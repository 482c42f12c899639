"""Vectorized deterministic hashing for shuffle/bucket keys.

Every wide stage in this engine (window_agg, group_aggregate exotic path,
sessionize, exact_dedup) shuffles on a COARSE bucket of its logical key so
that Ray dispatches one task per bucket instead of one per key. The bucket
hash must be (a) deterministic across processes (no PYTHONHASHSEED), and
(b) vectorized — it runs over EVERY input row of every such query, so a
per-row Python hash call here taxes the whole engine.

Implementation: ``pandas.util.hash_array`` (SipHash-1-3 in C with a fixed
16-byte key, categorize=True so repeated values hash once) per key column,
combined across columns with splitmix-style mixing in uint64 wraparound
arithmetic. No Python-level per-row work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "openmldb-ray-h64"  # 16 bytes, fixed → process-independent
_MIX = np.uint64(0x9E3779B97F4A7C15)
# nulls in integer-typed columns hash to the same value a NaN would in a
# float64 block (the Arrow→numpy conversion of int-with-null produces
# float64+NaN), keeping the two representations of "null int" coherent
_NULL_HASH = pd.util.hash_array(np.array([np.nan]), hash_key=_HASH_KEY)[0]


def stable_hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a column (Series/ndarray/
    Arrow array). Strings, ints, floats, bools all supported; nulls hash
    to a fixed value.

    Integer columns CONTAINING nulls hash by their integer bits, not by
    the float64 the default numpy conversion would produce: otherwise the
    same value 5 hashes differently in a null-carrying block (float64
    5.0) than in a null-free one (int64 5) — block-dependent buckets
    split one key across shuffle partitions and break feature_cross's
    same-inputs-same-bucket guarantee.

    ALL nulls hash to one fixed value regardless of the block's physical
    representation: float NaN, Arrow null, object None and Arrow
    null-TYPED columns (an all-null slice degraded by a pandas concat)
    must agree, else one null key splits across buckets depending on
    which block its row happened to land in."""
    import pyarrow as pa

    null_mask = None
    if isinstance(values, (pa.Array, pa.ChunkedArray)) and \
            not (pa.types.is_integer(values.type)
                 or pa.types.is_boolean(values.type)) and values.null_count:
        # generic Arrow null mask (ints/bools handled with fill_null
        # below); computed BEFORE to_numpy, which erases null identity
        null_mask = pa.compute.is_null(values).to_numpy(zero_copy_only=False)
    if isinstance(values, (pa.Array, pa.ChunkedArray)) and \
            (pa.types.is_integer(values.type)
             or pa.types.is_boolean(values.type)):
        if values.null_count:
            null_mask = pa.compute.is_null(values).to_numpy(
                zero_copy_only=False)
            values = pa.compute.fill_null(
                values, False if pa.types.is_boolean(values.type) else 0)
        arr = values.to_numpy(zero_copy_only=False)
        if arr.dtype.kind == "i" and arr.dtype != np.int64:
            arr = arr.astype(np.int64)
        elif arr.dtype.kind == "u" and arr.dtype != np.uint64:
            arr = arr.astype(np.uint64)
    elif hasattr(values, "to_numpy"):  # pd.Series / pa.Array / pa.ChunkedArray
        if isinstance(values, pd.Series) and \
                pd.api.types.is_extension_array_dtype(values.dtype) and \
                pd.api.types.is_integer_dtype(values.dtype):
            # masked Int64 etc.: same integer-bits rule as the Arrow path
            null_mask = values.isna().to_numpy()
            arr = values.fillna(0).to_numpy(np.int64)
        else:
            try:
                arr = values.to_numpy(zero_copy_only=False)  # pyarrow sig
            except TypeError:
                arr = values.to_numpy()
    else:
        arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S"):
        arr = arr.astype(object)
    if null_mask is None and arr.dtype.kind in ("O", "M", "m"):
        # object None / pd.NA / NaT: unify with the fixed null hash
        m = pd.isna(arr)
        if m.any():
            null_mask = m
    h = pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=True)
    if null_mask is not None and null_mask.any():
        h = h.copy() if not h.flags.writeable else h
        h[null_mask] = _NULL_HASH
    return h


def bucket_ids(table_or_df, keys: list[str], num_buckets: int) -> np.ndarray:
    """Combined bucket id over one or more key columns → int64 in
    [0, num_buckets). Accepts a pa.Table or pd.DataFrame."""
    h = None
    for k in keys:
        col = table_or_df[k]
        hk = stable_hash64(col)
        with np.errstate(over="ignore"):
            h = hk if h is None else (h * _MIX) ^ hk
    return (h % np.uint64(num_buckets)).astype("int64")


def default_num_buckets(floor: int = 256) -> int:
    """Bucket fanout: max(floor, 4 × cluster CPUs) so reduce-side
    parallelism scales with the cluster instead of capping at a constant
    (VERDICT r1: fixed 256 caps a 256-node cluster's window reduce).
    ``OMR_NUM_BUCKETS`` pins it explicitly (RUNBOOK.md knobs)."""
    from ..config import num_buckets as _cfg_num_buckets

    pinned = _cfg_num_buckets()
    if pinned:
        return pinned
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover - ray not importable
        cpus = 0
    return max(floor, 4 * cpus)


def quiet_ray_data_logs() -> None:
    """Drop two cosmetic ray.data warnings (unhashable pandas-metadata
    schemas; zero-column reduce blocks). Called from inside worker UDFs:
    ray.data's own configure_logging() resets logger levels per process,
    so a one-time driver-side setLevel does not survive into map workers."""
    import logging

    for name in ("ray.data._internal.arrow_ops.transform_pyarrow",
                 "ray.data._internal.execution.streaming_executor_state",
                 # empty pandas blocks: size sampling np.vectorize s on
                 # zero rows ("Error calculating size for column ...")
                 "ray.data._internal.pandas_block"):
        logging.getLogger(name).setLevel(logging.ERROR)


def add_bucket_column(keys: list[str], col_name: str, num_buckets: int):
    """Arrow-native map_batches fn factory: append the bucket-id column to
    each batch. Blocks stay Arrow through the downstream shuffle (no
    pandas/object round-trip before groupby)."""
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        ids = bucket_ids(t, keys, num_buckets)
        # schema metadata (b'pandas'/parquet provenance dicts) makes
        # schemas UNHASHABLE, defeating Ray's schema-dedup in the shuffle
        # ("Failed to hash the schemas" warning per unify) — strip it here,
        # right before every grouped exchange (zero-copy)
        return t.replace_schema_metadata(None) \
                .append_column(col_name, pa.array(ids, type=pa.int64()))

    return fn
