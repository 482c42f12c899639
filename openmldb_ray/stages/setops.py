"""Distributed SQL set operations: INTERSECT / EXCEPT (both DISTINCT).

The reference's HybridSE enum carries a Union physical op
(hybridse/include/vm/physical_op.h:37-66) and the SQL docs reserve the
set-operation surface; this module completes it Ray-Data-first with the
other two ANSI set operations (UNION DISTINCT composes from the existing
``relational.distinct`` over a ``Dataset.union``).

Shape (the exact-dedup / semi-join pattern): both sides are tagged with a
side flag, unioned, and co-shuffled ONCE on a coarse SipHash bucket of ALL
columns — whole row-tuples land in the same bucket, so each bucket decides
its rows independently with no second pass. Within a bucket, rows are
canonicalized per column (``key_strings``: null-safe, block-dtype-safe)
and folded to integer codes via iterative ``np.unique`` — no string
concatenation (no separator-collision class of bugs), no per-row Python.
The emitted rows are ``take``n from the ARROW block, so payload values
never round-trip through pandas object dtype.

SQL null semantics: set operations compare by DISTINCTness, so NULL
matches NULL (IS NOT DISTINCT FROM) — ``key_strings``' sentinel gives
exactly that.

Scale: one all-to-all exchange of the (already column-pruned) inputs,
``default_num_buckets()`` fanout (4×cluster CPUs); per-bucket work is
O(rows log rows) vectorized. Nothing is materialized on the driver.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

SIDE_FLAG = "__is_left"
_BUCKET = "__sb"


def _check_schemas(a: "ray.data.Dataset", b: "ray.data.Dataset") -> list[str]:
    sa, sb = a.schema(), b.schema()
    if sa is None or sb is None:
        raise ValueError("set operation inputs must have a known schema")
    if list(sa.names) != list(sb.names):
        if sorted(sa.names) == sorted(sb.names):
            return list(sa.names)  # same columns, different order → align
        raise ValueError(
            f"set operation schemas differ: {list(sa.names)} vs {list(sb.names)}")
    return list(sa.names)


def _row_codes(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Integer tuple-identity codes for every row: canonicalize each
    column (null-safe strings), factorize, and fold columns pairwise with
    an overflow-free re-factorization after each fold."""
    from ..core.grouping import key_strings, null_int_types_mapper

    df = t.select(cols).to_pandas(types_mapper=null_int_types_mapper)
    codes: np.ndarray | None = None
    for c in cols:
        ks = key_strings(df[c])  # sentinel-filled: factorize sees no NA
        cc, uniq = pd.factorize(ks)
        cc = cc.astype(np.int64)
        if codes is None:
            codes = cc
        else:
            combined = codes * np.int64(len(uniq)) + cc
            _, codes = np.unique(combined, return_inverse=True)
            codes = codes.astype(np.int64)
    return codes if codes is not None else np.zeros(t.num_rows, np.int64)


def _make_bucket_fn(cols: list[str], keep_in_right: bool):
    """Per-bucket kernel: emit side-A rows whose tuple is (intersect) /
    is not (except) present on side B — first occurrence per distinct
    tuple, taken from the Arrow block (typed payload end to end)."""

    def fn(t: pa.Table) -> pa.Table:
        drop = [c for c in (SIDE_FLAG, _BUCKET) if c in t.column_names]
        body = t.drop_columns(drop)
        if t.num_rows == 0:
            return body
        is_a = np.asarray(t[SIDE_FLAG].combine_chunks().to_numpy(
            zero_copy_only=False), dtype=bool)
        codes = _row_codes(body, cols)
        a_pos = np.nonzero(is_a)[0]
        uniq_a, first_a = np.unique(codes[a_pos], return_index=True)
        b_codes = np.unique(codes[~is_a])
        keep = np.isin(uniq_a, b_codes, assume_unique=True)
        if not keep_in_right:
            keep = ~keep
        sel = a_pos[first_a[keep]]
        return body.take(pa.array(np.sort(sel), type=pa.int64()))

    return fn


def _setop(a, b, keep_in_right: bool, num_buckets: int | None):
    from ..core.empty_ds import union_any
    from ..core.grouping import map_groups_typed
    from ..core.hashing import add_bucket_column, default_num_buckets

    cols = _check_schemas(a, b)
    for name, tp in zip(a.schema().names, a.schema().types):
        if isinstance(tp, pa.DataType) and (
                pa.types.is_nested(tp) or pa.types.is_binary(tp)
                or pa.types.is_large_binary(tp)):
            raise TypeError(
                f"set operation on nested/binary column {name!r} is not "
                f"supported; hash it to a scalar fingerprint first")

    def tag(value: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            return t.append_column(
                SIDE_FLAG, pa.array(np.full(t.num_rows, value, bool)))
        return f

    both = union_any(
        a.map_batches(tag(True), batch_format="pyarrow", batch_size=None),
        b.map_batches(tag(False), batch_format="pyarrow", batch_size=None))
    nb = num_buckets or default_num_buckets()
    both = both.map_batches(add_bucket_column(cols, _BUCKET, nb),
                            batch_format="pyarrow", batch_size=None)
    out = map_groups_typed(both, _BUCKET, _make_bucket_fn(cols, keep_in_right),
                            batch_format="pyarrow")
    # one 0-row typed seed block: an all-excepted (empty) result must keep
    # its schema — Ray's groupby emits no blocks for it, collapsing
    # schema() to None downstream (found by the sf0.1 oracle sweep, where
    # EXCEPT is legitimately empty). Schemas were already probed above.
    from ..core.empty_ds import is_empty_shim

    sa = a.schema()
    if not is_empty_shim(out) and all(isinstance(t, pa.DataType)
                                      for t in sa.types):
        import ray.data as rd

        types = dict(zip(sa.names, sa.types))
        seed = pa.table({c: pa.nulls(0, types[c]) for c in cols})
        out = out.union(rd.from_arrow(seed))
    return out


def intersect_distinct(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                       num_buckets: int | None = None) -> "ray.data.Dataset":
    """ANSI ``a INTERSECT b``: distinct row-tuples present in BOTH inputs
    (row values from ``a``; NULLs compare equal)."""
    return _setop(a, b, keep_in_right=True, num_buckets=num_buckets)


def except_distinct(a: "ray.data.Dataset", b: "ray.data.Dataset", *,
                    num_buckets: int | None = None) -> "ray.data.Dataset":
    """ANSI ``a EXCEPT b``: distinct row-tuples of ``a`` absent from ``b``
    (NULLs compare equal)."""
    return _setop(a, b, keep_in_right=False, num_buckets=num_buckets)
