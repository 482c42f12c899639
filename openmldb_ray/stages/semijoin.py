"""Distributed semi-join / anti-join (EXISTS / NOT EXISTS semantics).

``semi_join(left, right, on)`` keeps left rows that have at least one
right row with equal join keys; ``anti=True`` keeps the rows that have
none — the incremental-curation workhorse ("new docs whose content is
NOT already in yesterday's corpus", "users with at least one purchase").
The reference engine expresses these only as a LEFT JOIN + null filter,
shipping the whole right payload; a semi-join only needs right's DISTINCT
KEYS, which is the scale point.

Null semantics are SQL ``EXISTS`` (not ``IN``): null keys never equal
anything — a null-keyed left row is dropped by semi and KEPT by anti,
and null right keys are ignored entirely.

Scale design — two strategies, ``auto`` by right-side metadata count:

* ``broadcast``: right is reduced to its distinct keys with a per-block
  combiner BEFORE materializing (the driver sees distinct keys, never
  rows), put in the object store once, and each left batch filters with
  one vectorized ``merge`` membership probe.
* ``shuffle``: both sides co-shuffle ONCE on a coarse bucket of the key
  hash — right reduced to per-block distinct keys first, so the exchange
  carries distinct-key partials, not right rows — and each bucket probes
  locally.  Value-exact within the bucket (the hash only routes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ..config import broadcast_limit as _cfg_broadcast_limit


def _probe_mask(lkeys: pd.DataFrame, rkeys: pd.DataFrame,
                on: list[str]) -> np.ndarray:
    """EXISTS hit mask per left row against distinct ``rkeys`` (null left
    keys never hit)."""
    lnull = lkeys[on].isna().any(axis=1).to_numpy()
    rk = rkeys.dropna(subset=on).drop_duplicates(subset=on)
    if not len(rk):
        return np.zeros(len(lkeys), dtype=bool)
    m = lkeys[on].merge(rk[on], on=on, how="left", indicator=True)
    return (m["_merge"].to_numpy() == "both") & ~lnull


def _probe(ldf: pd.DataFrame, rkeys: pd.DataFrame, on: list[str],
           anti: bool) -> pd.DataFrame:
    """Filter ``ldf`` by EXISTS/NOT EXISTS against distinct ``rkeys``."""
    hit = _probe_mask(ldf, rkeys, on)
    return ldf[~hit if anti else hit]


def semi_join(
    left,
    right,
    on: str | list[str],
    *,
    anti: bool = False,
    strategy: str = "auto",
    broadcast_limit: int | None = None,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
):
    import ray

    from ..core.empty_ds import union_any
    from ..core.grouping import map_groups_typed
    from ..core.hashing import (add_bucket_column, default_num_buckets,
                                quiet_ray_data_logs)

    on = [on] if isinstance(on, str) else list(on)

    def distinct_keys(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        return df[on].dropna(subset=on).drop_duplicates(subset=on)

    if strategy == "auto":
        # materialize ONCE (object store, spillable): the count below and
        # the chosen path's distinct-keys pass / exchange would otherwise
        # each re-run right's full upstream lineage (the last_join /
        # anti_join_ids materialize-once pattern)
        right = right.materialize()
        strategy = ("broadcast"
                    if right.count() <= _cfg_broadcast_limit(broadcast_limit,
                                                            5_000_000)
                    else "shuffle")

    if strategy == "broadcast":
        rkeys = right.select_columns(on).map_batches(
            distinct_keys, batch_format="pandas",
            batch_size=None).to_pandas()
        if not set(on) <= set(rkeys.columns):
            # empty datasets can materialize with no columns at all
            rkeys = pd.DataFrame({c: pd.Series(dtype=object) for c in on})
        rkeys = rkeys.drop_duplicates(subset=on)
        ref = ray.put(rkeys)

        class _Probe:
            def __init__(self):
                self.rkeys = ray.get(ref)

            def __call__(self, ldf: pd.DataFrame) -> pd.DataFrame:
                quiet_ray_data_logs()
                return _probe(ldf, self.rkeys, on, anti)

        return left.map_batches(_Probe, batch_format="pandas",
                                concurrency=(1, 16))

    if strategy != "shuffle":
        raise ValueError(f"strategy={strategy!r}")

    # typed-Arrow exchange end-to-end (the interval_join f35fe6e shape):
    # right rows pad non-key columns with pa.nulls of the LEFT schema's
    # types, and the per-bucket probe filters the left Arrow table by a
    # key-only membership mask — left payload columns never round-trip
    # through pandas, so nullable int64 payloads neither crash a restore
    # cast nor lose >2^53 precision to float64 unification.
    import pyarrow as pa
    import pyarrow.compute as pc

    nb = num_buckets or default_num_buckets()
    ds_a = left.map_batches(lambda t: t, batch_format="pyarrow",
                            batch_size=None)
    schema = ds_a.schema()
    names, types = list(schema.names), list(schema.types)
    add_b = add_bucket_column(on, "__b", nb)

    def null_key_mask(t: pa.Table):
        m = None
        for c in on:
            mc = pc.is_null(t[c])
            m = mc if m is None else pc.or_(m, mc)
        return m

    # null-keyed left rows can't be routed by key hash and never match —
    # resolve them up front (anti keeps, semi drops) and exclude from the
    # exchange entirely
    def null_side(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        t = t.select(names).replace_schema_metadata(None)
        return t.filter(null_key_mask(t)) if anti else t.slice(0, 0)

    def mark_left(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        t = t.select(names).replace_schema_metadata(None)
        t = t.filter(pc.invert(null_key_mask(t)))
        return t.append_column("__role",
                               pa.array(np.zeros(t.num_rows, np.int8)))

    def pad_right(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        arrays = []
        for name, typ in zip(names, types):
            if name in on:
                arrays.append(pc.cast(t[name], typ).combine_chunks())
            else:
                arrays.append(pa.nulls(t.num_rows, typ))
        out = pa.Table.from_arrays(arrays, names=names)
        return out.append_column("__role",
                                 pa.array(np.ones(t.num_rows, np.int8)))

    nulls = ds_a.map_batches(null_side, batch_format="pyarrow",
                             batch_size=None)
    l_tag = ds_a.map_batches(mark_left, batch_format="pyarrow",
                             batch_size=None) \
        .map_batches(add_b, batch_format="pyarrow", batch_size=None)
    r_tag = right.select_columns(on) \
        .map_batches(distinct_keys, batch_format="pandas",
                     batch_size=None) \
        .map_batches(pad_right, batch_format="pyarrow", batch_size=None) \
        .map_batches(add_b, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        is_r = pc.equal(g["__role"], 1)
        lt = g.filter(pc.invert(is_r)).select(names)
        rk = g.filter(is_r).select(on).to_pandas()
        hit = _probe_mask(lt.select(on).to_pandas(), rk, on)
        return lt.filter(pa.array(~hit if anti else hit))

    joined = map_groups_typed(union_any(l_tag, r_tag), "__b", per_bucket,
                              batch_format="pyarrow",
                              num_partitions=num_partitions)
    return union_any(joined, nulls)


def anti_join(left, right, on, **kw):
    """NOT EXISTS: left rows with no equal-keyed right row."""
    return semi_join(left, right, on, anti=True, **kw)
