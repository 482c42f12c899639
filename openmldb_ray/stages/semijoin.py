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


def _probe(ldf: pd.DataFrame, rkeys: pd.DataFrame, on: list[str],
           anti: bool) -> pd.DataFrame:
    """Filter ``ldf`` by EXISTS/NOT EXISTS against distinct ``rkeys``."""
    lnull = ldf[on].isna().any(axis=1).to_numpy()
    rk = rkeys.dropna(subset=on).drop_duplicates(subset=on)
    if not len(rk):
        hit = np.zeros(len(ldf), dtype=bool)
    else:
        m = ldf[on].merge(rk[on], on=on, how="left", indicator=True)
        hit = (m["_merge"].to_numpy() == "both") & ~lnull
    return ldf[~hit if anti else hit]


def semi_join(
    left,
    right,
    on: str | list[str],
    *,
    anti: bool = False,
    strategy: str = "auto",
    broadcast_limit: int = 5_000_000,
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
        strategy = ("broadcast" if right.count() <= broadcast_limit
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

    from .interval_join import _restore_types, _schema_dtypes

    nb = num_buckets or default_num_buckets()
    lcols = list(left.schema().names)
    ltypes = _schema_dtypes(left, lcols)
    add_b = add_bucket_column(on, "__b", nb)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        out = df.copy()
        out["__role"] = np.zeros(len(df), dtype=np.int8)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        out = distinct_keys(df).copy()
        for c in lcols:
            if c not in out.columns:
                out[c] = None
        out["__role"] = np.ones(len(out), dtype=np.int8)
        return out[lcols + ["__role"]]

    # null-keyed left rows can't be routed by key hash and never match —
    # resolve them up front (anti keeps, semi drops) and exclude from the
    # exchange entirely
    def null_side(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        m = df[on].isna().any(axis=1)
        return df[m] if anti else df.iloc[:0]

    def nonnull(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df[on].isna().any(axis=1)]

    nulls = left.map_batches(null_side, batch_format="pandas",
                             batch_size=None)
    l_tag = left.map_batches(nonnull, batch_format="pandas",
                             batch_size=None) \
        .map_batches(tag_left, batch_format="pandas", batch_size=None) \
        .map_batches(add_b, batch_format="pyarrow", batch_size=None)
    r_tag = right.select_columns(on) \
        .map_batches(tag_right, batch_format="pandas", batch_size=None) \
        .map_batches(add_b, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        is_r = g["__role"].to_numpy() == 1
        ldf = _restore_types(g.loc[~is_r, lcols].reset_index(drop=True),
                             ltypes)
        rk = _restore_types(g.loc[is_r, on].reset_index(drop=True),
                            {c: ltypes[c] for c in on if c in ltypes})
        return _probe(ldf, rk, on, anti)

    joined = map_groups_typed(union_any(l_tag, r_tag), "__b", per_bucket,
                              batch_format="pandas",
                              num_partitions=num_partitions)
    return union_any(joined, nulls)


def anti_join(left, right, on, **kw):
    """NOT EXISTS: left rows with no equal-keyed right row."""
    return semi_join(left, right, on, anti=True, **kw)
