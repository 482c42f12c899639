"""Relational operators: the non-window slice of the reference's offline
plan inventory (SparkPlanner.scala:235-276 dispatch), re-expressed as thin
Ray Data compositions. Each helper documents the reference node it covers.

These are intentionally shallow — Ray Data's Dataset API already IS the
operator; the value here is (a) OpenMLDB-exact semantics (e.g. GROUP BY
aggregate null handling, LIMIT-before-sort ordering), (b) named-output
aggregation matching the oracle SQL column names, (c) scale-conscious
defaults (partial aggregation before the shuffle).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..core.aggregates import AggSpec

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def simple_project(ds: "ray.data.Dataset", columns: dict[str, str] | list[str],
                   casts: dict[str, pa.DataType] | None = None) -> "ray.data.Dataset":
    """SimpleProjectPlan.scala:35 — select / reorder / rename / cast."""
    if isinstance(columns, list):
        columns = {c: c for c in columns}
    casts = casts or {}

    def fn(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        for src, dst in columns.items():
            col = t[src]
            if src in casts:
                col = pc.cast(col, casts[src])
            arrays.append(col)
            names.append(dst)
        return pa.Table.from_arrays([a.combine_chunks() for a in arrays], names=names)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def const_project(rows: list[dict]) -> "ray.data.Dataset":
    """ConstProjectPlan.scala:32 — SELECT of constants."""
    import ray.data as rd

    return rd.from_items(rows)


def filter_expr(ds: "ray.data.Dataset", predicate) -> "ray.data.Dataset":
    """FilterPlan.scala:29-75 — vectorized predicate inside map_batches
    (pc expression builder fn: pa.Table -> BooleanArray)."""

    def fn(t: pa.Table) -> pa.Table:
        mask = predicate(t)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def group_aggregate(
    ds: "ray.data.Dataset",
    keys,
    aggs: list[AggSpec],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """GroupByAggregationPlan.scala:37-174 — full GROUP BY aggregate.

    Simple aggregates (sum/count/avg/min/max/count_star) go through Ray
    Data's native ``groupby().aggregate(...)`` which pre-aggregates per
    block before the shuffle (the scale path). Anything else
    (distinct_count/median/top/…/cate) falls back to
    ``groupby().map_groups`` with the exact evaluators over whole groups.
    """
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    keys = [keys] if isinstance(keys, str) else list(keys)
    native = {"sum": Sum, "count": Count, "avg": Mean, "min": Min, "max": Max}
    if all(a.kind in native or a.kind == "count_star" for a in aggs):
        fns = []
        for a in aggs:
            if a.kind == "count_star":
                fns.append(Count(alias_name=a.name))
            elif a.kind == "count":
                # count(col) counts NON-NULL values (reference semantics;
                # Ray's Count default ignore_nulls=False would count rows)
                fns.append(Count(a.col, ignore_nulls=True, alias_name=a.name))
            else:
                fns.append(native[a.kind](a.col, alias_name=a.name))
        return ds.groupby(keys, num_partitions=num_partitions).aggregate(*fns)

    import numpy as np

    from ..core.aggregates import make_evaluator
    from ..core.hashing import add_bucket_column, default_num_buckets

    evals = [(a, make_evaluator(a)) for a in aggs]

    # shuffle on a COARSE bucket of the group keys, then evaluate every real
    # group inside the bucket with one pandas groupby — one Ray dispatch per
    # bucket instead of per group (matters when key cardinality is large;
    # same trick as stages/dedup.py). Bucket column appended Arrow-native so
    # the exchange moves Arrow blocks.
    add_bucket = add_bucket_column(keys, "__gb", default_num_buckets())

    # integer columns convert from Arrow as NULLABLE Int64 so a bucket that
    # happens to carry a null keeps the exact-int evaluator path: a plain
    # to_pandas() would deliver float64 there, silently corrupting int64
    # values >= 2^53 (distinct ids collapse) AND flipping the output dtype
    # per bucket (the data-dependent-schema bug class fixed in
    # stream_window commit 7fb6252)
    _null_ints = {pa.int8(): pd.Int64Dtype(), pa.int16(): pd.Int64Dtype(),
                  pa.int32(): pd.Int64Dtype(), pa.int64(): pd.Int64Dtype(),
                  pa.uint8(): pd.Int64Dtype(), pa.uint16(): pd.Int64Dtype(),
                  pa.uint32(): pd.Int64Dtype()}

    def fn(t) -> pd.DataFrame:
        bucket = t.to_pandas(types_mapper=_null_ints.get) \
            if isinstance(t, pa.Table) else t
        bucket = bucket.drop(columns="__gb", errors="ignore")
        rows = []
        for key_vals, g in bucket.groupby(keys, sort=False, dropna=False):
            if not isinstance(key_vals, tuple):
                key_vals = (key_vals,)
            idx = np.arange(len(g), dtype=np.int64)
            cols = {}
            for a, _ in evals:
                for c in (a.col, a.cond, a.cat):
                    if c and c not in cols:
                        s = g[c]
                        valid = s.notna().to_numpy()
                        if pd.api.types.is_integer_dtype(s):
                            vals = s.fillna(0).to_numpy(np.int64)
                        elif pd.api.types.is_numeric_dtype(s) or pd.api.types.is_bool_dtype(s):
                            vals = pd.to_numeric(s, errors="coerce").fillna(0).to_numpy(float)
                        else:
                            vals = s.to_numpy(object)
                        cols[c] = (vals, valid)
            row = dict(zip(keys, key_vals))
            for a, ev in evals:
                row[a.name] = ev(cols, idx)
            rows.append(row)
        return pd.DataFrame(rows)

    from ..core.grouping import map_groups_typed

    return map_groups_typed(
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
        "__gb", fn, batch_format="pyarrow", num_partitions=num_partitions)


def sort_by(ds: "ray.data.Dataset", keys, descending=False) -> "ray.data.Dataset":
    """SortByPlan.scala:25-31 — global ORDER BY (range-partitioned sort)."""
    return ds.sort(keys, descending=descending)


def limit_n(ds: "ray.data.Dataset", n: int) -> "ray.data.Dataset":
    """LimitPlan.scala:25-26."""
    return ds.limit(n)


def distinct(ds: "ray.data.Dataset", keys=None) -> "ray.data.Dataset":
    """DISTINCT over the given columns (whole row when keys is None).

    The reference has no offline Distinct implementation
    (SparkPlanner.scala:274-275 throws); provided here because a
    training-data engine needs it. Per-block local dedup (combiner) →
    coarse-bucket hash shuffle → per-bucket drop_duplicates: one Ray
    dispatch per bucket, not one per distinct value (a high-cardinality
    key would otherwise spawn millions of group tasks).
    """
    from ..core.hashing import add_bucket_column, default_num_buckets

    if keys is None:
        keys = list(ds.schema().names)
    keys = [keys] if isinstance(keys, str) else list(keys)
    sel = ds.select_columns(keys)

    def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(keys)

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(keys).drop(columns="__db")

    from ..core.grouping import map_groups_typed

    return map_groups_typed(
        sel.map_batches(local_dedup, batch_format="pandas", batch_size=None)
           .map_batches(add_bucket_column(keys, "__db", default_num_buckets()),
                        batch_format="pyarrow", batch_size=None),
        "__db", bucket_dedup, batch_format="pandas")


def concat_zip(a: "ray.data.Dataset", b: "ray.data.Dataset") -> "ray.data.Dataset":
    """ConcatJoinPlan.scala:32-81 — zip two plan outputs row-by-row (used to
    stitch independently computed windows). Requires equal row counts and
    aligned ordering (same upstream sort)."""
    from ..core.empty_ds import zip_any

    return zip_any(a, b)
