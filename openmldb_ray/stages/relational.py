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


def group_aggregate_sets(
    ds: "ray.data.Dataset",
    keys,
    aggs: list[AggSpec],
    *,
    sets="rollup",
    grouping_id_col: str = "grouping_id",
    materialize_input: bool = True,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """GROUP BY GROUPING SETS / ROLLUP / CUBE (north-rule extension — the
    reference has no grouping-sets surface; this is the multi-granularity
    rollup a feature store computes per (domain), (domain, lang), ()).

    ``sets``: ``"rollup"`` (prefixes, coarsest last), ``"cube"`` (all
    subsets), or an explicit list of key subsets. Key columns absent from
    a set come back NULL in their original Arrow type, and ``grouping_id``
    carries the standard GROUPING() bitmask (first key = most significant
    bit, 1 = aggregated out) so a real NULL key is distinguishable from a
    rollup NULL. NULL keys form their own groups (SQL GROUP BY).

    Scale shape (mergeable aggs — sum/count/avg/min/max/count_star): raw
    rows are pre-aggregated per batch and shuffled ONCE into a base table
    of mergeable partials at the FINEST (all-keys) granularity; every
    grouping set then re-aggregates that distinct-key base (tiny — it is
    |distinct key tuples| rows, materialized once), so s granularities
    cost one raw-data exchange, not s. ``avg`` rides as (sum, count)
    pairs, exact. Non-mergeable aggs (median/top/distinct_count/…) fall
    back to one :func:`group_aggregate` per set over the (optionally
    materialized) narrow projection.
    """
    import itertools

    import numpy as np
    import ray

    from ..core.empty_ds import union_any
    from ..core.grouping import map_groups_typed, null_int_types_mapper
    from ..core.hashing import (bucket_ids, default_num_buckets,
                                quiet_ray_data_logs)

    keys = [keys] if isinstance(keys, str) else list(keys)
    if sets == "rollup":
        set_list = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    elif sets == "cube":
        set_list = [s for r in range(len(keys), -1, -1)
                    for s in itertools.combinations(keys, r)]
    else:
        set_list = [tuple([s] if isinstance(s, str) else s) for s in sets]
        for s in set_list:
            if not set(s) <= set(keys):
                raise ValueError(f"grouping set {s} not a subset of {keys}")

    key_types = {n: t for n, t in zip(ds.schema().names, ds.schema().types)
                 if n in keys}
    out_cols = keys + [a.name for a in aggs] + [grouping_id_col]

    def _null_array(n: int, t):
        # schema types are pyarrow DataTypes for Arrow-block datasets,
        # numpy dtypes / Python types for pandas-block ones
        if isinstance(t, pa.DataType):
            if pa.types.is_integer(t):
                return pd.array([pd.NA] * n, dtype="Int64")
            if pa.types.is_floating(t):
                return np.full(n, np.nan)
            if pa.types.is_timestamp(t):
                return pd.array([pd.NaT] * n, dtype=f"datetime64[{t.unit}]")
            if pa.types.is_boolean(t):
                return pd.array([pd.NA] * n, dtype="boolean")
            return np.full(n, None, dtype=object)
        if pd.api.types.is_integer_dtype(t):
            return pd.array([pd.NA] * n, dtype="Int64")
        if pd.api.types.is_float_dtype(t):
            return np.full(n, np.nan)
        if pd.api.types.is_datetime64_any_dtype(t):
            return pd.array([pd.NaT] * n, dtype="datetime64[ns]")
        if pd.api.types.is_bool_dtype(t):
            return pd.array([pd.NA] * n, dtype="boolean")
        return np.full(n, None, dtype=object)

    def _pad_gid(part, missing, gid):
        def finish(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for k in missing:
                df[k] = _null_array(len(df), key_types[k])
            df[grouping_id_col] = np.int64(gid)
            return df[out_cols]

        return part.map_batches(finish, batch_format="pandas",
                                batch_size=None)

    def _gid(s):
        g = 0
        for i, k in enumerate(keys):
            if k not in s:
                g |= 1 << (len(keys) - 1 - i)
        return g

    mergeable = {"sum", "count", "avg", "min", "max", "count_star"}
    if not all(a.kind in mergeable for a in aggs):
        # exotic aggs: one group_aggregate per set (its coarse-bucket path
        # is null-key-safe); share the input scan via materialization
        need = list(dict.fromkeys(
            keys + [c for a in aggs
                    for c in (a.col, getattr(a, "cond", None),
                              getattr(a, "cat", None)) if c]))
        narrow = ds.select_columns(need)
        if materialize_input:
            narrow = narrow.materialize()
        outs = []
        for s in set_list:
            if s:
                part = group_aggregate(narrow, list(s), aggs,
                                       num_partitions=num_partitions)
            else:
                const = narrow.map_batches(
                    lambda t: t.append_column(
                        "__all", pa.array(np.zeros(len(t), dtype=np.int8))),
                    batch_format="pyarrow", batch_size=None)
                part = group_aggregate(
                    const, ["__all"], aggs,
                    num_partitions=num_partitions).drop_columns(["__all"])
            outs.append(_pad_gid(part, [k for k in keys if k not in s],
                                 _gid(s)))
        res = outs[0]
        for o in outs[1:]:
            res = union_any(res, o)
        return res

    # ---- mergeable path: one raw shuffle at the finest granularity ----
    # partial column plan: per agg, which mergeable pieces it ships
    pieces = []  # (agg_index, piece_kind in {s,c,m}, col_name)
    for i, a in enumerate(aggs):
        if a.kind in ("count", "count_star"):
            pieces.append((i, "c", f"__p{i}_c"))
        elif a.kind == "sum":
            pieces.append((i, "s", f"__p{i}_s"))
        elif a.kind == "avg":
            pieces.append((i, "s", f"__p{i}_s"))
            pieces.append((i, "c", f"__p{i}_c"))
        else:  # min / max
            pieces.append((i, a.kind, f"__p{i}_m"))

    need = list(dict.fromkeys(keys + [a.col for a in aggs if a.col]))
    nb = default_num_buckets()

    def partial(t: pa.Table) -> pd.DataFrame:
        quiet_ray_data_logs()
        df = t.to_pandas(types_mapper=null_int_types_mapper)
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for i, kind, name in pieces:
            a = aggs[i]
            if a.kind == "count_star":
                cols[name] = g.size()
            elif kind == "c":
                cols[name] = g[a.col].count()
            elif kind == "s":
                cols[name] = g[a.col].sum(min_count=1)
            else:
                cols[name] = getattr(g[a.col], kind)()
        out = pd.DataFrame(cols).reset_index()
        out["__b"] = bucket_ids(out, keys, nb)
        return out

    def merge_fn(sub_keys):
        def merge(g: pd.DataFrame) -> pd.DataFrame:
            quiet_ray_data_logs()
            g = g.drop(columns="__b", errors="ignore")
            gb = g.groupby(sub_keys, sort=False, dropna=False)
            cols = {}
            for i, kind, name in pieces:
                if kind == "c":
                    cols[name] = gb[name].sum()
                elif kind == "s":
                    cols[name] = gb[name].sum(min_count=1)
                else:
                    cols[name] = getattr(gb[name], kind)()
            return pd.DataFrame(cols).reset_index()

        return merge

    base = map_groups_typed(
        ds.select_columns(need)
          .map_batches(partial, batch_format="pyarrow", batch_size=None),
        "__b", merge_fn(keys), batch_format="pandas",
        num_partitions=num_partitions).materialize()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[c for c in df.columns if not c.startswith("__p")]].copy()
        for i, a in enumerate(aggs):
            if a.kind in ("count", "count_star"):
                out[a.name] = df[f"__p{i}_c"].fillna(0).astype(np.int64)
            elif a.kind == "sum":
                out[a.name] = df[f"__p{i}_s"]
            elif a.kind == "avg":
                s = df[f"__p{i}_s"].astype("float64")
                c = df[f"__p{i}_c"].astype("float64")
                out[a.name] = (s / c).where(c > 0)
            else:
                out[a.name] = df[f"__p{i}_m"]
        return out

    outs = []
    for s in set_list:
        if s == tuple(keys):
            part = base
        elif s:
            pre = base.map_batches(
                lambda df, sk=list(s): df.assign(
                    __b=bucket_ids(df, sk, nb)),
                batch_format="pandas", batch_size=None)
            part = map_groups_typed(pre, "__b", merge_fn(list(s)),
                                    batch_format="pandas",
                                    num_partitions=num_partitions)
        else:
            # global: the base is tiny (distinct key tuples) — one driver
            # fold is the cheapest correct reduce
            bdf = base.to_pandas()
            bdf["__all"] = np.int8(0)
            part = ray.data.from_pandas(
                merge_fn(["__all"])(bdf).drop(columns="__all"))
        part = part.map_batches(finalize, batch_format="pandas",
                                batch_size=None)
        outs.append(_pad_gid(part, [k for k in keys if k not in s],
                             _gid(s)))
    res = outs[0]
    for o in outs[1:]:
        res = union_any(res, o)
    return res


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
