"""Wide/long reshaping: pivot (categories → columns) and unpivot (melt).

``pivot_agg`` is the feature-eng "one column per category" rollup —
``SELECT key, SUM(CASE WHEN cat='a' THEN v END) AS v_sum_a, ... GROUP BY
key`` — without writing a CASE arm per category.  The reference has no
PIVOT statement (the *_cate UDAF family — default_defs/*_by_category_def.cc
— emits packed "cat:val,…" strings instead); this materializes the same
information as real typed columns, the shape ML feature stores want.

Scale shape: a per-batch combiner first collapses rows to ONE wide partial
row per (key, batch) — the shuffle carries |keys| × |categories| partials,
never raw rows — then one coarse key-hash bucket exchange merges partials
vectorized.  ``mean`` ships (sum, count) pairs and finalizes after the
merge, so it is exact, not an average of averages.

SQL-parity cell semantics for a (key, category) with no rows: ``sum`` /
``min`` / ``max`` / ``mean`` → NULL (SQL aggregates over an empty set),
``count`` → 0.

``unpivot`` is the inverse: row-local melt of value columns into
(variable, value) rows — shuffle-free, one streaming pass.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_AGGS = ("sum", "count", "min", "max", "mean")


def _sanitize(cat) -> str:
    return re.sub(r"\W", "_", str(cat))


def pivot_categories(ds, cat_col: str, *, cap: int = 10_000) -> list:
    """One narrow distinct scan of the category column (per-block unique →
    tiny driver fold), refused past ``cap`` distinct values — a pivot with
    100k columns is a modeling bug, not a dataframe."""

    def block_unique(df: pd.DataFrame) -> pd.DataFrame:
        u = df[cat_col].dropna().unique()
        return pd.DataFrame({"c": u})

    parts = (ds.select_columns([cat_col])
             .map_batches(block_unique, batch_format="pandas",
                          batch_size=None).to_pandas())
    if "c" not in parts.columns:   # all-empty input: Ray skips the UDF
        return []
    cats = sorted(parts["c"].unique().tolist())
    if len(cats) > cap:
        raise ValueError(
            f"pivot: {len(cats)} distinct categories exceed cap={cap}")
    return cats


def pivot_agg(
    ds,
    key_cols,
    cat_col: str,
    value_col: str,
    *,
    agg: str = "sum",
    categories: list | None = None,
    out_prefix: str | None = None,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
):
    """Pivot ``cat_col``'s categories into aggregated columns per key.

    Output: one row per distinct ``key_cols`` tuple with a column
    ``{out_prefix}{category}`` per category (sorted, sanitized names;
    default prefix ``{value_col}_{agg}_``).  NULL categories are ignored
    (they are not a column, matching the CASE-arm SQL shape).
    """
    from ..core.grouping import map_groups_typed
    from ..core.hashing import (add_bucket_column, default_num_buckets,
                                quiet_ray_data_logs)

    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {_AGGS}, got {agg!r}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if categories is None:
        categories = pivot_categories(ds, cat_col)
    categories = sorted(categories)
    prefix = (f"{value_col}_{agg}_" if out_prefix is None else out_prefix)
    names = [f"{prefix}{_sanitize(c)}" for c in categories]
    if len(set(names)) != len(names):
        raise ValueError(
            "pivot: sanitized category names collide; pass out_prefix= or "
            "distinct categories")
    # mean ships mergeable (sum, count) pairs; everything else merges with
    # its own agg
    parts_spec = (["sum", "count"] if agg == "mean" else [agg])

    narrow = ds.select_columns(list(dict.fromkeys(keys + [cat_col,
                                                          value_col])))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        d = df[df[cat_col].notna()]
        g = d.groupby(keys + [cat_col], sort=False, dropna=False)[value_col]
        frames = {}
        for p in parts_spec:
            s = getattr(g, p)() if p != "sum" else g.sum(min_count=1)
            frames[p] = s
        wide = {}
        for p, s in frames.items():
            w = s.unstack(cat_col)
            w = w.reindex(columns=categories)
            w.columns = [f"__{p}__{_sanitize(c)}" for c in categories]
            wide[p] = w
        out = pd.concat(wide.values(), axis=1).reset_index()
        return out

    from ..core.hashing import bucket_ids

    nb = num_buckets or default_num_buckets()

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        df = df.copy()
        df["__b"] = bucket_ids(df, keys, nb)
        return df

    pre = narrow \
        .map_batches(partial, batch_format="pandas", batch_size=None) \
        .map_batches(add_b, batch_format="pandas", batch_size=None)

    pcols = {p: [f"__{p}__{_sanitize(c)}" for c in categories]
             for p in parts_spec}

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        g = g.drop(columns="__b")
        gb = g.groupby(keys, sort=False, dropna=False)
        merged = {}
        for p, cols in pcols.items():
            if p == "sum":
                merged[p] = gb[cols].sum(min_count=1)
            elif p == "count":
                merged[p] = gb[cols].sum(min_count=1)
            else:
                merged[p] = getattr(gb[cols], p)()
        if agg == "mean":
            s = merged["sum"].to_numpy(np.float64)
            c = merged["count"].to_numpy(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                m = np.where(c > 0, s / c, np.nan)
            out = pd.DataFrame(m, columns=names,
                               index=merged["sum"].index)
        else:
            out = merged[agg]
            out.columns = names
            if agg == "count":
                # COUNT over an existing key group with no rows of this
                # category is 0, not NULL
                out = out.fillna(0).astype(np.int64)
        return out.reset_index()

    return map_groups_typed(pre, "__b", per_bucket, batch_format="pandas",
                            num_partitions=num_partitions)


def explode(ds, list_col: str, *, out_col: str | None = None,
            pos_col: str | None = None):
    """UNNEST a list column into one row per element — Arrow-native and
    zero-copy: the flattened child array is referenced, not rebuilt, and
    the parent rows are gathered with one ``take`` on
    ``list_parent_indices``. SQL semantics: NULL and empty lists produce
    no rows. ``pos_col`` adds the 0-based ordinality."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        out = t.drop_columns([list_col]).take(idx)
        out = out.append_column(out_col or list_col, flat)
        if pos_col:
            lengths = pc.list_value_length(col).to_numpy(
                zero_copy_only=False)
            lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
            first = np.concatenate(([0], np.cumsum(lengths)[:-1]))
            pos = (np.arange(int(lengths.sum()))
                   - np.repeat(first, lengths))
            out = out.append_column(pos_col, pa.array(pos, pa.int64()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def collect_list(ds, key, value_col: str, *, sort_by=None,
                 out_col: str | None = None,
                 num_buckets: int | None = None,
                 num_partitions: int | None = None):
    """The inverse of :func:`explode`: gather ``value_col`` into one
    Arrow list per key (assembling token sequences / per-user event
    traces). One coarse key-hash exchange; inside each bucket ONE Arrow
    sort + a zero-copy ``ListArray.from_arrays(offsets, values)`` — no
    per-group Python list building. ``sort_by`` fixes the element order
    (pass a unique column for determinism); NULL values are kept as list
    elements (SQL's array_agg keeps them too unless filtered first)."""
    import pyarrow as pa

    from ..core.grouping import map_groups_typed
    from ..core.hashing import (add_bucket_column, default_num_buckets,
                                quiet_ray_data_logs)

    keys = [key] if isinstance(key, str) else list(key)
    if len(keys) != 1:
        raise ValueError("collect_list: single key column only")
    key = keys[0]
    sort_cols = [key] + ([sort_by] if isinstance(sort_by, str)
                         else list(sort_by or []))
    name = out_col or f"{value_col}_list"

    nb = num_buckets or default_num_buckets()
    add_b = add_bucket_column([key], "__b", nb)
    pre = ds.select_columns(list(dict.fromkeys(sort_cols + [value_col]))) \
        .map_batches(add_b, batch_format="pyarrow", batch_size=None)

    def per_bucket(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        t = t.drop_columns(["__b"]).sort_by(
            [(c, "ascending") for c in sort_cols])
        kcol = t.column(key)
        codes = pd.factorize(kcol.to_pandas(), use_na_sentinel=False)[0]
        n = len(t)
        if n == 0:
            empty = pa.ListArray.from_arrays(
                pa.array([0], pa.int32()),
                t.column(value_col).combine_chunks())
            return pa.table({key: kcol.combine_chunks(),
                             name: empty.slice(0, 0)})
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(newg)
        offsets = np.concatenate((starts, [n])).astype(np.int32)
        values = t.column(value_col)
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        return pa.table({key: kcol.take(pa.array(starts)), name: la})

    return map_groups_typed(pre, "__b", per_bucket,
                            batch_format="pyarrow",
                            num_partitions=num_partitions)


def unpivot(
    ds,
    id_cols,
    value_cols,
    *,
    var_name: str = "variable",
    value_name: str = "value",
):
    """Melt ``value_cols`` into (variable, value) rows — the long format
    groupbys and window stages want. Row-local (k-fold replication inside
    each batch), shuffle-free, streaming."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    vals = list(value_cols)
    if not vals:
        raise ValueError("unpivot: value_cols must be non-empty")

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        return df.melt(id_vars=ids, value_vars=vals,
                       var_name=var_name, value_name=value_name)

    return ds.select_columns(ids + vals).map_batches(
        melt, batch_format="pandas", batch_size=None)
