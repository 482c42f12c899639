"""Hopping / tumbling (sliding-by-step) window aggregation.

``hopping_window_agg(ds, ts_col=.., window=W, hop=H, ...)`` aggregates
events into OVERLAPPING fixed windows: window starts are the multiples of
``H``, each window covers ``[start, start + W)``, and every event lands in
exactly ``k = W // H`` windows.  ``W == H`` degenerates to the tumbling
window (GROUP BY time bucket).  This is the streaming-analytics aggregate
(reference analog: OpenMLDB's ROWS_RANGE window is the per-row PIT
variant, see core/window_exact.py; the hopping form is the per-WINDOW
variant a monitoring / training-feature rollup needs).

Scale design: each batch replicates its rows k times VECTORIZED
(``np.repeat`` + tiled offsets — k is a small constant, W/H), then
immediately collapses them with a per-batch partial-aggregate combiner, so
the shuffle carries at most (#keys × #windows-touched) partial rows per
block, never the replicated events.  One coarse-bucket hash shuffle on
(keys, window_start) finishes the aggregate — the group_aggregate /
ngram_counts shape.  Supported: count (star), count_col, sum, min, max,
mean (sum+count carried separately and divided after the shuffle).  SQL
null semantics: sum/min/max/mean ignore nulls and are NULL for all-null
groups; count_col counts non-nulls.

Window starts are emitted as int64 in the timestamp's own unit (epoch us
for datetime inputs) so the output stays arithmetic-friendly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .interval_join import _to_i64

_FUNCS = ("count", "count_col", "sum", "min", "max", "mean")


def hopping_window_agg(
    ds,
    *,
    ts_col: str,
    window: int,
    hop: int,
    aggs: dict,
    key_cols: list[str] | None = None,
    out_ts_col: str = "window_start",
    num_buckets: int | None = None,
    num_partitions: int | None = None,
):
    """``aggs``: out_name -> (func, col) with func in
    count/count_col/sum/min/max/mean (col ignored for count).  Windows are
    ``[s, s + window)`` for every s multiple of ``hop`` that the data
    touches; requires ``window % hop == 0``."""
    from ..core.grouping import map_groups_typed
    from ..core.hashing import (add_bucket_column, default_num_buckets,
                                quiet_ray_data_logs)

    if window % hop != 0 or window <= 0 or hop <= 0:
        raise ValueError("window must be a positive multiple of hop")
    k = window // hop
    keys = list(key_cols) if key_cols else []
    for out, (fn, col) in aggs.items():
        if fn not in _FUNCS:
            raise ValueError(f"unsupported agg {fn!r}")
        if fn != "count" and col is None:
            raise ValueError(f"{out}: {fn} needs a column")
    val_cols = sorted({col for (fn, col) in aggs.values() if col})
    nb = num_buckets or default_num_buckets()

    # Blocks must emit IDENTICALLY-typed partials: a pandas conversion
    # maps int64-with-nulls to float64 only in blocks that contain a
    # null, so the shuffle would concatenate heterogeneous schemas
    # (ArrowInvalid on >2^53 ints; silent float precision loss below).
    # Convert from Arrow with nullable pandas ints instead — every
    # integer value column is Int64 in EVERY block, exact and stable.
    import pyarrow as pa

    _null_ints = {pa.int8(): pd.Int64Dtype(), pa.int16(): pd.Int64Dtype(),
                  pa.int32(): pd.Int64Dtype(), pa.int64(): pd.Int64Dtype(),
                  pa.uint8(): pd.Int64Dtype(), pa.uint16(): pd.Int64Dtype(),
                  pa.uint32(): pd.Int64Dtype()}

    def _typed_pdf(t: "pa.Table") -> pd.DataFrame:
        return t.to_pandas(types_mapper=_null_ints.get)

    # partial-column plan: one (sum|min|max|cnt) per (func-kind, col)
    def partial(t: "pa.Table") -> pd.DataFrame:
        quiet_ray_data_logs()
        df = _typed_pdf(t)
        n = len(df)
        ts = _to_i64(df[ts_col].to_numpy())
        base = np.floor_divide(ts, hop)
        idx = np.repeat(np.arange(n), k)
        ws = (base[idx] - np.tile(np.arange(k), n)) * hop
        rep = df.iloc[idx][keys + val_cols].reset_index(drop=True)
        rep[out_ts_col] = ws
        gb = rep.groupby(keys + [out_ts_col], sort=False, dropna=False)
        parts = {"__cnt": gb.size()}
        for col in val_cols:
            parts[f"__sum_{col}"] = gb[col].sum(min_count=1)
            parts[f"__min_{col}"] = gb[col].min()
            parts[f"__max_{col}"] = gb[col].max()
            parts[f"__nnz_{col}"] = gb[col].count()
        return pd.concat(parts, axis=1).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        gb = g.groupby(keys + [out_ts_col], sort=False, dropna=False)
        agg = {"__cnt": gb["__cnt"].sum()}
        for col in val_cols:
            agg[f"__sum_{col}"] = gb[f"__sum_{col}"].sum(min_count=1)
            agg[f"__min_{col}"] = gb[f"__min_{col}"].min()
            agg[f"__max_{col}"] = gb[f"__max_{col}"].max()
            agg[f"__nnz_{col}"] = gb[f"__nnz_{col}"].sum()
        m = pd.concat(agg, axis=1).reset_index()
        out = m[keys + [out_ts_col]].copy()
        # the window-start key is never null: plain int64 out (the
        # nullable Int64 came from the stable-partial conversion)
        out[out_ts_col] = out[out_ts_col].astype("int64")
        for name, (fn, col) in aggs.items():
            if fn == "count":
                out[name] = m["__cnt"].astype("int64")
            elif fn == "count_col":
                out[name] = m[f"__nnz_{col}"].astype("int64")
            elif fn == "sum":
                out[name] = m[f"__sum_{col}"]
            elif fn == "min":
                out[name] = m[f"__min_{col}"]
            elif fn == "max":
                out[name] = m[f"__max_{col}"]
            else:  # mean
                cnt = m[f"__nnz_{col}"].to_numpy().astype(np.float64)
                s = m[f"__sum_{col}"].to_numpy(dtype=np.float64,
                                               na_value=np.nan)
                with np.errstate(invalid="ignore", divide="ignore"):
                    out[name] = np.where(cnt > 0, s / cnt, np.nan)
        return out

    add_b = add_bucket_column(keys + [out_ts_col], "__b", nb)
    pre = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
             .map_batches(add_b, batch_format="pyarrow", batch_size=None))

    def bucket_final(t: "pa.Table") -> pd.DataFrame:
        return final(_typed_pdf(t).drop(columns="__b"))

    return map_groups_typed(pre, "__b", bucket_final,
                            batch_format="pyarrow",
                            num_partitions=num_partitions)
