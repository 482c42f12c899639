"""Interval (range) join: points joined to every interval containing them.

``interval_join(left, right, ts_col=.., start_col=.., end_col=..)`` emits,
for every left row, one output row per right interval with
``start <= ts <= end`` (SQL ``BETWEEN`` semantics) and, when ``on`` is
given, an equal join key — the campaign-attribution / validity-window /
sensor-enrichment join that plain equi-join engines can't express without
a cross product.  The reference expresses containment only as a LAST JOIN
residual ``ON`` condition (one newest match per row; see
stages/join_stage.py); this operator is the *all-matches* generalization
a training-data pipeline needs (e.g. "every eval-benchmark window a crawl
snapshot overlaps").

Scale design — two strategies, ``auto`` picks by right-side row count
(from block metadata, no execution):

* ``broadcast``: the interval table is materialized ONCE, put in the
  object store ONCE, and every actor reads the same ref in ``__init__``
  — never re-shipped per batch.  Per batch the match set is found by a
  fully vectorized sweep: sort the batch's points, two ``searchsorted``
  calls per interval array give each interval's contiguous span of
  matching points, and ``np.repeat`` + one arange subtraction
  materializes all (interval, point) pairs with no Python pair loop.
* ``shuffle``: both sides are range-partitioned on COARSE TIME BUCKETS —
  each point goes to exactly one bucket, each interval is replicated to
  every bucket it overlaps (vectorized ``np.repeat`` over bucket spans),
  so each bucket join is local and the union of bucket outputs is exact
  with no pair dedup (a point matches an interval only in the point's own
  bucket).  Degenerate LONG intervals (spanning > ``long_bucket_span``
  buckets — a handful of "always-on" rows on real data) would replicate
  across the whole axis; they are split out and BROADCAST instead, and
  each bucket task checks its points against them in the same group call,
  so ``how="left"`` match flags stay bucket-local and exact.

Partitioning assumption: bucket width defaults to ~the mean interval
length (clamped so the time axis yields ~8× default_num_buckets buckets),
keeping expected interval replication O(1) per interval.  Equi-key match
inside a bucket/batch loops over DISTINCT keys present (each iteration
vectorized) — fine for campaign/segment-grade key cardinality; the time
bucketing stays the shuffle axis either way.

``how="left"`` dtype contract: appended right columns are normalized to
null-safe dtypes (ints -> nullable Int64, bools -> nullable boolean,
floats -> float64, datetimes -> datetime64[us], rest -> object) in EVERY
output block, matched or not, so the streamed blocks agree on one schema
— nullable rather than float64 so int64 values past 2^53 survive intact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.compute as pc
from ..config import broadcast_limit as _cfg_broadcast_limit


def _to_i64(values) -> np.ndarray:
    """Timestamps/ints/floats as int64 (datetime64 -> epoch us)."""
    arr = np.asarray(values)
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").astype(np.int64)
    if arr.dtype == object:  # post-union object blocks: ints or Timestamps
        try:
            return arr.astype(np.int64)
        except (TypeError, ValueError):
            return (pd.to_datetime(pd.Series(arr)).astype("int64")
                    .to_numpy() // 1000)
    return arr.astype(np.int64)


def _sweep(pts_sorted: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """All (interval j, sorted-point position p) pairs with
    starts[j] <= pts_sorted[p] <= ends[j].  Fully vectorized."""
    lo = np.searchsorted(pts_sorted, starts, side="left")
    hi = np.searchsorted(pts_sorted, ends, side="right")
    cnt = np.maximum(hi - lo, 0)
    total = int(cnt.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    ij = np.repeat(np.arange(len(starts), dtype=np.int64), cnt)
    offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    pp = np.arange(total, dtype=np.int64) - np.repeat(offs, cnt) \
        + np.repeat(lo, cnt)
    return ij, pp


def _match_block(ldf: pd.DataFrame, rdf: pd.DataFrame, ts_col: str,
                 start_col: str, end_col: str, on: list[str]):
    """(left_idx, right_idx) match pairs between two pandas blocks.
    Loops over distinct equi-key values (each sweep vectorized)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if not len(ldf) or not len(rdf):
        return empty
    ts = _to_i64(ldf[ts_col].to_numpy())
    st = _to_i64(rdf[start_col].to_numpy())
    en = _to_i64(rdf[end_col].to_numpy())
    if not on:
        order = np.argsort(ts, kind="stable")
        ij, pp = _sweep(ts[order], st, en)
        return order[pp], ij
    # multi-key: one deterministic vectorized hash per side (collision-free
    # enough for grouping; equality is re-checked only through the hash —
    # hash_pandas_object is 64-bit, collisions are ~n^2/2^64)
    if len(on) > 1:
        lkey = pd.util.hash_pandas_object(ldf[on], index=False).to_numpy()
        rkey = pd.util.hash_pandas_object(rdf[on], index=False).to_numpy()
    else:
        lkey = ldf[on[0]].to_numpy()
        rkey = rdf[on[0]].to_numpy()
    # SQL: a null in any key column never matches — and null keys must be
    # EXCLUDED before the sort (np.argsort on an object array raises
    # TypeError comparing None with str). The hashed multi-key path needs
    # the same mask: hash_pandas_object gives nulls a real hash, which
    # would silently match null==null against SQL semantics.
    l_na = ldf[on].isna().any(axis=1).to_numpy()
    r_na = rdf[on].isna().any(axis=1).to_numpy()
    li_all, ri_all = [], []
    r_valid = np.nonzero(~r_na)[0]
    r_order = r_valid[np.argsort(rkey[r_valid], kind="stable")]
    rk_sorted = rkey[r_order]
    for k in pd.unique(lkey[~l_na]):
        r_lo = np.searchsorted(rk_sorted, k, side="left")
        r_hi = np.searchsorted(rk_sorted, k, side="right")
        if r_hi == r_lo:
            continue
        lmask = np.nonzero((lkey == k) & ~l_na)[0]
        r_idx = r_order[r_lo:r_hi]
        t = ts[lmask]
        t_order = np.argsort(t, kind="stable")
        ij, pp = _sweep(t[t_order], st[r_idx], en[r_idx])
        if len(ij):
            li_all.append(lmask[t_order[pp]])
            ri_all.append(r_idx[ij])
    if not li_all:
        return empty
    return np.concatenate(li_all), np.concatenate(ri_all)


def _schema_dtypes(ds, cols) -> dict:
    """Column -> numpy dtype from a dataset schema (object fallback)."""
    out = {}
    sch = ds.schema()
    names = list(sch.names) if sch is not None else []
    for c in cols:
        dt = np.dtype(object)
        if c in names:
            tp = sch.types[names.index(c)]
            try:
                dt = np.dtype(tp.to_pandas_dtype()
                              if hasattr(tp, "to_pandas_dtype") else tp)
            except TypeError:
                dt = np.dtype(object)
        out[c] = dt
    return out


def _null_safe_dtype(dt) -> object:
    # ints/bools go NULLABLE, not float64: a float64 cast silently rounds
    # int64 values past 2^53 (distinct hash ids would collapse) — the
    # library-wide nullable-Int64 convention
    k = getattr(dt, "kind", "O")
    if k in "iu":
        return pd.Int64Dtype()
    if k == "b":
        return pd.BooleanDtype()
    if k == "f":
        return np.dtype(np.float64)
    if k == "M":
        return np.dtype("datetime64[us]")
    return np.dtype(object)


def _assemble(ldf: pd.DataFrame, rdf: pd.DataFrame, li: np.ndarray,
              ri: np.ndarray, how: str, rcols: list[str],
              rtypes: dict) -> pd.DataFrame:
    out_names = [c if c not in ldf.columns else c + "__r" for c in rcols]
    matched = ldf.iloc[li].reset_index(drop=True)
    rpart = rdf.iloc[ri][rcols].reset_index(drop=True)
    rpart.columns = out_names
    out = pd.concat([matched, rpart], axis=1)
    if how == "left":
        hit = np.zeros(len(ldf), dtype=bool)
        hit[li] = True
        rest = ldf.iloc[~hit].reset_index(drop=True)
        for c, rc in zip(out_names, rcols):
            dt = _null_safe_dtype(rtypes[rc])
            out[c] = out[c].astype(dt)
            kind = getattr(dt, "kind", "O")
            fill = pd.NaT if kind == "M" else (
                np.nan if isinstance(dt, np.dtype) else pd.NA)
            rest[c] = pd.Series([fill] * len(rest), dtype=dt)
        out = pd.concat([out, rest], ignore_index=True)
    return out


def interval_join(
    left,
    right,
    *,
    ts_col: str,
    start_col: str,
    end_col: str,
    on: str | list[str] | None = None,
    how: str = "inner",
    right_cols: list[str] | None = None,
    strategy: str = "auto",
    broadcast_limit: int | None = None,
    bucket_width: int | None = None,
    long_bucket_span: int = 64,
    num_partitions: int | None = None,
):
    """Join each left row (point ``ts_col``) to EVERY right interval
    containing it (``start_col <= ts <= end_col``, plus equality on ``on``
    when given).  ``how`` in {"inner", "left"}.  Right columns are
    appended (``right_cols`` or all right columns), name collisions
    suffixed ``__r``.  Output row order is not defined (set semantics)."""
    import ray

    on = [on] if isinstance(on, str) else (list(on) if on else [])
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}")
    # materialize the interval side ONCE: auto's count(), the stats
    # pre-pass, the long-interval scan and tag_intervals otherwise each
    # re-execute the right pipeline (join_stage.last_join convention)
    right = right.materialize()
    rcols = list(right_cols) if right_cols is not None \
        else list(right.schema().names)
    need = list(dict.fromkeys([start_col, end_col] + on + rcols))

    if strategy == "auto":
        strategy = ("broadcast"
                    if right.count() <= _cfg_broadcast_limit(broadcast_limit,
                                                            2_000_000)
                    else "shuffle")

    def _run_broadcast(rdf: pd.DataFrame):
        rtypes = {c: rdf[c].dtype for c in rcols}
        ref = ray.put(rdf)

        class _Lookup:
            def __init__(self):
                self.rdf = ray.get(ref)

            def __call__(self, ldf: pd.DataFrame) -> pd.DataFrame:
                from ..core.hashing import quiet_ray_data_logs
                quiet_ray_data_logs()
                li, ri = _match_block(ldf, self.rdf, ts_col, start_col,
                                      end_col, on)
                return _assemble(ldf, self.rdf, li, ri, how, rcols, rtypes)

        return left.map_batches(_Lookup, batch_format="pandas",
                                concurrency=(1, 16))

    def _need_df() -> pd.DataFrame:
        rdf = right.to_pandas()
        if not set(need) <= set(rdf.columns):
            # empty datasets can materialize with no columns at all
            dts = _schema_dtypes(right, need)
            rdf = pd.DataFrame({c: pd.Series(dtype=dts[c]) for c in need})
        return rdf[need]

    if strategy == "broadcast":
        return _run_broadcast(_need_df())

    # ---------------------------------------------------- shuffle strategy
    from ..core.empty_ds import union_any
    from ..core.grouping import map_groups_typed
    from ..core.hashing import default_num_buckets, quiet_ray_data_logs

    # one narrow pre-pass over the interval table: time extent + mean length
    def _stats(t):
        import pyarrow as pa

        s = _to_i64(t.column(start_col).to_numpy(zero_copy_only=False))
        e = _to_i64(t.column(end_col).to_numpy(zero_copy_only=False))
        if not len(s):
            return pa.table({"mn": [np.iinfo(np.int64).max],
                             "mx": [np.iinfo(np.int64).min],
                             "sl": [0], "n": [0]})
        return pa.table({"mn": [int(s.min())], "mx": [int(e.max())],
                         "sl": [int((e - s).clip(min=0).sum())],
                         "n": [len(s)]})

    st = right.select_columns([start_col, end_col]) \
        .map_batches(_stats, batch_format="pyarrow", batch_size=None) \
        .to_pandas()
    t0, t1 = int(st["mn"].min()), int(st["mx"].max())
    n_iv = int(st["n"].sum())
    if n_iv == 0 or t1 < t0:
        # no usable intervals: inner -> empty; left -> all-null right cols
        return _run_broadcast(_need_df().iloc[:0])

    mean_len = max(int(st["sl"].sum()) // max(n_iv, 1), 1)
    if bucket_width is None:
        span = max(t1 - t0 + 1, 1)
        width = max(min(max(mean_len, span // (8 * default_num_buckets())),
                        span), 1)
    else:
        width = max(int(bucket_width), 1)
    n_buckets = (t1 - t0) // width
    long_w = width * long_bucket_span

    def _long_only(t):
        s = _to_i64(t.column(start_col).to_numpy(zero_copy_only=False))
        e = _to_i64(t.column(end_col).to_numpy(zero_copy_only=False))
        return t.filter((e - s) > long_w)

    long_df = right.map_batches(_long_only, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    if len(long_df) > 1_000_000:
        raise ValueError(
            f"interval_join: {len(long_df)} intervals span more than "
            f"{long_bucket_span} buckets; raise bucket_width")
    long_ref = ray.put(long_df[need]) if len(long_df) else None

    import pyarrow as pa

    # normalize BOTH sides to Arrow blocks before reading schemas: a
    # pandas-block input reports numpy dtypes (object for strings), which
    # pa.from_numpy_dtype can't type the null padding from (the
    # anti_join_ids / request_window convention)
    left = left.map_batches(lambda t: t, batch_format="pyarrow",
                            batch_size=None)
    right = right.map_batches(lambda t: t, batch_format="pyarrow",
                              batch_size=None)

    lcols = list(left.schema().names)
    rtypes = _schema_dtypes(right, need)
    rmap = {c: "__iv__" + c for c in need}

    def _pa_type(ds_schema, name):
        tp = ds_schema.types[list(ds_schema.names).index(name)]
        return tp if isinstance(tp, pa.DataType) \
            else pa.from_numpy_dtype(np.dtype(tp))

    l_patypes = {c: _pa_type(left.schema(), c) for c in lcols}
    r_patypes = {c: _pa_type(right.schema(), c) for c in need}
    union_names = lcols + ["__role", "__tb"] + [rmap[c] for c in need]

    # the exchange is typed Arrow end-to-end: null padding is pa.nulls
    # with the REAL column types (an object/pandas union would both slow
    # the shuffle and round 2^63-scale epoch-us ints through float64)
    def tag_points(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        ts = _to_i64(t.column(ts_col).to_numpy(zero_copy_only=False))
        tb = np.clip((ts - t0) // width, 0, n_buckets)
        arrays = [pc.cast(t.column(c), l_patypes[c]) for c in lcols]
        arrays.append(pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        arrays.append(pa.array(tb, type=pa.int64()))
        arrays += [pa.nulls(t.num_rows, r_patypes[c]) for c in need]
        return pa.table(dict(zip(union_names, arrays)))

    def tag_intervals(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        s = _to_i64(t.column(start_col).to_numpy(zero_copy_only=False))
        e = _to_i64(t.column(end_col).to_numpy(zero_copy_only=False))
        keep = (e - s) <= long_w
        t = t.select(need).filter(pa.array(keep))
        s, e = s[keep], e[keep]
        b0 = np.clip((s - t0) // width, 0, n_buckets)
        b1 = np.clip((e - t0) // width, 0, n_buckets)
        cnt = np.maximum(b1 - b0 + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        tb = (np.arange(int(cnt.sum()), dtype=np.int64)
              - np.repeat(offs, cnt) + np.repeat(b0, cnt))
        rep = t.take(pa.array(idx))
        arrays = [pa.nulls(len(idx), l_patypes[c]) for c in lcols]
        arrays.append(pa.array(np.ones(len(idx), dtype=np.int8)))
        arrays.append(pa.array(tb, type=pa.int64()))
        arrays += [pc.cast(rep.column(c), r_patypes[c]) for c in need]
        return pa.table(dict(zip(union_names, arrays)))

    pts = left.map_batches(tag_points, batch_format="pyarrow",
                           batch_size=None)
    ivs = right.map_batches(tag_intervals, batch_format="pyarrow",
                            batch_size=None)

    def per_bucket(g: pa.Table) -> pd.DataFrame:
        quiet_ray_data_logs()
        is_iv = pc.equal(g["__role"], 1)
        ldf = g.filter(pc.invert(is_iv)).select(lcols).to_pandas()
        riv = g.filter(is_iv).select([rmap[c] for c in need])
        riv = riv.rename_columns(need)
        rdf = riv.to_pandas()
        if long_ref is not None:
            rdf = pd.concat([rdf, ray.get(long_ref)], ignore_index=True)
        li, ri = _match_block(ldf, rdf, ts_col, start_col, end_col, on)
        return _assemble(ldf, rdf, li, ri, how, rcols, rtypes)

    return map_groups_typed(union_any(pts, ivs), "__tb", per_bucket,
                            batch_format="pyarrow",
                            num_partitions=num_partitions)
