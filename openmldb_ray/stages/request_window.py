"""Long-window aggregates for sparse REQUEST rows over a large history.

The reference keeps pre-aggregated per-(key, time-bucket) partial states so
a request over a month-long window combines ~30 partials + edge rows
instead of re-scanning raw history (hybridse/src/vm/aggregator.h:37-300,
RequestAggUnionRunner in hybridse/src/vm/runner.cc). In a batch Ray Data
engine the same asymptotics come from ONE co-shuffle of (requests ∪
history) by key and per-key prefix/sliding states:

    requests.union(history) → coarse-bucket hash shuffle on the key
    → per key: sort history once, prefix sums (sum/count/avg) and a
      sparse-table RMQ (min/max) answer every request in O(h log S + r)
      vectorized numpy work — no O(window) re-scan per request and no
      per-request Python loop.

This is the reusable operator behind "backfill point-in-time features for
training rows": requests (the training rows) are typically orders of
magnitude sparser than the event history.

Frame semantics: closed time window ``[T - preceding_ms, T]`` per request
timestamp T — ROWS_RANGE ... PRECEDING AND CURRENT ROW over a WINDOW
UNION-style buffer (history rows at exactly T are included, like DuckDB's
RANGE CURRENT ROW peer rows). Empty window → NULL for sum/avg/min/max,
0 for count/count_star (reference UDAF null semantics).

Payload exchange is Arrow-native (the semi_join typed-exchange idiom,
bbe994d, applied here in round 4): the per-bucket kernel receives a
pyarrow Table, converts ONLY the narrow kernel columns (keys, order_by,
request flag, agg value columns) to pandas/numpy, and re-emits the
request rows by ``Table.take`` on their original row positions — request
payload columns never pass through pandas, so nullable-int payloads and
int payloads past 2^53 survive bit-exact with their original Arrow
types. Aggregated VALUE columns are float64/int64 by definition of the
aggs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from ..core.aggregates import AggSpec

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_KINDS = {"sum", "count", "avg", "min", "max", "count_star"}
REQ_FLAG = "__is_req"


def _sliding_extreme(h: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                     want_max: bool,
                     valid_in_win: np.ndarray | None = None) -> np.ndarray:
    """min/max of h[lo_i:hi_i] per request, fully vectorized via a sparse
    table (range-min/max query): O(n log S) build where S is the largest
    window span, O(1) per query answered as op(level_k[lo], level_k[hi-2^k])
    — no per-request Python loop, so dense request streams (r ≈ h) pay
    numpy constants, not interpreter constants.

    NaN history values are masked with ∓inf; ``valid_in_win`` (non-NaN count
    per window, already computed by the caller's prefix sums) turns all-NaN
    windows into NaN. Windows need not be monotonic."""
    out = np.full(lo.shape[0], np.nan, dtype=np.float64)
    span_all = hi - lo
    nonempty = span_all > 0
    if valid_in_win is not None:
        nonempty &= valid_in_win > 0
    if h.shape[0] == 0 or not nonempty.any():
        return out
    n = h.shape[0]
    fill = -np.inf if want_max else np.inf
    op = np.maximum if want_max else np.minimum
    level = np.where(np.isnan(h), fill, h)
    span = span_all[nonempty].astype(np.int64)
    n_levels = int(span.max()).bit_length()  # levels 0..n_levels-1 (2^k rows)
    tables = [level]
    for k in range(1, n_levels):
        step = 1 << (k - 1)
        prev = tables[-1]
        tables.append(op(prev[:prev.shape[0] - step], prev[step:])
                      if prev.shape[0] > step else prev[:0])
    loq = lo[nonempty].astype(np.int64)
    hiq = hi[nonempty].astype(np.int64)
    # per-query level: floor(log2(span)); exact for spans < 2^52
    kq = np.floor(np.log2(span)).astype(np.int64)
    res = np.empty(span.shape[0], dtype=np.float64)
    for k in np.unique(kq):
        m = kq == k
        t = tables[k]
        res[m] = op(t[loq[m]], t[hiq[m] - (1 << k)])
    if valid_in_win is None:
        res = np.where(np.isinf(res) & (res == fill), np.nan, res)
    out[nonempty] = res
    return out


def request_window_agg(
    requests: "ray.data.Dataset",
    history: "ray.data.Dataset",
    partition_by,
    order_by: str,
    aggs: list[AggSpec],
    *,
    preceding_ms: int,
    num_partitions: int | None = None,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Per request row: aggregates over history rows of the same key with
    ``order_by`` in ``[request_ts - preceding_ms, request_ts]``.

    Output: the request rows (all columns) plus one column per AggSpec.
    Supported kinds: sum / count / avg / min / max / count_star.
    """
    import pyarrow as pa

    from ..core.hashing import add_bucket_column, default_num_buckets

    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    for a in aggs:
        if a.kind not in _KINDS:
            raise ValueError(f"request_window_agg supports {sorted(_KINDS)}, "
                             f"got {a.kind!r}")
    need_cols = sorted({a.col for a in aggs if a.col})
    # normalize to Arrow blocks FIRST: a pandas-block dataset's schema()
    # reports numpy dtypes, which cannot drive the restore casts below
    # (the anti_join_ids idiom)
    requests = requests.map_batches(lambda t: t, batch_format="pyarrow",
                                    batch_size=None)
    history = history.map_batches(lambda t: t, batch_format="pyarrow",
                                  batch_size=None)
    req_schema = requests.schema()
    hist_schema = history.schema()
    req_cols = list(req_schema.names)
    req_types = dict(zip(req_schema.names, req_schema.types))
    hist_types = dict(zip(hist_schema.names, hist_schema.types))
    # unified layout: request columns first, then history-only value columns
    target = [(c, req_types[c]) for c in req_cols]
    target += [(c, hist_types[c]) for c in need_cols if c not in req_types]

    def flag(value: bool, keep: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select([c for c in keep if c in t.column_names])
            arrays, names = [], []
            for c, typ in target:
                names.append(c)
                arrays.append(t[c] if c in t.column_names
                              else pa.nulls(t.num_rows, typ))
            out = pa.Table.from_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in arrays], names=names)
            return out.append_column(
                REQ_FLAG, pa.array(np.full(t.num_rows, value, dtype=bool)))
        return fn

    hist_keep = sorted(set(keys) | {order_by} | set(need_cols))
    from ..core.empty_ds import union_any

    both = union_any(
        requests.map_batches(flag(True, req_cols),
                             batch_format="pyarrow", batch_size=None),
        history.map_batches(flag(False, hist_keep),
                            batch_format="pyarrow", batch_size=None))
    add_b = add_bucket_column(keys, "__rwb",
                              num_buckets or default_num_buckets())

    kernel_cols = sorted(set(keys) | {order_by, REQ_FLAG} | set(need_cols))

    def bucket_fn(t: "pa.Table") -> "pa.Table":
        # narrow pandas view for the numeric kernel only; payload columns
        # stay in Arrow and are re-emitted by position (typed, exact)
        nd = t.select(kernel_cols).to_pandas()
        nd["__pos"] = np.arange(len(nd), dtype=np.int64)
        pos_parts: list[np.ndarray] = []
        agg_parts: dict[str, list[np.ndarray]] = {a.name: [] for a in aggs}
        for _, sub in nd.groupby(keys, sort=False, dropna=False):
            pos, vals = _one_key_arrays(sub, order_by, aggs, preceding_ms)
            pos_parts.append(pos)
            for a in aggs:
                agg_parts[a.name].append(vals[a.name])
        pos_all = (np.concatenate(pos_parts) if pos_parts
                   else np.array([], dtype=np.int64))
        out = t.select(req_cols).take(pa.array(pos_all, type=pa.int64()))
        for a in aggs:
            parts = agg_parts[a.name]
            int_out = a.kind in ("count", "count_star")
            v = (np.concatenate(parts) if parts
                 else np.array([], dtype=np.int64 if int_out
                               else np.float64))
            out = out.append_column(
                a.name, pa.array(v,
                                 type=pa.int64() if int_out
                                 else pa.float64(),
                                 from_pandas=True))  # NaN -> null
        return out

    from ..core.grouping import map_groups_typed

    return map_groups_typed(
        both.map_batches(add_b, batch_format="pyarrow", batch_size=None),
        "__rwb", bucket_fn, batch_format="pyarrow",
        num_partitions=num_partitions,
    )


def _ts_f64(col: pd.Series) -> np.ndarray:
    """order_by as float64 — datetime columns are REJECTED (their raw ns
    floats would make preceding_ms off by 1e6 and exceed 2^53); convert
    to an epoch-ms/us integer column upstream, like every caller does."""
    arr = col.to_numpy()
    if arr.dtype.kind == "M":
        raise TypeError(
            "request_window_agg: datetime order_by not supported — "
            "convert to an integer epoch column in preceding_ms units "
            "first (epoch_ms, like the events fixtures)")
    return col.to_numpy(np.float64)


def _one_key_arrays(
    g: pd.DataFrame, order_by: str, aggs: list[AggSpec],
    preceding_ms: int,
) -> "tuple[np.ndarray, dict[str, np.ndarray]]":
    """One key's kernel over the NARROW frame (keys, order_by, flag, agg
    value columns, __pos): returns the request rows' original positions
    in the bucket table (original within-key order) and one aligned numpy
    array per agg — the caller reattaches payload via Arrow ``take``."""
    is_req = g[REQ_FLAG].to_numpy(bool)
    # null timestamps: a NaN history row would sort to the tail and land
    # inside any NaN request's searchsorted window — exclude them; null
    # requests keep their row with NULL/0 aggregates via the empty window
    tsall = _ts_f64(g[order_by])
    hist = g[~is_req & ~np.isnan(tsall)]
    req = g[is_req]
    h_ts = hist[order_by].to_numpy(np.float64)
    order_h = np.argsort(h_ts, kind="stable")
    h_ts = h_ts[order_h]
    r_ts_raw = req[order_by].to_numpy(np.float64)
    order_r = np.argsort(r_ts_raw, kind="stable")
    r_ts = r_ts_raw[order_r]
    lo = np.searchsorted(h_ts, r_ts - preceding_ms, side="left")
    hi = np.searchsorted(h_ts, r_ts, side="right")

    cache: dict[str, np.ndarray] = {}

    def col_vals(c: str) -> np.ndarray:
        if c not in cache:
            cache[c] = pd.to_numeric(hist[c], errors="coerce") \
                         .to_numpy(np.float64)[order_h]
        return cache[c]

    # arrays below are aligned to ts-sorted request order; inv restores
    # the original within-key order at the end
    inv = np.empty_like(order_r)
    inv[order_r] = np.arange(order_r.size)
    n_in_win = (hi - lo).astype(np.int64)
    vals: dict[str, np.ndarray] = {}
    for a in aggs:
        if a.kind == "count_star":
            vals[a.name] = n_in_win[inv]
            continue
        v = col_vals(a.col)
        valid = (~np.isnan(v)).astype(np.float64)
        csum = np.concatenate(([0.0], np.cumsum(np.where(np.isnan(v), 0.0, v))))
        ccnt = np.concatenate(([0.0], np.cumsum(valid)))
        s = csum[hi] - csum[lo]
        c = (ccnt[hi] - ccnt[lo]).astype(np.int64)
        if a.kind == "count":
            out_v: np.ndarray = c
        elif a.kind == "sum":
            out_v = np.where(c > 0, s, np.nan)
        elif a.kind == "avg":
            out_v = np.where(c > 0, s / np.maximum(c, 1), np.nan)
        else:  # min / max
            out_v = _sliding_extreme(v, lo, hi,
                                     want_max=(a.kind == "max"),
                                     valid_in_win=c)
        vals[a.name] = out_v[inv]
    return req["__pos"].to_numpy(np.int64), vals
