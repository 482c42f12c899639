"""Vectorized window kernel + dispatcher (single partition).

Fast path for the common frames (`ROWS n PRECEDING AND CURRENT ROW`,
`ROWS_RANGE d PRECEDING AND CURRENT ROW`, UNBOUNDED — no excludes, no
MAXSIZE, no OPEN) and common aggregates (sum/count/avg/min/max/
count_star/lag/at/first_value/lead), using pandas' Cython rolling
kernels and numpy searchsorted instead of the reference's per-row JIT
loop (WindowComputer.scala:78-141). Anything outside this subset
falls back to the reference-exact kernel (window_exact).

Semantics parity with the exact kernel is enforced by
tests/test_window_kernel.py property sweeps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .aggregates import FAST_KINDS, AggSpec, spec_columns, spec_has_expr
from .frames import FrameSpec
from .window_exact import window_project_exact

_SHIFT_KINDS = {"lag", "at", "first_value"}

#: aggregates with an O(n) two-pointer sliding implementation (frequency
#: state add/evict as the frame slides) — used when the frame is a simple
#: ROWS / ROWS_RANGE / UNBOUNDED ... CURRENT ROW with no excludes
SLIDING_KINDS = {"distinct_count", "topn_frequency", "top1_ratio"}


def _is_numeric(s: pd.Series) -> bool:
    return pd.api.types.is_numeric_dtype(s) or pd.api.types.is_bool_dtype(s)


def fast_eligible(g: pd.DataFrame, aggs: list[AggSpec], frame: FrameSpec) -> bool:
    if not frame.fast_path_eligible():
        return False
    for a in aggs:
        if spec_has_expr(a):
            return False  # composite frame expressions are exact-kernel only
        if a.kind in SLIDING_KINDS:
            continue
        if a.kind not in FAST_KINDS:
            return False
        if a.col is not None and a.kind not in _SHIFT_KINDS and not _is_numeric(g[a.col]):
            return False
    return True


def _rolling(series: pd.Series, ts: np.ndarray, frame: FrameSpec):
    """Return a pandas Rolling/Expanding object implementing the frame."""
    if frame.is_pure_rows:
        return series.rolling(frame.rows_preceding + 1, min_periods=1)
    if frame.is_pure_range:
        idx = pd.DatetimeIndex(ts.view("datetime64[ms]"))
        s = pd.Series(series.to_numpy(), index=idx)
        return s.rolling(pd.Timedelta(milliseconds=frame.range_preceding), closed="both", min_periods=1)
    return series.expanding(min_periods=1)


def window_project_vectorized(
    g: pd.DataFrame, order_col: str, aggs: list[AggSpec], frame: FrameSpec
) -> dict[str, np.ndarray]:
    """Compute features over ALL rows of a sorted partition (caller applies
    the primary-row emit mask). Returns name -> ndarray (NaN/None = NULL)."""
    ts = g[order_col].to_numpy(np.int64)
    n = ts.shape[0]
    out: dict[str, np.ndarray] = {}

    for a in aggs:
        if a.kind == "count_star":
            ones = pd.Series(np.ones(n))
            out[a.name] = _rolling(ones, ts, frame).count().to_numpy(np.float64)
        elif a.kind in ("sum", "count", "avg", "min", "max", "median"):
            s = pd.to_numeric(g[a.col], errors="coerce").astype(np.float64)
            r = _rolling(s, ts, frame)
            fn = {"sum": "sum", "count": "count", "avg": "mean", "min": "min",
                  "max": "max", "median": "median"}[a.kind]
            vals = getattr(r, fn)().to_numpy(np.float64)
            if a.kind == "sum":
                # rolling.sum with min_periods=1 yields 0.0 for all-NaN windows
                # in some pandas versions; normalize to NULL like the reference
                cnt = r.count().to_numpy(np.float64)
                vals = np.where(cnt > 0, vals, np.nan)
            out[a.name] = vals
        elif a.kind in ("lag", "at", "first_value"):
            # lag/at are PARTITION-POSITIONAL, independent of the frame: the
            # reference compiles lag(v, k) to its own appended ROWS
            # (k PRECEDING, CURRENT) sub-window (window_attributes.yaml
            # batch_plan blocks), so a frame narrower than k does NOT null
            # the result. first_value (k=0) is the newest in-frame row,
            # which for fast-path frames is the current row.
            k = 0 if a.kind == "first_value" else a.k
            vals = g[a.col].shift(k).to_numpy()
            out[a.name] = vals
        else:  # pragma: no cover - guarded by fast_eligible
            raise AssertionError(a.kind)
    return out


def _frame_starts(ts: np.ndarray, frame: FrameSpec) -> np.ndarray:
    """Non-decreasing array lo: window of row i = rows [lo[i], i]."""
    n = ts.shape[0]
    if frame.is_pure_rows:
        return np.maximum(np.arange(n) - frame.rows_preceding, 0)
    if frame.is_pure_range:
        side = "right" if frame.open_range else "left"
        return np.searchsorted(ts, ts - frame.range_preceding, side=side)
    return np.zeros(n, dtype=np.int64)


_CARD_LIMIT = 64  # ≤ this many distinct values → fully vectorized matrix path


def _sliding_matrix_path(vals: np.ndarray, valid: np.ndarray, lo: np.ndarray,
                         aggs_for_col: list[AggSpec]) -> dict[str, np.ndarray]:
    """Vectorized frequency windows for a small-cardinality column:
    C[i, v] = #occurrences of value v in window [lo_i, i] via per-value
    prefix sums — no Python row loop."""
    from .aggregates import _fmt_typed

    n = vals.shape[0]
    uniq, codes = np.unique(vals[valid], return_inverse=True)
    k = uniq.shape[0]
    onehot = np.zeros((n + 1, k), dtype=np.int32)
    onehot[np.nonzero(valid)[0] + 1, codes] = 1
    cum = np.cumsum(onehot, axis=0)  # (n+1, k)
    C = cum[np.arange(1, n + 1)] - cum[lo]  # counts per value per row
    # NULL is its own distinct value in the reference's distinct_count
    # (test_udaf_function.yaml id 5)
    cumnull = np.cumsum(np.concatenate([[0], (~valid).astype(np.int64)]))
    null_in_win = (cumnull[np.arange(1, n + 1)] - cumnull[lo]) > 0
    out: dict[str, np.ndarray] = {}
    present = C > 0
    totals = C.sum(axis=1)
    for a in aggs_for_col:
        if a.kind == "distinct_count":
            nulls_add = (np.zeros(n, dtype=np.int64) if a.val_t == "bool"
                         else null_in_win.astype(np.int64))
            out[a.name] = (present.sum(axis=1) + nulls_add).astype(object)
        elif a.kind == "top1_ratio":
            # empty window (all-null) -> 0.0, matching the exact kernel.
            # k == 0 (a partition with ZERO distinct non-null values) makes
            # C a (n, 0) matrix whose axis-1 max is a zero-size reduction —
            # np.where evaluates both branches eagerly, so guard it
            top = C.max(axis=1) if k else np.zeros(n)
            r = np.where(totals > 0, top / np.maximum(totals, 1), 0.0)
            out[a.name] = np.asarray([float(x) for x in r], dtype=object)
        else:  # topn_frequency: count desc, value asc — stable argsort on -C
            labels = np.asarray(
                [_fmt_typed(u, a.val_t, a.tz_ms) for u in uniq], dtype=object)
            order = np.argsort(-C, axis=1, kind="stable")  # ties → lower value index first
            kk = a.k
            pres_cnt = present.sum(axis=1)
            # string assembly runs once per UNIQUE (prefix, length)
            # pattern, not per row: sliding windows repeat the same top-k
            # layout for long runs, so the unique-pattern count is tiny
            # (bounded by distinct-value arrangements, and in the worst
            # case this degenerates to the old per-row cost)
            m = min(kk, k) if k else 0
            take = np.minimum(pres_cnt, kk).astype(np.int64)
            if m == 0:
                out[a.name] = np.full(n, ",".join(["NULL"] * kk),
                                      dtype=object)
            else:
                key = np.where(np.arange(m)[None, :] < take[:, None],
                               order[:, :m], -1)
                uk, inv = np.unique(key, axis=0, return_inverse=True)
                res_u = np.empty(len(uk), dtype=object)
                for ui, row in enumerate(uk):
                    sel = row[row >= 0]
                    # always pad to k entries with literal "NULL"
                    # (exact-kernel parity; FZTopNFrequency::Output)
                    res_u[ui] = ",".join(
                        [labels[j] for j in sel]
                        + ["NULL"] * (kk - sel.size))
                out[a.name] = res_u[inv]
    return out


def window_project_sliding(
    g: pd.DataFrame, order_col: str, aggs: list[AggSpec], frame: FrameSpec
) -> dict[str, np.ndarray]:
    """O(n) frequency-state computation of distinct_count / topn_frequency /
    top1_ratio. Small-cardinality columns (≤64 distinct) take a fully
    vectorized prefix-sum matrix path; otherwise a two-pointer Counter
    (one add + one evict per row). Matches the exact kernel
    (parity-tested); requires fast-path frames."""
    from collections import Counter

    from .aggregates import _fmt_typed

    ts = g[order_col].to_numpy(np.int64)
    n = ts.shape[0]
    lo = _frame_starts(ts, frame)

    # try the matrix path per column
    by_col: dict[str, list[AggSpec]] = {}
    for a in aggs:
        by_col.setdefault(a.col, []).append(a)
    out_fast: dict[str, np.ndarray] = {}
    remaining: list[AggSpec] = []
    for col, col_aggs in by_col.items():
        s = g[col]
        valid = s.notna().to_numpy()
        vals = s.to_numpy(object)
        nuniq = pd.unique(s.dropna()).shape[0]
        if nuniq <= _CARD_LIMIT:
            out_fast.update(_sliding_matrix_path(vals, valid, lo, col_aggs))
        else:
            remaining.extend(col_aggs)
    if not remaining:
        return out_fast
    aggs = remaining
    out: dict[str, list] = {a.name: [] for a in aggs}
    cols = {}
    for a in aggs:
        if a.col not in cols:
            s = g[a.col]
            cols[a.col] = (s.to_numpy(object), s.notna().to_numpy())
    counters = {c: Counter() for c in cols}
    totals = dict.fromkeys(cols, 0)
    nulls = dict.fromkeys(cols, 0)
    ptr = 0
    for i in range(n):
        for c, (vals, valid) in cols.items():
            if valid[i]:
                counters[c][vals[i]] += 1
                totals[c] += 1
            else:
                nulls[c] += 1
        while ptr < lo[i]:
            for c, (vals, valid) in cols.items():
                if valid[ptr]:
                    cnt = counters[c]
                    cnt[vals[ptr]] -= 1
                    if cnt[vals[ptr]] == 0:
                        del cnt[vals[ptr]]
                    totals[c] -= 1
                else:
                    nulls[c] -= 1
            ptr += 1
        for a in aggs:
            cnt = counters[a.col]
            if a.kind == "distinct_count":
                # NULL counts as a distinct value (reference parity),
                # except for bool columns
                extra = 1 if (nulls[a.col] and a.val_t != "bool") else 0
                out[a.name].append(len(cnt) + extra)
            elif a.kind == "top1_ratio":
                out[a.name].append(
                    0.0 if totals[a.col] == 0 else max(cnt.values()) / totals[a.col])
            else:  # topn_frequency: count desc, value asc, NULL-padded to k
                items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                parts = [_fmt_typed(k, a.val_t, a.tz_ms)
                         for k, _ in items[: a.k]]
                parts += ["NULL"] * (a.k - len(parts))
                out[a.name].append(",".join(parts))
    merged = {k: np.asarray(v, dtype=object) for k, v in out.items()}
    merged.update(out_fast)
    return merged


#: exact-kernel output dtype contract — outputs arrive as Python lists
#: with None for NULL, and naive column assignment infers a
#: DATA-DEPENDENT dtype (int64 when no window was empty, object when
#: some were, Arrow null when ALL were), so blocks from different
#: partitions disagree and the shuffle unify fails or silently promotes.
_FLOAT_OUT_KINDS = {"avg", "avg_where", "median", "top1_ratio"}
_VALUE_TYPED_KINDS = {"sum", "sum_where", "min", "max", "min_where",
                      "max_where", "lag", "at", "first_value"}


def _stable_output_array(a: AggSpec, vals, src) -> object:
    """Pin an exact-kernel output column's dtype from the (kind, input
    dtype) contract: ratio-like kinds are float64, value-typed kinds over
    int input are nullable Int64 (same Arrow type as int64, null-safe),
    over float input float64. String/object outputs pass through (their
    inference is stable — topn/cate render literal 'NULL', never None)."""
    if a.kind in _FLOAT_OUT_KINDS:
        return pd.array([np.nan if v is None else float(v) for v in vals],
                        dtype="float64")
    if a.kind in _VALUE_TYPED_KINDS and src is not None:
        if pd.api.types.is_integer_dtype(src) or \
                pd.api.types.is_bool_dtype(src):
            if a.kind in ("lag", "at", "first_value") and \
                    pd.api.types.is_bool_dtype(src):
                return pd.array(vals, dtype="boolean")
            return pd.array(vals, dtype="Int64")
        if pd.api.types.is_float_dtype(src):
            return pd.array([np.nan if v is None else float(v) for v in vals],
                            dtype="float64")
    return vals


def compute_window_features(
    g: pd.DataFrame,
    order_col: str,
    aggs: list[AggSpec],
    frame: FrameSpec,
    is_primary_col: str | None = None,
) -> pd.DataFrame:
    """Dispatcher: run the window computation over one partition.

    ``g`` must already be ordered (ts asc; union rows before primary rows on
    ties — see stages.window_stage for the distributed sort contract).
    Rows with NULL/negative order key are dropped (no output, no buffering).
    Returns the emitted rows (primary only) with feature columns appended.
    """
    if pd.api.types.is_datetime64_any_dtype(g[order_col]) or \
            pd.api.types.is_object_dtype(g[order_col]):
        # the reference rejects date/string order keys for windows
        # (test_window_row_range.yaml:284-330 cases 9-11 expect failure);
        # callers must derive an int64 ms key first (sources/io.with_ts_ms)
        raise TypeError(
            f"window order column {order_col!r} must be an integer epoch key "
            f"(got {g[order_col].dtype}); derive int64 ms first")
    ok = g[order_col].notna() & (g[order_col] >= 0)
    if not ok.all():
        g = g[ok]
    if len(g) == 0:
        # typed empties: `base[a.name] = []` infers object, so an empty
        # partition's block schema disagreed with every non-empty one
        # (and EMPTY_PROBE's typed-schema purpose was defeated). Match
        # the dtype the kernel non-empty partitions would take emits:
        # the fast path computes numeric aggregates in float64; the
        # exact path follows _stable_output_array's contract.
        base = g.copy()
        wa = [a for a in aggs if a.kind != "lead"]
        fast = fast_eligible(g, wa, frame)
        for a in aggs:
            src = g[a.col] if (a.col is not None
                               and a.col in g.columns) else None
            numeric_src = src is not None and _is_numeric(src)
            if a.kind in ("count", "count_star", "count_where",
                          "distinct_count"):
                base[a.name] = pd.array([], dtype="int64")
            elif a.kind == "lead" or (fast and a.kind in
                                      ("lag", "at", "first_value")):
                # shift()-based in every kernel: numeric input → float64
                base[a.name] = (pd.array([], dtype="float64")
                                if numeric_src
                                else pd.array([], dtype=object))
            elif fast and a.kind in ("sum", "avg", "min", "max", "median",
                                     "top1_ratio"):
                base[a.name] = pd.array([], dtype="float64")
            else:
                base[a.name] = _stable_output_array(a, [], src)
        if is_primary_col is not None and is_primary_col in base.columns:
            base = base.drop(columns=[is_primary_col])
        return base

    lead_aggs = [a for a in aggs if a.kind == "lead"]
    win_aggs = [a for a in aggs if a.kind != "lead"]
    prim = g[is_primary_col].to_numpy(bool) if is_primary_col else None

    if fast_eligible(g, win_aggs, frame):
        vec_aggs = [a for a in win_aggs if a.kind not in SLIDING_KINDS]
        sld_aggs = [a for a in win_aggs if a.kind in SLIDING_KINDS]
        feats = window_project_vectorized(g, order_col, vec_aggs, frame)
        if sld_aggs:
            feats.update(window_project_sliding(g, order_col, sld_aggs, frame))
        res = g if prim is None else g[prim]
        res = res.copy()
        sel = slice(None) if prim is None else prim
        for a in win_aggs:
            res[a.name] = feats[a.name][sel]
    else:
        # int64 DIRECTLY — a float64 round trip silently corrupts order
        # keys past 2^53 (rows truly inside a RANGE bound fall outside
        # the corrupted one); invalid rows are already dropped, so the
        # cast is total
        s_ts = g[order_col]
        if pd.api.types.is_integer_dtype(s_ts):
            ts64 = s_ts.to_numpy(np.int64, na_value=0)
        else:
            ts64 = s_ts.to_numpy(np.float64).astype(np.int64)
        ts_valid = np.ones(len(g), bool)  # invalid already dropped
        cols: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        needed = {c for a in win_aggs for c in spec_columns(a)}
        for c in needed:
            s = g[c]
            valid = s.notna().to_numpy()
            if pd.api.types.is_integer_dtype(s):
                # keep ints integral — string-rendering aggregates (top/cate/
                # top_n families) must print "9", not "9.000000"
                vals = s.fillna(0).to_numpy(np.int64)
            elif _is_numeric(s):
                vals = pd.to_numeric(s, errors="coerce").fillna(0).to_numpy(np.float64)
            else:
                vals = s.to_numpy(object)
            cols[c] = (vals, valid)
        emit_idx, outputs = window_project_exact(
            ts64, ts_valid, cols, win_aggs, frame, is_primary=prim
        )
        res = g.iloc[emit_idx].copy()
        for a in win_aggs:
            src = g[a.col] if (a.col is not None
                               and a.col in g.columns) else None
            res[a.name] = _stable_output_array(a, outputs[a.name], src)

    for a in lead_aggs:
        # extension (not in reference, SURVEY §7.6): forward shift over the
        # EMITTED stream — non-point-in-time, for label construction only.
        res[a.name] = res[a.col].shift(-a.k)

    # canonical output dtypes: counts are int64 (never NULL — empty frames
    # count 0), so downstream schemas are stable across kernels/partitions
    for a in aggs:
        if a.kind in ("count", "count_star", "count_where", "distinct_count"):
            res[a.name] = pd.to_numeric(res[a.name], errors="coerce").fillna(0).astype(np.int64)

    if is_primary_col is not None and is_primary_col in res.columns:
        res = res.drop(columns=[is_primary_col])
    return res
