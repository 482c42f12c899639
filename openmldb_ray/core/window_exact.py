"""Reference-exact sliding-window kernel (single partition, pure Python).

Re-implements ``HistoryWindow::BufferData`` / ``Slide``
(reference: hybridse/include/vm/mem_catalog.h:363-529) and the offline
consumption loop (WindowAggPlan.scala:501-558, 560-611):

- input rows must be sorted ts-ascending, with WINDOW UNION rows placed
  BEFORE primary rows on ts ties (WindowAggPlan.scala:78-91) and arrival
  order otherwise stable (out-of-order ts within a partition is a caller
  bug, mirroring mem_catalog.h:385-388).
- the buffer is newest-first: index 0 = current row.
- rows with NULL or negative order key emit nothing and never enter the
  buffer (WindowAggPlan.scala:784-791).
- union (non-primary) rows feed the buffer but never emit.
- eviction implements the merged-frame union rule: a row stays while it
  satisfies EITHER the ROWS count bound OR the ROWS_RANGE ts bound
  (mem_catalog.h:462-491); MAXSIZE caps the buffer unconditionally.
- EXCLUDE CURRENT_TIME / EXCLUDE CURRENT_ROW are applied to the view,
  not the buffer (mem_catalog.h:493-525).
- INSTANCE_NOT_IN_WINDOW: primary rows are never buffered; each primary
  row's own view still starts with itself (mem_catalog.h:274-275).

This kernel is the semantic source of truth; the vectorized kernel
(window_fast) must agree with it on its eligible subset (tested in
tests/test_window_kernel.py).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .aggregates import AggSpec, iter_specs_deep, make_evaluator, spec_has_expr
from .frames import FrameSpec


def window_project_exact(
    ts: np.ndarray,
    ts_valid: np.ndarray,
    cols: dict[str, tuple[np.ndarray, np.ndarray]],
    aggs: list[AggSpec],
    frame: FrameSpec,
    is_primary: np.ndarray | None = None,
):
    """Compute window aggregates over one sorted partition.

    Returns (emit_idx, outputs): ``emit_idx`` int64 array of input row
    positions that produced output (primary rows with a valid order key,
    in order), ``outputs`` dict name -> list of python scalars (None=NULL).
    """
    n = ts.shape[0]
    evals = [(a.name, a.kind, spec_has_expr(a), make_evaluator(a))
             for a in aggs]
    outputs: dict[str, list] = {name: [] for name, _, _, _ in evals}
    emit: list[int] = []

    buf: deque[int] = deque()  # newest first
    rows_p = frame.rows_preceding
    range_p = frame.range_preceding
    open_r = frame.open_range
    max_size = frame.max_size
    merged = frame.is_merged
    unbounded = frame.is_unbounded

    # ROWS n OPEN PRECEDING keeps n rows, not n+1
    # (test_window_exclude_current_time.yaml:744-760 case 19 w2: ROWS 3 OPEN
    # PRECEDING caps the window at 3 rows)
    rows_cap = None if rows_p is None else (rows_p if open_r else rows_p + 1)

    def slide(cur_ts: int) -> None:
        if range_p is not None:
            lo = cur_ts - range_p
            while buf:
                bt = ts[buf[-1]]
                in_range = (bt > lo) if open_r else (bt >= lo)
                if in_range:
                    break
                if merged and len(buf) <= rows_cap:
                    break  # still covered by the ROWS bound
                buf.pop()
        elif rows_p is not None:
            while len(buf) > rows_cap:
                buf.pop()
        if max_size > 0 and not (frame.rows_end or frame.range_end
                                 or frame.range_end_open
                                 or frame.exclude_current_row
                                 or frame.exclude_current_time):
            # permanent eviction == final-view cap only for plain CURRENT
            # ROW-ended frames; with an end bound or exclusion the cap must
            # apply to the post-exclusion view instead
            # (test_window_row_range.yaml 24-2; test_current_row.yaml 14;
            # window_attributes.yaml 4)
            while len(buf) > max_size:
                buf.pop()

    def view(i: int, staged: bool):
        """Window views for current row i (staged=True → i is not in buf).

        Returns (main, positional): ``main`` honours EXCLUDE CURRENT_ROW /
        CURRENT_TIME with MAXSIZE applied to the post-exclusion frame
        (test_current_row.yaml cases 14/23); ``positional`` is the raw
        buffer-order view used by lag/at, which index buffer positions and
        ignore the exclusion attributes (test_current_row.yaml cases 24-27:
        lag(c4,2) EXCLUDE CURRENT_ROW still counts from the current row)."""
        cand = ([i] + list(buf)) if staged else list(buf)
        if staged:
            # staged path must re-apply bounds the buffer eviction normally
            # enforces (the staged row shifts positional counting by one)
            out = []
            cur = ts[i]
            for pos, j in enumerate(cand):
                ok = unbounded
                if rows_p is not None and pos < rows_cap:
                    ok = True
                if range_p is not None and not ok:
                    lo = cur - range_p
                    bt = ts[j]
                    ok = (bt > lo) if open_r else (bt >= lo)
                if ok:
                    out.append(j)
            cand = out
        # end bounds (AND x PRECEDING) — exclude the newest rows, current
        # row included (FOLLOWING is unsupported, so end offsets only shrink)
        if frame.rows_end:
            cand = cand[frame.rows_end:]
        if frame.range_end or frame.range_end_open:
            hi = ts[i] + frame.range_end
            if frame.range_end_open:
                cand = [j for j in cand if ts[j] < hi]
            else:
                cand = [j for j in cand if ts[j] <= hi]
        # exclusions (view-level), then MAXSIZE over what remains visible
        if frame.exclude_current_time:
            # with staging, buf never holds same-ts rows; kept as a guard
            cand = [j for j in cand if j == i or ts[j] != ts[i]]
        if frame.exclude_current_row:
            cand = [j for j in cand if j != i]
        if max_size > 0:
            cand = list(cand)[:max_size]
        return np.asarray(cand, dtype=np.int64)

    # EXCLUDE CURRENT_TIME staging (mem_catalog.h:413-455
    # current_history_buffer_): rows do NOT enter the main buffer until the
    # order key advances past their ts, so same-ts rows are invisible to each
    # other AND the frame's ROWS/MAXSIZE caps apply over current + older-ts
    # rows only (verified against test_window_exclude_current_time.yaml:59-90
    # case 1: MAXSIZE with EXCLUDE CURRENT_TIME).
    exclude_ct = frame.exclude_current_time
    staged_rows: list[int] = []
    staged_ts: int | None = None

    def flush_staged() -> None:
        for j in staged_rows:
            buf.appendleft(j)
            slide(int(ts[j]))
            hist.appendleft(j)
        staged_rows.clear()

    # lag/at are PARTITION-POSITIONAL, independent of the frame, maxsize
    # and exclusions: the reference compiles lag(v, k) to its own appended
    # ROWS (k PRECEDING, CURRENT) sub-window over the partition
    # (window_attributes.yaml batch_plan blocks: "PROJECT(type=
    # WindowAggregation, NEED_APPEND_INPUT) +-WINDOW(rows=(ts, k PRECEDING,
    # 0 CURRENT))"). History holds only the deepest offset needed.
    _deep = list(iter_specs_deep(aggs))
    has_pos = any(a.kind in ("lag", "at") for a in _deep)
    kmax = (max((a.k or 0) for a in _deep if a.kind in ("lag", "at"))
            if has_pos else 0)
    hist: deque[int] = deque(maxlen=max(kmax, 1))  # newest first

    def compute(i: int, staged: bool) -> None:
        idx = view(i, staged=staged)
        emit.append(i)
        if has_pos:
            idx_pos = np.asarray([i] + list(hist), dtype=np.int64)
        else:
            idx_pos = None
        for name, kind, has_expr, ev in evals:
            if has_expr:
                outputs[name].append(ev(cols, idx, idx_pos))
            else:
                outputs[name].append(ev(cols, idx_pos if kind in ("lag", "at")
                                         else idx))

    for i in range(n):
        if not ts_valid[i] or ts[i] < 0:
            continue
        if exclude_ct and staged_rows and ts[i] > staged_ts:
            flush_staged()
        prim = True if is_primary is None else bool(is_primary[i])
        if prim and frame.instance_not_in_window:
            compute(i, staged=True)
            continue  # never buffered (and not in lag history either)
        if exclude_ct:
            # staged rows join the lag history only at flush: under EXCLUDE
            # CURRENT_TIME, lag skips same-ts rows too
            # (test_window_union.yaml 18-4: l1 for a ts-100 row is the ts-99
            # union value, not the same-ts union row)
            if prim:
                compute(i, staged=True)
            staged_rows.append(i)
            staged_ts = int(ts[i])
        else:
            buf.appendleft(i)
            slide(int(ts[i]))
            if prim:
                compute(i, staged=False)
            hist.appendleft(i)

    return np.asarray(emit, dtype=np.int64), outputs
