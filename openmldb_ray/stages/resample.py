"""Time-grid resampling: regular per-key snapshots with as-of forward fill.

The time-series featurization shape: training wants feature values at
REGULAR timestamps (hourly/daily snapshots), events arrive at irregular
ones. ``time_grid`` expands each key to its epoch-aligned grid of
timestamps (one vectorized repeat/arange pass over a tiny per-key
(min, max) range table — the grid rows are synthesized distributed, never
driver-side), and ``resample_asof`` forward-fills each grid point with the
latest event at-or-before it via the point-in-time :func:`last_join`
(so a snapshot can never see a later event — the same temporal-leakage
contract as the window stages).

Contract: the order column is int64 (ms — the engine-wide raw-int64 ts
convention, SURVEY §1.3); ``step`` is an int in the same unit. Grid points
are epoch-aligned (``ceil(min/step)*step .. max``), so every grid row has
at least one event at-or-before it within its key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def time_grid(ds, key, ts_col: str, step: int, *, out_ts: str = "grid_ts"):
    """One row per (key, aligned grid timestamp) covering each key's
    [ceil(min/step)*step, max] range at ``step`` spacing."""
    if step <= 0:
        raise ValueError("time_grid: step must be a positive int")
    from ..core.aggregates import Agg
    from .relational import group_aggregate

    keys = [key] if isinstance(key, str) else list(key)
    rng = group_aggregate(ds, keys, [Agg.min(ts_col, "__mn"),
                                     Agg.max(ts_col, "__mx")])

    import pyarrow as pa

    def expand(t: pa.Table) -> pa.Table:
        mn = t.column("__mn").to_numpy(zero_copy_only=False).astype(np.int64)
        mx = t.column("__mx").to_numpy(zero_copy_only=False).astype(np.int64)
        # ceil to the next step multiple, exact for negatives too
        start = -(-mn // step) * step
        counts = np.maximum((mx - start) // step + 1, 0)
        rep = np.repeat(np.arange(len(mn)), counts)
        # intra-key index: global arange minus each key's first position
        first = np.concatenate(([0], np.cumsum(counts)[:-1]))
        intra = np.arange(counts.sum()) - np.repeat(first, counts)
        # take keeps the key columns' Arrow types even when every grid is
        # empty (span < step), so the Dataset schema stays typed end-to-end
        out = t.select(keys).take(pa.array(rep, pa.int64()))
        return out.append_column(
            out_ts, pa.array(start[rep] + intra * step, pa.int64()))

    return rng.map_batches(expand, batch_format="pyarrow", batch_size=None)


def resample_asof(
    events,
    key,
    ts_col: str,
    step: int,
    value_cols: list[str],
    *,
    out_ts: str = "grid_ts",
    tiebreak: str | None = None,
    **join_kw,
):
    """Regular per-key snapshots forward-filled from the latest event
    at-or-before each grid point (grid = :func:`time_grid`; fill =
    point-in-time :func:`last_join`). Pass ``tiebreak`` (a unique column)
    when multiple events can share one (key, ts) — otherwise pre-aggregate
    events to one row per (key, ts) first."""
    from .join_stage import last_join

    keys = [key] if isinstance(key, str) else list(key)
    if len(keys) != 1:
        raise ValueError("resample_asof: single key column only")
    grid = time_grid(events, keys[0], ts_col, step, out_ts=out_ts)
    right_cols = {c: c for c in value_cols}
    return last_join(grid, events, (keys[0], keys[0]), order_by=ts_col,
                     asof_left_ts=out_ts, tiebreak=tiebreak,
                     right_cols=right_cols, **join_kw)
