"""Session gap windows (north-rule extension; no reference analog —
OpenMLDB reserves the SESSION keyword but never implements it, see
SURVEY §7.6).

Same partition/order contract as the window stage: hash-shuffle by
entity key, per-key ts-ascending order, session boundary where the gap
to the previous event exceeds ``gap``. Session ids are 0-based per key
in ts order, deterministic under a tiebreak column.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def sessionize(
    ds: "ray.data.Dataset",
    partition_by,
    order_by: str,
    *,
    gap: int,
    session_col: str = "session_id",
    tiebreak: str | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Assign ``session_col``: 0-based session index per partition key;
    a new session starts when ts - prev_ts > gap (same units as order_by)."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [order_by] + ([tiebreak] if tiebreak else [])
        g = g.sort_values(sort_cols, kind="stable").copy()
        ts = pd.to_numeric(g[order_by]).to_numpy(np.int64)
        new = np.empty(len(g), dtype=np.int64)
        if len(g):
            new[0] = 0
            new[1:] = (np.diff(ts) > gap).astype(np.int64)
        g[session_col] = np.cumsum(new)
        return g

    return ds.groupby(keys, num_partitions=num_partitions).map_groups(
        fn, batch_format="pandas"
    )


def session_aggregate(
    ds: "ray.data.Dataset",
    partition_by,
    order_by: str,
    *,
    gap: int,
    value_col: str | None = None,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Sessionize then emit one row per session: key cols, session_id,
    session_start, session_end, n_events, and sum_value when value_col."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [order_by] + ([tiebreak] if tiebreak else [])
        g = g.sort_values(sort_cols, kind="stable")
        ts = pd.to_numeric(g[order_by]).to_numpy(np.int64)
        new = np.empty(len(g), dtype=np.int64)
        if len(g):
            new[0] = 0
            new[1:] = (np.diff(ts) > gap).astype(np.int64)
        sid = np.cumsum(new)
        out = pd.DataFrame({k: np.repeat(g[k].iloc[:1].to_numpy(), sid[-1] + 1 if len(g) else 0) for k in keys})
        grp = pd.DataFrame({"sid": sid, "ts": ts})
        agg = grp.groupby("sid").agg(session_start=("ts", "min"),
                                     session_end=("ts", "max"),
                                     n_events=("ts", "size")).reset_index()
        out["session_id"] = agg["sid"].to_numpy()
        out["session_start"] = agg["session_start"].to_numpy()
        out["session_end"] = agg["session_end"].to_numpy()
        out["n_events"] = agg["n_events"].to_numpy(np.int64)
        if value_col is not None:
            sums = pd.DataFrame({"sid": sid, "v": g[value_col].to_numpy()}).groupby("sid")["v"].sum()
            out["sum_value"] = sums.to_numpy()
        return out

    return ds.groupby(keys, num_partitions=num_partitions).map_groups(
        fn, batch_format="pandas"
    )
