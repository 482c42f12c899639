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

    def fn(bucket: pd.DataFrame) -> pd.DataFrame:
        # one Ray dispatch per coarse bucket; sessionize every key inside
        # with vectorized groupby ops (scales to high key cardinality)
        sort_cols = keys + [order_by] + ([tiebreak] if tiebreak else [])
        g = bucket.sort_values(sort_cols, kind="stable").copy()
        ts = pd.to_numeric(g[order_by]).to_numpy(np.int64)
        if len(g) == 0:
            g[session_col] = np.array([], dtype=np.int64)
            return g.drop(columns="__sb", errors="ignore")
        from ..core.grouping import key_change_mask

        new_key = key_change_mask(g, keys)
        new = np.empty(len(g), dtype=np.int64)
        new[0] = 0
        new[1:] = (np.diff(ts) > gap).astype(np.int64)
        new[new_key] = 0
        sid = np.cumsum(new)
        # reset the running id at each key boundary
        base = np.zeros(len(g), dtype=np.int64)
        starts = np.nonzero(new_key)[0]
        base[starts] = sid[starts]
        np.maximum.accumulate(base, out=base)
        g[session_col] = sid - base
        return g.drop(columns="__sb", errors="ignore")

    return _coarse_grouped(ds, keys, fn, num_partitions)


def _coarse_grouped(ds, keys, fn, num_partitions):
    from ..core.hashing import add_bucket_column, default_num_buckets

    from ..core.grouping import map_groups_typed

    add_bucket = add_bucket_column(keys, "__sb", default_num_buckets())
    return map_groups_typed(
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
        "__sb", fn, batch_format="pandas", num_partitions=num_partitions)


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
    rows = sessionize(ds, keys, order_by, gap=gap, tiebreak=tiebreak,
                      num_partitions=num_partitions)

    def agg_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        spec = dict(session_start=(order_by, "min"), session_end=(order_by, "max"),
                    n_events=(order_by, "size"))
        if value_col is not None:
            spec["sum_value"] = (value_col, "sum")
        out = (bucket.groupby([*keys, "session_id"], sort=False, as_index=False)
                     .agg(**spec))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out.drop(columns="__sb", errors="ignore")

    # sessions are whole within a coarse key bucket, so one more pass over
    # the already-bucketed rows aggregates them without another shuffle
    return _coarse_grouped(rows, keys, agg_fn, num_partitions)
