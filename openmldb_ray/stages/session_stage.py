"""Session gap windows (north-rule extension; no reference analog —
OpenMLDB reserves the SESSION keyword but never implements it, see
SURVEY §7.6).

Same partition/order contract as the window stage: hash-shuffle by
entity key, per-key ts-ascending order, session boundary where the gap
to the previous event exceeds ``gap``. Session ids are 0-based per key
in ts order, deterministic under a tiebreak column.

Time semantics (library-wide conventions, see interval_join._to_i64 /
decay.py): a datetime ``order_by`` converts to epoch MICROSECONDS, so
``gap`` is in microseconds for datetime columns and in the column's own
units for numeric columns. Rows with a NULL ``order_by`` have no place
on the timeline and are DROPPED (same rule as the window stages, which
exclude null-order rows) — they are never silently cast to INT64_MIN.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _sessionize_frame(bucket: pd.DataFrame, keys, order_by: str, gap: int,
                      session_col: str, tiebreak: str | None) -> pd.DataFrame:
    """Assign 0-based per-key session ids within one coarse key bucket
    (buckets hold whole keys, so sessions never straddle buckets)."""
    # null order rows are off the timeline: drop (window-stage rule);
    # without this, to_numpy(int64) would cast NaN to INT64_MIN and diff
    # would wrap, assigning garbage session boundaries silently
    bucket = bucket[bucket[order_by].notna()]
    sort_cols = keys + [order_by] + ([tiebreak] if tiebreak else [])
    g = bucket.sort_values(sort_cols, kind="stable").copy()
    if len(g) == 0:
        g[session_col] = np.array([], dtype=np.int64)
        return g.drop(columns="__sb", errors="ignore")
    ts_s = g[order_by]
    if pd.api.types.is_datetime64_any_dtype(ts_s):
        # datetime -> epoch MICROSECONDS, the library-wide convention
        ts = ts_s.to_numpy().astype("datetime64[us]").astype(np.int64)
    else:
        ts = pd.to_numeric(ts_s).to_numpy(np.int64)
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
    a new session starts when ts - prev_ts > gap (column units for numeric
    order_by, MICROSECONDS for datetime). Null-order rows are dropped."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)

    def fn(bucket: pd.DataFrame) -> pd.DataFrame:
        # one Ray dispatch per coarse bucket; sessionize every key inside
        # with vectorized groupby ops (scales to high key cardinality)
        return _sessionize_frame(bucket, keys, order_by, gap, session_col,
                                 tiebreak)

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
    session_start, session_end, n_events, and sum_value when value_col.

    ONE shuffle total: sessions are whole within a coarse key bucket, so
    the per-bucket kernel assigns session ids AND aggregates them in the
    same dispatch — the event rows never ride a second exchange.
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)

    def fused_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = _sessionize_frame(bucket, keys, order_by, gap, "session_id",
                                 tiebreak)
        spec = dict(session_start=(order_by, "min"), session_end=(order_by, "max"),
                    n_events=(order_by, "size"))
        if value_col is not None:
            spec["sum_value"] = (value_col, "sum")
        out = (rows.groupby([*keys, "session_id"], sort=False, as_index=False)
                   .agg(**spec))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return _coarse_grouped(ds, keys, fused_fn, num_partitions)
