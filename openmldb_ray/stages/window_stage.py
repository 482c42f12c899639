"""Distributed window aggregation (the WindowAggPlan rebuild).

Reference dataflow (java/openmldb-batch/.../nodes/WindowAggPlan.scala:52-189):
optional WINDOW UNION concat → repartition by partition keys →
sortWithinPartitions(keys ++ orderby ++ unionFlag) → per-partition stateful
sliding-window compute. Here that becomes:

    (optional union concat with __is_primary flag)
    → ds.groupby(partition_keys).map_groups(kernel, batch_format="pandas")

``groupby().map_groups`` is Ray Data's hash-shuffle + per-key grouping: one
all-to-all exchange, then each whole key is handed, sorted by us, to the
vectorized kernel. This is the ONLY shuffle in the stage. Keys are assumed
to fit in a worker's heap; entities whose history is too large for one task
use :func:`window_agg_salted`, the skew path (reference analog:
WindowAggPlan.scala:192-312 + utils/SkewDataFrameUtils.scala — time-slice
each hot key and replicate boundary history as buffer-only "expanded" rows).

Scale notes (100 TB): the shuffle key is (partition_by); pre-pruning columns
before this stage matters more than anything else — call
``ds.select_columns`` so only the order key, value columns, and pass-through
ids move through the exchange. Wide payloads (token arrays) should be split
off before the shuffle and re-joined by id afterwards (SURVEY §7.5).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from ..core.aggregates import AggSpec
from ..core.frames import FrameSpec
from ..core.window_fast import compute_window_features

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

UNION_FLAG = "__is_primary"
EXPANDED_FLAG = "__expanded"
BUCKET_COL = "__bucket"


def _normalize_keys(partition_by) -> list[str]:
    return [partition_by] if isinstance(partition_by, str) else list(partition_by)


def _make_group_fn(order_by: str, aggs: list[AggSpec], frame: FrameSpec,
                   has_union: bool, tiebreak: str | None, drop_cols: list[str]):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [order_by]
        if has_union:
            # ts ties: union rows (False) before primary rows (True),
            # WindowAggPlan.scala:78-91
            sort_cols.append(UNION_FLAG)
        if tiebreak:
            sort_cols.append(tiebreak)
        g = g.sort_values(sort_cols, kind="stable")
        out = compute_window_features(
            g, order_by, aggs, frame,
            is_primary_col=UNION_FLAG if has_union else None,
        )
        if drop_cols:
            out = out.drop(columns=[c for c in drop_cols if c in out.columns])
        return out

    return fn


def window_agg(
    ds: "ray.data.Dataset",
    partition_by,
    order_by: str,
    aggs: list[AggSpec],
    frame: FrameSpec,
    *,
    union: "ray.data.Dataset | None" = None,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """OpenMLDB ``SELECT agg(..) OVER w`` with optional ``WINDOW w AS (UNION ...)``.

    ``union`` rows feed window state but are never emitted
    (WindowAggPlanUtil.scala:50-117). ``tiebreak`` makes ts-tie ordering
    deterministic (the reference uses arrival order; distributed reads have
    no stable arrival order, so callers pass an id column).
    """
    keys = _normalize_keys(partition_by)
    has_union = union is not None
    if has_union:
        ds = ds.map_batches(_add_flag_true, batch_format="pandas", batch_size=None)
        union_flagged = union.map_batches(_add_flag_false, batch_format="pandas", batch_size=None)
        ds = ds.union(union_flagged)
    fn = _make_group_fn(order_by, aggs, frame, has_union, tiebreak, drop_cols=[])
    return ds.groupby(keys, num_partitions=num_partitions).map_groups(
        fn, batch_format="pandas"
    )


def _add_flag_true(df: pd.DataFrame) -> pd.DataFrame:
    df[UNION_FLAG] = True
    return df


def _add_flag_false(df: pd.DataFrame) -> pd.DataFrame:
    df[UNION_FLAG] = False
    return df


# ---------------------------------------------------------------------------
# Skew path: time-bucket salting with boundary-history replication


def window_agg_salted(
    ds: "ray.data.Dataset",
    partition_by,
    order_by: str,
    aggs: list[AggSpec],
    frame: FrameSpec,
    *,
    bucket_ms: int,
    history_ms: int | None = None,
    union: "ray.data.Dataset | None" = None,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Skew-defused window aggregate for hot partition keys.

    Each (key, ts) is assigned a time bucket ``ts // bucket_ms``; rows within
    ``history_ms`` of a bucket's end are REPLICATED into the next bucket as
    buffer-only rows (``__expanded``), so every bucket can compute its rows'
    windows independently — the reference's skew "expanded row" trick
    (WindowAggPlan.scala:419-499, SkewDataFrameUtils.genUnionDf:110-143)
    with deterministic fixed-width buckets instead of quantiles.

    Requires a pure ROWS_RANGE frame (history is a time extent); callers
    must pick ``bucket_ms >= history_ms``. The shuffle key becomes
    (partition_by…, bucket), multiplying parallelism for hot keys by the
    number of occupied buckets.

    ``union`` may be a Dataset (flagged + concatenated here) or the string
    ``"preflagged"`` meaning ``ds`` already carries a bool ``__is_primary``
    column — the single-pass path when primary/union membership is a
    row-level predicate of one stream (avoids consuming the input twice).
    """
    if frame.range_preceding is None:
        raise ValueError("salted path requires a ROWS_RANGE frame (time-bounded history)")
    if frame.instance_not_in_window:
        raise ValueError("INSTANCE_NOT_IN_WINDOW is not supported on the salted path "
                         "(expanded primary replicas would be buffered); use window_agg")
    if history_ms is None:
        history_ms = frame.range_preceding
    if bucket_ms < history_ms:
        raise ValueError("bucket_ms must be >= history_ms to cover the frame")
    keys = _normalize_keys(partition_by)
    preflagged = isinstance(union, str) and union == "preflagged"
    if union is not None and not preflagged:
        ds = ds.map_batches(_add_flag_true, batch_format="pandas", batch_size=None)
        ds = ds.union(union.map_batches(_add_flag_false, batch_format="pandas", batch_size=None))

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.to_numeric(df[order_by], errors="coerce")
        valid = (s.notna() & (s >= 0)).to_numpy()
        tsv = s.fillna(0).to_numpy(np.int64)
        bucket = tsv // bucket_ms
        own = df.copy()
        own[BUCKET_COL] = bucket
        own[EXPANDED_FLAG] = False
        near_end = valid & (tsv >= (bucket + 1) * bucket_ms - history_ms)
        rep = df[near_end].copy()
        rep[BUCKET_COL] = bucket[near_end] + 1
        rep[EXPANDED_FLAG] = True
        return pd.concat([own, rep], ignore_index=True)

    ds = ds.map_batches(explode, batch_format="pandas", batch_size=None)

    has_union = union is not None

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # expanded (replicated-history) rows always have strictly smaller ts
        # than the bucket's own rows, so ties only occur within a class;
        # union rows sort before primary on ties as in the plain stage
        sort_cols = [order_by] + ([UNION_FLAG] if has_union else []) + ([tiebreak] if tiebreak else [])
        g = g.sort_values(sort_cols, kind="stable")
        emit = ~g[EXPANDED_FLAG]
        if has_union:
            emit &= g[UNION_FLAG]
        g = g.assign(**{UNION_FLAG: emit})
        out = compute_window_features(g, order_by, aggs, frame, is_primary_col=UNION_FLAG)
        return out.drop(columns=[c for c in (EXPANDED_FLAG, BUCKET_COL) if c in out.columns])

    return ds.groupby([*keys, BUCKET_COL], num_partitions=num_partitions).map_groups(
        fn, batch_format="pandas"
    )
