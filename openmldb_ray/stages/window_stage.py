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
EMIT_COL = "__emit"


def _normalize_keys(partition_by) -> list[str]:
    return [partition_by] if isinstance(partition_by, str) else list(partition_by)


def _to_arrow(out: pd.DataFrame):
    """Emit Arrow blocks with a stable column order — pandas blocks with
    object columns defeat Ray's size estimation and can surface
    inconsistent empty-block schemas downstream."""
    import pyarrow as pa

    # metadata stripped: schemas carrying the b'pandas' metadata dict are
    # UNHASHABLE, which defeats Ray's schema-dedup fast path and spams
    # 'Failed to hash the schemas' warnings on every unify
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def _make_group_fn(order_by: str, aggs: list[AggSpec], frame: FrameSpec,
                   has_union: bool, tiebreak: str | None, drop_cols: list[str],
                   hook=None, keys: list[str] | None = None,
                   emit_col: str | None = None):
    """Group fn. When ``keys`` is given the incoming frame is a COARSE
    bucket holding many partition keys (one Ray dispatch per bucket, not
    per key — high-cardinality scale path); each key is windowed
    independently inside.

    ``emit_col`` (salted path): a bool column marking which rows EMIT
    output — buffer-only rows (expanded history replicas, union rows)
    are False. The sort tie order still uses the ORIGINAL union flag
    (union-before-primary), so emit masking cannot perturb lag/ordering
    semantics; the mask is applied right before the kernel."""

    def one_key(g: pd.DataFrame, presorted: bool = False):
        if not presorted:
            sort_cols = [order_by]
            if has_union:
                # ts ties: union rows (False) before primary rows (True),
                # WindowAggPlan.scala:78-91
                sort_cols.append(UNION_FLAG)
            if tiebreak:
                sort_cols.append(tiebreak)
            g = g.sort_values(sort_cols, kind="stable")
        if hook is not None:
            hook("pre", g)
        if emit_col is not None:
            g = g.assign(**{UNION_FLAG: g[emit_col].to_numpy(bool)})
        out = compute_window_features(
            g, order_by, aggs, frame,
            is_primary_col=UNION_FLAG if (has_union or emit_col is not None)
            else None,
        )
        if drop_cols:
            out = out.drop(columns=[c for c in drop_cols if c in out.columns])
        if hook is not None:
            hook("post", out)
        return out

    if keys is None:
        return lambda g: _to_arrow(one_key(g))

    # columns the window kernel actually reads; everything else is PAYLOAD
    # and must never round-trip through pandas (nullable int64 -> float64,
    # ints past 2^53 rounded, list columns to object) — payload rows are
    # re-attached from the sorted Arrow table by emitted row position
    from ..core.aggregates import spec_columns

    needed = {order_by, *(keys or [])}
    if has_union:
        needed.add(UNION_FLAG)
    if tiebreak:
        needed.add(tiebreak)
    if emit_col:
        needed.add(emit_col)
    for a in aggs:
        needed.update(spec_columns(a))

    def bucket_fn(bucket: "pa.Table"):
        """Arrow-native bucket kernel: ONE stable Arrow sort over
        (keys…, order, flags), zero-copy per-key slicing via vectorized
        boundary detection, pandas conversion only for the NARROW
        kernel-input columns of each slice; payload columns are gathered
        from the Arrow table via ``take`` on the emitted positions (exact
        types, no object-dtype round trip). The full frame is converted
        only when a WindowHook is installed (its contract sees all
        columns)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if "__wb" in bucket.column_names:
            bucket = bucket.drop_columns(["__wb"])
        if bucket.num_rows == 0:
            return _to_arrow(one_key(bucket.to_pandas(), presorted=True))
        spec = [(k, "ascending") for k in keys] + [(order_by, "ascending")]
        if has_union:
            spec.append((UNION_FLAG, "ascending"))
        if tiebreak:
            spec.append((tiebreak, "ascending"))
        t = bucket.sort_by(spec)  # Arrow sorts are stable; ties keep order
        n = t.num_rows
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for kcol in keys:
            col = t[kcol].combine_chunks()
            a, b = col.slice(0, n - 1), col.slice(1)
            # null == null -> same group (pandas dropna=False parity);
            # validity flip -> boundary. Float NaN needs the same care:
            # Arrow not_equal(NaN, NaN) is true, which would split every
            # consecutive NaN-keyed pair into its own one-row partition
            neq = pc.fill_null(pc.not_equal(a, b), False) \
                    .to_numpy(zero_copy_only=False)
            vchg = pc.xor(pc.is_null(a), pc.is_null(b)) \
                     .to_numpy(zero_copy_only=False)
            if pa.types.is_floating(col.type):
                both_nan = pc.and_kleene(
                    pc.fill_null(pc.is_nan(a), False),
                    pc.fill_null(pc.is_nan(b), False)) \
                    .to_numpy(zero_copy_only=False)
                neq &= ~both_nan
            change[1:] |= neq | vchg
        starts = np.nonzero(change)[0]
        bounds = np.append(starts, n)
        payload = [c for c in t.column_names if c not in needed]
        if hook is not None or not payload:
            parts = [one_key(t.slice(bounds[i], bounds[i + 1] - bounds[i])
                              .to_pandas(), presorted=True)
                     for i in range(starts.size)]
            return _to_arrow(pd.concat(parts, ignore_index=True))
        tn = t.select([c for c in t.column_names if c in needed])
        tn = tn.append_column(
            "__wpos", pa.array(np.arange(n, dtype=np.int64)))
        parts = [one_key(tn.slice(bounds[i], bounds[i + 1] - bounds[i])
                          .to_pandas(), presorted=True)
                 for i in range(starts.size)]
        outn = pd.concat(parts, ignore_index=True)
        pos = outn["__wpos"].to_numpy(np.int64)
        feat_cols = [c for c in outn.columns
                     if c not in tn.column_names]
        base = t.take(pa.array(pos, pa.int64()))
        keep = [c for c in t.column_names
                if c not in drop_cols and c not in feat_cols]
        out = base.select(keep)
        for c in feat_cols:
            out = out.append_column(c, pa.Array.from_pandas(outn[c]))
        return out

    return bucket_fn


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
    hook=None,
) -> "ray.data.Dataset":
    """OpenMLDB ``SELECT agg(..) OVER w`` with optional ``WINDOW w AS (UNION ...)``.

    ``union`` rows feed window state but are never emitted
    (WindowAggPlanUtil.scala:50-117). ``tiebreak`` makes ts-tie ordering
    deterministic (the reference uses arrival order; distributed reads have
    no stable arrival order, so callers pass an id column). ``hook`` is the
    WindowHook analog (reference: window/WindowHook.scala,
    WindowSampleSupport.scala) — ``hook(phase, df)`` called per partition
    with phase "pre" (sorted input) and "post" (computed output), for
    sampling/metrics/lineage; it runs inside workers, so side effects must
    be worker-local (e.g. write to files/queues, not driver state).
    """
    keys = _normalize_keys(partition_by)
    has_union = union is not None
    if has_union:
        ds = ds.map_batches(_flag_adder(True), batch_format="pyarrow", batch_size=None)
        union_flagged = union.map_batches(_flag_adder(False), batch_format="pyarrow",
                                          batch_size=None)
        from ..core.empty_ds import union_any
        ds = union_any(ds, union_flagged)
    # shuffle on a coarse hash bucket of the partition keys: whole keys stay
    # together (the window contract) but Ray dispatches once per bucket, not
    # once per key — the difference between ~4×cores and millions of group
    # tasks at high entity cardinality. The bucket column is appended
    # Arrow-native (vectorized SipHash) so the exchange moves Arrow blocks
    # and no per-row Python hash runs on the input.
    from ..core.hashing import add_bucket_column, default_num_buckets

    add_bucket = add_bucket_column(keys, "__wb", default_num_buckets())
    fn = _make_group_fn(order_by, aggs, frame, has_union, tiebreak, drop_cols=[],
                        hook=hook, keys=keys)
    from ..core.grouping import map_groups_typed

    return map_groups_typed(
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
        "__wb", fn, batch_format="pyarrow", num_partitions=num_partitions)


def _flag_adder(value: bool):
    def fn(t):
        import pyarrow as pa

        if UNION_FLAG in t.column_names:
            t = t.drop_columns([UNION_FLAG])
        return t.append_column(
            UNION_FLAG, pa.array(np.full(t.num_rows, value, dtype=bool)))

    return fn


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
    if not frame.is_pure_range:
        # a merged ROWS+ROWS_RANGE frame would retain rows older than
        # history_ms via the ROWS bound, which are never replicated across
        # bucket boundaries — silently wrong; reject (ADVICE r1)
        raise ValueError("salted path requires a pure ROWS_RANGE frame "
                         "(time-bounded history, no ROWS bound)")
    if frame.instance_not_in_window:
        raise ValueError("INSTANCE_NOT_IN_WINDOW is not supported on the salted path "
                         "(expanded primary replicas would be buffered); use window_agg")
    if history_ms is None:
        history_ms = frame.range_preceding
    elif frame.range_preceding is not None and \
            history_ms < frame.range_preceding:
        # an explicit history shorter than the frame silently DROPS
        # boundary history: rows between history_ms and range_preceding
        # before a bucket edge are never replicated into the next bucket
        raise ValueError(
            f"history_ms ({history_ms}) must cover the frame's "
            f"range_preceding ({frame.range_preceding})")
    if bucket_ms < history_ms:
        raise ValueError("bucket_ms must be >= history_ms to cover the frame")
    keys = _normalize_keys(partition_by)
    preflagged = isinstance(union, str) and union == "preflagged"
    if union is not None and not preflagged:
        ds = ds.map_batches(_flag_adder(True), batch_format="pyarrow", batch_size=None)
        from ..core.empty_ds import union_any
        ds = union_any(ds, union.map_batches(_flag_adder(False),
                                             batch_format="pyarrow",
                                             batch_size=None))

    has_union = union is not None

    def explode(t: "pa.Table") -> "pa.Table":
        # Arrow-native so the downstream sort shuffle runs on Arrow blocks.
        # EMIT_COL is computed here, vectorized: a row emits output iff it
        # is not an expanded history replica and (with union) is primary.
        import pyarrow as pa
        import pyarrow.compute as pc

        ts = pc.cast(t[order_by], pa.int64())
        valid = pc.and_kleene(pc.is_valid(ts), pc.greater_equal(ts, 0))
        ts0 = pc.if_else(valid, ts, pa.scalar(0, pa.int64()))
        bucket = pc.divide(ts0, bucket_ms)
        own = t.append_column(BUCKET_COL, pc.cast(bucket, pa.int64()))
        own = own.append_column(EXPANDED_FLAG, pa.array(np.zeros(t.num_rows, bool)))
        own_emit = (pc.fill_null(pc.cast(t[UNION_FLAG], pa.bool_()), False)
                    if has_union
                    else pa.array(np.ones(t.num_rows, bool)))
        own = own.append_column(EMIT_COL, own_emit)
        near_end = pc.and_(
            pc.fill_null(valid, False),
            pc.greater_equal(ts0, pc.subtract(
                pc.multiply(pc.add(bucket, 1), bucket_ms), history_ms)))
        rep_base = t.filter(near_end)
        rep_bucket = pc.add(pc.cast(bucket, pa.int64()).filter(near_end), 1)
        rep = rep_base.append_column(BUCKET_COL, rep_bucket)
        rep = rep.append_column(EXPANDED_FLAG, pa.array(np.ones(rep.num_rows, bool)))
        rep = rep.append_column(EMIT_COL, pa.array(np.zeros(rep.num_rows, bool)))
        return pa.concat_tables([own, rep])

    ds = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)

    # same coarse-bucket exchange as the plain stage (one int64 __wb sort,
    # one vectorized in-bucket Arrow sort + boundary split) instead of a
    # full multi-key map_groups: at 8M rows / 8 CPUs this halves the
    # non-kernel machinery cost of the window stage
    from ..core.grouping import map_groups_typed
    from ..core.hashing import add_bucket_column, default_num_buckets

    add_bucket = add_bucket_column([*keys, BUCKET_COL], "__wb",
                                   default_num_buckets())
    fn = _make_group_fn(order_by, aggs, frame, has_union, tiebreak,
                        drop_cols=[EXPANDED_FLAG, BUCKET_COL, EMIT_COL],
                        keys=[*keys, BUCKET_COL], emit_col=EMIT_COL)
    return map_groups_typed(
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
        "__wb", fn, batch_format="pyarrow", num_partitions=num_partitions)
