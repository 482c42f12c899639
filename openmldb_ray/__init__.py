"""openmldb_ray — a Ray-Data-native rebuild of OpenMLDB's offline
SQL-over-time feature-engineering surface.

Reference semantics studied from lukeAyin/OpenMLDB (read-only at
/root/reference); the architecture is idiomatic Ray Data: Dataset
pipelines, zero-copy Arrow batches inside map_batches, actor pools for
stateful stages, explicit shuffles for the wide steps.

Public surface:
    core.frames.FrameSpec        — window frame description
    core.window_exact            — reference-exact ring-buffer kernel
    core.window_fast             — vectorized kernel for common aggs
    stages.window_stage.window_agg        — distributed window aggregate
    stages.join_stage.last_join           — point-in-time / as-of LAST JOIN
    stages.union_stage.window_union_agg   — WINDOW UNION backfill
    stages.session_stage.sessionize       — session gap windows
    stages.dedup / textstats / simsearch  — training-data ops
    pipelines.flagship                    — the tokenized-sequence suite
"""

__version__ = "0.1.0"

# Ray's pandas->Arrow block conversion attaches b'pandas' schema metadata,
# which makes pa.Schema unhashable and trips an informational warning
# ("Failed to hash the schemas (for deduplication)") on EVERY bundle unify
# downstream of a pandas-format stage — pure log spam (the slow unify path
# still runs correctly). Arrow-side emitters in this package strip their
# own metadata; this silences the residual warning from blocks Ray itself
# converts. Runs in every process that imports the package (driver AND
# map workers unpickling our UDFs).
import logging as _logging

_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow").setLevel(_logging.ERROR)


class _EmptySchemaDivergenceFilter(_logging.Filter):
    """Drop Ray's schema-divergence warning ONLY when the new schema is
    empty. Ray 2.49's sort-based shuffle emits zero-row, zero-COLUMN blocks
    for empty output partitions (verified by instrumenting
    streaming_executor_state.OpState.add_output: the empty-schema bundles
    come from the AllToAllOperator[Sort] itself, not from any UDF in this
    package — every group fn here returns typed columns on zero-row input).
    Divergence between two real schemas still warns."""

    def filter(self, record: "_logging.LogRecord") -> bool:  # noqa: A003
        msg = record.getMessage()
        if "different schema" not in msg:
            return True
        return not ("new schema: ." in msg or "new schema: None." in msg)


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state").addFilter(
    _EmptySchemaDivergenceFilter())


class _EmptyPandasSizeFilter(_logging.Filter):
    """Drop Ray's pandas per-column size-estimation warning for ZERO-ROW
    blocks only (``np.vectorize`` refuses size-0 input without ``otypes``;
    Ray falls back to index-only memory accounting, which is exact for an
    empty block). Real size-estimation failures on non-empty data still
    warn."""

    def filter(self, record: "_logging.LogRecord") -> bool:  # noqa: A003
        msg = record.getMessage()
        return not ("Error calculating size for column" in msg
                    and "size 0 inputs" in msg)


_logging.getLogger(
    "ray.data._internal.pandas_block").addFilter(_EmptyPandasSizeFilter())
del _logging
