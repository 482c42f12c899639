"""Window frame specification.

Mirrors the semantics of OpenMLDB's frame model
(reference: hybridse/include/vm/mem_catalog.h:245-249 — kFrameRows,
kFrameRowsRange, kFrameRowsMergeRowsRange; WINDOW_CLAUSE.md:28-62):

- ``ROWS BETWEEN n PRECEDING AND CURRENT ROW``        → rows_preceding=n
- ``ROWS_RANGE BETWEEN d PRECEDING AND CURRENT ROW``  → range_preceding=d
  (d in the same units as the int64 order key, e.g. milliseconds)
- both set                                            → merged frame (union
  extent: a row is buffered while it satisfies EITHER bound —
  mem_catalog.h:462-491 Slide pops only rows beyond both)
- ``OPEN PRECEDING``   → open_range=True  (strict inequality on the start)
- ``UNBOUNDED``        → leave both bounds None
- ``MAXSIZE k``        → max_size=k (cap on buffered rows; only meaningful
  for range-like frames, sql_node.h:1240)
- ``EXCLUDE CURRENT_TIME`` → rows whose ts == current row's ts (other than
  the current row itself) are excluded from the view (mem_catalog.h:493-525)
- ``EXCLUDE CURRENT_ROW``  → the current row is not in its own window
- ``INSTANCE_NOT_IN_WINDOW`` (WINDOW UNION only) → primary-table rows are
  never buffered; each primary row's window = itself + union rows
  (WindowAggPlan.scala:589-592)
- end bounds: ``range_end`` <= 0 is the end offset for RANGE frames
  (``AND x PRECEDING`` → range_end=-x); ``rows_end`` >= 0 skips the newest
  rows_end buffer positions for ROWS frames. FOLLOWING is unsupported,
  matching the reference (WINDOW_CLAUSE.md:154-156).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FrameSpec:
    rows_preceding: int | None = None   # count of preceding rows (excl. current)
    range_preceding: int | None = None  # ts offset; window start = cur_ts - range_preceding
    open_range: bool = False            # strict inequality on range start
    rows_end: int = 0                   # newest buffer positions excluded (ROWS ... AND n PRECEDING)
    range_end: int = 0                  # <=0; rows with ts > cur_ts + range_end excluded
    range_end_open: bool = False        # strict end bound (… AND n OPEN PRECEDING)
    max_size: int = 0                   # 0 = uncapped
    exclude_current_time: bool = False
    exclude_current_row: bool = False
    instance_not_in_window: bool = False

    def __post_init__(self) -> None:
        if self.rows_preceding is None and self.range_preceding is None:
            # UNBOUNDED frame: fine.
            pass
        if self.rows_preceding is not None and self.rows_preceding < 0:
            raise ValueError("rows_preceding must be >= 0")
        if self.range_preceding is not None and self.range_preceding < 0:
            raise ValueError("range_preceding must be >= 0 (offset magnitude)")
        if self.range_end > 0 or self.rows_end < 0:
            raise ValueError("FOLLOWING bounds unsupported (matches reference)")

    @property
    def is_pure_rows(self) -> bool:
        return self.rows_preceding is not None and self.range_preceding is None

    @property
    def is_pure_range(self) -> bool:
        return self.range_preceding is not None and self.rows_preceding is None

    @property
    def is_merged(self) -> bool:
        return self.rows_preceding is not None and self.range_preceding is not None

    @property
    def is_unbounded(self) -> bool:
        return self.rows_preceding is None and self.range_preceding is None

    def fast_path_eligible(self) -> bool:
        """True when the vectorized kernel implements this frame exactly:
        simple ROWS / ROWS_RANGE / UNBOUNDED ... AND CURRENT ROW with no
        exclusions, no MAXSIZE, no open bound."""
        return (
            not self.is_merged
            and self.rows_end == 0
            and self.range_end == 0
            and not self.range_end_open
            and self.max_size == 0
            and not self.exclude_current_time
            and not self.exclude_current_row
            and not self.instance_not_in_window
            and not self.open_range
        )


#: parse helpers for the tiny textual frame grammar used in pipelines/tests,
#: e.g. rows(2), range("1h"), range(3600_000, maxsize=10)
_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}


def interval_ms(text: str | int) -> int:
    """'10s' → 10000; '1d' → 86400000; plain ints pass through."""
    if isinstance(text, int):
        return text
    t = text.strip().lower()
    for unit in ("ms", "s", "m", "h", "d"):
        if t.endswith(unit) and t[: -len(unit)].strip().isdigit():
            return int(t[: -len(unit)]) * _UNIT_MS[unit]
    return int(t)


def rows(n: int, **kw) -> FrameSpec:
    return FrameSpec(rows_preceding=n, **kw)


def rows_range(d: str | int, **kw) -> FrameSpec:
    return FrameSpec(range_preceding=interval_ms(d), **kw)


def unbounded(**kw) -> FrameSpec:
    return FrameSpec(**kw)
