"""Snapshot diff — the incremental-curation primitive.

A recurring 100 TB-pipeline need: yesterday's curated snapshot vs today's
re-crawl — which documents were added, which disappeared, which changed
(so only those re-enter the expensive downstream stages: re-embed,
re-dedup, re-tokenize). A full re-run is the naive answer; the diff is one
key-hash co-shuffle of BOTH snapshots (the exact anti_join/exact_dedup
scale shape: coarse buckets, the key itself never a per-key group call)
with a vectorized per-bucket outer merge + null-safe column compare.

Output: one row per non-identical key — ``key``, ``status`` in
{'added','removed','changed'}, and ``old_<c>`` / ``new_<c>`` for every
compared column (nulls on the absent side). Unchanged rows are dropped
(the whole point: the diff is small even when the snapshots are not);
``emit_unchanged=True`` keeps them for audits.

Both sides must share the schema; ``key`` must be unique per side (it is
a snapshot key). Null == null counts as equal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def snapshot_diff(
    old,
    new,
    key: str,
    *,
    compare_cols: list[str] | None = None,
    emit_unchanged: bool = False,
    num_buckets: int = 1024,
    num_partitions: int | None = None,
):
    from ..core.grouping import map_groups_typed
    from ..core.hashing import add_bucket_column

    old_names = old.schema().names
    if compare_cols is None:
        compare_cols = [c for c in old_names if c != key]
    cols = [key] + list(compare_cols)

    def tag(side):
        def fn(t):
            import pyarrow as pa
            import pyarrow.compute as pc  # noqa: F401

            t = t.select(cols)
            return t.append_column(
                "__side", pa.array(np.full(len(t), side, dtype=np.int8)))
        return fn

    both = (old.map_batches(tag(0), batch_format="pyarrow", batch_size=None)
            .union(new.map_batches(tag(1), batch_format="pyarrow",
                                   batch_size=None)))
    add_b = add_bucket_column([key], "__b", num_buckets)

    def bucket_diff(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["__side"] == 0][cols].copy()
        n = g[g["__side"] == 1][cols].copy()
        # integer compare columns ride the outer merge as NULLABLE Int64:
        # NaN-padding from added/removed keys would otherwise promote
        # them to float64, where values past 2^53 compare equal and a
        # genuinely changed row is silently classed 'unchanged' (and the
        # old_/new_ output dtype would differ per bucket)
        for c in compare_cols:
            if o[c].dtype.kind in "iu":
                o[c] = o[c].astype("Int64")
                n[c] = n[c].astype("Int64")
        m = o.merge(n, how="outer", on=key, suffixes=("__o", "__n"),
                    indicator=True)
        in_old = m["_merge"] != "right_only"
        in_new = m["_merge"] != "left_only"
        changed = np.zeros(len(m), dtype=bool)
        for c in compare_cols:
            a, b = m[f"{c}__o"], m[f"{c}__n"]
            eq = ((a == b) | (a.isna() & b.isna()))
            if eq.dtype != bool:  # nullable boolean: one-sided NA != equal
                eq = eq.fillna(False)
            changed |= ~eq.to_numpy(dtype=bool)
        status = np.where(~in_old, "added",
                          np.where(~in_new, "removed",
                                   np.where(changed, "changed", "unchanged")))
        out = pd.DataFrame({key: m[key], "status": status})
        for c in compare_cols:
            out[f"old_{c}"] = m[f"{c}__o"].where(in_old)
            out[f"new_{c}"] = m[f"{c}__n"].where(in_new)
        if not emit_unchanged:
            out = out[out["status"] != "unchanged"]
        return out.reset_index(drop=True)

    pre = both.map_batches(add_b, batch_format="pyarrow", batch_size=None)
    return map_groups_typed(pre, "__b", bucket_diff, batch_format="pandas",
                            num_partitions=num_partitions)
