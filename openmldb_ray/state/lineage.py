"""Per-partition lineage records for resumable output (north rule:
"a killed job restarted via ray job submit skips completed partitions").

Reference analog: the offline engine's ``_SUCCESS``-guarded per-plan-node
parquet cache (SparkPlanner.scala:288-327 slowRunCacheDir). Here the unit
of resumability is a VALUE of the partition column: each value gets its own
parquet directory plus ``lineage/<value>.json`` holding row count, a
content checksum, and metrics. A rerun calls :func:`completed_partitions`
and filters those values out of the input BEFORE the shuffle, so finished
work is skipped at the read, not re-computed and discarded.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def _safe(val) -> str:
    return "".join(ch if (ch.isalnum() or ch in "-_.") else "_" for ch in str(val))


def completed_partitions(out_dir: str) -> set[str]:
    d = _lineage_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    done = set()
    for f in os.listdir(d):
        if f.endswith(".json"):
            try:
                rec = json.load(open(os.path.join(d, f)))
                if rec.get("status") == "complete":
                    done.add(rec["partition"])
            except (json.JSONDecodeError, KeyError):
                continue
    return done


def write_partitioned_with_lineage(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_col: str,
    *,
    checksum_col: str | None = None,
    resume: bool = True,
) -> dict:
    """Write ``ds`` as one parquet directory per partition-column value,
    each committed with a lineage record. Returns a summary dict.

    Writing is atomic per partition: data lands under ``part=<v>/`` first,
    the lineage JSON (the commit marker) is written only after the parquet
    write returns. On resume, values with a complete lineage record are
    skipped BEFORE any compute.

    Scale note: this materializes each partition through a filtered write —
    one pass per partition value, intended for a handful of coarse output
    partitions (entity keys / shard ranges). For thousands of partitions use
    ``ds.write_parquet(partition_cols=[...])`` and coarser lineage units.
    """
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    done = completed_partitions(out_dir) if resume else set()
    import pandas as pd

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        if partition_col not in df.columns:
            return pd.DataFrame({partition_col: []})
        return df[[partition_col]].drop_duplicates()

    partials = (ds.select_columns([partition_col])
                  .map_batches(_dedupe, batch_format="pandas", batch_size=None)
                  .to_pandas())
    values = sorted(set(partials[partition_col].astype(str)))
    summary = {"written": [], "skipped": []}
    for v in values:
        if v in done:
            summary["skipped"].append(v)
            continue
        t0 = time.time()
        part = ds.filter(expr=f"{partition_col} == {v!r}")
        pdir = os.path.join(out_dir, f"part={_safe(v)}")
        # a partition without a lineage record is incomplete (e.g. the job
        # died mid-write): clear it first — write_parquet appends part files,
        # which would silently duplicate rows on resume
        shutil.rmtree(pdir, ignore_errors=True)
        part.write_parquet(pdir)
        n = part.count()
        checksum = None
        if checksum_col is not None:
            checksum = int(part.sum(checksum_col) or 0)
        rec = {
            "partition": v,
            "status": "complete",
            "rows": n,
            "checksum": checksum,
            "output": pdir,
            "wall_sec": round(time.time() - t0, 3),
        }
        with open(os.path.join(_lineage_dir(out_dir), f"{_safe(v)}.json"), "w") as f:
            json.dump(rec, f)
        summary["written"].append(v)
    return summary


def filter_completed(ds: "ray.data.Dataset", out_dir: str,
                     partition_col: str) -> "ray.data.Dataset":
    """Drop rows whose partition already has a complete lineage record —
    the resume path applied at the INPUT, before any shuffle."""
    done = completed_partitions(out_dir)
    if not done:
        return ds
    import pandas as pd

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df[partition_col].astype(str).isin(done)]

    return ds.map_batches(fn, batch_format="pandas", batch_size=None)
