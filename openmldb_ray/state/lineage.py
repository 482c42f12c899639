"""Per-partition lineage records for resumable output (north rule:
"a killed job restarted via ray job submit skips completed partitions").

Reference analog: the offline engine's ``_SUCCESS``-guarded per-plan-node
parquet cache (SparkPlanner.scala:288-327 slowRunCacheDir). The unit of
resumability is a VALUE of the partition column: the dataset is written in
ONE parallel pass with ``write_parquet(partition_cols=[...])`` (hive
layout ``<col>=<value>/``), then each value's lineage JSON (the commit
marker) is derived from the written files — row count from parquet footer
metadata (no data read) and an optional checksum from a column-pruned
read of just the checksum column. A rerun calls
:func:`completed_partitions` and filters those values out of the input
BEFORE the shuffle, so finished work is skipped at the read; partition
dirs left behind by a crash (data present, no marker) are cleared before
the write so a resume can never duplicate rows.
"""

from __future__ import annotations

import glob
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


def _plain_arrow_lists(t):
    """Replace Ray tensor-extension columns (produced whenever an array
    column round-trips through a pandas block) with plain Arrow list
    columns, so the written parquet is readable by ANY parquet reader —
    not just a process with Ray's extension types registered."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for i, f in enumerate(t.schema):
        if not isinstance(f.type, pa.BaseExtensionType):
            continue
        if not f.type.extension_name.startswith("ray.data"):
            continue
        storage = t.column(i).combine_chunks().storage
        if pa.types.is_struct(storage.type):  # variable-shaped: (data, shape)
            # flatten(), NOT field(): .field() returns the raw child array
            # and IGNORES the parent's slice offset/length, so on a sliced
            # block (e.g. the resume path's filtered batches) row k would
            # silently take row k+offset's payload — cross-wired rows
            # (caught by the round-5 kill-resume load test: resumed
            # partitions carried other docs' token arrays)
            idx = storage.type.get_field_index("data")
            data = storage.flatten()[idx]
        else:  # fixed-shape tensor: (fixed_size_)list storage
            data = storage
        if pa.types.is_large_list(data.type):
            data = pc.cast(data, pa.list_(data.type.value_type))
        elif pa.types.is_fixed_size_list(data.type):
            data = pc.cast(data, pa.list_(data.type.value_type))
        t = t.set_column(i, f.name, data)
    # stale pandas metadata would still describe the extension dtype and
    # break to_pandas() for plain readers — drop it
    meta = {k: v for k, v in (t.schema.metadata or {}).items() if k != b"pandas"}
    return t.replace_schema_metadata(meta or None)


def _partition_dirs(out_dir: str, partition_col: str) -> dict[str, str]:
    """value -> dir for every hive-layout partition dir present on disk.
    Dir names are hive-ENCODED ('a b' -> 'a%20b'); decode them so every
    consumer (lineage records, the done-set, filter_completed's
    str(value) comparison, the incomplete-dir rmtree) works in raw value
    space — comparing raw values against encoded names let resume append
    duplicate rows into already-complete partitions. Partition values
    must be non-null (a null writes __HIVE_DEFAULT_PARTITION__, which no
    raw value can ever match)."""
    from urllib.parse import unquote

    out = {}
    for p in glob.glob(os.path.join(out_dir, f"{partition_col}=*")):
        if os.path.isdir(p):
            out[unquote(os.path.basename(p).split("=", 1)[1])] = p
    return out


def write_partitioned_with_lineage(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_col: str,
    *,
    checksum_col: str | None = None,
    resume: bool = True,
) -> dict:
    """Write ``ds`` hive-partitioned by ``partition_col`` in ONE parallel
    pass, committing each partition value with a lineage record. Returns a
    summary dict {"written": [...], "skipped": [...]}.

    Scale shape: one streaming write over the data (Ray fans out one file
    per block per value); lineage stats come from parquet footers plus a
    column-pruned checksum read — no per-partition filter passes over the
    dataset (the round-1 implementation paid 3 executions per value).
    """
    import pyarrow.parquet as pq

    if not resume:
        # a fresh run must not leave stale 'complete' records behind:
        # a LATER resume would trust them and silently drop those
        # partitions' input rows with no data on disk
        shutil.rmtree(_lineage_dir(out_dir), ignore_errors=True)
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    done = completed_partitions(out_dir) if resume else set()
    if done:
        ds = filter_completed(ds, out_dir, partition_col)
    # a partition dir without a lineage record is incomplete (the job died
    # mid-write): clear it — write_parquet appends part files, which would
    # silently duplicate rows on resume
    pre_existing = _partition_dirs(out_dir, partition_col)
    for v, pdir in pre_existing.items():
        if v not in done:
            shutil.rmtree(pdir, ignore_errors=True)

    # resume with nothing left to do? limit(1) short-circuits: non-empty
    # inputs answer after ~one block instead of the full pipeline pass a
    # count() would burn (and the write below would then re-execute)
    if done and ds.limit(1).count() == 0:
        return {"written": [], "skipped": sorted(done)}
    t0 = time.time()
    ds = ds.map_batches(_plain_arrow_lists, batch_format="pyarrow", batch_size=None)
    ds.write_parquet(out_dir, partition_cols=[partition_col])
    wall = round(time.time() - t0, 3)

    summary = {"written": [], "skipped": sorted(done)}
    for v, pdir in sorted(_partition_dirs(out_dir, partition_col).items()):
        if v in done:
            continue
        files = sorted(glob.glob(os.path.join(pdir, "**", "*.parquet"),
                                 recursive=True))
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        checksum = None
        if checksum_col is not None:
            checksum = 0
            for f in files:
                col = pq.read_table(f, columns=[checksum_col])[checksum_col]
                s = col.combine_chunks().cast("int64")
                import pyarrow.compute as pc

                checksum += int(pc.sum(s).as_py() or 0)
        rec = {
            "partition": v,
            "status": "complete",
            "rows": rows,
            "checksum": checksum,
            "output": pdir,
            "n_files": len(files),
            "wall_sec": wall,
        }
        with open(os.path.join(_lineage_dir(out_dir), f"{_safe(v)}.json"), "w") as f:
            json.dump(rec, f)
        summary["written"].append(v)
    return summary


def filter_completed(ds: "ray.data.Dataset", out_dir: str,
                     partition_col: str) -> "ray.data.Dataset":
    """Drop rows whose partition already has a complete lineage record —
    the resume path applied at the INPUT, before any shuffle.

    PYARROW-format filter, deliberately NOT pandas: a variable-length
    list payload (token arrays) that crosses a pandas block boundary
    comes back as a Ray tensor-extension column, and Ray 2.49's
    pandas→Arrow batch conversion can CROSS-WIRE rows of such columns in
    downstream pyarrow-format stages (observed: a worker-side identity
    ``map_batches(..., batch_format="pyarrow")`` after the old pandas
    filter paired ~2/3 of a block's rows with other rows' token arrays —
    caught by the round-5 kill-resume load test, since this filter only
    runs on resume). Keeping the block Arrow end-to-end sidesteps the
    conversion entirely — the engine-wide payload rule."""
    done = completed_partitions(out_dir)
    if not done:
        return ds
    import pyarrow as pa
    import pyarrow.compute as pc

    vals = pa.array(sorted(done), pa.string())

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(
            pc.cast(t[partition_col], pa.string()), value_set=vals))
        return t.filter(pc.fill_null(keep, True))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
