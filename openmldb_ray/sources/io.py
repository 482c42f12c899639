"""Sources & sinks (LoadDataPlan / SelectIntoPlan rebuild).

Reference: nodes/LoadDataPlan.scala:30-134 (LOAD DATA INFILE csv/parquet,
deep copy vs soft copy), nodes/SelectIntoPlan.scala:28-56 (INTO OUTFILE,
write modes overwrite/append/errorifexists).

Scale defaults: always pass ``columns=`` so only needed columns leave
storage; int64-ms order keys are derived once at the read (zero-copy cast)
to mirror the reference's ms timestamp arithmetic
(nodes/WindowAggPlan.scala:368-373 divides Spark µs by 1000 at the JNI
boundary — we cast Arrow timestamp[us] → timestamp[ms] → int64).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    ds = rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
    # parquet blocks carry b'pandas' provenance metadata, which makes their
    # schemas UNHASHABLE (dict) — that defeats Ray's schema-dedup on every
    # downstream bundle ("Failed to hash the schemas" warning spam). The
    # strip is zero-copy and fuses with the next map.
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow", batch_size=None)


def with_ts_ms(ds: rd.Dataset, ts_col: str, out_col: str = "ts_ms") -> rd.Dataset:
    """Append an int64 epoch-milliseconds column derived from a timestamp
    column (the engine's canonical order-key representation)."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[ts_col]
        unit = col.type.unit if pa.types.is_timestamp(col.type) else None
        raw = pc.cast(col, pa.int64())
        div = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}.get(unit, 1)
        if unit == "s":
            ms = pc.multiply(raw, 1000)
        elif div == 1:
            ms = raw
        else:  # truncate toward zero, matching DuckDB epoch_ms on positive ts
            ms = pc.divide(raw, div)
        return t.append_column(out_col, ms)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def load_data(path: str, fmt: str = "parquet", *, columns=None,
              deep_copy_to: str | None = None) -> rd.Dataset:
    """LOAD DATA INFILE. ``deep_copy_to`` mirrors the reference's deep-copy
    mode (materialize into the offline store); default is soft copy (read
    in place — LoadDataPlan.scala:60-62 path-register). ``hive://db.table``
    / ``catalog://db.table`` URIs resolve through the registered catalog
    (LoadDataPlan.scala:30-134 hive branch; see sources/catalog.py)."""
    from .catalog import is_catalog_uri, resolve

    if is_catalog_uri(path):
        entry = resolve(path)
        path, fmt = entry.path, entry.fmt
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=columns)
    elif fmt == "csv":
        ds = rd.read_csv(path)
        if columns:
            ds = ds.select_columns(columns)
    elif fmt in ("json", "jsonl"):
        # newline-delimited JSON — the interchange format of most public
        # LLM corpora (beyond the reference's csv/parquet LoadData surface)
        ds = rd.read_json(path)
        if columns:
            ds = ds.select_columns(columns)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    if deep_copy_to:
        ds.write_parquet(deep_copy_to)
        ds = rd.read_parquet(deep_copy_to)
    return ds


def select_into(ds: rd.Dataset, path: str, fmt: str = "parquet",
                mode: str = "overwrite", **write_kwargs) -> None:
    """INTO OUTFILE with the reference's write modes
    (SelectIntoPlan.scala:28-56). Output is a directory of part files —
    never one giant file — so reruns and downstream reads parallelize."""
    exists = os.path.exists(path) and bool(os.listdir(path)) if os.path.isdir(path) else os.path.exists(path)
    if exists:
        if mode == "errorifexists":
            raise FileExistsError(path)
        if mode == "overwrite":
            shutil.rmtree(path, ignore_errors=True)
        # append: fall through, Ray writes new files alongside
    if fmt == "parquet":
        ds.write_parquet(path, **write_kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **write_kwargs)
    elif fmt in ("json", "jsonl"):
        ds.write_json(path, **write_kwargs)
    else:
        raise ValueError(f"unsupported format: {fmt}")
