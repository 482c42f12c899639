"""Generic-catalog source (the reference's hive branch, rebuilt storage-
agnostic).

Reference: nodes/LoadDataPlan.scala:30-134 — ``LOAD DATA INFILE
'hive://db.table'`` resolves the table through the session catalog and then
follows the same deep-copy (materialize into the offline store) / soft-copy
(path-register) modes as file sources. There is no Hive metastore in this
environment (and none is needed for the semantics): the catalog is an
explicit registry mapping ``db.table`` → (storage path, format). A real
deployment would populate it from an external metastore; every downstream
behavior (URI resolution, copy modes, column pruning) is identical and
tested here.
"""

from __future__ import annotations

from dataclasses import dataclass

#: URI schemes that resolve through the catalog (the reference accepts
#: ``hive://`` — LoadDataPlan.scala:44; ``catalog://`` is the neutral alias)
CATALOG_SCHEMES = ("hive://", "catalog://")


@dataclass(frozen=True)
class CatalogEntry:
    path: str
    fmt: str = "parquet"


_REGISTRY: dict[str, CatalogEntry] = {}


def register_table(db: str, table: str, path: str, fmt: str = "parquet") -> None:
    """Register ``db.table`` → storage location (metastore stand-in)."""
    _REGISTRY[f"{db}.{table}"] = CatalogEntry(path=path, fmt=fmt)


def unregister_table(db: str, table: str) -> None:
    _REGISTRY.pop(f"{db}.{table}", None)


def is_catalog_uri(path: str) -> bool:
    return any(path.startswith(s) for s in CATALOG_SCHEMES)


def resolve(uri: str) -> CatalogEntry:
    """``hive://db.table`` → registered entry; KeyError names the missing
    table (matching the reference's catalog-lookup failure mode)."""
    name = uri
    for s in CATALOG_SCHEMES:
        if uri.startswith(s):
            name = uri[len(s):]
            break
    entry = _REGISTRY.get(name)
    if entry is None:
        raise KeyError(f"catalog table not registered: {name!r} "
                       f"(register_table(db, table, path) first)")
    return entry
