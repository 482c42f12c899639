"""Typed stand-in for an EMPTY ray.data.Dataset.

Ray's map machinery rebuilds empty output blocks as zero-column tables, so
after any ``map_batches`` over a rowless dataset ``schema()`` is None and
every downstream schema consumer (subquery scoping, join right-side typing)
dies. The reference corpus declares tables with NO rows and still expects
the query to compile and run (cases/function/fz_ddl/test_bank.yaml expects
``success`` over six empty tables), so the SQL engine needs schema to
survive an empty pipeline.

``EmptyTypedDataset`` carries the 0-row Arrow table driver-side and executes
every transform EAGERLY on it — trivially cheap at zero rows, and the same
kernel functions the distributed path would run, so output schemas match by
construction. It is only created under ``grouping.EMPTY_PROBE`` (the SQL
engine's small-in-memory-tables gate); the 100 TB paths never see one.
Mixed combinations (a real dataset union'd with an empty one) degrade to a
real typed-empty-block dataset via ``to_real()``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def is_empty_shim(x) -> bool:
    return isinstance(x, EmptyTypedDataset)


def to_real(x):
    return x.to_real() if isinstance(x, EmptyTypedDataset) else x


def union_any(a, *others):
    """``a.union(*others)`` tolerating EmptyTypedDataset on either side."""
    if isinstance(a, EmptyTypedDataset):
        return a.union(*others)
    return a.union(*[to_real(o) for o in others])


def zip_any(a, b):
    if isinstance(a, EmptyTypedDataset):
        return a.zip(b)
    if isinstance(b, EmptyTypedDataset):
        return a.zip(b.to_real())
    return a.zip(b)


class EmptyTypedDataset:
    """Duck-typed subset of the ray.data.Dataset API over a 0-row table.

    ``schema()`` returns the pyarrow Schema — callers use ``.names`` /
    ``.types``, which pa.Schema provides just like ray.data.Schema.
    """

    def __init__(self, table: pa.Table):
        if isinstance(table, pd.DataFrame):
            table = pa.Table.from_pandas(table, preserve_index=False) \
                .replace_schema_metadata(None)
        self._t = table.slice(0, 0)

    # ---- conversions --------------------------------------------------
    def to_real(self):
        import ray.data as rd

        return rd.from_arrow(self._t)

    def to_arrow(self) -> pa.Table:
        return self._t

    def to_arrow_refs(self):
        import ray

        return [ray.put(self._t)]

    def to_pandas(self, *a, **kw) -> pd.DataFrame:
        return self._t.to_pandas()

    # ---- metadata ------------------------------------------------------
    def schema(self, *a, **kw) -> pa.Schema:
        return self._t.schema

    def columns(self):
        return list(self._t.column_names)

    def count(self) -> int:
        return 0

    def num_blocks(self) -> int:
        return 1

    def stats(self) -> str:
        return "EmptyTypedDataset (driver-side, 0 rows)"

    def __repr__(self):
        return f"EmptyTypedDataset(schema={self._t.schema.names})"

    # ---- transforms (eager, driver-side) --------------------------------
    def _apply(self, fn, batch_format: str) -> "EmptyTypedDataset":
        batch = self._t if batch_format == "pyarrow" else self._t.to_pandas()
        out = fn(batch)
        if not isinstance(out, (pa.Table, pd.DataFrame)):
            out = pa.Table.from_pandas(pd.DataFrame(out)) \
                .replace_schema_metadata(None)
        shim = EmptyTypedDataset(out)
        # kernels evaluating expressions over zero rows often emit untyped
        # (null) columns; a column that kept its input NAME keeps its input
        # type (the 0-row equivalent of what real data would produce)
        t = shim._t
        in_types = {f.name: f.type for f in self._t.schema}
        for i, f in enumerate(t.schema):
            src = in_types.get(f.name)
            if pa.types.is_null(f.type) and src is not None \
                    and not pa.types.is_null(src):
                t = t.set_column(i, f.name, pa.nulls(0, src))
        shim._t = t
        return shim

    def map_batches(self, fn, *, batch_format="pyarrow", batch_size=None,
                    fn_constructor_kwargs=None, **kw) -> "EmptyTypedDataset":
        if isinstance(fn, type):
            fn = fn(**(fn_constructor_kwargs or {}))
        return self._apply(fn, batch_format or "pyarrow")

    def filter(self, *a, **kw):
        return self

    def select_columns(self, cols):
        return EmptyTypedDataset(self._t.select(list(cols)))

    def drop_columns(self, cols):
        keep = [c for c in self._t.column_names if c not in set(cols)]
        return EmptyTypedDataset(self._t.select(keep))

    def add_column(self, name, fn, **kw):
        df = self._t.to_pandas()
        df[name] = fn(df)
        return EmptyTypedDataset(df)

    def sort(self, *a, **kw):
        return self

    def limit(self, n):
        return self

    def materialize(self):
        return self

    def repartition(self, *a, **kw):
        return self

    def random_shuffle(self, *a, **kw):
        return self

    def union(self, *others):
        if all(isinstance(o, EmptyTypedDataset) for o in others):
            return self
        return self.to_real().union(*[to_real(o) for o in others])

    def zip(self, other):
        if isinstance(other, EmptyTypedDataset):
            names = self._t.column_names + other._t.column_names
            cols = list(self._t.columns) + list(other._t.columns)
            arrays, seen = [], {}
            out_names = []
            for n in names:  # Ray zip suffixes duplicate right names with _1
                if n in seen:
                    seen[n] += 1
                    out_names.append(f"{n}_{seen[n]}")
                else:
                    seen[n] = 0
                    out_names.append(n)
            arrays = cols
            return EmptyTypedDataset(pa.Table.from_arrays(arrays, out_names))
        return self.to_real().zip(other)

    def groupby(self, keys, num_partitions=None):
        return _EmptyGrouped(self)

    def join(self, *a, **kw):
        return self.to_real().join(*a, **kw)

    # ---- consumption -----------------------------------------------------
    def take(self, n=20):
        return []

    def take_all(self, *a, **kw):
        return []

    def take_batch(self, *a, **kw):
        return self._t

    def iter_batches(self, *a, **kw):
        return iter(())

    def iter_rows(self, *a, **kw):
        return iter(())

    def write_parquet(self, path, **kw):
        return self.to_real().write_parquet(path, **kw)

    def write_csv(self, path, **kw):
        return self.to_real().write_csv(path, **kw)


class _EmptyGrouped:
    def __init__(self, parent: EmptyTypedDataset):
        self._p = parent

    def map_groups(self, fn, *, batch_format="pandas", **kw):
        return self._p._apply(fn, batch_format or "pandas")
