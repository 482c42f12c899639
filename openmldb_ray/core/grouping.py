"""Schema-preserving ``groupby().map_groups()``.

Ray's groupby over an EMPTY dataset produces a dataset with zero blocks —
``.schema()`` returns None and every downstream schema consumer (subquery
scoping, join right-side typing, write sinks) dies. That only matters for
conformance-scale inputs (the reference corpus declares tables with no rows,
e.g. cases/function/fz_ddl/test_bank.yaml, and asserts ``success``); at
100 TB an empty input is a bug upstream, and the emptiness check below
costs a ``count()`` (an extra execution of the upstream pipeline), which a
production pipeline must never pay silently. Hence the contextvar gate: the
SQL engine turns EMPTY_PROBE on for small in-memory table sets only; every
other caller gets plain ``map_groups`` byte-identical to before.
"""

from __future__ import annotations

import contextvars

import pandas as pd
import pyarrow as pa

EMPTY_PROBE: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "omr_empty_probe", default=False)


def _empty_frame(sch, batch_format: str):
    """Zero-row frame typed from a ray.data Schema (Arrow or pandas-block)."""
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        t = base.empty_table()
        return t.to_pandas() if batch_format == "pandas" else t
    df = pd.DataFrame({n: pd.Series(dtype=t)
                       for n, t in zip(base.names, base.types)})
    return (df if batch_format == "pandas"
            else pa.Table.from_pandas(df, preserve_index=False)
            .replace_schema_metadata(None))


def map_groups_typed(ds, keys, fn, *, batch_format: str = "pandas",
                     num_partitions=None):
    """``ds.groupby(keys).map_groups(fn)`` with an empty-input escape hatch.

    Under EMPTY_PROBE, an empty input short-circuits the shuffle entirely:
    ``fn`` runs ONCE driver-side on a zero-row frame typed from the input
    schema, and the (sliced-to-zero-rows) typed result becomes the output
    dataset — so downstream ``schema()`` sees real names/types. A kernel
    that cannot run on zero rows falls through to the real shuffle.
    """
    from .empty_ds import EmptyTypedDataset

    if isinstance(ds, EmptyTypedDataset):
        return ds.groupby(keys).map_groups(fn, batch_format=batch_format)
    if EMPTY_PROBE.get():
        try:
            if ds.count() == 0:
                sch = ds.schema()
                if sch is not None:
                    probe = fn(_empty_frame(sch, batch_format))
                    return EmptyTypedDataset(probe)
        except Exception:
            pass  # kernel needs rows → run the real (empty) shuffle
    return ds.groupby(keys, num_partitions=num_partitions).map_groups(
        fn, batch_format=batch_format)


def key_change_mask(df, keys) -> "np.ndarray":
    """True at rows where ANY key column differs from the previous row
    (the frame must already be sorted by ``keys``): one vectorized
    shift-compare per key column, null-safe (two nulls compare equal).
    Replaces the per-row ``astype(str).agg(join, axis=1)`` boundary
    pattern — Python-per-row inside otherwise vectorized kernels."""
    import numpy as np

    n = len(df)
    m = np.zeros(n, dtype=bool)
    if n == 0:
        return m
    m[0] = True
    for k in keys:
        col = df[k].to_numpy()
        cur, prev = col[1:], col[:-1]
        neq = cur != prev
        cn, pn = pd.isna(cur), pd.isna(prev)
        m[1:] |= (neq & ~(cn & pn)) | (cn ^ pn)
    return m
