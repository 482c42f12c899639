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

import numpy as np
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


NULL_KEY_SENTINEL = "\x00<null>\x00"

_NULL_INT_DTYPES = None  # lazy: {pa int type -> pd.Int64Dtype()}


def null_int_types_mapper(tp):
    """``pa.Table.to_pandas(types_mapper=...)`` hook mapping every integer
    width to nullable Int64 — the house convention for partial-aggregate
    inputs: a null in an int64 column must NOT promote the block to
    float64 (values past 2^53 would silently round, and block dtypes
    would become data-dependent)."""
    global _NULL_INT_DTYPES
    if _NULL_INT_DTYPES is None:
        _NULL_INT_DTYPES = {
            pa.int8(): pd.Int64Dtype(), pa.int16(): pd.Int64Dtype(),
            pa.int32(): pd.Int64Dtype(), pa.int64(): pd.Int64Dtype(),
            pa.uint8(): pd.Int64Dtype(), pa.uint16(): pd.Int64Dtype(),
            pa.uint32(): pd.Int64Dtype(), pa.uint64(): pd.Int64Dtype(),
        }
    return _NULL_INT_DTYPES.get(tp)


def arrow_col_type(schema, col: str) -> "pa.DataType":
    """A column's ``pyarrow.DataType`` from a ``ray.data`` Schema, safe
    for PANDAS-block datasets carrying extension dtypes: Ray's
    ``Schema.types`` calls ``pa.from_numpy_dtype`` on each dtype and, for
    a pandas ``Int64Dtype``/``boolean`` block, logs
    ``ERROR -- Error converting dtype Int64 to Arrow`` and yields None
    (which ``np.dtype(None)`` then silently reads as float64 — breaking
    the exact-integer-sum contract downstream). This helper never touches
    ``Schema.types`` on a pandas block schema; extension dtypes resolve
    through their ``numpy_dtype``. Raises TypeError for dtypes with no
    Arrow equivalent."""
    base = getattr(schema, "base_schema", schema)
    if isinstance(base, pa.Schema):
        return base.field(col).type
    names = list(base.names)
    tp = list(base.types)[names.index(col)]
    if isinstance(tp, pa.DataType):
        return tp
    npdt = getattr(tp, "numpy_dtype", None)  # pandas extension dtypes
    try:
        return pa.from_numpy_dtype(npdt if npdt is not None
                                   else np.dtype(tp))
    except (pa.ArrowNotImplementedError, TypeError) as e:
        raise TypeError(f"column {col!r}: no Arrow equivalent for "
                        f"dtype {tp}") from e


def key_strings(s: pd.Series, sentinel: str = NULL_KEY_SENTINEL):
    """Canonical per-row string keys (object ndarray) for grouping /
    broadcast-map lookups, null-safe and BLOCK-DTYPE-safe.

    Two engine-wide footguns this helper owns:

    - nulls: plain ``astype(str)`` mints the literal 'None'/'nan'/'<NA>'
      and merges it with a real category of that name — nulls map to the
      NUL-framed sentinel instead (one real group, SQL GROUP BY keeps
      NULLs). The sentinel is restored/applied by MASK ASSIGNMENT, never
      ``fillna``: pandas fillna routes NUL-containing strings through a
      numpy U-dtype scalar that silently TRUNCATES trailing NULs. The
      same truncation hits numpy object-array vs str-scalar COMPARISON
      (``arr == sentinel`` is always False) — detect nulls with the
      original column's isna mask, never by comparing to the sentinel.
    - numeric keys: Ray's Arrow→pandas conversion turns an int64 block
      containing a null into float64, so the same key stringifies as '1'
      in null-free blocks and '1.0' in null-carrying ones — two groups
      for one category, block-dependent encodings. Integral floats
      therefore render WITHOUT the decimal point (|v| < 2^53; larger
      int-typed keys alongside nulls need Arrow-format batches).
    """
    import numpy as np

    na = s.isna().to_numpy()
    kind = getattr(s.dtype, "kind", None)
    if kind in ("i", "u", "b") or (
            pd.api.types.is_integer_dtype(s.dtype)
            or pd.api.types.is_bool_dtype(s.dtype)):
        out = s.astype(str).to_numpy(dtype=object)
    elif kind == "f" or pd.api.types.is_float_dtype(s.dtype):
        v = s.to_numpy(np.float64, na_value=np.nan)
        out = np.empty(len(s), dtype=object)
        integral = np.isfinite(v) & (np.abs(v) < 2.0 ** 53) \
            & (v == np.rint(v))
        out[integral] = v[integral].astype(np.int64).astype("U").astype(object)
        rest = ~integral & ~na
        out[rest] = v[rest].astype("U").astype(object)
    else:
        out = s.astype(str).to_numpy(dtype=object)
    out[na] = sentinel
    return out


def sentinel_keys(key: pd.Series, sentinel: str = NULL_KEY_SENTINEL):
    """Stats-table key column (strings + None) → object ndarray with the
    sentinel restored, by mask assignment (see key_strings for why not
    fillna)."""
    arr = key.to_numpy(dtype=object, copy=True)
    arr[key.isna().to_numpy()] = sentinel
    return arr


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
