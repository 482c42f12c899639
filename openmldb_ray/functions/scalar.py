"""Scalar function library (RowProjectPlan rebuild).

The reference JIT-compiles per-row scalar expressions
(nodes/RowProjectPlan.scala:40-264 delegating to hybridse/src/udf/udf.cc);
here every scalar function is a vectorized ``pyarrow.compute`` kernel
applied inside ``map_batches`` — no per-row Python in the hot path.

Registry surface mirrors hybridse/src/udf/default_udf_library.cc:
math (abs/ceil/floor/round/truncate/exp/ln/log2/log10/pow/sqrt/trig/
pmod/degrees/hex), string (concat/concat_ws/substr/strcmp/lower/upper/
char_length/replace/reverse/like_match/regexp_like), date/time (year/
month/day/dayofweek/dayofyear/weekofyear/hour/minute/second/date_format/
datediff/unix_timestamp), null/conditional (is_null/if_null/nvl2/if),
casts, hash64/farm_fingerprint.

User-extension surface (reference: external .so UDFs,
SparkPlanner.scala:349-378): ``register(name, fn)`` adds any
array-in/array-out callable to the same registry.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

REGISTRY: dict[str, Callable] = {}


def register(name: str, fn: Callable, *aliases: str) -> None:
    REGISTRY[name] = fn
    for a in aliases:
        REGISTRY[a] = fn


def get(name: str) -> Callable:
    return REGISTRY[name]


def _arr(x):
    return x if isinstance(x, (pa.Array, pa.ChunkedArray)) else pa.scalar(x)


# ---- math -----------------------------------------------------------------
register("abs", pc.abs)
register("ceil", lambda x: pc.ceil(x), "ceiling")
register("floor", pc.floor)
register("round", lambda x, nd=0: pc.round(x, ndigits=nd))
register("truncate", lambda x: pc.trunc(x))
register("exp", pc.exp)
register("ln", pc.ln)


def _log(a, b=None):
    """log(expr) = natural log; log(base, expr) = ln(expr)/ln(base)
    (reference default_udf_library.cc:1234-1281 — note base-first arg order)."""
    if b is None:
        return pc.ln(pc.cast(a, pa.float64()))
    return pc.divide(pc.ln(pc.cast(b, pa.float64())),
                     pc.ln(pc.cast(a, pa.float64())))


register("log", _log)
register("log2", pc.log2)
register("log10", pc.log10)
register("pow", pc.power, "power")
register("sqrt", pc.sqrt)
register("sin", pc.sin)
register("cos", pc.cos)
register("tan", pc.tan)
register("cot", lambda x: pc.divide(pc.cos(x), pc.sin(x)))
register("asin", pc.asin)
register("acos", pc.acos)
register("atan", pc.atan)
register("atan2", pc.atan2)
register("pmod", lambda x, y: pc.subtract(x, pc.multiply(
    pc.floor(pc.divide(pc.cast(x, pa.float64()), pc.cast(y, pa.float64()))),
    pc.cast(y, pa.float64()))))
register("degrees", lambda x: pc.multiply(pc.cast(x, pa.float64()), 180.0 / np.pi))


def _hash64(x) -> pa.Array:
    """hash64 / farm_fingerprint equivalent: deterministic 64-bit hash of the
    string form (not the reference's exact farmhash bits — documented delta)."""
    import hashlib

    vals = pc.cast(x, pa.string()).to_pylist() if isinstance(x, (pa.Array, pa.ChunkedArray)) else [str(x)]
    out = [None if v is None else
           int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(), "big") - (1 << 63)
           for v in vals]
    return pa.array(out, type=pa.int64())


register("hash64", _hash64, "farm_fingerprint")

# ---- string ---------------------------------------------------------------
register("concat", lambda *xs: pc.binary_join_element_wise(
    *[pc.cast(x, pa.string()) for x in xs], ""))
register("concat_ws", lambda sep, *xs: pc.binary_join_element_wise(
    *[pc.cast(x, pa.string()) for x in xs], sep))
register("substr", lambda s, pos, length=None:
         pc.utf8_slice_codeunits(s, start=pos - 1,
                                 stop=(pos - 1 + length) if length is not None else None),
         "substring")
register("strcmp", lambda a, b: pc.cast(
    pc.subtract(pc.cast(pc.greater(a, b), pa.int32()),
                pc.cast(pc.less(a, b), pa.int32())), pa.int32()))
register("lower", pc.utf8_lower, "lcase")
register("upper", pc.utf8_upper, "ucase")
register("char_length", pc.utf8_length, "character_length")
register("replace", lambda s, pat, rep="": pc.replace_substring(s, pattern=pat, replacement=rep))
register("reverse", pc.utf8_reverse)
register("like_match", lambda s, pat: pc.match_like(s, pat))
register("ilike_match", lambda s, pat: pc.match_like(s, pat, ignore_case=True))
register("regexp_like", lambda s, pat: pc.match_substring_regex(s, pat))


def _char(code) -> pa.Array:
    """char(n) → the character with code n % 256 (udf.cc:258 int_to_char)."""
    vals = code.to_pylist() if hasattr(code, "to_pylist") else [code]
    return pa.array([None if v is None else chr(int(v) % 256) for v in vals],
                    type=pa.string())


register("char", _char)

_HEXCHARS = set("0123456789abcdefABCDEF")


def _hex(s) -> pa.Array:
    """hex(str): per-character uppercase hex of the string's bytes, no
    zero-padding below 0x10 (udf.cc:60-69)."""
    vals = s.to_pylist() if hasattr(s, "to_pylist") else [s]
    return pa.array(
        [None if v is None else
         "".join(format(b, "X") for b in str(v).encode("utf-8"))
         for v in vals], type=pa.string())


def _unhex_one(v: str):
    if any(c not in _HEXCHARS for c in v):
        return None  # any non-hex character → NULL (udf.cc:71-82)
    if len(v) % 2:  # odd length: first char is a lone low nibble (udf.cc:96)
        return (bytes([int(v[0], 16)]) + bytes.fromhex(v[1:])).decode("latin-1")
    return bytes.fromhex(v).decode("latin-1")


def _unhex(s) -> pa.Array:
    vals = s.to_pylist() if hasattr(s, "to_pylist") else [s]
    return pa.array([None if v is None else _unhex_one(str(v)) for v in vals],
                    type=pa.string())


register("hex", _hex)
register("unhex", _unhex)

# ---- date / time (inputs: timestamp or int64 epoch-ms) --------------------


def _as_ts(x):
    t = x.type if hasattr(x, "type") else None
    if t is not None and pa.types.is_integer(t):
        return pc.cast(pc.multiply(x, 1000), pa.timestamp("us"))
    return x


register("year", lambda x: pc.cast(pc.year(_as_ts(x)), pa.int32()))
register("month", lambda x: pc.cast(pc.month(_as_ts(x)), pa.int32()))
register("day", lambda x: pc.cast(pc.day(_as_ts(x)), pa.int32()), "dayofmonth")
# MySQL-style DOW: 1=Sunday..7=Saturday (udf.cc dayofweek)
register("dayofweek", lambda x: pc.cast(pc.add(
    pc.day_of_week(_as_ts(x), count_from_zero=True, week_start=7), 1), pa.int32()))
register("dayofyear", lambda x: pc.cast(pc.day_of_year(_as_ts(x)), pa.int32()))
register("weekofyear", lambda x: pc.cast(pc.iso_week(_as_ts(x)), pa.int32()), "week")
register("hour", lambda x: pc.cast(pc.hour(_as_ts(x)), pa.int32()))
register("minute", lambda x: pc.cast(pc.minute(_as_ts(x)), pa.int32()))
register("second", lambda x: pc.cast(pc.second(_as_ts(x)), pa.int32()))
register("date_format", lambda x, fmt: pc.strftime(_as_ts(x), format=fmt))
register("datediff", lambda a, b: pc.cast(pc.days_between(_as_ts(b), _as_ts(a)), pa.int32()))
register("unix_timestamp", lambda x: pc.divide(pc.cast(pc.cast(_as_ts(x), pa.timestamp("ms")), pa.int64()), 1000))
register("last_day", lambda x: pc.cast(pc.subtract(
    pc.ceil_temporal(_as_ts(x), unit="month", ceil_is_strictly_greater=True),
    pa.scalar(86400000000, pa.duration("us"))), pa.date32()))
register("date", lambda x: pc.cast(_as_ts(x), pa.date32()))
register("timestamp", lambda x: pc.cast(_as_ts(x), pa.timestamp("ms")))

# ---- null / conditional ---------------------------------------------------
register("is_null", pc.is_null, "isnull")
register("if_null", lambda x, d: pc.coalesce(x, d), "ifnull", "nvl")
register("nvl2", lambda x, a, b: pc.if_else(pc.is_valid(x), a, b))
register("if", lambda c, a, b: pc.if_else(c, a, b))

# ---- casts ----------------------------------------------------------------
register("bool", lambda x: pc.cast(x, pa.bool_()))
register("int16", lambda x: pc.cast(x, pa.int16()))
register("int32", lambda x: pc.cast(x, pa.int32()))
register("int64", lambda x: pc.cast(x, pa.int64()))
register("float", lambda x: pc.cast(x, pa.float32()))
register("double", lambda x: pc.cast(x, pa.float64()))
register("string", lambda x: pc.cast(x, pa.string()))

# ---- feature-zero string-feature family -----------------------------------
# (reference: hybridse/src/udf/default_defs/feature_zero_def.cc:558-676 —
# split / split_by_key / split_by_value / join, fz_* aliases)
register("split", lambda s, delim: pc.split_pattern(s, pattern=delim), "fz_split")


def _split_kv(s, delim: str, kv_delim: str, want: int) -> pa.Array:
    vals = s.to_pylist() if hasattr(s, "to_pylist") else list(s)
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        parts = []
        for item in str(v).split(delim):
            kv = item.split(kv_delim, 1)
            if len(kv) == 2:
                parts.append(kv[want])
        out.append(parts)
    return pa.array(out, type=pa.list_(pa.string()))


register("split_by_key", lambda s, d, kd: _split_kv(s, d, kd, 0), "fz_split_by_key")
register("split_by_value", lambda s, d, kd: _split_kv(s, d, kd, 1), "fz_split_by_value")


def _join_list(lst, delim: str) -> pa.Array:
    vals = lst.to_pylist() if hasattr(lst, "to_pylist") else list(lst)
    return pa.array(
        [None if v is None else delim.join("" if x is None else str(x) for x in v)
         for v in vals], type=pa.string())


register("join", _join_list, "fz_join")

# ---- array / list ---------------------------------------------------------
register("size", lambda x: pc.cast(pc.list_value_length(x), pa.int32()))


def _array_contains(lst, val) -> pa.Array:
    idx = pc.index_in(pc.list_flatten(lst), value_set=pa.array([val]))
    # fall back to python for correctness across nested offsets
    pys = lst.to_pylist() if hasattr(lst, "to_pylist") else lst
    return pa.array([None if v is None else (val in v) for v in pys], type=pa.bool_())


register("array_contains", _array_contains)


def project(ds, exprs: dict[str, Callable], keep: list[str] | None = None):
    """Apply named scalar expressions: each value is fn(table) -> Array.
    Equivalent of a RowProjectPlan node — one stateless map_batches."""

    def fn(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        for c in (keep or []):
            arrays.append(t[c].combine_chunks())
            names.append(c)
        for name, e in exprs.items():
            col = e(t)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            arrays.append(col)
            names.append(name)
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
