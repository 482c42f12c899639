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

#: env var carrying os.pathsep-joined external UDF module paths — set by
#: register_external and inherited by Ray workers (local mode) so worker
#: processes can lazily re-load the same modules on a registry miss
EXTERNAL_UDFS_ENV = "OMR_EXTERNAL_UDFS"
_external_loaded: set[str] = set()
_EXTERNAL_FNS: dict[str, Callable] = {}


def external_snapshot() -> dict[str, Callable]:
    """Externally-registered UDFs (name → fn) for shipping into worker
    processes (the SQL Evaluator captures this at plan time)."""
    return dict(_EXTERNAL_FNS)


def register(name: str, fn: Callable, *aliases: str) -> None:
    REGISTRY[name] = fn
    for a in aliases:
        REGISTRY[a] = fn


def _load_module_udfs(path: str) -> dict[str, Callable]:
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "omr_udf_" + os.path.basename(path).replace(".", "_"), path)
    if spec is None or spec.loader is None:
        raise ValueError(f"register_external: cannot load module {path!r}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    udfs = getattr(mod, "OMR_UDFS", None)
    if udfs is None:
        udfs = {n: f for n, f in vars(mod).items()
                if callable(f) and not n.startswith("_")}
    return dict(udfs)


def register_external(path: str, *, names: list[str] | None = None,
                      prefix: str = "") -> list[str]:
    """Register scalar UDFs from a Python module FILE — the environment's
    analog of the reference's external ``.so`` registration
    (SparkPlanner.scala:349-378 ``Engine.RegisterExternalFunction``;
    hybridse/src/udf/dynamic_lib_manager.h). The module may declare
    ``OMR_UDFS = {"name": callable, ...}``; otherwise every public
    top-level callable registers under its own name. Functions must be
    vectorized (Arrow/numpy array in → array out) like every registry
    kernel.

    Worker visibility mirrors the reference's .so contract (the library
    file must exist on every executor): the path is appended to the
    ``OMR_EXTERNAL_UDFS`` env var, which Ray workers inherit, and
    :func:`get` lazily re-loads it on a registry miss inside the worker
    process — so external UDFs work through the SQL engine's per-process
    resolution too. Returns the registered names."""
    import os

    udfs = _load_module_udfs(path)
    if names is not None:
        missing = sorted(set(names) - set(udfs))
        if missing:
            raise ValueError(
                f"register_external: {path!r} does not define {missing}")
        udfs = {n: udfs[n] for n in names}
    out = []
    for n, f in udfs.items():
        register(prefix + n, f)
        _EXTERNAL_FNS[prefix + n] = f
        out.append(prefix + n)
    # env entry carries the prefix too ("prefix|path") so a worker-side
    # lazy reload registers the same names the driver did
    entry = f"{prefix}|{os.path.abspath(path)}"
    existing = [p for p in os.environ.get(EXTERNAL_UDFS_ENV, "")
                .split(os.pathsep) if p]
    if entry not in existing:
        os.environ[EXTERNAL_UDFS_ENV] = os.pathsep.join(existing + [entry])
    _external_loaded.add(entry)
    return sorted(out)


def _load_externals_from_env() -> bool:
    """Load any env-announced external UDF modules this process has not
    seen yet; returns True if anything new was registered."""
    import os

    new = False
    for entry in os.environ.get(EXTERNAL_UDFS_ENV, "").split(os.pathsep):
        if not entry or entry in _external_loaded:
            continue
        _external_loaded.add(entry)
        prefix, _, p = entry.partition("|")
        if not p or not os.path.exists(p):
            continue   # not present on this node — same failure mode as
            # a missing .so on an executor; the KeyError below says which
            # function is unresolved
        for n, f in _load_module_udfs(p).items():
            register(prefix + n, f)
            new = True
    return new


def get(name: str) -> Callable:
    try:
        return REGISTRY[name]
    except KeyError:
        if _load_externals_from_env():
            return REGISTRY[name]   # may raise KeyError again: correct
        raise


def _arr(x):
    return x if isinstance(x, (pa.Array, pa.ChunkedArray)) else pa.scalar(x)


# ---- math -----------------------------------------------------------------
register("abs", pc.abs)
register("ceil", lambda x: pc.ceil(x), "ceiling")
register("floor", pc.floor)
register("round", lambda x, nd=0: pc.round(
    x, ndigits=nd, round_mode="half_towards_infinity"))  # C round(): half away from zero
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
    """hash64 / farm_fingerprint: bit-exact FarmHash Fingerprint64 over the
    value's raw little-endian bytes (udf.cc:1418 + literal_traits.h:462-527:
    numerics by sizeof, Timestamp -> int64 ms, Date -> packed
    (y-1900)<<16|(m-1)<<8|d int32, string -> utf8 bytes). Fixed-width types
    take the vectorized numpy path; strings hash per row.
    Verified against test_udf_function.yaml ids 4/5 vectors."""
    from .farmhash import fingerprint64, fingerprint64_fixed

    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        x = pa.array([x])
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    t = x.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        out = [None if v is None else _u2i64(fingerprint64(v.encode()))
               for v in x.to_pylist()]
        return pa.array(out, type=pa.int64())

    if pa.types.is_date32(t):
        packed = pc.add(pc.add(
            pc.shift_left(pc.subtract(pc.year(x), 1900), 16),
            pc.shift_left(pc.subtract(pc.month(x), 1), 8)), pc.day(x))
        x, t = pc.cast(packed, pa.int32()), pa.int32()
    elif pa.types.is_timestamp(t):
        x, t = pc.cast(pc.cast(x, pa.timestamp("ms")), pa.int64()), pa.int64()

    _widths = {pa.int16(): (np.int16, np.uint16, 2),
               pa.int32(): (np.int32, np.uint32, 4),
               pa.int64(): (np.int64, np.uint64, 8),
               pa.float32(): (np.float32, np.uint32, 4),
               pa.float64(): (np.float64, np.uint64, 8),
               pa.bool_(): (np.bool_, np.uint8, 1)}
    if t not in _widths:  # e.g. int8 widened by SQL layer; fall back to int32
        x, t = pc.cast(x, pa.int32()), pa.int32()
    dt, ut, w = _widths[t]
    nulls = pc.is_null(x)
    vals = x.fill_null(False if t == pa.bool_() else 0) \
            .to_numpy(zero_copy_only=False).astype(dt).view(ut) \
            .astype(np.uint64)
    h = fingerprint64_fixed(vals, w).view(np.int64)
    return pa.array(h, type=pa.int64(), mask=np.asarray(nulls.to_pylist(),
                                                        dtype=bool))


def _u2i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


register("hash64", _hash64, "farm_fingerprint")

# ---- string ---------------------------------------------------------------
register("concat", lambda *xs: pc.binary_join_element_wise(
    *[to_string_sql(x) for x in xs], ""))
register("concat_ws", lambda sep, *xs: pc.binary_join_element_wise(
    *[to_string_sql(x) for x in xs],
    to_string_sql(sep) if not isinstance(sep, str) else sep))
def _substr(s, pos, length=None):
    """substr/substring (udf.cc:1048-1097): 1-based ``pos``; ``pos == 0``,
    ``len < 1`` or out-of-range ``pos`` -> EMPTY string (not NULL); negative
    ``pos`` counts from the end; NULL input or NULL pos/len -> NULL.
    Column-valued pos/len supported (test_udf_function.yaml id 0)."""
    pos_arr = isinstance(pos, (pa.Array, pa.ChunkedArray))
    len_arr = isinstance(length, (pa.Array, pa.ChunkedArray))
    s_arr = isinstance(s, (pa.Array, pa.ChunkedArray))
    if (s_arr and not pos_arr and not len_arr and pos is not None
            and pos > 0 and (length is None or length >= 1)):
        # vectorized fast path for the common literal case
        return pc.utf8_slice_codeunits(
            s, start=pos - 1,
            stop=(pos - 1 + length) if length is not None else None)
    if s_arr:
        n = len(s)
        vals = s.to_pylist()
    else:
        # constant string with a column/expression pos or len (a literal
        # like -2 arrives as an evaluated UnaryOp ARRAY, so the all-scalar
        # broadcast in _eval_func doesn't fire)
        n = len(pos) if pos_arr else (len(length) if len_arr else 1)
        vals = [s] * n
    poss = pos.to_pylist() if pos_arr else [pos] * n
    lens = (length.to_pylist() if len_arr
            else [length] * n)
    has_len = length is not None or len_arr
    out = []
    for v, p, L in zip(vals, poss, lens):
        if v is None or p is None or (has_len and L is None):
            out.append(None)
            continue
        sz = len(v)
        if p == 0 or (has_len and L < 1) or p > sz or p < -sz:
            out.append("")
            continue
        start = sz + p if p < 0 else p - 1
        stop = min(start + L, sz) if has_len else sz
        out.append(v[start:stop])
    return pa.array(out, pa.string())


register("substr", _substr, "substring")
def _strcmp(a, b):
    if a is None or b is None:  # NULL literal operand -> NULL (not an error)
        return None
    for v in (a, b):
        t = getattr(v, "type", None)
        if t is not None and not (pa.types.is_string(t)
                                  or pa.types.is_null(t)):
            raise ValueError("strcmp requires string operands (reference parity)")
        if t is None and not isinstance(v, str):
            raise ValueError("strcmp requires string operands (reference parity)")
    return pc.cast(pc.subtract(pc.cast(pc.greater(a, b), pa.int32()),
                               pc.cast(pc.less(a, b), pa.int32())), pa.int32())


register("strcmp", _strcmp)
register("lower", pc.utf8_lower, "lcase")
register("upper", pc.utf8_upper, "ucase")
register("char_length", pc.utf8_length, "character_length")
def _broadcast_list(v, n: int) -> list:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v.to_pylist()
    return [v] * n


def _replace(s, pat, rep=""):
    """replace(str, search[, replacement]) — 2-arg form removes. Runtime
    (column / NULL-valued expression) search/replacement args propagate
    NULL per row (cases/query/udf_query.yaml udf_replace rp4/rp5)."""
    if (pat is None or rep is None
            or isinstance(pat, (pa.Array, pa.ChunkedArray))
            or isinstance(rep, (pa.Array, pa.ChunkedArray))):
        sv = s.to_pylist()
        n = len(sv)
        pv, rv = _broadcast_list(pat, n), _broadcast_list(rep, n)
        return pa.array([None if (a is None or p is None or r is None)
                         else a.replace(p, r)
                         for a, p, r in zip(sv, pv, rv)], pa.string())
    return pc.replace_substring(s, pattern=pat, replacement=rep)


register("replace", _replace)
register("reverse", pc.utf8_reverse)


def like_to_regex(pattern: str, escape: str | None) -> str:
    """SQL LIKE pattern -> RE2 full-match body. escape=None/'' disables
    escaping (reference like_match semantics, udf.cc kLikeMatch)."""
    import re as _re

    out = []
    i = 0
    esc = escape if escape else None
    while i < len(pattern):
        ch = pattern[i]
        if esc and ch == esc:
            if i + 1 >= len(pattern):
                # dangling escape: the reference pattern matches nothing
                # (test_like.yaml id 29)
                return "[^\\s\\S]"  # RE2-safe never-match
            out.append(_re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(_re.escape(ch))
        i += 1
    return "".join(out)


def _like_rx(pattern, escape, ci: bool) -> str:
    if hasattr(pattern, "as_py"):
        pattern = pattern.as_py()
    if hasattr(escape, "as_py"):
        escape = escape.as_py()
    if pattern is None:
        # reference: NULL pattern is a compile error (test_like_match id 17)
        raise ValueError("like_match: NULL pattern (reference parity)")
    if escape is None:
        # explicit NULL escape is a compile error too (id 18); the 2-arg
        # form defaults to backslash before reaching here
        raise ValueError("like_match: NULL escape (reference parity)")
    if escape and len(escape) > 1:
        # multi-char escape matches nothing (test_like_match id 28)
        body = "[^\\s\\S]"  # RE2 has no lookahead; matches nothing
    else:
        body = like_to_regex(pattern, escape or None)
    return ("(?i)" if ci else "") + "^(?:" + body + ")$"


def _like_match_rows(s, pattern, escape, ci: bool) -> pa.Array:
    """Per-row like_match for runtime (array / NULL-valued) pattern or
    escape args: each NULL argument yields NULL for that row (udf_query.yaml
    like_udf_const_null_string; literal-NULL args stay compile errors in
    _like_rx, matching test_like_match ids 17/18)."""
    import re as _re

    sv = s.to_pylist()
    n = len(sv)
    pv, ev = _broadcast_list(pattern, n), _broadcast_list(escape, n)
    out = []
    rx_cache: dict = {}
    for a, p, esc in zip(sv, pv, ev):
        if a is None or p is None or esc is None:
            out.append(None)
            continue
        rx = rx_cache.get((p, esc))
        if rx is None:
            rx = rx_cache[(p, esc)] = _re.compile(_like_rx(p, esc, ci))
        out.append(bool(rx.match(a)))
    return pa.array(out, pa.bool_())


def _like_match(s, pattern, escape="\\"):
    """like_match(str, pattern[, escape]) — default escape backslash;
    empty-string escape disables escaping (reference udf docs)."""
    if isinstance(pattern, (pa.Array, pa.ChunkedArray)) or \
            isinstance(escape, (pa.Array, pa.ChunkedArray)):
        return _like_match_rows(s, pattern, escape, False)
    return pc.match_substring_regex(s, _like_rx(pattern, escape, False))


def to_string_sql(x):
    """SQL string conversion with reference formatting: timestamps as
    %Y-%m-%d %H:%M:%S in the engine timezone, dates as %Y-%m-%d, bools as
    true/false, floats shortest-round-trip (float32 via np.float32 repr)."""
    t = getattr(x, "type", None)
    if t is None:
        if x is None:  # literal NULL: propagate, never the string 'None'
            return pa.scalar(None, pa.string())
        if isinstance(x, bool):
            return pa.scalar("true" if x else "false")
        return pa.scalar(str(x))
    if pa.types.is_string(t):
        return x
    if pa.types.is_timestamp(t):
        ms = pc.cast(pc.cast(x, pa.timestamp("ms")), pa.int64())
        if _TZ_OFFSET_MS:
            ms = pc.add(ms, _TZ_OFFSET_MS)
        sec = pc.divide(ms, 1000)  # Arrow %S prints subseconds; truncate
        return pc.strftime(pc.cast(sec, pa.timestamp("s")),
                           format="%Y-%m-%d %H:%M:%S")
    if pa.types.is_date(t):
        return pc.strftime(pc.cast(x, pa.timestamp("ms")), format="%Y-%m-%d")
    if pa.types.is_boolean(t):
        n = len(x)
        return pc.if_else(x, pa.repeat(pa.scalar("true"), n),
                          pa.repeat(pa.scalar("false"), n))
    if pa.types.is_floating(t):
        is32 = pa.types.is_float32(t)
        vals = x.to_pylist() if hasattr(x, "to_pylist") else [x.as_py()]
        out = []
        for v in vals:
            if v is None:
                out.append(None)
            elif v != v:  # NaN
                out.append("nan")
            elif v == int(v) and abs(v) < 1e16:
                out.append(str(int(v)))
            else:
                out.append(repr(np.float32(v)) if is32 else repr(float(v)))
        return pa.array(out, pa.string())
    return pc.cast(x, pa.string())


def _ilike_match(s, pattern, escape="\\"):
    if isinstance(pattern, (pa.Array, pa.ChunkedArray)) or \
            isinstance(escape, (pa.Array, pa.ChunkedArray)):
        return _like_match_rows(s, pattern, escape, True)
    return pc.match_substring_regex(s, _like_rx(pattern, escape, True))


register("like_match", _like_match)
register("ilike_match", _ilike_match)
register("string", to_string_sql)
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


#: engine timezone offset for breaking epoch instants into civil fields
#: (year/hour/date_format/...). The reference uses the SYSTEM timezone; its
#: conformance corpus was recorded under UTC+8 (Asia/Shanghai), so the YAML
#: runner sets +8h. Driver pipelines keep 0 (UTC).
_TZ_OFFSET_MS = 0


def set_timezone_offset_ms(ms: int) -> None:
    global _TZ_OFFSET_MS
    _TZ_OFFSET_MS = int(ms)


def get_timezone_offset_ms() -> int:
    return _TZ_OFFSET_MS


def _as_ts(x):
    """Accept timestamp / date / bigint(ms epoch); reject narrower ints,
    floats and strings (reference: date functions on smallint/int fail,
    cases/function/function/test_date.yaml ids 1/3/5)."""
    t = x.type if hasattr(x, "type") else None
    if t is not None and pa.types.is_date(t):
        return x
    if t is not None and pa.types.is_integer(t):
        if not pa.types.is_int64(t):
            raise ValueError(
                "date/time functions accept timestamp, date or bigint "
                "(ms epoch) — reference parity")
        us = pc.multiply(x, 1000)
    elif t is not None and pa.types.is_timestamp(t):
        us = pc.multiply(pc.cast(pc.cast(x, pa.timestamp("ms")), pa.int64()),
                         1000)
    elif isinstance(x, int):
        us = pa.scalar(x * 1000, pa.int64())
    else:
        raise ValueError(
            f"date/time functions accept timestamp, date or bigint, got {t}")
    if _TZ_OFFSET_MS:
        us = pc.add(pc.cast(us, pa.int64()), _TZ_OFFSET_MS * 1000)
    return pc.cast(us, pa.timestamp("us"))


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
def _date_format(x, fmt):
    """date_format accepts timestamp/date ONLY (unlike the field
    extractors, which also take bigint ms — test_date.yaml ids 1 vs 2)."""
    t = getattr(x, "type", None)
    if t is None or not (pa.types.is_timestamp(t) or pa.types.is_date(t)):
        raise ValueError("date_format requires timestamp or date "
                         "(reference parity)")
    sec = pc.divide(pc.cast(_as_ts(x), pa.timestamp("us")).cast(pa.int64()),
                    1000000)
    return pc.strftime(pc.cast(sec, pa.timestamp("s")), format=fmt)


register("date_format", _date_format)
register("datediff", lambda a, b: pc.cast(pc.days_between(_as_ts(b), _as_ts(a)), pa.int32()))
register("unix_timestamp", lambda x: pc.divide(pc.cast(pc.cast(_as_ts(x), pa.timestamp("ms")), pa.int64()), 1000))
register("last_day", lambda x: pc.cast(pc.subtract(
    pc.ceil_temporal(_as_ts(x), unit="month", ceil_is_strictly_greater=True),
    pa.scalar(86400000000, pa.duration("us"))), pa.date32()))
register("date", lambda x: pc.cast(_as_ts(x), pa.date32()))
register("timestamp", lambda x: pc.cast(_as_ts(x), pa.timestamp("ms")))

# ---- null / conditional ---------------------------------------------------
register("is_null", pc.is_null, "isnull")
# identity(x): pass-through (hybridse/src/udf/default_udf_library.cc; used
# by feature-zero generated SQL to pin an expression's evaluation)
register("identity", lambda x: x)
def _if_null(x, d):
    """ifnull/nvl: the reference requires value and default to have the
    SAME type — even int vs double is a compile error
    (cases/function/expression/test_condition.yaml ids 11-13; id 11-2 shows
    the matching-type success case)."""
    def _ty(v):
        t = getattr(v, "type", None)
        if t is not None:
            return t
        if isinstance(v, bool):
            return pa.bool_()
        if isinstance(v, int):
            # SQL literal typing: int32 unless it overflows (parser rule)
            return pa.int32() if -2**31 <= v < 2**31 else pa.int64()
        return pa.scalar(v).type
    tx, td = _ty(x), _ty(d)
    if not tx.equals(td):
        # strictly same type: even int32 vs bigint is a compile error
        # (test_condition.yaml id 12 bigint col + int literal -> fail,
        # id 10 int col + int literal -> ok)
        raise ValueError(
            "ifnull: value/default type mismatch (reference parity)")
    if not hasattr(d, "type"):
        d = pa.scalar(d, td)
    return pc.coalesce(x, d)


register("if_null", _if_null, "ifnull", "nvl")
register("nvl2", lambda x, a, b: pc.if_else(pc.is_valid(x), a, b))


def _require_strings(*vals):
    for v in vals:
        t = getattr(v, "type", None)
        if t is not None and not pa.types.is_string(t):
            raise ValueError("string function requires string operands "
                             "(reference parity)")
        if t is None and not isinstance(v, str):
            raise ValueError("string function requires string operands "
                             "(reference parity)")
register("if", lambda c, a, b: pc.if_else(c, a, b))

# expression-shorthand UDFs (default_udf_library.cc:2390,2463,2562,2574):
# add(x,y) = x + y; inc(x) = x + 1; minimum/maximum lower to the cond-expr
# x<y ? x : y — SQL null semantics (null comparand -> null), NOT the
# null-skipping min/max aggregate
register("add", lambda x, y: pc.add(x, y))
register("inc", lambda x: pc.add(x, 1))
register("minimum", lambda x, y: pc.if_else(pc.less(x, y), x, y))
register("maximum", lambda x, y: pc.if_else(pc.greater(x, y), x, y))


# ---- JSON extraction (engine extension; Spark/Hive get_json_object) -------
# The reference has no JSON UDFs; log-shaped training data (WARC metadata,
# event payloads) makes this table stakes. Path grammar: $ .field [idx],
# e.g. "$.a.b[2].c". Returns STRING: raw text for JSON scalars, compact
# JSON for objects/arrays; NULL for invalid JSON / missing path / JSON
# null (Spark semantics; matches DuckDB json_extract_string for oracles).
_JSONPATH_STEP = __import__("re").compile(r"\.([^.\[\]]+)|\[(\d+)\]")


def _parse_jsonpath(path: str):
    if not isinstance(path, str) or not path.startswith("$"):
        return None
    steps, pos = [], 1
    for m in _JSONPATH_STEP.finditer(path, 1):
        if m.start() != pos:
            return None
        steps.append(m.group(1) if m.group(1) is not None
                     else int(m.group(2)))
        pos = m.end()
    return steps if pos == len(path) else None


def _get_json_object(s, path):
    import json

    if hasattr(path, "as_py"):
        path = path.as_py()
    steps = _parse_jsonpath(path)
    vals = s.to_pylist() if hasattr(s, "to_pylist") else list(s)
    out = []
    for v in vals:
        if v is None or steps is None:
            out.append(None)
            continue
        try:
            cur = json.loads(v)
        except (ValueError, TypeError):
            out.append(None)
            continue
        for st in steps:
            if isinstance(st, str):
                if isinstance(cur, dict) and st in cur:
                    cur = cur[st]
                else:
                    cur = _JSON_MISS
                    break
            elif isinstance(cur, list) and 0 <= st < len(cur):
                cur = cur[st]
            else:
                cur = _JSON_MISS
                break
        if cur is _JSON_MISS or cur is None:
            out.append(None)
        elif isinstance(cur, str):
            out.append(cur)
        elif isinstance(cur, (dict, list, bool, int, float)):
            # ensure_ascii=False: Spark and DuckDB emit UTF-8 in
            # re-serialized objects, not \uXXXX escapes (fuzzer-found)
            out.append(json.dumps(cur, separators=(",", ":"),
                                  ensure_ascii=False))
        else:  # pragma: no cover — json.loads yields no other types
            out.append(str(cur))
    return pa.array(out, pa.string())


_JSON_MISS = object()

register("get_json_object", _get_json_object, "json_extract_string")

# ---- casts ----------------------------------------------------------------
register("bool", lambda x: pc.cast(x, pa.bool_()))
register("int16", lambda x: pc.cast(x, pa.int16()))
register("int32", lambda x: pc.cast(x, pa.int32()))
register("int64", lambda x: pc.cast(x, pa.int64()))
register("float", lambda x: pc.cast(x, pa.float32()))
register("double", lambda x: pc.cast(x, pa.float64()))
register("string", to_string_sql)  # SQL formatting rules (see above)

# ---- feature-zero string-feature family -----------------------------------
# (reference: hybridse/src/udf/default_defs/feature_zero_def.cc:558-676 —
# split / split_by_key / split_by_value / join, fz_* aliases)
def _split(s, delim):
    """fz_split: NULL input yields an EMPTY list, not NULL
    (test_feature_zero_function.yaml id 2: fz_join(fz_split(NULL)) = '');
    an empty delimiter yields empty lists (id 5: every fz_join over a
    ""-delimited split renders '')."""
    if delim == "":
        n = len(s)
        return pa.array([[]] * n, type=pa.list_(pa.string()))
    out = pc.split_pattern(s, pattern=delim)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    if out.null_count:
        vals = out.to_pylist()
        out = pa.array([v if v is not None else [] for v in vals], out.type)
    return out


register("split", _split, "fz_split", "split_array")


def _split_kv(s, delim: str, kv_delim: str, want: int) -> pa.Array:
    vals = s.to_pylist() if hasattr(s, "to_pylist") else list(s)
    out = []
    for v in vals:
        if v is None or delim == "" or kv_delim == "":
            out.append([])  # NULL / empty delimiter -> empty list
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
    """array_contains(array, value): python `in` gives the reference's
    NULL semantics for free — a NULL search value matches only arrays
    holding a NULL element (udf_query.yaml array_contains c9/c10)."""
    pys = lst.to_pylist() if hasattr(lst, "to_pylist") else lst
    if isinstance(val, (pa.Array, pa.ChunkedArray)):
        vv = val.to_pylist()
        return pa.array([None if l is None else (x in l)
                         for l, x in zip(pys, vv)], type=pa.bool_())
    if hasattr(val, "as_py"):
        val = val.as_py()
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
