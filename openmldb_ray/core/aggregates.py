"""Window / group UDAF library.

Re-implements the aggregate surface of the reference's UDF library
(hybridse/src/udf/default_udf_library.cc InitUdaf;
default_defs/feature_zero_def.cc:654-666 for top1_ratio/topn_frequency;
default_defs/*_by_category_def.cc for the *_cate family;
window_functions_def.cc:95-175 for lag/at/first_value).

Semantics notes (must-match):
- NULL inputs are skipped by every aggregate; ``count(col)`` counts
  non-null values, ``count_star`` counts rows.
- Window buffers are ordered NEWEST-FIRST: buffer index 0 is the current
  row. Hence ``first_value(col)`` returns the CURRENT row's value and
  ``lag(col, n) == at(col, n)`` is the value n rows before the current
  one *within the window buffer* (window_functions_def.cc:95-175).
- ``top(col, k)`` returns the k largest values as a comma-joined string,
  descending. ``topn_frequency(col, k)`` returns the k most frequent
  values comma-joined (count desc, value asc tiebreak). ``top1_ratio`` is
  most-frequent-count / non-null-count.
- ``*_cate(value, cat)`` returns "cat1:agg,cat2:agg" with categories
  sorted ascending; ``*_cate_where`` filters rows by a bool condition
  column first.
- ``lead`` is NOT in the reference (an extension required by the north
  rule); it is resolved at the partition level (forward shift), not from
  the window buffer, and is flagged non-point-in-time.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Aggregate specification


@dataclass(frozen=True)
class AggSpec:
    kind: str                 # one of KINDS below
    name: str                 # output column name
    col: str | None = None    # input value column (None for count_star)
    cond: str | None = None   # bool condition column for *_where
    cat: str | None = None    # category column for *_cate
    k: int | None = None      # k for top/topn_frequency, offset for lag/at/lead
    delim: str | None = None     # delimiter for window_split*
    kv_delim: str | None = None  # kv delimiter for window_split_by_key/value
    # render hints for string-producing aggregates (cate/top_n families):
    # source column type kinds ("int"/"float"/"bool"/"string"/"timestamp"/
    # "date") + civil-time offset. None -> numpy-dtype heuristic.
    val_t: str | None = None
    cat_t: str | None = None
    tz_ms: int = 0
    # composite window expressions (reference: nested UDAF codegen,
    # test_udaf_function.yaml ids 42/43/49/53): when set, the value /
    # condition role is a per-frame expression instead of a plain column.
    # Inside one output row's frame, inner aggregates reduce the SAME frame
    # to constants; the expression then evaluates element-wise over the
    # frame rows and the outer ``kind`` reduces the result. Exact-kernel
    # only (fast path rejects these).
    expr: "FrameExpr | None" = None       # value role
    cond_expr: "FrameExpr | None" = None  # condition role


@dataclass(frozen=True)
class FrameExpr:
    """A per-frame expression for a composite aggregate argument.

    ``fn(sliced_cols, consts, n) -> (vals ndarray, valid ndarray)`` where
    ``sliced_cols`` maps each name in ``cols`` to that column's
    (values, valid) pair restricted to the frame, ``consts`` maps each
    inner spec's name to its frame-reduced python scalar, and ``n`` is the
    frame length. ``inner`` are the nested AggSpecs. ``seq`` names a
    sequence-valued inner (window_split family) whose token list IS the
    value sequence (fused UDAF-of-UDAF composition, e.g.
    ``distinct_count(fz_window_split(c1, ","))``); ``fn`` is unused then.
    """

    fn: object = None
    cols: tuple = ()
    inner: tuple = ()
    seq: str | None = None
    # (name, pyarrow.DataType) pairs typing each inner constant — needed so
    # a NULL inner result (e.g. first_value over strings) keeps its column
    # type through strict-typed fns like ifnull (test_udaf ids 47/48).
    # Filled by the SQL layer once input types are known.
    const_types: tuple = ()


SEQ_KINDS = {"window_split", "window_split_by_key", "window_split_by_value"}


def spec_has_expr(spec: AggSpec) -> bool:
    return spec.expr is not None or spec.cond_expr is not None


def iter_specs_deep(aggs):
    """Yield every spec including nested inner specs (recursive)."""
    for a in aggs:
        yield a
        for fe in (a.expr, a.cond_expr):
            if fe is not None:
                yield from iter_specs_deep(fe.inner)


def spec_columns(spec: AggSpec):
    """Physical input columns this spec (incl. nested exprs) reads."""
    for a in iter_specs_deep([spec]):
        for c in (a.col, a.cond, a.cat):
            if c:
                yield c
        for fe in (a.expr, a.cond_expr):
            if fe is not None:
                yield from fe.cols


KINDS = {
    "sum", "count", "count_star", "avg", "min", "max",
    "sum_where", "count_where", "avg_where", "min_where", "max_where",
    "distinct_count", "median", "top", "topn_frequency", "top1_ratio",
    "lag", "at", "first_value", "lead",
    "sum_cate", "count_cate", "avg_cate", "min_cate", "max_cate",
    "sum_cate_where", "count_cate_where", "avg_cate_where",
    "min_cate_where", "max_cate_where",
    "window_split", "window_split_by_key", "window_split_by_value",
    *(f"top_n_{m}_{b}_cate_where" for m in ("key", "value")
      for b in ("sum", "count", "avg", "min", "max")),
}

#: aggregates the vectorized kernel (window_fast) implements
FAST_KINDS = {"sum", "count", "count_star", "avg", "min", "max", "median",
              "lag", "at", "first_value", "lead"}


class Agg:
    """Convenience constructors: ``Agg.sum("v", "sum_v")`` etc."""

    @staticmethod
    def _mk(kind, col=None, name=None, **kw):
        if name is None:
            name = f"{kind}_{col}" if col else kind
        return AggSpec(kind=kind, name=name, col=col, **kw)

    @classmethod
    def sum(cls, col, name=None):
        return cls._mk("sum", col, name)

    @classmethod
    def count(cls, col, name=None):
        return cls._mk("count", col, name)

    @classmethod
    def count_star(cls, name="count_star"):
        return AggSpec(kind="count_star", name=name)

    @classmethod
    def avg(cls, col, name=None):
        return cls._mk("avg", col, name)

    @classmethod
    def min(cls, col, name=None):
        return cls._mk("min", col, name)

    @classmethod
    def max(cls, col, name=None):
        return cls._mk("max", col, name)

    @classmethod
    def sum_where(cls, col, cond, name=None):
        return cls._mk("sum_where", col, name, cond=cond)

    @classmethod
    def count_where(cls, col, cond, name=None):
        return cls._mk("count_where", col, name, cond=cond)

    @classmethod
    def avg_where(cls, col, cond, name=None):
        return cls._mk("avg_where", col, name, cond=cond)

    @classmethod
    def min_where(cls, col, cond, name=None):
        return cls._mk("min_where", col, name, cond=cond)

    @classmethod
    def max_where(cls, col, cond, name=None):
        return cls._mk("max_where", col, name, cond=cond)

    @classmethod
    def distinct_count(cls, col, name=None):
        return cls._mk("distinct_count", col, name)

    @classmethod
    def median(cls, col, name=None):
        return cls._mk("median", col, name)

    @classmethod
    def top(cls, col, k, name=None):
        return cls._mk("top", col, name, k=k)

    @classmethod
    def topn_frequency(cls, col, k, name=None):
        return cls._mk("topn_frequency", col, name, k=k)

    @classmethod
    def top1_ratio(cls, col, name=None):
        return cls._mk("top1_ratio", col, name)

    @classmethod
    def lag(cls, col, n, name=None):
        return cls._mk("lag", col, name or f"lag{n}_{col}", k=n)

    @classmethod
    def at(cls, col, n, name=None):
        return cls._mk("at", col, name or f"at{n}_{col}", k=n)

    @classmethod
    def first_value(cls, col, name=None):
        return cls._mk("first_value", col, name)

    @classmethod
    def lead(cls, col, n, name=None):
        return cls._mk("lead", col, name or f"lead{n}_{col}", k=n)

    @classmethod
    def window_split(cls, col, delim, name=None):
        return cls._mk("window_split", col, name, delim=delim)

    @classmethod
    def window_split_by_key(cls, col, delim, kv_delim, name=None):
        return cls._mk("window_split_by_key", col, name, delim=delim, kv_delim=kv_delim)

    @classmethod
    def window_split_by_value(cls, col, delim, kv_delim, name=None):
        return cls._mk("window_split_by_value", col, name, delim=delim, kv_delim=kv_delim)

    @classmethod
    def cate(cls, kind, col, cat, name=None, cond=None):
        base = f"{kind}_cate" + ("_where" if cond else "")
        return cls._mk(base, col, name, cat=cat, cond=cond)

    @classmethod
    def top_n_cate(cls, base, col, cond, cat, n, by="key", name=None):
        """``top_n_{key|value}_{base}_cate_where(value, cond, cat, n)``
        (reference default_defs/*_by_category_def.cc + containers.h)."""
        kind = f"top_n_{by}_{base}_cate_where"
        return cls._mk(kind, col, name, cond=cond, cat=cat, k=n)


# ---------------------------------------------------------------------------
# Exact per-window evaluators (used by window_exact over buffer index lists)
#
# Columns are passed as dict name -> (values: np.ndarray, valid: np.ndarray).
# ``idx`` is the int array of window row positions, newest first (0=current).


def _vals(cols, col, idx):
    v, ok = cols[col]
    sel = idx[ok[idx]]
    return v[sel]


def _where_idx(cols, cond, idx):
    cv, cok = cols[cond]
    keep = cok[idx] & (cv[idx].astype(bool))
    return idx[keep]


def _fmt_num(x) -> str:
    """Format a value the way the reference renders it in top()/cate strings."""
    if isinstance(x, (float, np.floating)):
        f = float(x)
        return str(int(f)) if f.is_integer() else repr(f)
    if isinstance(x, (bool, np.bool_)):
        return str(bool(x)).lower()
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    return str(x)


def _fmt_ref(x) -> str:
    """Reference-exact value rendering (v1::format_string): floats print as
    printf %f (6 decimals) — used by the top_n_*_cate_where family whose
    golden cases (udaf_test.cc) pin that format, e.g. 'x:4.500000'."""
    if isinstance(x, (bool, np.bool_)):
        return "true" if x else "false"
    if isinstance(x, (float, np.floating)):
        return f"{float(x):f}"
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    return str(x)


def _fmt_typed(x, t: str | None, tz_ms: int = 0) -> str:
    """Render a key/value with its SOURCE column type (reference
    v1::format_string semantics: ints bare, floats %f, bools true/false,
    timestamps civil %Y-%m-%d %H:%M:%S in the engine timezone)."""
    if t is None:
        return _fmt_ref(x)
    if t == "int":
        return str(int(x))
    if t == "float":
        return f"{float(x):f}"
    if t == "bool":
        return "true" if x else "false"
    if t == "timestamp":
        ts = pd.Timestamp(x)
        if tz_ms:
            ts = ts + pd.Timedelta(milliseconds=tz_ms)
        return ts.strftime("%Y-%m-%d %H:%M:%S")
    if t == "date":
        return pd.Timestamp(x).strftime("%Y-%m-%d")
    return str(x)


def _fmt_cate_val(x, base: str, val_t: str | None) -> str:
    """Aggregate-result rendering in cate strings: count -> int,
    avg -> %f, sum/min/max follow the value column's type
    (cases/function/function/test_udaf_function.yaml ids 20/24/34).
    Without a type hint (direct API use), keep the compact legacy
    rendering."""
    if base == "count":
        return str(int(x))
    if val_t is None:
        return _fmt_num(x)
    if base == "avg":
        return f"{float(x):f}"
    return _fmt_typed(x, val_t)


def _agg_scalar(kind, arr):
    if arr.size == 0:
        return None
    if kind == "sum":
        return arr.sum()
    if kind == "avg":
        return float(arr.sum()) / arr.size
    if kind == "min":
        return arr.min()
    if kind == "max":
        return arr.max()
    if kind == "count":
        return arr.size
    raise AssertionError(kind)


def _make_inner_evals(fe: FrameExpr):
    out = []
    for ispec in fe.inner:
        mode = ("pos" if ispec.kind in ("lag", "at")
                else "expr" if spec_has_expr(ispec) else "frame")
        out.append((ispec.name, mode, make_evaluator(ispec)))
    return out


def _eval_frame_expr(fe: FrameExpr, inner_evals, cols, idx, idx_pos):
    consts = {}
    for name, mode, iev in inner_evals:
        if mode == "pos":
            consts[name] = iev(cols, idx_pos if idx_pos is not None else idx)
        elif mode == "expr":
            consts[name] = iev(cols, idx, idx_pos)
        else:
            consts[name] = iev(cols, idx)
    if fe.seq is not None:
        tokens = consts[fe.seq] or []
        vals = np.asarray(tokens, dtype=object)
        valid = np.asarray([t is not None for t in tokens], dtype=bool)
        return vals, valid
    sliced = {c: (cols[c][0][idx], cols[c][1][idx]) for c in fe.cols}
    return fe.fn(sliced, consts, int(idx.size), dict(fe.const_types))


def make_evaluator(spec: AggSpec):
    """Return fn(cols, idx) -> python scalar (None = NULL).

    Specs with a FrameExpr (composite window expressions) take
    ``fn(cols, idx, idx_pos=None)`` instead: the expression evaluates over
    the frame view, then the base kind reduces it."""
    if spec_has_expr(spec):
        import dataclasses

        base = dataclasses.replace(
            spec, expr=None, cond_expr=None,
            col="__fe_v" if spec.expr is not None else spec.col,
            cond="__fe_c" if spec.cond_expr is not None else spec.cond)
        base_ev = make_evaluator(base)
        v_in = (_make_inner_evals(spec.expr)
                if spec.expr is not None else None)
        c_in = (_make_inner_evals(spec.cond_expr)
                if spec.cond_expr is not None else None)
        plain = [c for c in (base.col, base.cond, base.cat)
                 if c and not c.startswith("__fe_")]

        def ev(cols, idx, idx_pos=None):
            ncols = {c: (cols[c][0][idx], cols[c][1][idx]) for c in plain}
            n = int(idx.size)
            if spec.expr is not None:
                v, ok = _eval_frame_expr(spec.expr, v_in, cols, idx, idx_pos)
                ncols["__fe_v"] = (v, ok)
                n = len(v)
            if spec.cond_expr is not None:
                cv, cok = _eval_frame_expr(spec.cond_expr, c_in, cols, idx,
                                           idx_pos)
                ncols["__fe_c"] = (cv, cok)
            return base_ev(ncols, np.arange(n, dtype=np.int64))
        return ev

    kind, col, cond, cat, k = spec.kind, spec.col, spec.cond, spec.cat, spec.k

    if kind == "count_star":
        return lambda cols, idx: int(idx.size)

    if kind in ("sum", "avg", "min", "max", "count"):
        def ev(cols, idx, kind=kind):
            arr = _vals(cols, col, idx)
            out = _agg_scalar(kind, arr)
            return None if out is None and kind != "count" else (0 if kind == "count" and out is None else out)
        return ev

    if kind in ("sum_where", "avg_where", "min_where", "max_where", "count_where"):
        base = kind[: -len("_where")]

        if base == "count" and col is None:
            # count_where(*, cond): row count over the condition
            return lambda cols, idx: int(_where_idx(cols, cond, idx).size)

        def ev(cols, idx, base=base):
            arr = _vals(cols, col, _where_idx(cols, cond, idx))
            out = _agg_scalar(base, arr)
            if base == "count":
                return 0 if out is None else out
            return out
        return ev

    if kind == "distinct_count":
        # NULL counts as its own distinct value in the reference
        # (test_udaf_function.yaml id 5: window [4, 4, NULL] -> 2) —
        # EXCEPT for bool columns, where NULL folds away (id 6:
        # [False, True, NULL] -> 2)
        count_null = spec.val_t != "bool"

        def ev(cols, idx):
            vv, vok = cols[col]
            arr = vv[idx][vok[idx]]
            has_null = count_null and bool((~vok[idx]).any())
            return int(np.unique(arr).size) + (1 if has_null else 0)
        return ev

    if kind == "median":
        def ev(cols, idx):
            arr = _vals(cols, col, idx)
            return None if arr.size == 0 else float(np.median(arr.astype(np.float64)))
        return ev

    if kind == "top":
        def ev(cols, idx):
            arr = _vals(cols, col, idx)
            if arr.size == 0:
                return None
            kk = min(k, arr.size)
            topk = np.sort(arr)[::-1][:kk]
            return ",".join(_fmt_num(x) for x in topk)
        return ev

    if kind == "topn_frequency":
        def ev(cols, idx):
            # reference FZTopNFrequency::Output (feature_zero_def.cc:483-554):
            # result is ALWAYS top_n entries, padded with literal "NULL" when
            # fewer distinct values exist (test_udaf_function.yaml id 53:
            # 2-row window, topn_frequency(id, 3) -> "1,NULL,NULL"); an empty
            # frame never ran Update, so top_n_ stays 0 -> empty string
            if idx.size == 0:
                return ""
            arr = _vals(cols, col, idx)
            uniq, cnt = np.unique(arr, return_counts=True)
            order = np.lexsort((uniq, -cnt))  # count desc, value asc
            # values render via v1::format_string: floats as printf %f
            # (fz id 4: float32 1.1 -> "1.100000", double 2.1 -> "2.100000");
            # the source-type hint keeps nullable ints (stored as float64
            # in pandas) printing bare
            vals = [_fmt_typed(uniq[i], spec.val_t, spec.tz_ms)
                    for i in order[:k]]
            vals += ["NULL"] * (k - len(vals))
            return ",".join(vals)
        return ev

    if kind == "top1_ratio":
        def ev(cols, idx):
            # empty map (no non-null values) -> 0.0, not NULL
            # (feature_zero_def.cc FZTop1Ratio::Output: map.empty() -> 0)
            arr = _vals(cols, col, idx)
            if arr.size == 0:
                return 0.0
            _, cnt = np.unique(arr, return_counts=True)
            return float(cnt.max()) / float(arr.size)
        return ev

    if kind in ("lag", "at"):
        def ev(cols, idx):
            if k >= idx.size:
                return None
            v, ok = cols[col]
            j = idx[k]
            return v[j] if ok[j] else None
        return ev

    if kind == "first_value":
        def ev(cols, idx):
            if idx.size == 0:
                return None
            v, ok = cols[col]
            j = idx[0]
            return v[j] if ok[j] else None
        return ev

    if kind == "lead":
        raise ValueError("lead is partition-level (forward shift), not a window-buffer aggregate")

    if kind in ("window_split", "window_split_by_key", "window_split_by_value"):
        # feature_zero_def.cc window_split*: split every window row's string
        # and concatenate the pieces in window order (newest first)
        delim, kvd = spec.delim, spec.kv_delim
        want = 0 if kind.endswith("_by_key") else 1

        def ev(cols, idx):
            v, ok = cols[col]
            out = []
            if not delim or (kind != "window_split" and not kvd):
                return out  # empty delimiter -> no segments (fz id 5)
            for j in idx:
                if not ok[j]:
                    continue
                for item in str(v[j]).split(delim):
                    if kind == "window_split":
                        out.append(item)
                    else:
                        kv = item.split(kvd, 1)
                        if len(kv) == 2:
                            out.append(kv[want])
            return out
        return ev

    if kind.startswith("top_n_"):
        # top_n_{key|value}_{base}_cate_where(value, cond, cat, n)
        # (default_defs/*_by_category_def.cc TopN*CateWhereDef +
        # containers.h OutputTopNByValue). Batch-equivalent of the
        # reference's streaming bounded dict: an evicted key can never
        # re-enter (the dict minimum is non-decreasing), so the result is
        # the per-category aggregate over ALL qualifying rows, restricted
        # to the top-n categories.
        mode = kind.split("_")[2]  # "key" | "value"
        base = kind.split("_")[3]  # sum|count|avg|min|max

        def ev(cols, idx, mode=mode, base=base):
            use = _where_idx(cols, cond, idx)
            cv, cok = cols[cat]
            vv, vok = cols[col]
            keep = cok[use] & vok[use]
            use = use[keep]
            if use.size == 0:
                return ""  # reference outputs "" for an empty dict
            cats = cv[use]
            vals = vv[use]
            order = np.argsort(cats, kind="stable")
            cats, vals = cats[order], vals[order]
            pairs = []
            i, n = 0, cats.shape[0]
            while i < n:
                j = i
                while j < n and cats[j] == cats[i]:
                    j += 1
                pairs.append((cats[i], _agg_scalar(base, vals[i:j])))
                i = j
            if mode == "key":
                pairs.sort(key=lambda p: p[0], reverse=True)
            else:  # order by (agg value, category), largest first
                pairs.sort(key=lambda p: (p[1], p[0]), reverse=True)
            def _fv(v):
                # top_n golden format is %f for floats even without type
                # hints (udaf_test.cc pins e.g. 'x:4.500000')
                if spec.val_t is None:
                    return _fmt_ref(v) if base != "count" else str(int(v))
                return _fmt_cate_val(v, base, spec.val_t)

            def _fk(c):
                if spec.cat_t is None:
                    return _fmt_ref(c)
                return _fmt_typed(c, spec.cat_t, spec.tz_ms)

            return ",".join(f"{_fk(c)}:{_fv(v)}" for c, v in pairs[:k])
        return ev

    if kind.endswith("_cate") or kind.endswith("_cate_where"):
        base = kind.split("_cate")[0]

        def ev(cols, idx, base=base):
            use = _where_idx(cols, cond, idx) if cond else idx
            cv, cok = cols[cat]
            vv, vok = cols[col]
            keep = cok[use] & vok[use]
            use = use[keep]
            if use.size == 0:
                return None
            cats = cv[use]
            vals = vv[use]
            order = np.argsort(cats, kind="stable")
            cats, vals = cats[order], vals[order]
            out = []
            i = 0
            n = cats.shape[0]
            while i < n:
                j = i
                while j < n and cats[j] == cats[i]:
                    j += 1
                key_s = (_fmt_typed(cats[i], spec.cat_t, spec.tz_ms)
                         if spec.cat_t is not None else _fmt_num(cats[i]))
                val_s = _fmt_cate_val(
                    _agg_scalar('count' if base == 'count' else base,
                                vals[i:j]), base, spec.val_t)
                out.append(f"{key_s}:{val_s}")
                i = j
            return ",".join(out)
        return ev

    raise ValueError(f"unknown aggregate kind: {kind}")
