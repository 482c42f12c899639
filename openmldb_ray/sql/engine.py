"""Lowering: SQL AST -> Ray Data pipeline over the existing stage API.

Mirrors the reference's planner dispatch (java/openmldb-batch/.../
SparkPlanner.scala:235-276: PhysicalOpType -> node) but lowers directly from
the AST — there is no physical-plan IR because Ray Data's lazy Dataset
already is one.  Mapping:

    FROM t                      -> tables[t]
    FROM (subquery)             -> recursive lowering
    LAST JOIN ... ON ...        -> stages.join_stage.last_join (equi keys +
                                   point-in-time bound extracted from ON;
                                   leftovers become a vectorized residual)
    LEFT JOIN                   -> stages.join_stage.left_join
    WHERE                       -> map_batches filter (Arrow mask)
    WINDOW w AS (...)           -> stages.window_stage.window_agg (one
                                   shuffle per distinct window)
    GROUP BY                    -> stages.relational.group_aggregate
    select exprs                -> map_batches projection (eval_expr)
    ORDER BY / LIMIT / DISTINCT -> Dataset.sort / limit / unique

Aggregate calls are rewritten to generated columns before expression
evaluation; their argument expressions are materialized as temp columns so
the window/groupby stages always see plain columns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import numpy as np

from ..core.aggregates import AggSpec, FrameExpr, SEQ_KINDS
from ..core.frames import FrameSpec
from .ast_nodes import (
    Between, BinaryOp, Case, Cast, Column, FrameBound, FuncCall, InList,
    IsNull, Join, Like, Literal, SelectItem, SelectStmt, Star, TableRef,
    UnaryOp, WindowDef,
)
from .eval_expr import Evaluator, SqlEvalError, TYPE_NAMES
from .parser import parse_sql

RID = "__rid"  # deterministic arrival-order tiebreak, added by attach_rid
UTB = "__utb"  # multi-table WINDOW UNION tiebreak: (source_rank<<40) + rid


class _EncodeUnionTb:
    """Appends the int64 union tiebreak (source_rank << 40) + row-id.
    Higher rank sorts later (= buffers nearer the primary row); the primary
    stream gets the highest rank, union sources rank by REVERSE SQL-list
    position (WindowAggPlanUtil.scala union ordering;
    test_window_union.yaml 19-1/19-2)."""

    def __init__(self, rank: int):
        self.rank = rank

    def __call__(self, t):
        import numpy as np
        import pyarrow as pa

        base = np.full(t.num_rows, self.rank << 40, dtype=np.int64)
        if RID in t.column_names:
            rid = t[RID].to_numpy(zero_copy_only=False)
            base = base + np.asarray(rid, dtype=np.int64)
        arr = pa.array(base)
        if UTB in t.column_names:
            return t.set_column(t.column_names.index(UTB), UTB, arr)
        return t.append_column(UTB, arr)


class SqlLowerError(ValueError):
    pass


# ---- scope ----------------------------------------------------------------

class Scope:
    """Maps (qualifier, column) -> physical column name."""

    def __init__(self):
        self.quals: dict[str, dict[str, str]] = {}
        self.order: list[str] = []

    def add_table(self, qual: str, cols: dict[str, str]) -> None:
        self.quals[qual] = dict(cols)
        self.order.append(qual)

    def add_alias(self, qual: str, cols: dict[str, str]) -> None:
        """Extra qualifier for an already-added table: resolvable but not
        part of ``order`` (so SELECT * and bare-name lookup see the table
        once)."""
        self.quals.setdefault(qual, dict(cols))

    def resolve(self, col: Column) -> str:
        if col.table is not None:
            m = self.quals.get(col.table)
            if m is None:
                if "." in col.table:
                    # db.table qualifier that names no catalog table in
                    # scope — a subquery ALIAS is not a database table
                    # (test_multiple_databases.yaml id 8)
                    raise SqlLowerError(
                        f"table {col.table!r} not found for column "
                        f"{col.name!r} (matches reference)")
                # unknown single-part qualifier: treat as bare
                # (template/stale aliases); _bare errors on ambiguity
                return self._bare(col.name)
            phys = m.get(col.name)
            if phys is None:
                raise SqlLowerError(
                    f"column {col.table}.{col.name} not found")
            return phys
        return self._bare(col.name)

    def _bare(self, name: str) -> str:
        hits = {self.quals[q][name] for q in self.order
                if name in self.quals[q]}
        if not hits:
            raise SqlLowerError(f"column {name!r} not found")
        if len(hits) > 1:
            # a bare name mapping to several DISTINCT physical columns
            # must be qualified (integration_test test_lastjoin_complex.yaml
            # id 14; a table registered under two qualifiers is fine)
            raise SqlLowerError(
                f"column {name!r} is ambiguous across joined tables "
                "(matches reference; qualify it)")
        return next(iter(hits))

    def all_output(self) -> list[tuple[str, str]]:
        """(display_name, physical) pairs for SELECT *, left-to-right."""
        out = []
        for q in self.order:
            for disp, phys in self.quals[q].items():
                out.append((disp, phys))
        return out

    def table_output(self, qual: str) -> list[tuple[str, str]]:
        return list(self.quals[qual].items())


class _Resolver:
    """Picklable Column->physical-name mapper for worker-side evaluation."""

    def __init__(self, mapping: dict, ambiguous: frozenset = frozenset()):
        self.mapping = mapping   # (qual|None, name) -> physical
        self.ambiguous = ambiguous  # bare names visible from >1 tables

    def __call__(self, col: Column) -> str:
        if col.table is not None:
            key = (col.table, col.name)
            if key in self.mapping:
                return self.mapping[key]
            if "." in col.table:
                # db.table qualifier naming no table in scope is an error
                # (test_multiple_databases.yaml id 8)
                raise SqlLowerError(
                    f"table {col.table!r} not found for column {col.name!r} "
                    "(matches reference)")
        if col.name in self.ambiguous:
            # a bare (or unknown-qualifier) name visible from several
            # joined tables must be qualified
            # (integration_test test_lastjoin_complex.yaml id 14;
            # test_multiple_databases.yaml id 3)
            raise SqlLowerError(
                f"column {col.name!r} is ambiguous across joined tables "
                "(matches reference; qualify it)")
        key2 = (None, col.name)
        if key2 in self.mapping:
            return self.mapping[key2]
        # fall through: maybe the physical name itself
        return col.name


def _freeze_scope(scope: Scope) -> _Resolver:
    mapping: dict = {}
    seen_in: dict[str, set] = {}
    for q in reversed(scope.order):   # earlier tables win for bare names
        for name, phys in scope.quals[q].items():
            mapping[(q, name)] = phys
            mapping[(None, name)] = phys
            # ambiguity = same bare name -> DISTINCT physical columns
            seen_in.setdefault(name, set()).add(phys)
    for q, cols in scope.quals.items():   # alias quals: qualified-only
        if q not in scope.order:
            for name, phys in cols.items():
                mapping.setdefault((q, name), phys)
    ambiguous = frozenset(n for n, ps in seen_in.items() if len(ps) > 1)
    return _Resolver(mapping, ambiguous)


# ---- AST utilities --------------------------------------------------------

def _children(e) -> tuple:
    if isinstance(e, UnaryOp):
        return (e.operand,)
    if isinstance(e, BinaryOp):
        return (e.left, e.right)
    if isinstance(e, Like):
        return ((e.operand, e.pattern, e.escape) if e.escape is not None
                else (e.operand, e.pattern))
    if isinstance(e, IsNull):
        return (e.operand,)
    if isinstance(e, InList):
        return (e.operand, *e.items)
    if isinstance(e, Between):
        return (e.operand, e.low, e.high)
    if isinstance(e, Case):
        out = [] if e.operand is None else [e.operand]
        for c, r in e.whens:
            out += [c, r]
        if e.default is not None:
            out.append(e.default)
        return tuple(out)
    if isinstance(e, Cast):
        return (e.operand,)
    if isinstance(e, FuncCall):
        return tuple(e.args)
    return ()


def walk(e):
    yield e
    for c in _children(e):
        yield from walk(c)


def _top_agg_calls(nodes) -> list:
    """Top-most aggregate FuncCalls in ``nodes`` (no descent into them)."""
    out = []

    def visit(e):
        if is_agg_call(e):
            out.append(e)
            return
        for c in _children(e):
            visit(c)

    for n in nodes:
        visit(n)
    return out


def _push_scalar_over(expr):
    """Composite window expressions (test_udaf_function.yaml id 42:
    ``abs(sum(c3)) OVER w1``, ``log((sum(c1)+sum(c2))/c3) OVER w1``): the
    parser attaches OVER to the outermost call. When that call is NOT an
    aggregate, push the window down onto each top-most aggregate inside;
    the scalar structure then evaluates per emitted row in the final
    projection (non-aggregate columns read the current row, matching the
    reference's row-project-over-window codegen)."""
    while True:
        targets = [n for n in walk(expr)
                   if isinstance(n, FuncCall) and n.over is not None
                   and n.name.lower() not in AGG_NAMES]
        if not targets:
            return expr
        mapping = {}
        for t in targets:
            subs = _top_agg_calls(t.args)
            # no aggregate inside: a pure scalar call with OVER evaluates
            # per row, window irrelevant (test_feature_zero_function.yaml
            # id 5: fz_join(fz_split(c1, ""), "") OVER w1)
            smap = {s: FuncCall(s.name, s.args, t.over, s.distinct)
                    for s in subs}
            mapping[t] = FuncCall(
                t.name, tuple(rewrite(a, smap) for a in t.args),
                None, t.distinct)
        expr = rewrite(expr, mapping)


def rewrite(e, mapping: dict):
    """Replace nodes (by value-equality) per ``mapping``; rebuild parents."""
    if e in mapping:
        return mapping[e]
    if isinstance(e, UnaryOp):
        return UnaryOp(e.op, rewrite(e.operand, mapping))
    if isinstance(e, BinaryOp):
        return BinaryOp(e.op, rewrite(e.left, mapping), rewrite(e.right, mapping))
    if isinstance(e, Like):
        return Like(rewrite(e.operand, mapping), rewrite(e.pattern, mapping),
                    e.kind, e.escape, e.negated)
    if isinstance(e, IsNull):
        return IsNull(rewrite(e.operand, mapping), e.negated)
    if isinstance(e, InList):
        return InList(rewrite(e.operand, mapping),
                      tuple(rewrite(i, mapping) for i in e.items), e.negated)
    if isinstance(e, Between):
        return Between(rewrite(e.operand, mapping), rewrite(e.low, mapping),
                       rewrite(e.high, mapping), e.negated)
    if isinstance(e, Case):
        return Case(rewrite(e.operand, mapping) if e.operand is not None else None,
                    tuple((rewrite(c, mapping), rewrite(r, mapping))
                          for c, r in e.whens),
                    rewrite(e.default, mapping) if e.default is not None else None)
    if isinstance(e, Cast):
        return Cast(rewrite(e.operand, mapping), e.type_name,
                    via_fn=getattr(e, "via_fn", False))
    if isinstance(e, FuncCall):
        return FuncCall(e.name, tuple(rewrite(a, mapping) for a in e.args),
                        e.over, e.distinct)
    return e


# ---- aggregate call -> AggSpec -------------------------------------------

#: SQL UDAF name -> (AggSpec kind, arg roles). Roles: v=value expr,
#: c=condition expr, g=category expr, k=int literal, d=str literal (delim),
#: e=str literal (kv delim)
_AGG_SIGS: dict[str, tuple[str, str]] = {
    "sum": ("sum", "v"), "count": ("count", "v"), "avg": ("avg", "v"),
    "min": ("min", "v"), "max": ("max", "v"),
    "sum_where": ("sum_where", "vc"), "count_where": ("count_where", "vc"),
    "avg_where": ("avg_where", "vc"), "min_where": ("min_where", "vc"),
    "max_where": ("max_where", "vc"),
    "distinct_count": ("distinct_count", "v"),
    "median": ("median", "v"),
    "top": ("top", "vk"),
    "topn_frequency": ("topn_frequency", "vk"),
    "fz_topn_frequency": ("topn_frequency", "vk"),
    "top1_ratio": ("top1_ratio", "v"), "fz_top1_ratio": ("top1_ratio", "v"),
    "lag": ("lag", "vk"), "at": ("at", "vk"), "lead": ("lead", "vk"),
    "first_value": ("first_value", "v"),
    "sum_cate": ("sum_cate", "vg"), "count_cate": ("count_cate", "vg"),
    "avg_cate": ("avg_cate", "vg"), "min_cate": ("min_cate", "vg"),
    "max_cate": ("max_cate", "vg"),
    "sum_cate_where": ("sum_cate_where", "vcg"),
    "count_cate_where": ("count_cate_where", "vcg"),
    "avg_cate_where": ("avg_cate_where", "vcg"),
    "min_cate_where": ("min_cate_where", "vcg"),
    "max_cate_where": ("max_cate_where", "vcg"),
    "window_split": ("window_split", "vd"),
    "window_split_by_key": ("window_split_by_key", "vde"),
    "window_split_by_value": ("window_split_by_value", "vde"),
    "fz_window_split": ("window_split", "vd"),
    "fz_window_split_by_key": ("window_split_by_key", "vde"),
    "fz_window_split_by_value": ("window_split_by_value", "vde"),
}
for _m in ("key", "value"):
    for _b in ("sum", "count", "avg", "min", "max"):
        _AGG_SIGS[f"top_n_{_m}_{_b}_cate_where"] = (
            f"top_n_{_m}_{_b}_cate_where", "vcgk")
        _AGG_SIGS[f"fz_top_n_{_m}_{_b}_cate_where"] = (
            f"top_n_{_m}_{_b}_cate_where", "vcgk")

AGG_NAMES = set(_AGG_SIGS)


def is_agg_call(e) -> bool:
    return (isinstance(e, FuncCall)
            and (e.name.lower() in AGG_NAMES or e.over is not None))


def _lit_int(e) -> int:
    if isinstance(e, Literal) and isinstance(e.value, (int, bool)):
        return int(e.value)
    if isinstance(e, UnaryOp) and e.op == "-" and isinstance(e.operand, Literal):
        return -int(e.operand.value)
    raise SqlLowerError(f"expected integer literal, got {e}")


def _lit_str(e) -> str:
    if isinstance(e, Literal) and isinstance(e.value, str):
        return e.value
    raise SqlLowerError(f"expected string literal, got {e}")


def _make_frame_expr_fn(expr_ast):
    """Compile a frame expression into the kernel-facing callable
    ``fn(sliced_cols, consts, n) -> (vals, valid)`` (see FrameExpr).
    Columns arrive as the exact kernel's (values, valid) numpy pairs;
    inner-aggregate constants broadcast to the frame length. Evaluation
    reuses the Arrow expression evaluator over a tiny per-frame table —
    O(frame) per output row, exact-kernel-only by design."""
    ev = Evaluator(None)  # column names are physical already

    def fn(sliced: dict, consts: dict, n: int, const_types: dict):
        names, arrays = [], []
        for cname, (v, ok) in sliced.items():
            mask = ~np.asarray(ok, dtype=bool)
            if v.dtype == object:
                arrays.append(pa.array(
                    [None if m else x for x, m in zip(v, mask)]))
            else:
                arrays.append(pa.array(v, mask=mask))
            names.append(cname)
        for cname, cval in consts.items():
            if isinstance(cval, np.generic):
                cval = cval.item()
            ctype = const_types.get(cname)
            if cval is None:
                arrays.append(pa.nulls(n, ctype) if ctype is not None
                              else pa.nulls(n))
            else:
                arrays.append(pa.array([cval] * n, type=ctype))
            names.append(cname)
        t = pa.Table.from_arrays(arrays, names=names)
        out = ev.eval(expr_ast, t)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        valid = pc.is_valid(out).to_numpy(zero_copy_only=False)
        if pa.types.is_integer(out.type):
            vals = pc.fill_null(out, 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
        elif pa.types.is_floating(out.type):
            vals = pc.fill_null(out, 0.0).to_numpy(zero_copy_only=False)
        elif pa.types.is_boolean(out.type):
            vals = pc.fill_null(out, False).to_numpy(zero_copy_only=False)
        else:
            vals = np.asarray(out.to_pylist(), dtype=object)
        return vals, valid

    return fn


class AggCollector:
    """Turns aggregate FuncCalls into AggSpecs + temp-column exprs."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.temp_exprs: dict[str, object] = {}   # temp col -> expr AST
        self.specs: list[AggSpec] = []
        self.replacements: dict = {}              # FuncCall -> Column
        self._n = 0
        self._ni = 0

    def _temp(self, expr) -> str:
        if isinstance(expr, Column):
            return None  # filled by caller with resolved physical name
        for name, e in self.temp_exprs.items():
            if e == expr:
                return name
        name = f"{self.prefix}a{len(self.temp_exprs)}"
        self.temp_exprs[name] = expr
        return name

    def add(self, call: FuncCall, resolve) -> Column:
        if call in self.replacements:
            return self.replacements[call]
        out_col = f"{self.prefix}{self._n}"
        self._n += 1
        spec = self._make_spec(call, resolve, out_col)
        self.specs.append(spec)
        repl = Column(out_col)
        self.replacements[call] = repl
        return repl

    def _make_spec(self, call: FuncCall, resolve, out_col: str) -> AggSpec:
        name = call.name.lower()

        if name == "count" and len(call.args) == 1 and isinstance(call.args[0], Star):
            return AggSpec(kind="count_star", name=out_col)
        if name == "count" and len(call.args) == 1 \
                and isinstance(call.args[0], Literal):
            # count over a constant is a compile error in the reference
            # (count(1), integration_test test_udaf_table.yaml id 1 —
            # only count(col) / count(*) resolve)
            raise SqlLowerError("count over a constant is not supported "
                                "(matches reference; use count(*))")
        if name == "count_where" and len(call.args) == 2 \
                and isinstance(call.args[0], Star):
            # count_where(*, cond): row count over the condition
            kw = self._role_arg(call.args[1], resolve, "cond")
            return AggSpec(kind="count_where", name=out_col, col=None, **kw)
        if name == "count" and call.distinct:
            kw = self._role_arg(call.args[0], resolve, "col")
            return AggSpec(kind="distinct_count", name=out_col, **kw)

        sig = _AGG_SIGS.get(name)
        if sig is None:
            raise SqlLowerError(f"unknown aggregate {name!r}")
        kind, roles = sig
        args = list(call.args)
        if len(args) != len(roles):
            raise SqlLowerError(
                f"{name} expects {len(roles)} args, got {len(args)}")
        kw: dict = {}
        for role, arg in zip(roles, args):
            if role == "v":
                kw.update(self._role_arg(arg, resolve, "col"))
            elif role == "c":
                kw.update(self._role_arg(arg, resolve, "cond"))
            elif role == "g":
                kw["cat"] = self._arg_col(arg, resolve)
            elif role == "k":
                kw["k"] = _lit_int(arg)
            elif role == "d":
                kw["delim"] = _lit_str(arg)
            elif role == "e":
                kw["kv_delim"] = _lit_str(arg)
        spec = AggSpec(kind=kind, name=out_col, **kw)
        if spec.expr is not None and spec.expr.seq is not None \
                and kind in ("lag", "at", "lead", "first_value"):
            raise SqlLowerError(
                f"{kind} over a window_split sequence is unsupported")
        return spec

    def _role_arg(self, arg, resolve, field: str) -> dict:
        """Value/condition role: a plain column/temp, or — when the
        argument itself contains aggregate calls — a per-frame expression
        (reference nested-UDAF codegen, test_udaf_function.yaml ids
        42/43/49/53; see core.aggregates.FrameExpr)."""
        if not any(is_agg_call(n) for n in walk(arg)):
            return {field: self._arg_col(arg, resolve,
                                         want_bool=field == "cond")}
        return {f"{field}_expr" if field == "cond" else "expr":
                self._frame_expr(arg, resolve)}

    def _frame_expr(self, arg, resolve) -> FrameExpr:
        subs = []
        mapping: dict = {}
        inner = []
        for s in _top_agg_calls([arg]):
            if s in mapping:
                continue
            iname = f"{self.prefix}i{self._ni}"
            self._ni += 1
            ispec = self._make_spec(s, resolve, iname)
            inner.append(ispec)
            mapping[s] = Column(iname)
            subs.append(s)
        # fused UDAF-of-UDAF: the argument IS a list-producing aggregate
        # (distinct_count(fz_window_split(c1, ","))): the token sequence is
        # the value sequence, no element-wise expression in between
        if len(subs) == 1 and arg == subs[0] and inner[0].kind in SEQ_KINDS:
            return FrameExpr(inner=tuple(inner), seq=inner[0].name)
        if any(i.kind in SEQ_KINDS for i in inner):
            raise SqlLowerError(
                "window_split inside an arithmetic aggregate argument "
                "is unsupported")
        expr_ast = rewrite(arg, mapping)
        colmap = {}
        for n2 in walk(expr_ast):
            if isinstance(n2, Column) and not n2.name.startswith(self.prefix):
                colmap[n2] = Column(resolve(n2))
        expr_ast = rewrite(expr_ast, colmap)
        phys = tuple(sorted({c.name for c in colmap.values()}))
        return FrameExpr(fn=_make_frame_expr_fn(expr_ast), cols=phys,
                         inner=tuple(inner))

    def _arg_col(self, arg, resolve, want_bool: bool = False) -> str:
        if isinstance(arg, Column):
            return resolve(arg)
        if any(is_agg_call(n) for n in walk(arg)):
            raise SqlLowerError(
                "aggregate call inside a category argument is unsupported")
        name = self._temp(arg)
        return name


# ---- frame conversion -----------------------------------------------------

def frame_from_windowdef(w: WindowDef) -> FrameSpec:
    rows_p = range_p = None
    rows_end = 0
    range_end = 0
    open_range = False
    range_end_open = False
    ft = w.frame_type
    if ft is None:
        raise SqlLowerError(
            "window definition requires a ROWS/ROWS_RANGE frame "
            "(matches reference: no-frame windows are rejected)")
    if w.max_size is not None:
        if ft == "rows":
            raise SqlLowerError(
                "MAXSIZE is only valid for ROWS_RANGE frames "
                "(matches reference, error_window.yaml id 13)")
        if w.max_size <= 0:
            raise SqlLowerError(
                "MAXSIZE must be a positive integer (matches reference)")
    if ft == "rows":
        for b in (w.start, w.end):
            if b is not None and b.interval:
                raise SqlLowerError(
                    "ROWS frame bounds cannot carry time units "
                    "(matches reference, error_window.yaml id 8)")
    if ft is not None:
        s, e = w.start, w.end
        if s is None:
            raise SqlLowerError("frame without bounds")
        if ft == "rows":
            if s.kind == "unbounded":
                rows_p = None
            elif s.kind == "preceding":
                rows_p = s.value
            elif s.kind == "open_preceding":
                # OPEN excludes the boundary row itself
                rows_p = max(0, s.value - 1)
            elif s.kind == "current":
                rows_p = 0
            if e is not None and e.kind == "preceding":
                rows_end = max(0, e.value)
            elif e is not None and e.kind == "open_preceding":
                rows_end = max(0, e.value + 1)
        else:  # rows_range
            if s.kind == "unbounded":
                range_p = None
            elif s.kind in ("preceding", "open_preceding"):
                range_p = s.value
                open_range = s.kind == "open_preceding"
            elif s.kind == "current":
                range_p = 0
            if e is not None and e.kind == "preceding":
                range_end = min(0, -e.value)
            elif e is not None and e.kind == "open_preceding":
                range_end = min(0, -e.value)
                range_end_open = True
        if s.kind not in ("unbounded",) and s.value is not None and s.value < 0:
            raise SqlLowerError("negative frame bound")
    return FrameSpec(
        rows_preceding=rows_p, range_preceding=range_p, open_range=open_range,
        rows_end=rows_end, range_end=range_end, range_end_open=range_end_open,
        max_size=w.max_size or 0,
        exclude_current_time=w.exclude_current_time,
        exclude_current_row=w.exclude_current_row,
        instance_not_in_window=w.instance_not_in_window,
    )


# ---- worker-side callables ------------------------------------------------

class _AddColumns:
    """map_batches fn: append evaluated expression columns."""

    def __init__(self, exprs: list, resolver):
        self.exprs = exprs            # [(name, ast)]
        self.ev = Evaluator(resolver)

    def __call__(self, t: pa.Table) -> pa.Table:
        for name, ast in self.exprs:
            arr = self.ev.eval(ast, t)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if name in t.column_names:
                t = t.set_column(t.column_names.index(name), name, arr)
            else:
                t = t.append_column(name, arr)
        return t


class _FilterBatches:
    def __init__(self, pred_ast, resolver):
        self.ast = pred_ast
        self.ev = Evaluator(resolver)

    def __call__(self, t: pa.Table) -> pa.Table:
        mask = self.ev.eval(self.ast, t)
        if not pa.types.is_boolean(mask.type):
            from .eval_expr import sql_cast
            mask = sql_cast(mask, pa.bool_())
        mask = pc.fill_null(mask, False)
        return t.filter(mask)


class _Project:
    def __init__(self, items: list, resolver):
        self.items = items            # [(out_name, ast)]
        self.ev = Evaluator(resolver)

    def __call__(self, t: pa.Table) -> pa.Table:
        arrays = []
        names = []
        for out_name, ast in self.items:
            arr = self.ev.eval(ast, t)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arrays.append(arr)
            names.append(out_name)
        return pa.Table.from_arrays(arrays, names=names)


class _ResidualPred:
    """Vectorized residual ON-condition for last_join: pandas frame in,
    bool mask out (evaluated through the Arrow evaluator)."""

    def __init__(self, pred_ast, resolver):
        self.ast = pred_ast
        self.ev = Evaluator(resolver)

    def __call__(self, df) -> "object":
        t = pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)
        mask = self.ev.eval(self.ast, t)
        return pc.fill_null(mask, False).to_numpy(zero_copy_only=False)


# ---- FROM lowering --------------------------------------------------------

def attach_rid(ds):
    """Add a deterministic arrival-order tiebreak column. The reference's
    window tie order is storage order (mem_catalog.h buffer order); a
    distributed read has none, so conformance inputs carry an explicit id."""
    import ray.data  # noqa: F401

    def add(t: pa.Table, start=0) -> pa.Table:
        return t  # placeholder — rows get rids in the runner instead

    return ds


def _maybe_empty_shim(ds):
    """Under grouping.EMPTY_PROBE, represent a rowless base table as an
    EmptyTypedDataset so its schema survives the lowered pipeline (Ray's map
    machinery rebuilds empty blocks as zero-column tables — see
    core/empty_ds.py). Real datasets and non-empty tables pass through."""
    from ..core.empty_ds import EmptyTypedDataset
    from ..core.grouping import EMPTY_PROBE

    if not EMPTY_PROBE.get() or isinstance(ds, (EmptyTypedDataset, pd.DataFrame)):
        return ds
    try:
        if ds.count() == 0:
            sch = ds.schema()
            base = getattr(sch, "base_schema", sch)
            if isinstance(base, pa.Schema):
                return EmptyTypedDataset(base.empty_table())
    except Exception:
        pass
    return ds


def _lower_from(node, tables, ctx) -> tuple:
    """Returns (ds, scope)."""
    if node is None:
        import ray.data as rd
        ds = rd.from_arrow(pa.table({"__one": pa.array([1], pa.int32())}))
        sc = Scope()
        sc.add_table("__const__", {})
        return ds, sc

    if isinstance(node, TableRef):
        if node.subquery is not None:
            sub = _lower_select(node.subquery, tables, dict(ctx, keep_rid=True))
            ds = sub
            cols = list(ds.schema().names)
            visible = [c for c in cols if not c.startswith("__")]
            import re as _re

            norm = [_re.sub(r"__dup\d+$", "", c) for c in visible]
            if len(set(norm)) != len(norm):
                raise SqlLowerError(
                    "duplicate column names in subquery output are "
                    "unsupported (test_sub_select.yaml ids 10/11)")
            sc = Scope()
            qual = node.alias or node.name
            sc.add_table(qual, {c: c for c in visible})
            if RID in cols:
                sc.quals[qual].pop(RID, None)
            if ctx.get("default_db"):
                # the session db qualifies aliases too:
                # `db.t1.c1 FROM (...) as t1` (test_multiple_databases 7/9)
                sc.add_alias(f"{ctx['default_db']}.{qual}", sc.quals[qual])
            return ds, sc
        if node.name not in tables:
            raise SqlLowerError(f"unknown table {node.name!r}")
        ds = _maybe_empty_shim(tables[node.name])
        cols = list(ds.schema().names)
        sc = Scope()
        visible = {c: c for c in cols if not c.startswith("__")}
        qual = node.alias or node.name
        sc.add_table(qual, visible)
        if node.alias is None and "." in node.name:
            # FROM db.table: `table.col` refs resolve via the short name
            # (alias qual — not double-counted by SELECT * / bare lookup)
            sc.add_alias(node.name.split(".", 1)[1], visible)
        if ctx.get("default_db") and "." not in qual:
            sc.add_alias(f"{ctx['default_db']}.{qual}", visible)
        if node.alias and node.alias != node.name:
            pass
        elif node.alias is None:
            pass
        return ds, sc

    if isinstance(node, Join):
        return _lower_join(node, tables, ctx)

    raise SqlLowerError(f"cannot lower FROM node {node!r}")


def _split_conjuncts(e) -> list:
    if isinstance(e, BinaryOp) and e.op == "and":
        return _split_conjuncts(e.left) + _split_conjuncts(e.right)
    return [e]


def _side_of(col: Column, lscope: Scope, rqual: str) -> str:
    if col.table == rqual:
        return "right"
    if col.table is not None and col.table in lscope.quals:
        return "left"
    if col.table is None:
        # bare: prefer left
        try:
            lscope._bare(col.name)
            return "left"
        except SqlLowerError:
            return "right"
    return "unknown"


def _expr_side(e, lscope: Scope, rqual: str) -> str:
    """Which side(s) an expression references: 'left'|'right'|'both'|'none'."""
    sides = set()
    for n in walk(e):
        if isinstance(n, Column):
            sides.add(_side_of(n, lscope, rqual))
    sides.discard("none")
    if not sides:
        return "none"
    if sides == {"left"}:
        return "left"
    if sides == {"right"}:
        return "right"
    return "both"


def _lower_join(node: Join, tables, ctx):
    from ..stages.join_stage import last_join, left_join

    lds, lscope = _lower_from(node.left, tables, ctx)
    if node.right.subquery is not None or True:
        rds, rscope_tmp = _lower_from(node.right, tables, ctx)
    rqual = rscope_tmp.order[0]
    rcols_display = list(rscope_tmp.quals[rqual].keys())

    lphys = set()
    for q in lscope.order:
        lphys.update(lscope.quals[q].values())

    # physical rename plan for the right side
    right_cols: dict[str, str] = {}
    for c in rcols_display:
        phys = c if c not in lphys else f"{c}__r"
        while phys in lphys or (phys != c and phys in rcols_display):
            phys += "_"
        right_cols[c] = phys

    conjs = _split_conjuncts(node.condition)
    equi: list[tuple[str, str]] = []       # (left_phys, right_orig)
    residual_parts = []
    asof_pair = None    # (left_ts_phys, right_order_col)

    jorder_col = None
    if node.order_by is not None:
        if _side_of(node.order_by, lscope, rqual) != "right":
            raise SqlLowerError("LAST JOIN ORDER BY must be a right column")
        jorder_col = node.order_by.name
        rtypes = {n: t for n, t in zip(rds.schema().names, rds.schema().types)}
        jt = rtypes.get(jorder_col)
        if jt is not None and hasattr(jt, "id") and not (
                pa.types.is_int32(jt) or pa.types.is_int64(jt)
                or pa.types.is_timestamp(jt)):
            raise SqlLowerError(
                f"LAST JOIN ORDER BY column must be int/bigint/timestamp, "
                f"got {jt} (matches reference, test_lastjoin_simple.yaml "
                f"ids 7-10/28/29)")

    for cj in conjs:
        if isinstance(cj, BinaryOp) and cj.op == "=" \
                and isinstance(cj.left, Column) and isinstance(cj.right, Column):
            s1 = _side_of(cj.left, lscope, rqual)
            s2 = _side_of(cj.right, lscope, rqual)
            if {s1, s2} == {"left", "right"}:
                lcol = cj.left if s1 == "left" else cj.right
                rcol = cj.right if s1 == "left" else cj.left
                equi.append((lscope.resolve(lcol), rcol.name))
                continue
        # point-in-time bound: right.order <= left.ts (or left.ts >= right.order)
        if (jorder_col is not None and isinstance(cj, BinaryOp)
                and cj.op in ("<=", ">=")
                and isinstance(cj.left, Column) and isinstance(cj.right, Column)):
            a, b = cj.left, cj.right
            if cj.op == ">=":
                a, b = b, a   # now a <= b
            if (_side_of(a, lscope, rqual) == "right" and a.name == jorder_col
                    and _side_of(b, lscope, rqual) == "left"
                    and asof_pair is None):
                asof_pair = (lscope.resolve(b), jorder_col)
                continue
        residual_parts.append(cj)

    # ORDER BY ... DESC: min order value wins (JoinPlan.scala:153-189 —
    # max for asc / min for desc) — negate into a derived int64 column so
    # every join path keeps its max-wins logic
    if jorder_col is not None and getattr(node, "order_desc", False):
        if asof_pair is not None:
            raise SqlLowerError("LAST JOIN ORDER BY DESC with point-in-time "
                                "bound unsupported")
        neg_src = jorder_col

        def _neg_order(t: pa.Table, src=neg_src) -> pa.Table:
            v = t[src]
            if not pa.types.is_integer(v.type):
                v = pc.cast(v, pa.int64())
            v = pc.multiply(pc.cast(v, pa.int64()), pa.scalar(-1, pa.int64()))
            return t.append_column("__jord_desc", v)

        rds = rds.map_batches(_neg_order, batch_format="pyarrow",
                              batch_size=None)
        jorder_col = "__jord_desc"

    if not equi and node.kind != "last":
        raise SqlLowerError("join requires at least one equi condition")

    # merged scope for residual evaluation / downstream
    out_scope = Scope()
    for q in lscope.order:
        out_scope.add_table(q, lscope.quals[q])
    out_scope.add_table(rqual, {c: right_cols[c] for c in rcols_display})

    residual = None
    if residual_parts:
        pred = residual_parts[0]
        for p in residual_parts[1:]:
            pred = BinaryOp("and", pred, p)
        residual = _ResidualPred(pred, _freeze_scope(out_scope))

    # keyless (pure non-equi) LAST JOIN: nested-loop semantics via a
    # constant join key — every (left, right) pair is a candidate, the
    # residual predicate filters, max-ORDER-BY / last-stored picks one
    # (test_lastjoin_simple.yaml id 17-1). Inherently a broadcast of the
    # whole right side; fine for dimension-sized right tables only.
    if not equi:
        lds = lds.map_batches(_ConstKey("__jkl"),
                              batch_format="pyarrow", batch_size=None)
        rds = rds.map_batches(_ConstKey("__jkr"),
                              batch_format="pyarrow", batch_size=None)
        on = ("__jkl", "__jkr")
        right_cols2 = dict(right_cols)
        right_cols2["__jkr"] = "__jkr"
        jorder = jorder_col
    # multi-key: synthesize composite key columns on both sides
    elif len(equi) > 1:
        lkeys = [lk for lk, _ in equi]
        rkeys = [rk for _, rk in equi]
        lds = lds.map_batches(_CompositeKey("__jkl", lkeys),
                              batch_format="pyarrow", batch_size=None)
        rds = rds.map_batches(_CompositeKey("__jkr", rkeys),
                              batch_format="pyarrow", batch_size=None)
        on = ("__jkl", "__jkr")
        right_cols2 = dict(right_cols)
        right_cols2["__jkr"] = "__jkr"
        jorder = jorder_col
    elif node.kind == "last":
        # reference LAST JOIN key equality is NULL-SAFE: a NULL left key
        # matches NULL right keys (test_lastjoin_simple.yaml id 19, null
        # variant, in BOTH corpora) — join on a derived encoded key so the
        # display columns stay untouched
        lds = lds.map_batches(_NullSafeKey("__jkl", equi[0][0]),
                              batch_format="pyarrow", batch_size=None)
        rds = rds.map_batches(_NullSafeKey("__jkr", equi[0][1]),
                              batch_format="pyarrow", batch_size=None)
        on = ("__jkl", "__jkr")
        right_cols2 = dict(right_cols)
        right_cols2["__jkr"] = "__jkr"
        jorder = jorder_col
    else:
        on = (equi[0][0], equi[0][1])
        right_cols2 = dict(right_cols)
        jorder = jorder_col

    # the join stage's internal arrival-order column is also named __rid
    # (join_stage.RID_COL); pass ours as the tiebreak WITHOUT adding it to
    # right_cols — _prep_right keeps it un-renamed and out_cols drops it
    tiebreak = RID if RID in rds.schema().names else None
    if node.kind == "last":
        out = last_join(
            lds, rds, on,
            order_by=jorder,
            asof_left_ts=asof_pair[0] if asof_pair else None,
            right_cols=right_cols2,
            residual=residual,
            tiebreak=tiebreak,
        )
    else:
        if residual is not None:
            raise SqlLowerError("LEFT JOIN with non-equi residual unsupported")
        out = left_join(lds, rds, on, right_cols=right_cols2)
    return out, out_scope


class _NullSafeKey:
    """Encoded single join key: NULL → "\\x00", value → "\\x01" + string
    rendering — so NULL==NULL matches (LAST JOIN null-safe equality)."""

    def __init__(self, name: str, src: str):
        self.name = name
        self.src = src

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.src]
        s = pc.binary_join_element_wise("\x01", pc.cast(col, pa.string()), "")
        s = pc.fill_null(s, "\x00")
        if self.name in t.column_names:
            return t.set_column(t.column_names.index(self.name), self.name, s)
        return t.append_column(self.name, s)


class _ConstKey:
    """Adds a constant int8 join key (keyless nested-loop LAST JOIN)."""

    def __init__(self, name: str):
        self.name = name

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        if self.name in t.column_names:
            return t.set_column(t.column_names.index(self.name), self.name, arr)
        return t.append_column(self.name, arr)


class _CompositeKey:
    """Adds a composite join key column: string-concat of parts; NULL if
    any part is NULL (a NULL key never matches, reference JoinPlan)."""

    def __init__(self, name: str, parts: list):
        self.name = name
        self.parts = parts

    def __call__(self, t: pa.Table) -> pa.Table:
        arrs = [pc.cast(t[p], pa.string()) for p in self.parts]
        out = arrs[0]
        for a in arrs[1:]:
            out = pc.binary_join_element_wise(out, a, "\x1f",
                                              null_handling="emit_null")
        if self.name in t.column_names:
            return t.set_column(t.column_names.index(self.name), self.name, out)
        return t.append_column(self.name, out)


# ---- SELECT lowering ------------------------------------------------------

def _default_name(e) -> str:
    """Output-column name for an unaliased select item: the rendered SQL
    text (the reference names unaliased exprs this way, e.g. 'c2 + 1')."""
    return _render(e)


def _render(e) -> str:
    if isinstance(e, Star):
        return "*"
    if isinstance(e, Column):
        return e.name
    if isinstance(e, Literal):
        if e.value is None:
            return "NULL"
        if isinstance(e.value, str):
            return f"'{e.value}'"
        return str(e.value)
    if isinstance(e, BinaryOp):
        op = {"&and": "&", "&or": "|", "&xor": "^"}.get(e.op, e.op.upper()
                                                        if e.op.isalpha()
                                                        else e.op)
        return f"{_render(e.left)} {op} {_render(e.right)}"
    if isinstance(e, UnaryOp):
        if e.op == "not":
            return f"NOT {_render(e.operand)}"
        return f"{e.op}{_render(e.operand)}"
    if isinstance(e, FuncCall):
        base = f"{e.name}({', '.join(_render(a) for a in e.args)})"
        if isinstance(e.over, str):
            return f"{base}over {e.over}"
        return base
    if isinstance(e, Cast):
        return f"cast({_render(e.operand)} as {e.type_name})"
    if isinstance(e, IsNull):
        return f"{_render(e.operand)} IS {'NOT ' if e.negated else ''}NULL"
    if isinstance(e, Like):
        return f"{_render(e.operand)} {e.kind.upper()} {_render(e.pattern)}"
    return "expr"


def _lower_select(stmt: SelectStmt, tables: dict, ctx: dict):
    import ray.data  # noqa: F401

    ds, scope = _lower_from(stmt.from_, tables, ctx)
    resolver = _freeze_scope(scope)

    # WHERE ------------------------------------------------------------
    if stmt.where is not None:
        if any(is_agg_call(n) for n in walk(stmt.where)):
            raise SqlLowerError("aggregates not allowed in WHERE")
        ds = ds.map_batches(_FilterBatches(stmt.where, resolver),
                            batch_format="pyarrow", batch_size=None)

    # expand * ----------------------------------------------------------
    items: list[SelectItem] = []
    for it in stmt.items:
        e = it.expr if isinstance(it, SelectItem) else it
        alias = it.alias if isinstance(it, SelectItem) else None
        if isinstance(e, Star):
            if e.table is not None:
                pairs = scope.table_output(e.table)
            else:
                pairs = scope.all_output()
            for disp, phys in pairs:
                items.append(SelectItem(Column(phys), disp))
        else:
            items.append(SelectItem(e, alias))

    items = [SelectItem(_push_scalar_over(it.expr), it.alias) for it in items]
    window_calls = [n for it in items for n in walk(it.expr)
                    if isinstance(n, FuncCall) and n.over is not None]
    for it in items:
        wnames = {n.over for n in walk(it.expr)
                  if isinstance(n, FuncCall) and isinstance(n.over, str)}
        if len(wnames) > 1:
            raise SqlLowerError(
                f"expression mixes windows {sorted(wnames)} "
                f"(matches reference, error_window.yaml id 12)")
    plain_aggs = [n for it in items for n in walk(it.expr)
                  if is_agg_call(n) and (not isinstance(n, FuncCall)
                                         or n.over is None)]
    if stmt.having is not None:
        plain_aggs += [n for n in walk(stmt.having) if is_agg_call(n)]

    if window_calls and (stmt.group_by or (plain_aggs and not stmt.windows)):
        raise SqlLowerError("mixing WINDOW and GROUP BY unsupported")

    replacements: dict = {}

    if window_calls:
        ds, replacements = _lower_windows(
            ds, stmt, window_calls, scope, resolver, tables, ctx)
    elif stmt.group_by or plain_aggs:
        ds, replacements = _lower_groupby(
            ds, stmt, plain_aggs, scope, resolver)
        # scope now = agg output columns
        resolver = _Resolver({})

    # HAVING -----------------------------------------------------------
    if stmt.having is not None:
        having = rewrite(stmt.having, replacements)
        ds = ds.map_batches(_FilterBatches(having, resolver),
                            batch_format="pyarrow", batch_size=None)

    # final projection ---------------------------------------------------
    proj_items = []
    seen: dict = {}
    validate = isinstance(resolver, _Resolver) and bool(resolver.mapping)
    for it in items:
        e = rewrite(it.expr, replacements)
        if validate:
            # worker-side eval looks columns up by physical name, so
            # ambiguity / unknown-db-qualifier errors must be raised at
            # LOWER time (test_lastjoin_complex.yaml id 14,
            # test_multiple_databases.yaml ids 3/8)
            for nd in walk(e):
                if isinstance(nd, Column):
                    resolver(nd)
        name = it.alias or _default_name(it.expr)
        if name in seen:
            # Ray Data blocks cannot carry duplicate column names; mark
            # dups with a __dupN suffix (consumers strip it for display)
            seen[name] += 1
            name = f"{name}__dup{seen[name]}"
        else:
            seen[name] = 0
        proj_items.append((name, e))
    keep_rid = ctx.get("keep_rid") and RID in ds.schema().names
    if keep_rid:
        proj_items.append((RID, Column(RID)))
    ds = ds.map_batches(_Project(proj_items, resolver),
                        batch_format="pyarrow", batch_size=None)

    # DISTINCT ----------------------------------------------------------
    if stmt.distinct:
        from ..stages.relational import distinct as distinct_stage
        ds = distinct_stage(ds)

    # ORDER BY / LIMIT ----------------------------------------------------
    if stmt.order_by:
        cols = [oi.column.name for oi in stmt.order_by]
        desc = [oi.desc for oi in stmt.order_by]
        ds = ds.sort(cols, descending=desc)
    if stmt.limit is not None:
        ds = ds.limit(stmt.limit)

    # UNION tail ----------------------------------------------------------
    if stmt.union_all is not None:
        other = _lower_select(stmt.union_all, tables, ctx)
        from ..core.empty_ds import union_any
        ds = union_any(ds, other)
        if stmt.union_distinct:
            from ..stages.relational import distinct as distinct_stage
            ds = distinct_stage(ds)

    return ds


# ---- window lowering ------------------------------------------------------

def _lower_windows(ds, stmt, window_calls, scope, resolver, tables, ctx):
    wdefs: dict[str, WindowDef] = {w.name: w for w in stmt.windows}

    # group agg calls per window (anonymous defs keyed by object)
    per_window: dict[object, list[FuncCall]] = {}
    for call in window_calls:
        key = call.over if isinstance(call.over, str) else call.over
        if isinstance(key, str):
            if key not in wdefs:
                raise SqlLowerError(f"unknown window {key!r}")
            key = wdefs[key]
        per_window.setdefault(key, []).append(call)

    replacements: dict = {}
    widx = 0
    for wdef, calls in per_window.items():
        ds = _run_one_window(ds, wdef, calls, scope, resolver, replacements,
                             tables, ctx, widx)
        widx += 1
    return ds, replacements


def _align_union(uds, primary_cols_phys: list, uscope: Scope):
    """Project a WINDOW UNION source to the primary's physical columns by
    display name (reference: schemas must match, WindowAggPlanUtil.scala)."""
    pairs = []
    for phys in primary_cols_phys:
        pairs.append((phys, Column(phys)))
    res = _freeze_scope(uscope)
    return uds.map_batches(_Project(pairs, res),
                           batch_format="pyarrow", batch_size=None)


def _run_one_window(ds, wdef: WindowDef, calls, scope, resolver,
                    replacements, tables, ctx, widx: int):
    from ..stages.window_stage import window_agg

    prefix = f"__w{widx}_"
    coll = AggCollector(prefix)
    for call in calls:
        repl = coll.add(call, resolver)
        replacements[call] = repl

    # materialize temp arg columns
    if coll.temp_exprs:
        ds = ds.map_batches(
            _AddColumns([(n, e) for n, e in coll.temp_exprs.items()], resolver),
            batch_format="pyarrow", batch_size=None)

    part_cols = [resolver(c) for c in wdef.partition_by]
    ptypes = dict(zip(ds.schema().names, ds.schema().types))
    for pcn in part_cols:
        pt = ptypes.get(pcn)
        if pt is not None and hasattr(pt, "id") and pa.types.is_floating(pt):
            # float/double partition keys are compile errors (no index can
            # cover them; test_performance_insensitive.yaml ids 14/15/17/18)
            raise SqlLowerError(
                f"window PARTITION BY {pcn!r}: float/double keys are "
                "invalid (matches reference)")
    if wdef.order_by is None:
        raise SqlLowerError("window requires ORDER BY (matches reference)")
    order_phys = resolver(wdef.order_by)

    # int64 order key (timestamps become ms)
    ord_col = f"{prefix}ord"
    ds = ds.map_batches(_OrderKey(order_phys, ord_col),
                        batch_format="pyarrow", batch_size=None)

    frame = frame_from_windowdef(wdef)

    union_ds = None
    if wdef.union_tables:
        # same-ts tie order across MULTIPLE union tables is the SQL list
        # order with the FIRST-listed table's rows buffering nearest the
        # primary row (test_window_union.yaml 19-1/19-2) — encode
        # (source_rank << 40) + per-table row-id as one int64 tiebreak
        # (insertion order within a table, reverse list order across)
        num_u = len(wdef.union_tables)
        ds = ds.map_batches(_EncodeUnionTb(num_u + 1),
                            batch_format="pyarrow", batch_size=None)
        primary_phys = [c for c in ds.schema().names]
        needed = [c for c in primary_phys if not c.startswith("__")]
        parts = []
        for uidx, ut in enumerate(wdef.union_tables):
            if isinstance(ut, SelectStmt):
                uds = _lower_select(ut, tables, dict(ctx, keep_rid=True))
            else:
                if ut not in tables:
                    raise SqlLowerError(f"unknown union table {ut!r}")
                uds = tables[ut]
            uschema = uds.schema()
            utypes = {n: t for n, t in zip(uschema.names, uschema.types)}
            missing = [c for c in needed if c not in utypes]
            if missing:
                raise SqlLowerError(
                    f"WINDOW UNION table missing columns {missing}")
            ptypes = {n: t for n, t in zip(ds.schema().names,
                                           ds.schema().types)}
            for c in needed:
                pt, ut = ptypes.get(c), utypes.get(c)
                if pt is not None and ut is not None and not pt.equals(ut):
                    raise SqlLowerError(
                        f"WINDOW UNION column {c!r} type mismatch: "
                        f"{ut} vs {pt} (matches reference)")
            uds = uds.map_batches(_EncodeUnionTb(num_u - uidx),
                                  batch_format="pyarrow", batch_size=None)
            pairs = [(c, Column(c)) for c in needed]
            pairs.append((UTB, Column(UTB)))
            uds = uds.map_batches(_Project(pairs, _Resolver({})),
                                  batch_format="pyarrow", batch_size=None)
            # temps + order key for the union side
            if coll.temp_exprs:
                uds = uds.map_batches(
                    _AddColumns(list(coll.temp_exprs.items()), _Resolver({})),
                    batch_format="pyarrow", batch_size=None)
            uds = uds.map_batches(_OrderKey(order_phys, ord_col),
                                  batch_format="pyarrow", batch_size=None)
            parts.append(uds)
        union_ds = parts[0]
        for p in parts[1:]:
            from ..core.empty_ds import union_any
            union_ds = union_any(union_ds, p)
        # align to the primary's full schema: columns the union source lacks
        # (earlier windows' features, __rid) become typed nulls — they are
        # never read by this window's aggs
        target = pa.schema(list(zip(ds.schema().names, ds.schema().types)))
        union_ds = union_ds.map_batches(_AlignSchema(target),
                                        batch_format="pyarrow", batch_size=None)

    if union_ds is not None and UTB in ds.schema().names:
        tiebreak = UTB
    else:
        tiebreak = RID if RID in ds.schema().names else None
    in_types = {n: t for n, t in zip(ds.schema().names, ds.schema().types)}
    specs = [_with_type_hints_deep(s, in_types) for s in coll.specs]
    # restore OpenMLDB UDAF result types (the vectorized kernel computes
    # sums/extremes in float64 for NaN-propagation; sum(int) must come back
    # int, count -> int64, avg -> double: udf/default_udf_library.cc)
    casts = {}
    for spec in specs:
        ty = _agg_result_type(spec, in_types)
        if ty is not None:
            casts[spec.name] = ty
    # sum(timestamp) is valid in the reference (args_in<..., Timestamp>,
    # default_udf_library.cc:2560) but pandas Timestamps don't add —
    # aggregate over a derived int64-ms view on BOTH streams and let the
    # result cast (already timestamp via _PRESERVE_KINDS) restore the type
    ts_sum_cols = sorted({s.col for s in specs
                          if s.kind == "sum" and s.col in in_types
                          and pa.types.is_timestamp(in_types[s.col])})
    if ts_sum_cols:
        import dataclasses

        def _add_ms_view(t: pa.Table, cols=tuple(ts_sum_cols)) -> pa.Table:
            import pyarrow.compute as pc
            for c in cols:
                t = t.append_column(f"__ms_{c}", pc.cast(t[c], pa.int64()))
            return t

        ds = ds.map_batches(_add_ms_view, batch_format="pyarrow",
                            batch_size=None)
        if union_ds is not None:
            union_ds = union_ds.map_batches(_add_ms_view,
                                            batch_format="pyarrow",
                                            batch_size=None)
        specs = [dataclasses.replace(s, col=f"__ms_{s.col}")
                 if (s.kind == "sum" and s.col in ts_sum_cols) else s
                 for s in specs]
    ds = window_agg(ds, part_cols, ord_col, specs, frame,
                    union=union_ds, tiebreak=tiebreak)
    if casts:
        ds = ds.map_batches(_CastCols(casts), batch_format="pyarrow",
                            batch_size=None)
    return ds


def _type_kind(t) -> str | None:
    if t is None:
        return None
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t):
        return "string"
    return None


_NUMERIC_VALUE_KINDS = frozenset([
    "sum_where", "avg_where", "min_where", "max_where",
    *[f"{b}_cate" for b in ("sum", "avg", "min", "max", "count")],
    *[f"{b}_cate_where" for b in ("sum", "avg", "min", "max", "count")],
    *[f"top_n_{m}_{b}_cate_where" for m in ("key", "value")
      for b in ("sum", "avg", "min", "max")],
])


def _with_type_hints(spec: AggSpec, in_types: dict) -> AggSpec:
    """Validate argument types (reference UDAF signatures) and attach
    source-type render hints for string-producing aggregates."""
    import dataclasses

    from ..functions import scalar as scalar_fns

    vk = _type_kind(in_types.get(spec.col)) if spec.col else None
    ck = _type_kind(in_types.get(spec.cat)) if spec.cat else None
    # value restrictions (test_udaf_function.yaml ids 18/26/33/40:
    # ts/date/string/bool values are compile errors for these UDAFs;
    # top_n_*_count_cate_where is the documented exception)
    if spec.kind in _NUMERIC_VALUE_KINDS and vk is not None \
            and vk not in ("int", "float"):
        raise SqlLowerError(
            f"{spec.kind} value must be numeric, got {vk} (matches reference)")
    if spec.kind == "avg" and vk in ("string", "timestamp", "date"):
        # avg rejects non-numeric values (args_in<int16..double>,
        # default_udf_library.cc:2680)
        raise SqlLowerError(
            f"{spec.kind} value must be numeric, got {vk} (matches reference)")
    if spec.kind == "sum" and vk in ("string", "date"):
        # sum accepts Timestamp but not string/date
        # (args_in<..., Timestamp>, default_udf_library.cc:2560;
        # test_udaf_function.yaml id 7 sum-timestamp expects success)
        raise SqlLowerError(
            f"{spec.kind} value must be numeric or timestamp, got {vk} "
            "(matches reference)")
    # category restrictions (ids 25/32/39: float/bool categories invalid)
    if spec.cat is not None and ck in ("float", "bool"):
        raise SqlLowerError(
            f"{spec.kind} category cannot be {ck} (matches reference)")
    return dataclasses.replace(
        spec,
        val_t=vk,
        cat_t=ck,
        tz_ms=scalar_fns.get_timezone_offset_ms(),
    )


def _with_type_hints_deep(spec: AggSpec, in_types: dict) -> AggSpec:
    import dataclasses

    spec = _with_type_hints(spec, in_types)

    def fix(fe):
        if fe is None:
            return None
        return dataclasses.replace(
            fe,
            inner=tuple(_with_type_hints_deep(i, in_types)
                        for i in fe.inner),
            const_types=tuple((i.name, _agg_result_type(i, in_types))
                              for i in fe.inner))

    if spec.expr is not None or spec.cond_expr is not None:
        spec = dataclasses.replace(spec, expr=fix(spec.expr),
                                   cond_expr=fix(spec.cond_expr))
    return spec


_PRESERVE_KINDS = {"sum", "min", "max", "lag", "at", "first_value", "lead",
                   "sum_where", "min_where", "max_where"}
_I64_KINDS = {"count", "count_star", "count_where", "distinct_count"}
_F64_KINDS = {"avg", "avg_where", "median", "top1_ratio"}


def _agg_result_type(spec: AggSpec, in_types: dict):
    if spec.kind in _I64_KINDS:
        return pa.int64()
    if spec.kind in _F64_KINDS:
        return pa.float64()
    if spec.kind in _PRESERVE_KINDS and spec.col in in_types:
        t = in_types[spec.col]
        if pa.types.is_integer(t) or pa.types.is_timestamp(t) or \
                pa.types.is_floating(t) or pa.types.is_boolean(t) or \
                pa.types.is_string(t) or pa.types.is_date(t):
            return t
    if spec.kind == "top":
        return pa.string()
    return None


class _CastCols:
    def __init__(self, casts: dict):
        self.casts = casts

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from .eval_expr import sql_cast

        for name, ty in self.casts.items():
            if name not in t.column_names:
                continue
            col = t[name].combine_chunks()
            if col.type.equals(ty):
                continue
            if pa.types.is_integer(ty) and (pa.types.is_floating(col.type)
                                            or pa.types.is_integer(col.type)):
                # C wrap-around overflow (test_window.yaml id 21); the
                # kernels mark NULL as NaN in float outputs -> null here
                vals = col.to_numpy(zero_copy_only=False)
                mask = pa.compute.is_null(col).to_numpy(zero_copy_only=False)
                with np.errstate(invalid="ignore"):
                    wrapped = np.asarray(vals, dtype=np.float64)
                    mask = mask | np.isnan(wrapped)
                    wrapped = np.where(np.isnan(wrapped), 0, wrapped)
                    ints = wrapped.astype(np.int64).astype(ty.to_pandas_dtype())
                arr = pa.array(ints, ty, mask=mask)
                t = t.set_column(t.column_names.index(name), name, arr)
                continue
            out = sql_cast(col, ty)
            if pa.types.is_floating(ty):
                # vectorized kernels use NaN as the NULL marker; a window
                # aggregate never legitimately returns NaN from non-NaN
                # input, so normalize (reference: empty window -> NULL)
                notnan = pc.fill_null(pc.is_nan(pc.fill_null(out, 0.0)), False)
                out = pc.if_else(notnan, pa.nulls(len(out), ty), out)
            t = t.set_column(t.column_names.index(name), name, out)
        return t


class _AlignSchema:
    """Reorder/null-fill a batch to a target pa.Schema (WINDOW UNION
    alignment)."""

    def __init__(self, schema: pa.Schema):
        self.schema = schema

    def __call__(self, t: pa.Table) -> pa.Table:
        from .eval_expr import sql_cast

        n = t.num_rows
        arrays = []
        for f in self.schema:
            if f.name in t.column_names:
                col = t[f.name].combine_chunks()
                if not col.type.equals(f.type):
                    col = sql_cast(col, f.type)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(arrays, schema=self.schema)


class _OrderKey:
    """Derive an int64 order key column from ts/int columns; reject
    date/string order keys (reference parity)."""

    def __init__(self, src: str, dst: str):
        self.src = src
        self.dst = dst

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.src]
        ty = col.type
        if pa.types.is_timestamp(ty):
            arr = pc.cast(col, pa.int64())
        elif pa.types.is_integer(ty):
            arr = pc.cast(col, pa.int64())
        else:
            raise SqlLowerError(
                f"window ORDER BY column {self.src!r} must be integer or "
                f"timestamp, got {ty} (matches reference)")
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if self.dst in t.column_names:
            return t.set_column(t.column_names.index(self.dst), self.dst, arr)
        return t.append_column(self.dst, arr)


# ---- group-by lowering ----------------------------------------------------

def _lower_groupby(ds, stmt, plain_aggs, scope, resolver):
    from ..stages.relational import group_aggregate

    coll = AggCollector("__g")
    replacements: dict = {}
    for call in plain_aggs:
        repl = coll.add(call, resolver)
        replacements[call] = repl

    if coll.temp_exprs:
        ds = ds.map_batches(
            _AddColumns(list(coll.temp_exprs.items()), resolver),
            batch_format="pyarrow", batch_size=None)

    sch = ds.schema()
    in_types = {n: t for n, t in zip(sch.names, sch.types)}
    coll.specs[:] = [_with_type_hints(s, in_types) for s in coll.specs]
    keys = [resolver(c) for c in stmt.group_by]
    for k in keys:
        kt = in_types.get(k)
        if kt is not None and hasattr(kt, "id") and pa.types.is_floating(kt):
            # float/double group keys are compile errors (same rule as
            # window partition keys; v040/test_groupby.yaml ids 6/7)
            raise SqlLowerError(
                f"GROUP BY {k!r}: float/double keys are invalid "
                "(matches reference)")
    if not keys:
        # global aggregate: constant key then drop
        ds = ds.map_batches(_AddColumns([("__gk", Literal(1))], resolver),
                            batch_format="pyarrow", batch_size=None)
        keys = ["__gk"]
    ds = group_aggregate(ds, keys, coll.specs)
    return ds, replacements


# ---- entry ----------------------------------------------------------------

def run_sql(sql: str, tables: dict, *, keep_rid: bool = False,
            default_db: str | None = None):
    """Parse + lower + return the (lazy) result Dataset.

    tables: {name: ray.data.Dataset}. Table names referenced in the SQL
    (including YAML-corpus placeholders ``{0}`` -> ``t0``) must be keys.
    default_db: scope qualifiers also resolve as ``<default_db>.<name>``
    (the reference addresses aliases through the session db,
    test_multiple_databases.yaml ids 7/9).
    """
    stmt = sql if isinstance(sql, SelectStmt) else parse_sql(sql)
    ctx = {"keep_rid": keep_rid, "default_db": default_db}
    from ..core.grouping import EMPTY_PROBE
    token = EMPTY_PROBE.set(_tables_are_tiny(tables))
    try:
        return _lower_select(stmt, tables, ctx)
    finally:
        EMPTY_PROBE.reset(token)


def _tables_are_tiny(tables: dict, limit: int = 100_000) -> bool:
    """True when every input is already in memory and small — the gate for
    grouping.EMPTY_PROBE (empty-input schema probing costs a count() per
    grouped stage, affordable only at conformance scale; a read_parquet
    input disables it so 100 TB pipelines never pay it)."""
    from ray.data.dataset import MaterializedDataset

    total = 0
    for t in tables.values():
        if isinstance(t, pd.DataFrame):
            total += len(t)
        elif isinstance(t, MaterializedDataset):
            total += t.count()
        else:
            return False
        if total > limit:
            return False
    return True
