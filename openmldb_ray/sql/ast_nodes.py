"""AST node definitions for the OpenMLDB offline SQL subset.

Shapes mirror the reference's logical plan nodes
(hybridse/include/node/sql_node.h: SelectQueryNode, WindowDefNode,
FrameNode, JoinNode) but are plain dataclasses — there is no port of the
reference's node hierarchy, only of WHAT each clause means.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---- expressions ----------------------------------------------------------

@dataclass(frozen=True)
class Literal:
    value: object          # python int/float/str/bool/None
    type_hint: str | None = None  # "string", "int", ... (None = inferred)


@dataclass(frozen=True)
class ArrayLiteral:
    """`[e1, e2, ...]` / `ARRAY<type>[...]` array literal (array_def.cc)."""
    items: tuple
    elem_type: str | None = None   # declared element type, None = inferred


@dataclass(frozen=True)
class Column:
    name: str
    table: str | None = None   # qualifier ({0}.c1 -> table "t0")


@dataclass(frozen=True)
class Star:
    table: str | None = None


@dataclass(frozen=True)
class UnaryOp:
    op: str                # "-", "+", "not"
    operand: object


@dataclass(frozen=True)
class BinaryOp:
    op: str                # "+","-","*","/","div","%","=","!=","<",...,"and","or","like","ilike","rlike"
    left: object
    right: object


@dataclass(frozen=True)
class IsNull:
    operand: object
    negated: bool = False


@dataclass(frozen=True)
class InList:
    operand: object
    items: tuple
    negated: bool = False


@dataclass(frozen=True)
class Between:
    operand: object
    low: object
    high: object
    negated: bool = False


@dataclass(frozen=True)
class Like:
    operand: object
    pattern: object
    kind: str                    # "like" | "ilike" | "rlike"
    escape: object | None = None
    negated: bool = False


@dataclass(frozen=True)
class Case:
    operand: object | None       # CASE x WHEN ... (None for searched CASE)
    whens: tuple                 # ((cond_or_value, result), ...)
    default: object | None


@dataclass(frozen=True)
class Cast:
    operand: object
    type_name: str               # "int","bigint","float","double","string","timestamp","date","bool","smallint"
    # True when written as the type-function form ``bool(x)`` instead of
    # CAST(x AS bool): the reference routes the former through the bool()
    # UDF (token parse: udf.cc StringToBool) and the latter through codegen
    # BoolCast (size != 0) — test_type.yaml ids 1 vs 23
    via_fn: bool = False


@dataclass(frozen=True)
class FuncCall:
    name: str                    # lowercased
    args: tuple
    over: str | None = None      # window name for `agg(...) OVER w`
    distinct: bool = False       # count(distinct x)


# ---- clauses --------------------------------------------------------------

@dataclass(frozen=True)
class SelectItem:
    expr: object
    alias: str | None            # None -> derive from expr text


@dataclass(frozen=True)
class FrameBound:
    kind: str                    # "unbounded" | "current" | "preceding" | "open_preceding"
    value: int | None = None     # offset (rows count, or ms for range)
    interval: bool = False       # bound written with a time unit (2s/3m/...)


@dataclass(frozen=True)
class WindowDef:
    name: str
    partition_by: tuple          # of Column
    order_by: Column | None
    frame_type: str | None       # "rows" | "rows_range" | None (unbounded default)
    start: FrameBound | None
    end: FrameBound | None
    union_tables: tuple = ()     # table names for WINDOW ... AS (UNION t1 ...)
    max_size: int | None = None  # None = no MAXSIZE clause written
    exclude_current_time: bool = False
    exclude_current_row: bool = False
    instance_not_in_window: bool = False


@dataclass(frozen=True)
class TableRef:
    name: str
    alias: str | None = None
    subquery: object | None = None   # SelectStmt for FROM (subquery)


@dataclass(frozen=True)
class Join:
    kind: str                    # "last" | "left"
    left: object                 # TableRef | Join
    right: TableRef
    condition: object            # ON expression
    order_by: Column | None = None   # LAST JOIN ORDER BY
    order_desc: bool = False     # ORDER BY ... DESC → min order wins


@dataclass(frozen=True)
class OrderItem:
    column: Column
    desc: bool = False


@dataclass(frozen=True)
class SelectStmt:
    items: tuple                 # of SelectItem | Star
    from_: object                # TableRef | Join | None
    where: object | None = None
    group_by: tuple = ()         # of Column
    having: object | None = None
    windows: tuple = ()          # of WindowDef
    order_by: tuple = ()         # of OrderItem
    limit: int | None = None
    distinct: bool = False
    # set-op tail: UNION [ALL|DISTINCT] <SelectStmt> (reference sql_node.h kQueryUnion)
    union_all: object | None = None
    union_distinct: bool = False
    into_outfile: str | None = None   # SELECT ... INTO OUTFILE 'path'
