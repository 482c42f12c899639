"""Recursive-descent parser for the OpenMLDB offline SQL subset.

Covers the grammar exercised by the reference's conformance corpus
(cases/function/**/*.yaml): SELECT [DISTINCT] items FROM (table | subquery |
LAST JOIN | LEFT JOIN) [WHERE] [GROUP BY] [HAVING] [WINDOW ...] [ORDER BY]
[LIMIT], expressions with the full operator set (arithmetic incl. DIV/MOD,
comparison, AND/OR/NOT/XOR, LIKE/ILIKE/RLIKE, IN, BETWEEN, IS NULL, CASE
WHEN, CAST / type() casts), aggregate calls with OVER, and the window
definition grammar (UNION sources, PARTITION BY, ORDER BY, ROWS /
ROWS_RANGE frames with OPEN/UNBOUNDED/MAXSIZE/EXCLUDE-attributes,
INSTANCE_NOT_IN_WINDOW).  Grammar reference: hybridse's zetasql-derived
parser (hybridse/include/node/sql_node.h WindowDefNode/FrameNode) — the
rules here are re-derived from the SQL text in the cases, not ported.
"""

from __future__ import annotations

from .ast_nodes import (
    ArrayLiteral, Between, BinaryOp, Case, Cast, Column, FrameBound,
    FuncCall, InList, IsNull, Join, Like, Literal, OrderItem, SelectItem,
    SelectStmt, Star, TableRef, UnaryOp, WindowDef,
)
from .lexer import SqlSyntaxError, Token, tokenize

_TYPE_NAMES = {"smallint", "int", "int16", "int32", "int64", "integer", "bigint",
               "float", "double", "string", "varchar", "timestamp", "date", "bool"}

#: words that terminate an implicit (AS-less) alias
_RESERVED = {
    "from", "where", "group", "having", "window", "order", "limit", "as",
    "and", "or", "not", "xor", "like", "ilike", "rlike", "in", "between",
    "is", "null", "case", "when", "then", "else", "end", "join", "last",
    "left", "on", "union", "distinct", "select", "asc", "desc", "true",
    "false", "div", "mod", "config", "over", "into", "outfile", "options",
    "partition", "rows", "rows_range", "range", "preceding", "following",
    "maxsize", "exclude", "open", "current", "escape", "instance_not_in_window",
}


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self, ahead: int = 0) -> Token | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def at_kw(self, *words: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t is not None and t.kind == "ident" and t.text.lower() in words

    def at_op(self, *ops: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t is not None and t.kind == "op" and t.text in ops

    def take(self) -> Token:
        t = self.peek()
        if t is None:
            raise SqlSyntaxError("unexpected end of input")
        self.i += 1
        return t

    def expect_kw(self, word: str) -> Token:
        if not self.at_kw(word):
            raise SqlSyntaxError(f"expected {word.upper()} at {self._where()}")
        return self.take()

    def expect_op(self, op: str) -> Token:
        if not self.at_op(op):
            raise SqlSyntaxError(f"expected {op!r} at {self._where()}")
        return self.take()

    def _where(self) -> str:
        t = self.peek()
        return f"token {t.text!r} (pos {t.pos})" if t else "end of input"

    # -- entry --------------------------------------------------------------
    def parse(self) -> SelectStmt:
        stmt = self.parse_select()
        if self.at_op(";"):
            self.take()
        if self.peek() is not None:
            raise SqlSyntaxError(f"trailing input at {self._where()}")
        return stmt

    def parse_select(self) -> SelectStmt:
        self.expect_kw("select")
        distinct = False
        if self.at_kw("distinct"):
            self.take()
            distinct = True
        items = [self.parse_select_item()]
        while self.at_op(","):
            self.take()
            if self.at_kw("from") or self.peek() is None or self.at_op(";"):
                break   # trailing comma (accepted by reference), incl. FROM-less
            items.append(self.parse_select_item())

        from_ = None
        if self.at_kw("from"):
            self.take()
            from_ = self.parse_table_expr()

        where = None
        if self.at_kw("where"):
            self.take()
            where = self.parse_expr()

        group_by: list[Column] = []
        if self.at_kw("group"):
            self.take()
            self.expect_kw("by")
            group_by.append(self.parse_column_ref())
            while self.at_op(","):
                self.take()
                group_by.append(self.parse_column_ref())

        having = None
        if self.at_kw("having"):
            self.take()
            having = self.parse_expr()

        windows: list[WindowDef] = []
        if self.at_kw("window"):
            self.take()
            windows.append(self.parse_window_def())
            while self.at_op(","):
                self.take()
                windows.append(self.parse_window_def())

        order_by: list[OrderItem] = []
        if self.at_kw("order"):
            self.take()
            self.expect_kw("by")
            while True:
                col = self.parse_column_ref()
                desc = False
                if self.at_kw("desc"):
                    self.take()
                    desc = True
                elif self.at_kw("asc"):
                    self.take()
                order_by.append(OrderItem(col, desc))
                if self.at_op(","):
                    self.take()
                    continue
                break

        limit = None
        if self.at_kw("limit"):
            self.take()
            t = self.take()
            if t.kind != "int":
                raise SqlSyntaxError(f"LIMIT expects an integer, got {t.text!r}")
            limit = t.value

        into_outfile = None
        if self.at_kw("into"):
            self.take()
            self.expect_kw("outfile")
            t = self.take()
            into_outfile = t.value
            if self.at_kw("options"):
                self.take()
                self._skip_parens()

        union_all = None
        union_distinct = False
        if self.at_kw("union"):
            self.take()
            if self.at_kw("distinct"):
                self.take()
                union_distinct = True
            elif self.at_kw("all"):
                self.take()
            union_all = self.parse_select()

        if self.at_kw("config"):  # CONFIG (execute_mode=...) — online hint, ignored
            self.take()
            self._skip_parens()

        return SelectStmt(
            items=tuple(items), from_=from_, where=where,
            group_by=tuple(group_by), having=having, windows=tuple(windows),
            order_by=tuple(order_by), limit=limit, distinct=distinct,
            union_all=union_all, union_distinct=union_distinct,
            into_outfile=into_outfile,
        )

    def _skip_parens(self) -> None:
        self.expect_op("(")
        depth = 1
        while depth:
            t = self.take()
            if t.kind == "op" and t.text == "(":
                depth += 1
            elif t.kind == "op" and t.text == ")":
                depth -= 1

    # -- select items -------------------------------------------------------
    def parse_select_item(self):
        if self.at_op("*"):
            self.take()
            return SelectItem(Star(), None)
        # table.* form
        if (self.peek() and self.peek().kind == "ident" and self.at_op(".", ahead=1)
                and self.at_op("*", ahead=2)):
            tbl = self.take().text
            self.take()
            self.take()
            return SelectItem(Star(table=tbl), None)
        expr = self.parse_expr()
        alias = None
        if self.at_kw("as"):
            self.take()
            alias = self.take().text
        elif (self.peek() and self.peek().kind == "ident"
              and self.peek().text.lower() not in _RESERVED):
            alias = self.take().text
        return SelectItem(expr, alias)

    # -- FROM ---------------------------------------------------------------
    def parse_table_expr(self):
        left = self.parse_table_primary()
        while True:
            if self.at_kw("last") and self.at_kw("join", ahead=1):
                self.take(); self.take()
                right = self.parse_table_primary()
                jorder = None
                jdesc = False
                if self.at_kw("order"):
                    self.take()
                    self.expect_kw("by")
                    jorder = self.parse_column_ref()
                    if self.at_kw("asc"):
                        self.take()
                    elif self.at_kw("desc"):
                        self.take()
                        jdesc = True
                self.expect_kw("on")
                cond = self.parse_expr()
                left = Join("last", left, right, cond, jorder, jdesc)
            elif self.at_kw("left"):
                self.take()
                if self.at_kw("outer"):
                    self.take()
                self.expect_kw("join")
                right = self.parse_table_primary()
                self.expect_kw("on")
                cond = self.parse_expr()
                left = Join("left", left, right, cond)
            else:
                return left

    def parse_table_primary(self) -> TableRef:
        if self.at_op("("):
            self.take()
            sub = self.parse_select()
            self.expect_op(")")
            alias = None
            if self.at_kw("as"):
                self.take()
                alias = self.take().text
            elif (self.peek() and self.peek().kind == "ident"
                  and self.peek().text.lower() not in _RESERVED):
                alias = self.take().text
            return TableRef(name=alias or "__subquery__", alias=alias, subquery=sub)
        t = self.take()
        if t.kind != "ident":
            raise SqlSyntaxError(f"expected table name, got {t.text!r}")
        name = t.text
        if self.at_op("."):  # db.table — resolved as a qualified name so a
            self.take()      # WRONG db errors (test_out_in.yaml id 6)
            name = f"{name}.{self.take().text}"
        alias = None
        if self.at_kw("as"):
            self.take()
            alias = self.take().text
        elif (self.peek() and self.peek().kind == "ident"
              and self.peek().text.lower() not in _RESERVED):
            alias = self.take().text
        return TableRef(name=name, alias=alias)

    # -- WINDOW definitions -------------------------------------------------
    def parse_window_def(self) -> WindowDef:
        name = self.take().text
        self.expect_kw("as")
        self.expect_op("(")
        return self.parse_window_body(name)

    def parse_window_body(self, name: str) -> WindowDef:

        union_tables: list = []
        if self.at_kw("union"):
            self.take()
            while True:
                if self.at_op("("):
                    self.take()
                    union_tables.append(self.parse_select())
                    self.expect_op(")")
                    if self.at_kw("as"):
                        self.take()
                        self.take()  # alias on a window-union subquery: unused
                    elif (self.peek() and self.peek().kind == "ident"
                          and self.peek().text.lower() not in _RESERVED):
                        self.take()
                else:
                    union_tables.append(self.take().text)
                if self.at_op(","):
                    self.take()
                    continue
                break

        self.expect_kw("partition")
        self.expect_kw("by")
        partition_by = [self.parse_column_ref()]
        while self.at_op(","):
            self.take()
            partition_by.append(self.parse_column_ref())

        order_col = None
        if self.at_kw("order"):
            self.take()
            self.expect_kw("by")
            order_col = self.parse_column_ref()
            if self.at_kw("asc"):
                self.take()
            elif self.at_kw("desc"):
                raise SqlSyntaxError("DESC window ORDER BY unsupported (matches reference)")

        frame_type = None
        start = end = None
        if self.at_kw("rows", "rows_range", "range"):
            ft = self.take().text.lower()
            frame_type = "rows" if ft == "rows" else "rows_range"
            self.expect_kw("between")
            start = self.parse_frame_bound()
            self.expect_kw("and")
            end = self.parse_frame_bound()

        max_size = None
        exclude_time = exclude_row = instance_not_in = False
        seen_exclude = False
        while True:
            if self.at_kw("maxsize"):
                if seen_exclude:
                    # reference grammar: MAXSIZE belongs to the frame clause
                    # and cannot follow EXCLUDE attrs (test_current_row id 30)
                    raise SqlSyntaxError("MAXSIZE must precede EXCLUDE attributes")
                self.take()
                neg = self.at_op("-")
                if neg:
                    self.take()
                t = self.take()
                max_size = -int(t.value) if neg else int(t.value)
            elif self.at_kw("exclude"):
                seen_exclude = True
                self.take()
                w = self.take().text.lower()
                if w == "current_time":
                    exclude_time = True
                elif w == "current_row":
                    exclude_row = True
                elif w == "current":  # EXCLUDE CURRENT ROW / CURRENT TIME spellings
                    w2 = self.take().text.lower()
                    if w2 == "row":
                        exclude_row = True
                    elif w2 == "time":
                        exclude_time = True
                    else:
                        raise SqlSyntaxError(f"EXCLUDE CURRENT {w2!r}?")
                else:
                    raise SqlSyntaxError(f"EXCLUDE {w!r}?")
            elif self.at_kw("instance_not_in_window"):
                self.take()
                instance_not_in = True
            else:
                break
        self.expect_op(")")
        return WindowDef(
            name=name, partition_by=tuple(partition_by), order_by=order_col,
            frame_type=frame_type, start=start, end=end,
            union_tables=tuple(union_tables), max_size=max_size,
            exclude_current_time=exclude_time, exclude_current_row=exclude_row,
            instance_not_in_window=instance_not_in,
        )

    def parse_frame_bound(self) -> FrameBound:
        if self.at_kw("unbounded"):
            self.take()
            self.expect_kw("preceding")
            return FrameBound("unbounded")
        if self.at_kw("current"):
            self.take()
            self.expect_kw("row")
            return FrameBound("current")
        t = self.take()
        interval = False
        if t.kind == "op" and t.text == "-":  # negative bound (error cases probe this)
            t2 = self.take()
            interval = t2.kind == "interval"
            val = -int(t2.value)
        elif t.kind in ("int", "interval"):
            interval = t.kind == "interval"
            val = int(t.value)
        else:
            raise SqlSyntaxError(f"bad frame bound at {t.text!r}")
        if self.at_kw("open"):
            self.take()
            self.expect_kw("preceding")
            return FrameBound("open_preceding", val, interval)
        if self.at_kw("preceding"):
            self.take()
            return FrameBound("preceding", val, interval)
        if self.at_kw("following"):
            self.take()
            raise SqlSyntaxError("FOLLOWING bounds unsupported (matches reference)")
        raise SqlSyntaxError(f"expected PRECEDING at {self._where()}")

    # -- expressions --------------------------------------------------------
    def parse_column_ref(self) -> Column:
        t = self.take()
        if t.kind != "ident":
            raise SqlSyntaxError(f"expected column, got {t.text!r}")
        if self.at_op("."):
            self.take()
            col = self.take()
            if self.at_op("."):  # db.table.col — keep the db so SAME-named
                self.take()      # tables in different dbs stay distinct
                col2 = self.take()  # (test_multiple_databases.yaml id 12)
                return Column(col2.text, table=f"{t.text}.{col.text}")
            return Column(col.text, table=t.text)
        return Column(t.text)

    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_xor()
        while self.at_kw("or") or self.at_op("||"):
            # NOTE: in hybridse `||` is logical OR, not concat (udf docs)
            self.take()
            left = BinaryOp("or", left, self.parse_xor())
        return left

    def parse_xor(self):
        left = self.parse_and()
        while self.at_kw("xor"):
            self.take()
            left = BinaryOp("xor", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.at_kw("and"):
            self.take()
            left = BinaryOp("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.at_kw("not") or self.at_op("!"):
            self.take()
            return UnaryOp("not", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self):
        left = self.parse_bitor()
        while True:
            if self.at_op("=", "==", "!=", "<>", "<", "<=", ">", ">="):
                op = self.take().text
                op = {"==": "=", "<>": "!="}.get(op, op)
                left = BinaryOp(op, left, self.parse_bitor())
                continue
            negated = False
            j = 0
            if self.at_kw("not"):
                if self.at_kw("like", "ilike", "rlike", "in", "between", ahead=1):
                    negated = True
                    j = 1
                else:
                    break
            if self.at_kw("like", "ilike", "rlike", ahead=j):
                if negated:
                    self.take()
                op = self.take().text.lower()
                pattern = self.parse_bitor()
                escape = None
                if self.at_kw("escape"):
                    self.take()
                    escape = self.parse_primary()
                left = Like(left, pattern, op, escape, negated)
                continue
            if self.at_kw("in", ahead=j):
                if negated:
                    self.take()
                self.take()
                self.expect_op("(")
                items = [self.parse_expr()]
                while self.at_op(","):
                    self.take()
                    items.append(self.parse_expr())
                self.expect_op(")")
                left = InList(left, tuple(items), negated)
                continue
            if self.at_kw("between", ahead=j):
                if negated:
                    self.take()
                self.take()
                low = self.parse_bitor()
                self.expect_kw("and")
                high = self.parse_bitor()
                left = Between(left, low, high, negated)
                continue
            if self.at_kw("is"):
                self.take()
                neg = False
                if self.at_kw("not"):
                    self.take()
                    neg = True
                self.expect_kw("null")
                left = IsNull(left, neg)
                continue
            break
        return left

    def parse_bitor(self):
        left = self.parse_bitand()
        while self.at_op("|"):
            self.take()
            left = BinaryOp("&or", left, self.parse_bitand())
        return left

    def parse_bitand(self):
        left = self.parse_bitxor()
        while self.at_op("&"):
            self.take()
            left = BinaryOp("&and", left, self.parse_bitxor())
        return left

    def parse_bitxor(self):
        left = self.parse_shift()
        while self.at_op("^"):
            self.take()
            left = BinaryOp("&xor", left, self.parse_shift())
        return left

    def parse_shift(self):
        left = self.parse_additive()
        while self.at_op("<<", ">>"):
            op = self.take().text
            left = BinaryOp(op, left, self.parse_additive())
        return left

    def parse_additive(self):
        left = self.parse_multiplicative()
        while self.at_op("+", "-"):
            op = self.take().text
            left = BinaryOp(op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self):
        left = self.parse_unary()
        while self.at_op("*", "/", "%") or self.at_kw("div", "mod"):
            t = self.take()
            op = t.text.lower() if t.kind == "ident" else t.text
            op = {"mod": "%"}.get(op, op)
            left = BinaryOp(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at_op("-"):
            self.take()
            return UnaryOp("-", self.parse_unary())
        if self.at_op("+"):
            self.take()
            return self.parse_unary()
        if self.at_op("!"):
            self.take()
            return UnaryOp("not", self.parse_unary())
        if self.at_op("~"):
            self.take()
            return UnaryOp("~", self.parse_unary())
        return self.parse_primary()

    def _parse_array_literal(self, elem_type: str | None):
        self.expect_op("[")
        items: list = []
        if not self.at_op("]"):
            items.append(self.parse_expr())
            while self.at_op(","):
                self.take()
                items.append(self.parse_expr())
        self.expect_op("]")
        return ArrayLiteral(tuple(items), elem_type)

    def parse_primary(self):
        t = self.peek()
        if t is None:
            raise SqlSyntaxError("unexpected end of expression")
        if t.kind in ("int",):
            self.take()
            return Literal(t.value, "bigint" if t.text.rstrip("lL") != t.text or abs(t.value) > 2**31 - 1 else "int")
        if t.kind == "float":
            self.take()
            return Literal(t.value, "float" if t.text.rstrip("fF") != t.text else "double")
        if t.kind == "interval":
            # interval literals are only valid as frame bounds, which are
            # parsed by parse_frame_bound — the reference rejects them in
            # projections/expressions ("un-support const node kInterval",
            # cases/query/fail_query.yaml)
            raise SqlSyntaxError(
                f"interval literal {t.text!r} outside a window frame bound "
                "(matches reference)")
        if t.kind == "string":
            self.take()
            return Literal(t.value, "string")
        if t.kind == "op" and t.text == "(":
            self.take()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == "op" and t.text == "*":
            # only valid inside count(*) — callers handle
            self.take()
            return Star()
        if t.kind == "op" and t.text == "[":
            return self._parse_array_literal(None)
        if t.kind != "ident":
            raise SqlSyntaxError(f"unexpected token {t.text!r} in expression")

        word = t.text.lower()
        if word == "array" and self.at_op("<", ahead=1):
            # ARRAY<type>[e1, ...] typed array literal (array_def.cc)
            self.take()
            self.expect_op("<")
            ety = self.take().text.lower()
            self.expect_op(">")
            return self._parse_array_literal(ety)
        if word == "null":
            self.take()
            return Literal(None)
        if word in ("true", "false"):
            self.take()
            return Literal(word == "true", "bool")
        if word == "case":
            return self.parse_case()
        if word == "cast":
            self.take()
            self.expect_op("(")
            operand = self.parse_expr()
            self.expect_kw("as")
            ty = self.take().text.lower()
            if self.at_op("("):  # VARCHAR(60) — length ignored (strings unbounded)
                self.take()
                self.take()
                self.expect_op(")")
            self.expect_op(")")
            return Cast(operand, ty)
        if word == "distinct":  # count(distinct c) — handled by FuncCall caller
            pass

        # function call?
        if self.at_op("(", ahead=1):
            self.take()
            self.take()  # (
            if word in _TYPE_NAMES:
                # type(x) cast form (UDF semantics, see Cast.via_fn)
                operand = self.parse_expr()
                self.expect_op(")")
                return Cast(operand, word, via_fn=True)
            distinct = False
            args: list = []
            if self.at_kw("distinct"):
                self.take()
                distinct = True
            if not self.at_op(")"):
                args.append(self.parse_expr())
                while self.at_op(","):
                    self.take()
                    args.append(self.parse_expr())
            self.expect_op(")")
            over = None
            if self.at_kw("over"):
                self.take()
                if self.at_op("("):  # anonymous inline window
                    self.take()
                    over = self.parse_window_body("__anon__")
                    # parse_window_body consumes the closing ")"
                else:
                    over = self.take().text
            return FuncCall(word, tuple(args), over=over, distinct=distinct)

        # column ref (possibly qualified)
        return self.parse_column_ref()

    def parse_case(self):
        self.expect_kw("case")
        operand = None
        if not self.at_kw("when"):
            operand = self.parse_expr()
        whens = []
        while self.at_kw("when"):
            self.take()
            cond = self.parse_expr()
            self.expect_kw("then")
            res = self.parse_expr()
            whens.append((cond, res))
        default = None
        if self.at_kw("else"):
            self.take()
            default = self.parse_expr()
        self.expect_kw("end")
        return Case(operand, tuple(whens), default)


def parse_sql(sql: str) -> SelectStmt:
    return Parser(tokenize(sql)).parse()
