"""Differential fuzzer: the openmldb_ray SQL engine vs DuckDB.

Generates random scalar expressions from the dialect SHARED by the engine
(OpenMLDB semantics, re-derived from hybridse udf.cc / the expression
conformance corpus) and DuckDB (ANSI), evaluates both over the same Arrow
table, and reports value mismatches. The generator deliberately avoids the
documented divergences (CAST-failure->NULL vs error, concat null-skipping,
substr pos=0, DECIMAL literal typing) so every mismatch is a real bug in
one engine's shared-dialect behavior.

Usage:  python tools/fuzz_sql.py [--seeds 200] [--start 0] [--rows 64]
Prints one line per mismatching expression with both values; exit 1 if any.

tests/test_sql_fuzz.py pins a fixed seed range of this generator in CI.
"""
from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# random table
# ---------------------------------------------------------------------------

ALPHA = ["a", "b", "ab", "ba", "abc", "", "aa", "bab"]


def gen_table(rng: random.Random, n: int) -> pa.Table:
    def mask(p=0.2):
        return [rng.random() < p for _ in range(n)]

    def col(vals, typ):
        m = mask()
        return pa.array([None if mk else v for v, mk in zip(vals, m)], typ)

    # epoch ms within 2019-2021 (engine tz offset defaults to 0 == DuckDB's
    # naive-UTC reading of Arrow timestamps)
    base_ms = 1_546_300_800_000
    return pa.table({
        "i": col([rng.randint(-12, 12) for _ in range(n)], pa.int32()),
        "j": col([rng.randint(-12, 12) for _ in range(n)], pa.int64()),
        "h": col([rng.randint(-12, 12) for _ in range(n)], pa.int16()),
        "f": col([round(rng.uniform(-8, 8), 3) for _ in range(n)],
                 pa.float64()),
        "s": col([rng.choice(ALPHA) for _ in range(n)], pa.string()),
        "t": col([rng.choice(ALPHA) for _ in range(n)], pa.string()),
        "b": col([rng.random() < 0.5 for _ in range(n)], pa.bool_()),
        "tm": col([base_ms + rng.randint(0, 2 * 365 * 86_400_000)
                   for _ in range(n)], pa.timestamp("ms")),
        "dt": col([rng.randint(17_800, 18_700) for _ in range(n)],
                  pa.date32()),
        "__rid": pa.array(range(n), pa.int64()),
    })


# ---------------------------------------------------------------------------
# expression generator: each node renders to (engine_sql, duckdb_sql)
# ---------------------------------------------------------------------------

class E:
    __slots__ = ("eng", "duck")

    def __init__(self, eng: str, duck: str | None = None):
        self.eng = eng
        self.duck = duck if duck is not None else eng


def num_lit(rng) -> E:
    if rng.random() < 0.15:
        return E("NULL", "CAST(NULL AS DOUBLE)")
    if rng.random() < 0.5:
        return E(str(rng.randint(-12, 12)))
    v = round(rng.uniform(-8, 8), 3)
    # DuckDB types bare decimals as DECIMAL; force DOUBLE on both sides
    return E(f"CAST({v} AS DOUBLE)")


def str_lit(rng) -> E:
    if rng.random() < 0.1:
        return E("NULL", "CAST(NULL AS VARCHAR)")
    return E("'%s'" % rng.choice(ALPHA))


def gen_time_num(rng) -> E:
    """Civil-field extraction: integer-valued, shared with DuckDB at tz=0."""
    r = rng.random()
    if r < 0.55:
        fn = rng.choice(["year", "month", "day", "hour", "minute", "second"])
        return E(f"{fn}(tm)")
    if r < 0.70:
        # OpenMLDB dayofweek: Sunday=1..Saturday=7; DuckDB: Sunday=0..6
        return E("dayofweek(tm)", "(dayofweek(tm) + 1)")
    if r < 0.80:
        return E("weekofyear(tm)")
    if r < 0.90:
        # datediff(a, b) = a - b in days; date(tm) truncates at tz=0
        return E("datediff(dt, date(tm))",
                 "datediff('day', CAST(tm AS DATE), dt)")
    # scaled down so products/sums can't overflow int64 (engine wraps,
    # DuckDB raises — either way not a shared-dialect comparison).
    # floor() before ::BIGINT: DuckDB's cast rounds half-even, while the
    # reference's unix_timestamp truncates sub-second ms to whole seconds.
    return E("(unix_timestamp(tm) % 86400)",
             "(floor(epoch(tm))::BIGINT % 86400)")


def gen_num(rng, depth: int, mults: int = 2) -> E:
    if depth <= 0:
        if rng.random() < 0.12:
            return gen_time_num(rng)
        return rng.choice([lambda: E(rng.choice(["i", "j", "h", "f"])),
                           lambda: num_lit(rng)])()
    r = rng.random()
    if r < 0.35:
        op = rng.choice(["+", "-", "*"] if mults > 0 else ["+", "-"])
        nm = mults - 1 if op == "*" else mults
        # bound products: '*' operands are leaves
        d = 0 if op == "*" else depth - 1
        a, b = gen_num(rng, d, nm), gen_num(rng, d, nm)
        return E(f"({a.eng} {op} {b.eng})", f"({a.duck} {op} {b.duck})")
    if r < 0.45:
        a, b = gen_num(rng, depth - 1, 0), gen_num(rng, 0)
        # both engines: / always double, 0 or NULL divisor -> NULL
        return E(f"({a.eng} / {b.eng})", f"({a.duck} / {b.duck})")
    if r < 0.50:
        a = gen_num(rng, depth - 1, mults)
        return E(f"(- {a.eng})", f"(- {a.duck})")
    if r < 0.62:
        c = gen_bool(rng, depth - 1)
        a, b = gen_num(rng, depth - 1, mults), gen_num(rng, depth - 1, mults)
        return E(f"(CASE WHEN {c.eng} THEN {a.eng} ELSE {b.eng} END)",
                 f"(CASE WHEN {c.duck} THEN {a.duck} ELSE {b.duck} END)")
    if r < 0.70:
        s = gen_str(rng, depth - 1)
        return E(f"char_length({s.eng})", f"length({s.duck})")
    if r < 0.78:
        a, b = gen_num(rng, depth - 1, 1), gen_num(rng, 0)
        # %: C fmod on both; x % 0 -> NULL on both
        return E(f"({a.eng} % {b.eng})", f"({a.duck} % {b.duck})")
    if r < 0.86:
        a = gen_num(rng, depth - 1, mults)
        fn = rng.choice(["abs", "floor", "ceil", "round", "truncate"])
        dfn = "trunc" if fn == "truncate" else fn
        return E(f"{fn}({a.eng})", f"{dfn}(CAST({a.duck} AS DOUBLE))")
    if r < 0.90:
        a = gen_num(rng, depth - 1, mults)
        # sqrt over a non-negative argument (NaN-vs-NULL differences aside)
        return E(f"sqrt(abs({a.eng}))",
                 f"sqrt(abs(CAST({a.duck} AS DOUBLE)))")
    if r < 0.92:
        a, b = gen_str(rng, depth - 1), gen_str(rng, depth - 1)
        # strcmp = sign(a cmp b); NULL operand -> NULL on both sides
        return E(f"strcmp({a.eng}, {b.eng})",
                 f"(CASE WHEN {a.duck} > {b.duck} THEN 1 "
                 f"WHEN {a.duck} < {b.duck} THEN -1 "
                 f"WHEN {a.duck} = {b.duck} THEN 0 END)")
    if r < 0.97:
        # if_null requires SAME-TYPE operands (reference parity) — cast both
        a, b = gen_num(rng, depth - 1, mults), gen_num(rng, depth - 1, mults)
        return E(f"if_null(CAST({a.eng} AS DOUBLE), "
                 f"CAST({b.eng} AS DOUBLE))",
                 f"coalesce(CAST({a.duck} AS DOUBLE), "
                 f"CAST({b.duck} AS DOUBLE))")
    return gen_num(rng, 0)


def gen_str(rng, depth: int) -> E:
    if depth <= 0:
        return rng.choice([lambda: E(rng.choice(["s", "t"])),
                           lambda: str_lit(rng)])()
    r = rng.random()
    if r < 0.25:
        a = gen_str(rng, depth - 1)
        fn = rng.choice(["upper", "lower"])
        return E(f"{fn}({a.eng})", f"{fn}({a.duck})")
    if r < 0.50:
        a = gen_str(rng, depth - 1)
        pos = rng.randint(1, 5)
        if rng.random() < 0.5:
            ln = rng.randint(0, 4)
            return E(f"substr({a.eng}, {pos}, {ln})",
                     f"substr({a.duck}, {pos}, {ln})")
        return E(f"substr({a.eng}, {pos})", f"substr({a.duck}, {pos})")
    if r < 0.65:
        # concat: OpenMLDB any-NULL->NULL == ANSI || (DuckDB concat() skips
        # nulls, so render || on the DuckDB side)
        a, b = gen_str(rng, depth - 1), gen_str(rng, depth - 1)
        return E(f"concat({a.eng}, {b.eng})", f"({a.duck} || {b.duck})")
    if r < 0.70:
        fmt = rng.choice(["%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%H:%M"])
        return E(f"date_format(tm, '{fmt}')", f"strftime(tm, '{fmt}')")
    if r < 0.76:
        a = gen_str(rng, depth - 1)
        pat = rng.choice(["a", "b", "ab", "aa"])
        rep = rng.choice(["x", "", "zz"])
        return E(f"replace({a.eng}, '{pat}', '{rep}')",
                 f"replace({a.duck}, '{pat}', '{rep}')")
    if r < 0.80:
        a = gen_str(rng, depth - 1)
        return E(f"reverse({a.eng})", f"reverse({a.duck})")
    if r < 0.85:
        c = gen_bool(rng, depth - 1)
        a, b = gen_str(rng, depth - 1), gen_str(rng, depth - 1)
        return E(f"(CASE WHEN {c.eng} THEN {a.eng} ELSE {b.eng} END)",
                 f"(CASE WHEN {c.duck} THEN {a.duck} ELSE {b.duck} END)")
    return gen_str(rng, 0)


def gen_bool(rng, depth: int) -> E:
    if depth <= 0:
        if rng.random() < 0.5:
            return E("b")
        a, b = gen_num(rng, 0), gen_num(rng, 0)
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        return E(f"({a.eng} {op} {b.eng})", f"({a.duck} {op} {b.duck})")
    r = rng.random()
    if r < 0.30:
        a, b = gen_num(rng, depth - 1), gen_num(rng, depth - 1)
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        return E(f"({a.eng} {op} {b.eng})", f"({a.duck} {op} {b.duck})")
    if r < 0.45:
        a, b = gen_str(rng, depth - 1), gen_str(rng, depth - 1)
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        return E(f"({a.eng} {op} {b.eng})", f"({a.duck} {op} {b.duck})")
    if r < 0.65:
        a, b = gen_bool(rng, depth - 1), gen_bool(rng, depth - 1)
        op = rng.choice(["AND", "OR"])
        return E(f"({a.eng} {op} {b.eng})", f"({a.duck} {op} {b.duck})")
    if r < 0.72:
        a = gen_bool(rng, depth - 1)
        return E(f"(NOT {a.eng})", f"(NOT {a.duck})")
    if r < 0.77:
        a = rng.choice(["i", "j", "h", "f", "s", "b", "tm", "dt"])
        neg = "NOT " if rng.random() < 0.5 else ""
        return E(f"({a} IS {neg}NULL)")
    if r < 0.80:
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        return E(f"(date(tm) {op} dt)", f"(CAST(tm AS DATE) {op} dt)")
    if r < 0.88:
        a = gen_num(rng, 0)
        lo, hi = sorted([rng.randint(-12, 12), rng.randint(-12, 12)])
        return E(f"({a.eng} BETWEEN {lo} AND {hi})",
                 f"({a.duck} BETWEEN {lo} AND {hi})")
    if r < 0.95:
        a = gen_num(rng, 0)
        lits = [str(rng.randint(-12, 12)) for _ in range(rng.randint(1, 4))]
        if rng.random() < 0.3:
            lits.append("NULL")
        inner = ", ".join(lits)
        neg = "NOT " if rng.random() < 0.5 else ""
        return E(f"({a.eng} {neg}IN ({inner}))",
                 f"({a.duck} {neg}IN ({inner}))")
    s = rng.choice(["s", "t"])
    pat = "".join(rng.choice(["a", "b", "%", "_"])
                  for _ in range(rng.randint(1, 4)))
    return E(f"({s} LIKE '{pat}')")


GENS = [("n", gen_num), ("s", gen_str), ("b", gen_bool)]


def gen_exprs(rng, k: int = 8, depth: int = 4) -> list[E]:
    out = []
    for _ in range(k):
        kind, fn = rng.choice(GENS)
        e = fn(rng, rng.randint(1, depth))
        if kind == "n":
            # one CAST AS DOUBLE on both sides: dtype-insensitive compare
            e = E(f"CAST({e.eng} AS DOUBLE)", f"CAST({e.duck} AS DOUBLE)")
        out.append(e)
    return out


# ---------------------------------------------------------------------------
# runner / comparator
# ---------------------------------------------------------------------------

def _norm(v):
    if v is None or v != v:
        return None
    return v


def compare_col(a, b) -> bool:
    for x, y in zip(a, b):
        x, y = _norm(x), _norm(y)
        if x is None and y is None:
            continue
        if x is None or y is None:
            return False
        if isinstance(x, float) or isinstance(y, float):
            if not np.isclose(float(x), float(y), rtol=1e-9, atol=1e-12):
                return False
        elif x != y:
            return False
    return True


def run_seed(seed: int, rows: int, con, sql_query, rd) -> list[str]:
    rng = random.Random(seed)
    tbl = gen_table(rng, rows)
    exprs = gen_exprs(rng)
    names = [f"v{i}" for i in range(len(exprs))]
    eng_sql = "select __rid, " + ", ".join(
        f"{e.eng} as {nm}" for e, nm in zip(exprs, names)) + " from t0"
    duck_sql = "select __rid, " + ", ".join(
        f"{e.duck} as {nm}" for e, nm in zip(exprs, names)) + \
        " from tbl order by __rid"
    try:
        eng = sql_query(eng_sql, {"t0": rd.from_arrow(tbl)}) \
            .to_pandas().sort_values("__rid").reset_index(drop=True)
    except Exception as ex:
        return [f"seed {seed}: ENGINE ERROR {type(ex).__name__}: "
                f"{str(ex).splitlines()[0][:160]}\n  sql: {eng_sql}"]
    duck = con.execute(duck_sql).fetch_arrow_table().to_pandas()
    bad = []
    for e, nm in zip(exprs, names):
        ea = [None if (isinstance(v, float) and v != v) else v
              for v in eng[nm].tolist()]
        da = [None if (isinstance(v, float) and v != v) else v
              for v in duck[nm].tolist()]
        if not compare_col(ea, da):
            i = next(idx for idx, (x, y) in enumerate(zip(ea, da))
                     if not compare_col([x], [y]))
            row = {c: tbl[c][i].as_py() for c in
                   ("i", "j", "h", "f", "s", "t", "b")}
            bad.append(
                f"seed {seed} {nm}: engine={ea[i]!r} duck={da[i]!r} "
                f"row={row}\n  eng: {e.eng}\n  duck: {e.duck}")
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--rows", type=int, default=64)
    args = ap.parse_args()

    import logging

    import duckdb
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from openmldb_ray.sql import sql_query

    failures = 0
    for seed in range(args.start, args.start + args.seeds):
        rng = random.Random(seed)
        tbl = gen_table(rng, args.rows)
        con = duckdb.connect()
        con.register("tbl", tbl)
        for line in run_seed(seed, args.rows, con, sql_query, rd):
            print(line)
            failures += 1
        con.close()
        if seed % 20 == 19:
            print(f"... {seed + 1 - args.start} seeds done, "
                  f"{failures} mismatches", file=sys.stderr)
    ray.shutdown()
    print(f"TOTAL mismatching expressions: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
