"""Differential WINDOW UNION fuzzer: openmldb_ray SQL engine vs DuckDB.

WINDOW w AS (UNION t1 PARTITION BY k ORDER BY ts frame): the frame buffer
sees primary + union rows, but only primary rows are emitted. The DuckDB
oracle is UNION ALL + the same window + QUALIFY is_primary. Timestamps are
unique per key ACROSS both tables, so union tie ordering (primary-last in
the reference) never fires and both engines are deterministic.

Usage: python tools/fuzz_union.py [--seeds 100] [--start 0] [--rows 200]
"""
from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_tables(rng: random.Random, n: int) -> tuple[pa.Table, pa.Table]:
    nkeys = rng.randint(1, 6)
    keys = [f"k{i}" for i in range(nkeys)]
    used = set()

    def make(count, rid0):
        rows = []
        for i in range(count):
            k = rng.choice(keys)
            while True:
                t = rng.randint(0, 20 * n)
                if (k, t) not in used:
                    used.add((k, t))
                    break
            rows.append((k, t))
        return pa.table({
            "k": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "v": pa.array([None if rng.random() < 0.15
                           else rng.randint(-50, 50)
                           for _ in range(count)], pa.int64()),
            "__rid": pa.array(range(rid0, rid0 + count), pa.int64()),
        })

    n_union = rng.randint(0, 2 * n)
    return make(n, 0), make(n_union, 1_000_000)


def gen_query(rng: random.Random) -> tuple[str, str]:
    rows_range = rng.random() < 0.4
    n_prec = rng.choice([0, 1, 2, 3, 5, 10, 10_000])
    kw_e = "ROWS_RANGE" if rows_range else "ROWS"
    kw_d = "RANGE" if rows_range else "ROWS"
    frame_e = f"{kw_e} BETWEEN {n_prec} PRECEDING AND CURRENT ROW"
    frame_d = f"{kw_d} BETWEEN {n_prec} PRECEDING AND CURRENT ROW"
    aggs = [(f"a{i}", rng.choice(["sum", "count", "avg", "min", "max"]))
            for i in range(rng.randint(2, 4))]
    sel_e = ", ".join(f"CAST({fn}(v) OVER w AS DOUBLE) AS {nm}"
                      for nm, fn in aggs)
    sel_d = ", ".join(f"CAST({fn}(v) OVER "
                      f"(PARTITION BY k ORDER BY ts {frame_d}) AS DOUBLE) "
                      f"AS {nm}" for nm, fn in aggs)
    eng = (f"select t0.__rid as __rid, {sel_e} from t0 "
           f"window w as (union t1 partition by t0.k order by t0.ts "
           f"{frame_e})")
    duck = (f"WITH u AS (SELECT k, ts, v, 1 AS p, __rid FROM l "
            f"UNION ALL SELECT k, ts, v, 0, __rid FROM r) "
            f"SELECT __rid, {sel_d} FROM u QUALIFY p = 1 ORDER BY __rid")
    return eng, duck


def run_seed(seed: int, rows: int, sql_query, rd) -> list[str]:
    import duckdb
    rng = random.Random(seed + 80_000)
    left, right = gen_tables(rng, rows)
    eng_sql, duck_sql = gen_query(rng)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    try:
        eng = sql_query(eng_sql,
                        {"t0": rd.from_arrow(left),
                         "t1": rd.from_arrow(right)}) \
            .to_pandas().sort_values("__rid").reset_index(drop=True)
    except Exception as ex:
        return [f"seed {seed}: ENGINE ERROR {type(ex).__name__}: "
                f"{str(ex).splitlines()[0][:160]}\n  sql: {eng_sql}"]
    duck = con.execute(duck_sql).fetch_arrow_table().to_pandas()
    con.close()
    if len(eng) != len(duck):
        return [f"seed {seed}: ROW COUNT engine={len(eng)} duck={len(duck)}"
                f"\n  eng: {eng_sql}"]
    bad = []
    for nm in [c for c in duck.columns if c != "__rid"]:
        ea = eng[nm].to_numpy(dtype=float, na_value=np.nan)
        da = duck[nm].to_numpy(dtype=float, na_value=np.nan)
        ok = np.isclose(ea, da, rtol=1e-9, atol=1e-12, equal_nan=True)
        if not ok.all():
            i = int(np.argmax(~ok))
            bad.append(f"seed {seed} {nm} row {i}: engine={ea[i]} "
                       f"duck={da[i]}\n  eng: {eng_sql}\n  duck: {duck_sql}")
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--rows", type=int, default=200)
    args = ap.parse_args()

    import logging

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from openmldb_ray.sql import sql_query

    failures = 0
    for seed in range(args.start, args.start + args.seeds):
        for line in run_seed(seed, args.rows, sql_query, rd):
            print(line)
            failures += 1
        if seed % 10 == 9:
            print(f"... {seed + 1 - args.start} seeds done, "
                  f"{failures} mismatches", file=sys.stderr)
    ray.shutdown()
    print(f"TOTAL mismatching union columns: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
