"""Differential GROUP BY fuzzer: openmldb_ray SQL engine vs DuckDB.

Random tables with 1-2 group keys (nullable strings / ints) and nullable
numeric payloads; random aggregate lists (sum/count/avg/min/max,
count(distinct), *_where as CASE WHEN on the DuckDB side), optional WHERE
and HAVING. Numeric outputs CAST AS DOUBLE on both sides.

Usage: python tools/fuzz_groupby.py [--seeds 100] [--start 0] [--rows 300]
"""
from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_table(rng: random.Random, n: int) -> pa.Table:
    def nullable(gen, p=0.15):
        return [None if rng.random() < p else gen() for _ in range(n)]
    nk = rng.randint(2, 8)
    return pa.table({
        "g": pa.array(nullable(lambda: f"g{rng.randint(0, nk)}"), pa.string()),
        "d": pa.array(nullable(lambda: rng.randint(0, 3)), pa.int32()),
        "v": pa.array(nullable(lambda: rng.randint(-50, 50)), pa.int64()),
        "f": pa.array(nullable(lambda: round(rng.uniform(-20, 20), 3)),
                      pa.float64()),
    })


def gen_query(rng: random.Random):
    keys = rng.choice([["g"], ["d"], ["g", "d"]])
    aggs_e, aggs_d = [], []
    for i in range(rng.randint(2, 6)):
        col = rng.choice(["v", "f"])
        fn = rng.choice(["sum", "count", "avg", "min", "max",
                         "count_star", "distinct_count",
                         "sum_where", "count_where", "avg_where",
                         "min_where", "max_where"])
        nm = f"a{i}"
        if fn == "count_star":
            aggs_e.append(f"CAST(count(*) AS DOUBLE) AS {nm}")
            aggs_d.append(f"CAST(count(*) AS DOUBLE) AS {nm}")
        elif fn == "distinct_count":
            # reference semantics: NULL is its own distinct value
            # (test_udaf_function.yaml id 5) — add the any-null indicator
            aggs_e.append(f"CAST(distinct_count({col}) AS DOUBLE) AS {nm}")
            aggs_d.append(
                f"CAST(count(distinct {col}) + "
                f"max(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) "
                f"AS {nm}")
        elif fn.endswith("_where"):
            base = fn[:-6]
            thr = rng.randint(-20, 20)
            cond = f"{rng.choice(['v', 'f'])} > {thr}"
            aggs_e.append(
                f"CAST({base}_where({col}, {cond}) AS DOUBLE) AS {nm}")
            aggs_d.append(
                f"CAST({base}(CASE WHEN {cond} THEN {col} END) AS DOUBLE) "
                f"AS {nm}")
        else:
            aggs_e.append(f"CAST({fn}({col}) AS DOUBLE) AS {nm}")
            aggs_d.append(f"CAST({fn}({col}) AS DOUBLE) AS {nm}")
    where_parts = []
    if rng.random() < 0.4:
        where_parts.append(f"v > {rng.randint(-40, 10)}")
    limit_planned = rng.random() < 0.3
    having_e = having_d = ""
    if rng.random() < 0.3:
        c = rng.randint(1, 5)
        having_e = having_d = f" having count(*) >= {c}"
    ksel = ", ".join(keys)
    order = limit = ""
    if limit_planned:
        # ORDER BY the (unique) group keys + LIMIT: a deterministic prefix,
        # provided no NULL keys (null-order defaults differ across engines)
        where_parts.extend(f"{k} IS NOT NULL" for k in keys)
        dirs = " DESC" if rng.random() < 0.5 else ""
        order = " order by " + ", ".join(f"{k}{dirs}" for k in keys)
        limit = f" limit {rng.randint(1, 6)}"
    where = (" where " + " and ".join(where_parts)) if where_parts else ""
    eng = (f"select {ksel}, {', '.join(aggs_e)} from t0{where} "
           f"group by {ksel}{having_e}{order}{limit}")
    duck = (f"select {ksel}, {', '.join(aggs_d)} from tbl{where} "
            f"group by {ksel}{having_d}{order}{limit}")
    return keys, eng, duck


def run_seed(seed: int, rows: int, sql_query, rd) -> list[str]:
    import duckdb
    rng = random.Random(seed + 10_000)
    tbl = gen_table(rng, rows)
    keys, eng_sql, duck_sql = gen_query(rng)
    con = duckdb.connect()
    con.register("tbl", tbl)
    try:
        eng = sql_query(eng_sql, {"t0": rd.from_arrow(tbl)}).to_pandas()
    except Exception as ex:
        return [f"seed {seed}: ENGINE ERROR {type(ex).__name__}: "
                f"{str(ex).splitlines()[0][:160]}\n  sql: {eng_sql}"]
    duck = con.execute(duck_sql).fetch_arrow_table().to_pandas()
    con.close()
    key_sort = list(keys)
    eng = eng.sort_values(key_sort, na_position="last").reset_index(drop=True)
    duck = duck.sort_values(key_sort, na_position="last").reset_index(drop=True)
    if len(eng) != len(duck):
        return [f"seed {seed}: ROW COUNT engine={len(eng)} duck={len(duck)}"
                f"\n  eng: {eng_sql}\n  duck: {duck_sql}"]
    bad = []
    for nm in duck.columns:
        if nm in keys:
            ea, da = eng[nm].tolist(), duck[nm].tolist()
            for i, (x, y) in enumerate(zip(ea, da)):
                if (pd.isna(x) != pd.isna(y)) or \
                        (not pd.isna(x) and x != y):
                    bad.append(f"seed {seed} KEY {nm} row {i}: "
                               f"engine={x!r} duck={y!r}\n  eng: {eng_sql}")
                    break
            continue
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
    ap.add_argument("--rows", type=int, default=300)
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
    print(f"TOTAL mismatching groupby columns: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
