"""Differential LAST JOIN fuzzer: openmldb_ray SQL engine vs DuckDB.

LAST JOIN ... ORDER BY r.ts picks, per left row, the matching right row
with the greatest ts (point-in-time when the residual is r.ts <= l.ts).
The DuckDB oracle is the correlated argmax subquery with IS NOT DISTINCT
FROM key equality (the reference's integration_test expects null-safe LAST
JOIN keys). Right-side (k, ts) pairs are unique so the argmax is
deterministic in both engines.

Usage: python tools/fuzz_lastjoin.py [--seeds 100] [--start 0] [--rows 250]
"""
from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_tables(rng: random.Random, n_left: int) -> tuple[pa.Table, pa.Table]:
    nkeys = rng.randint(1, 8)
    keys = [f"k{i}" for i in range(nkeys)]

    def key(p_null=0.1):
        return None if rng.random() < p_null else rng.choice(keys)

    left = pa.table({
        "k": pa.array([key() for _ in range(n_left)], pa.string()),
        "ts": pa.array([rng.randint(0, 1000) for _ in range(n_left)],
                       pa.int64()),
        "v": pa.array([None if rng.random() < 0.15 else rng.randint(-50, 50)
                       for _ in range(n_left)], pa.int64()),
        "__rid": pa.array(range(n_left), pa.int64()),
    })
    n_right = rng.randint(0, 2 * n_left)
    seen = set()
    rk, rts = [], []
    for _ in range(n_right):
        k = key()
        while True:
            t = rng.randint(0, 1000)
            if (k, t) not in seen:
                seen.add((k, t))
                break
        rk.append(k)
        rts.append(t)
    right = pa.table({
        "k": pa.array(rk, pa.string()),
        "ts": pa.array(rts, pa.int64()),
        "w": pa.array([None if rng.random() < 0.15 else rng.randint(-50, 50)
                       for _ in range(n_right)], pa.int64()),
        "__rid": pa.array(range(n_right), pa.int64()),
    })
    return left, right


def gen_query(rng: random.Random) -> tuple[str, str]:
    residuals = []
    kind = rng.random()
    if kind < 0.45:
        residuals.append(("t1.ts <= t0.ts", "r.ts <= l.ts"))   # PIT
    elif kind < 0.60:
        c = rng.randint(-30, 30)
        residuals.append((f"t1.w < {c}", f"r.w < {c}"))
    elif kind < 0.75:
        residuals.append(("t1.w > t0.v", "r.w > l.v"))
    # else: pure-key join
    on_e = " and ".join(["t0.k = t1.k"] + [r[0] for r in residuals])
    on_d = " AND ".join(["(r.k IS NOT DISTINCT FROM l.k)"]
                        + [r[1] for r in residuals])
    eng = (f"select t0.__rid as __rid, t0.k as k, t0.v as v, "
           f"t1.w as w, t1.ts as rts "
           f"from t0 last join t1 order by t1.ts on {on_e}")
    duck = (f"SELECT l.__rid AS __rid, l.k AS k, l.v AS v, "
            f"(SELECT r.w FROM r WHERE {on_d} "
            f"ORDER BY r.ts DESC LIMIT 1) AS w, "
            f"(SELECT r.ts FROM r WHERE {on_d} "
            f"ORDER BY r.ts DESC LIMIT 1) AS rts "
            f"FROM l ORDER BY __rid")
    return eng, duck


def run_seed(seed: int, rows: int, sql_query, rd) -> list[str]:
    import duckdb
    rng = random.Random(seed + 50_000)
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
    for nm in ("v", "w", "rts"):
        ea = eng[nm].to_numpy(dtype=float, na_value=np.nan)
        da = duck[nm].to_numpy(dtype=float, na_value=np.nan)
        ok = np.isclose(ea, da, rtol=0, atol=0, equal_nan=True)
        if not ok.all():
            i = int(np.argmax(~ok))
            bad.append(f"seed {seed} {nm} row {i} (k={eng['k'][i]!r}): "
                       f"engine={ea[i]} duck={da[i]}\n  eng: {eng_sql}"
                       f"\n  duck: {duck_sql}")
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--rows", type=int, default=250)
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
    print(f"TOTAL mismatching lastjoin columns: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
