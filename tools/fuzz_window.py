"""Differential window-function fuzzer: openmldb_ray SQL engine vs DuckDB.

Random (partition key, unique-per-key int timestamp, nullable values)
tables; random ROWS / ROWS_RANGE frames with random preceding bounds
(including 0); random aggregates sum/count/avg/min/max (+ the CASE-WHEN
rendering of *_where) and lag within the frame depth. Timestamps are unique
per key so ROWS frames are deterministic in both engines; ROWS_RANGE maps
to ANSI RANGE. All numeric outputs are CAST AS DOUBLE on both sides so only
values are compared, not dtypes.

Usage: python tools/fuzz_window.py [--seeds 100] [--start 0] [--rows 200]
"""
from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_table(rng: random.Random, n: int) -> pa.Table:
    nkeys = rng.randint(1, 6)
    keys = [f"k{i}" for i in range(nkeys)]
    # ts unique GLOBALLY so a second window partitioned by k2 is also
    # deterministic under ROWS frames
    ts_all = rng.sample(range(0, 20 * n), n)
    rows = [(rng.choice(keys), ts_all[i]) for i in range(n)]
    def nullable(gen, p=0.15):
        return [None if rng.random() < p else gen() for _ in range(n)]
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.string()),
        "k2": pa.array([f"g{rng.randint(0, 3)}" for _ in range(n)],
                       pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        # the same instants as a timestamp column, ~seconds apart, for
        # unit-suffixed ROWS_RANGE bounds (2s/1m preceding)
        "tms": pa.array([r[1] * 700 for r in rows], pa.timestamp("ms")),
        "v": pa.array(nullable(lambda: rng.randint(-50, 50)), pa.int64()),
        "f": pa.array(nullable(lambda: round(rng.uniform(-20, 20), 3)),
                      pa.float64()),
        "__rid": pa.array(range(n), pa.int64()),
    })


class Q:
    __slots__ = ("eng", "duck")

    def __init__(self, eng, duck):
        self.eng = eng
        self.duck = duck


def gen_query(rng: random.Random) -> Q:
    rows_range = rng.random() < 0.4
    n_prec = rng.choice([0, 1, 2, 3, 5, 10, 10_000])
    kw_e = "ROWS_RANGE" if rows_range else "ROWS"
    kw_d = "RANGE" if rows_range else "ROWS"
    order_col = "ts"
    unit_e = unit_d = None
    if rows_range and rng.random() < 0.4:
        # unit-suffixed bounds over a TIMESTAMP order key
        order_col = "tms"
        unit_e, unit_d = rng.choice([("s", "SECOND"), ("m", "MINUTE"),
                                     ("h", "HOUR")])

    def bound(n):
        if unit_e is None:
            return f"{n} PRECEDING", f"{n} PRECEDING"
        return (f"{n}{unit_e} PRECEDING",
                f"INTERVAL {n} {unit_d} PRECEDING")

    lo_e, lo_d = bound(n_prec)
    r = rng.random()
    lag_ok = True
    if r < 0.25 and n_prec >= 1:
        # end bound m PRECEDING (frame entirely in the past)
        m = rng.randint(1, n_prec)
        hi_e, hi_d = bound(m)
        frame_eng = f"{kw_e} BETWEEN {lo_e} AND {hi_e}"
        frame_duck = f"{kw_d} BETWEEN {lo_d} AND {hi_d}"
        lag_ok = False
    elif r < 0.50:
        # EXCLUDE CURRENT_ROW (engine spelling) vs EXCLUDE CURRENT ROW
        frame_eng = (f"{kw_e} BETWEEN {lo_e} AND CURRENT ROW "
                     f"EXCLUDE CURRENT_ROW")
        frame_duck = (f"{kw_d} BETWEEN {lo_d} AND CURRENT ROW "
                      f"EXCLUDE CURRENT ROW")
        lag_ok = False
    else:
        frame_eng = f"{kw_e} BETWEEN {lo_e} AND CURRENT ROW"
        frame_duck = f"{kw_d} BETWEEN {lo_d} AND CURRENT ROW"
    aggs_e, aggs_d, names = [], [], []
    for i in range(rng.randint(3, 6)):
        col = rng.choice(["v", "f"])
        fn = rng.choice(["sum", "count", "avg", "min", "max",
                         "sum_where", "count_where", "lag"])
        nm = f"a{i}"
        if fn == "lag":
            if rows_range or not lag_ok:
                # lag vs RANGE / end-bound / EXCLUDE frames is
                # engine-specific (buffer-indexed in the reference)
                fn = "sum"
            else:
                d = rng.randint(0, max(0, min(n_prec, 4)))
                aggs_e.append(f"CAST(lag({col}, {d}) OVER w AS DOUBLE) AS {nm}")
                # DuckDB lag ignores the frame; with d <= n_prec the two agree
                aggs_d.append(f"CAST(lag({col}, {d}) OVER "
                              f"(PARTITION BY k ORDER BY ts) AS DOUBLE) AS {nm}")
                names.append(nm)
                continue
        if fn.endswith("_where"):
            base = fn[:-6]
            thr = rng.randint(-20, 20)
            cond_e = f"{rng.choice(['v', 'f'])} > {thr}"
            inner = col if base != "count" else col
            aggs_e.append(
                f"CAST({base}_where({inner}, {cond_e}) OVER w AS DOUBLE) AS {nm}")
            aggs_d.append(
                f"CAST({base}(CASE WHEN {cond_e} THEN {inner} END) OVER w "
                f"AS DOUBLE) AS {nm}")
        else:
            # ~1/4 of plain aggregates ride a SECOND window partitioned by
            # k2 — exercises the engine's multi-window fusion (ConcatJoin)
            win = "w2" if rng.random() < 0.25 else "w"
            aggs_e.append(f"CAST({fn}({col}) OVER {win} AS DOUBLE) AS {nm}")
            aggs_d.append(f"CAST({fn}({col}) OVER {win} AS DOUBLE) AS {nm}")
        names.append(nm)
    sel = ", ".join(aggs_e)
    seld = ", ".join(aggs_d)
    two = any(" OVER w2 " in a for a in aggs_e)
    w2_e = (f", w2 as (partition by k2 order by {order_col} {frame_eng})"
            if two else "")
    w2_d = (f", w2 as (partition by k2 order by {order_col} {frame_duck})"
            if two else "")
    eng = (f"select __rid, {sel} from t0 "
           f"window w as (partition by k order by {order_col} {frame_eng}){w2_e}")
    duck = (f"select __rid, {seld} from tbl "
            f"window w as (partition by k order by {order_col} {frame_duck}){w2_d} "
            f"order by __rid")
    return Q(eng, duck)


def run_seed(seed: int, rows: int, sql_query, rd) -> list[str]:
    import duckdb
    rng = random.Random(seed)
    tbl = gen_table(rng, rows)
    q = gen_query(rng)
    con = duckdb.connect()
    con.register("tbl", tbl)
    try:
        eng = sql_query(q.eng, {"t0": rd.from_arrow(tbl)}) \
            .to_pandas().sort_values("__rid").reset_index(drop=True)
    except Exception as ex:
        return [f"seed {seed}: ENGINE ERROR {type(ex).__name__}: "
                f"{str(ex).splitlines()[0][:160]}\n  sql: {q.eng}"]
    duck = con.execute(q.duck).fetch_arrow_table().to_pandas()
    con.close()
    bad = []
    for nm in [c for c in duck.columns if c != "__rid"]:
        ea = eng[nm].to_numpy(dtype=float, na_value=np.nan)
        da = duck[nm].to_numpy(dtype=float, na_value=np.nan)
        ok = (np.isnan(ea) & np.isnan(da)) | np.isclose(
            ea, da, rtol=1e-9, atol=1e-12, equal_nan=True)
        if not ok.all():
            i = int(np.argmax(~ok))
            bad.append(f"seed {seed} {nm} row {i}: engine={ea[i]} "
                       f"duck={da[i]}\n  eng: {q.eng}\n  duck: {q.duck}")
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
    print(f"TOTAL mismatching window columns: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
