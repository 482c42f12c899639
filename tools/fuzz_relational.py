"""Differential fuzzer for the round-3b relational ops vs DuckDB.

Covers rank_window (the five SQL rank functions), pivot_agg (all five
aggs), group_aggregate_sets (rollup/cube/explicit, mergeable + exotic
paths), inner/full-outer joins (both strategies, null keys, duplicate
keys) and resample_asof (epoch-aligned grids + as-of fill). Random key
dtypes, tie-heavy order columns, NULL keys/values, random partitioning.

Usage: python tools/fuzz_relational.py [--seeds 40] [--start 0] [--rows 300]
"""
from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _part(rng, ds):
    return ds.repartition(rng.randint(1, 9))


# ---------------------------------------------------------------------------
# rank_window
# ---------------------------------------------------------------------------

def fuzz_rank(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.rank import rank_window

    rng = random.Random(seed + 910_000)
    nrng = np.random.default_rng(seed + 910_000)
    nk = rng.randint(1, 12)
    if rng.random() < 0.5:
        k = nrng.integers(0, nk, rows)
    else:
        k = nrng.choice([f"k{i}" for i in range(nk)], rows)
    kind = rng.choice(["int_ties", "float_null", "str"])
    if kind == "int_ties":
        v = nrng.integers(0, max(2, rows // 20), rows).astype(float)
    elif kind == "float_null":
        v = np.where(nrng.random(rows) < 0.15, np.nan, nrng.random(rows))
    else:
        v = nrng.choice(list("abcdefg"), rows)
    desc = rng.random() < 0.5
    ntk = rng.choice([1, 2, 3, 7])
    df = pd.DataFrame({"id": np.arange(rows), "k": k, "v": v})
    out = rank_window(
        _part(rng, rd.from_pandas(df)), "v", key_col="k", tiebreak="id",
        descending=desc,
        outs={"rn": "row_number", "rk": "rank", "dr": "dense_rank",
              "pr": "percent_rank", "nt": ("ntile", ntk)}).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    dirn = "DESC" if desc else "ASC"
    con = duckdb.connect()
    con.register("df", df)
    o = con.execute(f"""
      SELECT id, ROW_NUMBER() OVER wt AS rn, NTILE({ntk}) OVER wt AS nt,
             RANK() OVER w AS rk, DENSE_RANK() OVER w AS dr,
             PERCENT_RANK() OVER w AS pr
      FROM df
      WINDOW w  AS (PARTITION BY k ORDER BY v {dirn} NULLS LAST),
             wt AS (PARTITION BY k ORDER BY v {dirn} NULLS LAST, id)
      ORDER BY id""").df()
    con.close()
    bad = []
    for c in ["rn", "rk", "dr", "nt"]:
        if not (out[c].to_numpy() == o[c].to_numpy()).all():
            i = int(np.argmax(out[c].to_numpy() != o[c].to_numpy()))
            bad.append(f"rank seed {seed} {c} row {i}: "
                       f"engine={out[c][i]} duck={o[c][i]} "
                       f"kind={kind} desc={desc} ntile={ntk}")
    if not np.allclose(out["pr"], o["pr"]):
        bad.append(f"rank seed {seed} pr mismatch kind={kind} desc={desc}")
    return bad


# ---------------------------------------------------------------------------
# pivot_agg
# ---------------------------------------------------------------------------

def fuzz_pivot(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.reshape import pivot_agg

    rng = random.Random(seed + 920_000)
    nrng = np.random.default_rng(seed + 920_000)
    cats = [f"c{i}" for i in range(rng.randint(1, 6))]
    agg, sqlagg = rng.choice([("sum", "SUM"), ("count", "COUNT"),
                              ("min", "MIN"), ("max", "MAX"),
                              ("mean", "AVG")])
    int_vals = rng.random() < 0.4
    v = (nrng.integers(-50, 50, rows).astype(float) if int_vals
         else nrng.random(rows) * 100)
    v = np.where(nrng.random(rows) < 0.1, np.nan, v)
    df = pd.DataFrame({
        "k": nrng.integers(0, rng.randint(1, 15), rows),
        "cat": nrng.choice(cats + [None], rows),
        "v": v,
    })
    out = pivot_agg(_part(rng, rd.from_pandas(df)), "k", "cat", "v",
                    agg=agg).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    arms = ", ".join(
        f"{sqlagg}(CASE WHEN cat='{c}' THEN v END) AS \"{c}\""
        for c in sorted(cats))
    con = duckdb.connect()
    con.register("df", df)
    o = con.execute(
        f"SELECT k, {arms} FROM df GROUP BY k ORDER BY k").df()
    con.close()
    bad = []
    if len(out) != len(o):
        return [f"pivot seed {seed}: rows {len(out)} vs {len(o)}"]
    for c in sorted(cats):
        col = f"v_{agg}_{c}"
        if col not in out.columns:
            # category never observed (all rows of c happened to be
            # dropped/null) — DuckDB arm exists but is all-NULL then
            if not o[c].isna().all() and not (
                    agg == "count" and (o[c] == 0).all()):
                bad.append(f"pivot seed {seed}: missing col {col}")
            continue
        ea = out[col].to_numpy(dtype=float, na_value=np.nan)
        da = o[c].to_numpy(dtype=float, na_value=np.nan)
        if not np.allclose(ea, da, equal_nan=True):
            bad.append(f"pivot seed {seed} {col} agg={agg} mismatch")
    return bad


# ---------------------------------------------------------------------------
# group_aggregate_sets
# ---------------------------------------------------------------------------

def fuzz_rollup(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.stages.relational import group_aggregate_sets

    rng = random.Random(seed + 930_000)
    nrng = np.random.default_rng(seed + 930_000)
    nkeys = rng.randint(1, 3)
    cols = {}
    for i in range(nkeys):
        if rng.random() < 0.5:
            cols[f"g{i}"] = nrng.choice(
                [f"x{j}" for j in range(rng.randint(1, 5))] + [None], rows)
        else:
            cols[f"g{i}"] = nrng.integers(0, rng.randint(1, 5), rows)
    cols["v"] = np.where(nrng.random(rows) < 0.1, np.nan,
                         nrng.random(rows) * 10)
    df = pd.DataFrame(cols)
    keys = [f"g{i}" for i in range(nkeys)]
    mode = rng.choice(["rollup", "cube"])
    exotic = rng.random() < 0.25
    aggs = ([Agg.median("v", "v_med")] if exotic else
            [Agg.sum("v", "v_sum"), Agg.count("v", "v_cnt"),
             Agg.avg("v", "v_avg"), Agg.min("v", "v_min"),
             Agg.max("v", "v_max"), Agg.count_star("n_rows")])
    out = group_aggregate_sets(_part(rng, rd.from_pandas(df)), keys, aggs,
                               sets=mode).to_pandas()
    sqlaggs = ("MEDIAN(v) AS v_med" if exotic else
               "SUM(v) AS v_sum, COUNT(v) AS v_cnt, AVG(v) AS v_avg, "
               "MIN(v) AS v_min, MAX(v) AS v_max, COUNT(*) AS n_rows")
    con = duckdb.connect()
    con.register("df", df)
    o = con.execute(f"""
        SELECT {', '.join(keys)}, {sqlaggs},
               GROUPING({', '.join(keys)}) AS grouping_id
        FROM df GROUP BY {mode.upper()}({', '.join(keys)})""").df()
    con.close()
    sort_key = ["grouping_id"] + keys
    s1 = out.sort_values(sort_key, na_position="last").reset_index(drop=True)
    s2 = o.sort_values(sort_key, na_position="last").reset_index(drop=True)
    if len(s1) != len(s2):
        return [f"rollup seed {seed}: rows {len(s1)} vs {len(s2)} "
                f"mode={mode} exotic={exotic}"]
    bad = []
    vcols = (["v_med"] if exotic else
             ["v_sum", "v_cnt", "v_avg", "v_min", "v_max", "n_rows"])
    for c in vcols + ["grouping_id"]:
        ea = s1[c].to_numpy(dtype=float, na_value=np.nan)
        da = s2[c].to_numpy(dtype=float, na_value=np.nan)
        if not np.allclose(ea, da, equal_nan=True):
            bad.append(f"rollup seed {seed} {c} mode={mode} "
                       f"exotic={exotic} nkeys={nkeys} mismatch")
    return bad


# ---------------------------------------------------------------------------
# inner / full outer joins
# ---------------------------------------------------------------------------

def fuzz_joins(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.join_stage import full_outer_join, inner_join

    rng = random.Random(seed + 940_000)
    nrng = np.random.default_rng(seed + 940_000)
    span = rng.randint(2, 40)
    L = pd.DataFrame({
        "k": np.where(nrng.random(rows) < 0.07, np.nan,
                      nrng.integers(0, span, rows).astype(float)),
        "a": nrng.random(rows),
    })
    nr = rng.randint(1, rows // 2 + 1)
    R = pd.DataFrame({
        "rk": np.where(nrng.random(nr) < 0.07, np.nan,
                       nrng.integers(0, span, nr).astype(float) *
                       rng.choice([1, 2])),
        "b": nrng.random(nr),
    })
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    bad = []
    strat = rng.choice(["broadcast", "shuffle"])
    out = inner_join(_part(rng, rd.from_pandas(L)),
                     _part(rng, rd.from_pandas(R)), ("k", "rk"),
                     strategy=strat).to_pandas()
    o = con.execute("SELECT k, a, b FROM L JOIN R ON k = rk").df()
    cols = ["k", "a", "b"]

    def srt(d):
        # Ray's to_pandas drops column names when every block is empty
        # (the Dataset-level schema is still typed) — reindex restores them
        # so a correct zero-match join compares clean against DuckDB
        return d.reindex(columns=cols).sort_values(
            cols, na_position="last").reset_index(drop=True)

    if len(out) != len(o):
        bad.append(f"join seed {seed} inner/{strat}: rows "
                   f"{len(out)} vs {len(o)}")
    elif not np.allclose(srt(out).to_numpy(float), srt(o).to_numpy(float),
                         equal_nan=True):
        bad.append(f"join seed {seed} inner/{strat}: value mismatch")
    fo = full_outer_join(_part(rng, rd.from_pandas(L)),
                         _part(rng, rd.from_pandas(R)),
                         ("k", "rk")).to_pandas()
    ofo = con.execute("SELECT COALESCE(k, rk) AS k, a, b "
                      "FROM L FULL OUTER JOIN R ON k = rk").df()
    con.close()
    if len(fo) != len(ofo):
        bad.append(f"join seed {seed} full_outer: rows "
                   f"{len(fo)} vs {len(ofo)}")
    elif not np.allclose(srt(fo).to_numpy(float), srt(ofo).to_numpy(float),
                         equal_nan=True):
        bad.append(f"join seed {seed} full_outer: value mismatch")
    return bad


# ---------------------------------------------------------------------------
# resample_asof
# ---------------------------------------------------------------------------

def fuzz_resample(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.resample import resample_asof

    rng = random.Random(seed + 950_000)
    nrng = np.random.default_rng(seed + 950_000)
    step = rng.choice([3, 10, 97, 1000])
    span = rng.randint(50, 5000)
    ev = pd.DataFrame({
        "k": nrng.integers(0, rng.randint(1, 10), rows),
        "ts": nrng.integers(0, span, rows).astype(np.int64),
        "val": nrng.random(rows),
        "eid": np.arange(rows, dtype=np.int64),
    })
    out = resample_asof(_part(rng, rd.from_pandas(ev)), "k", "ts", step,
                        ["val"], tiebreak="eid").to_pandas()
    con = duckdb.connect()
    con.register("ev", ev)
    o = con.execute(f"""
      WITH rng AS (SELECT k, CAST(ceil(min(ts)/{step}.0)*{step} AS BIGINT) s,
                          max(ts) e FROM ev GROUP BY k),
      grid AS (SELECT k, unnest(generate_series(s, e, {step})) AS grid_ts
               FROM rng),
      pick AS (SELECT g.k, g.grid_ts, ev.val,
               ROW_NUMBER() OVER (PARTITION BY g.k, g.grid_ts
                                  ORDER BY ev.ts DESC, ev.eid DESC) rn
               FROM grid g JOIN ev ON ev.k = g.k AND ev.ts <= g.grid_ts)
      SELECT k, grid_ts, val FROM pick WHERE rn = 1""").df()
    con.close()
    # Ray's to_pandas drops column names when every block is empty (all
    # grids empty because span < step) — the Dataset schema is still typed
    a = out.reindex(columns=["k", "grid_ts", "val"]) \
        .sort_values(["k", "grid_ts"]).reset_index(drop=True)
    b = o.sort_values(["k", "grid_ts"]).reset_index(drop=True)
    if len(a) != len(b):
        return [f"resample seed {seed}: rows {len(a)} vs {len(b)} "
                f"step={step}"]
    if not np.allclose(a.to_numpy(float), b.to_numpy(float),
                       equal_nan=True):
        return [f"resample seed {seed}: value mismatch step={step}"]
    return []


# ---------------------------------------------------------------------------
# explode / collect_list (UNNEST + array_agg round trip)
# ---------------------------------------------------------------------------

def fuzz_reshape(seed: int, rows: int, rd) -> list[str]:
    import duckdb
    import pyarrow as pa

    from openmldb_ray.stages.reshape import collect_list, explode

    rng = random.Random(seed + 960_000)
    nrng = np.random.default_rng(seed + 960_000)
    str_vals = rng.random() < 0.4
    lists, ids = [], []
    for i in range(rows):
        r = rng.random()
        if r < 0.08:
            lists.append(None)          # NULL list -> no rows
        elif r < 0.16:
            lists.append([])            # empty list -> no rows
        else:
            n = rng.randint(1, 6)
            if str_vals:
                el = [None if rng.random() < 0.1 else
                      rng.choice("abcdef") * rng.randint(1, 3)
                      for _ in range(n)]
            else:
                el = [None if rng.random() < 0.1 else
                      float(nrng.integers(-9, 9)) for _ in range(n)]
            lists.append(el)
        ids.append(i)
    typ = pa.list_(pa.string() if str_vals else pa.float64())
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "l": pa.array(lists, typ)})
    out = explode(_part(rng, rd.from_arrow(tbl)), "l", out_col="v",
                  pos_col="pos").to_pandas() \
        .sort_values(["id", "pos"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", tbl)
    o = con.execute(
        "SELECT id, unnest(l) AS v, generate_subscripts(l, 1) - 1 AS pos "
        "FROM t ORDER BY id, pos").df()
    bad = []
    if len(out) != len(o):
        bad.append(f"explode seed {seed}: rows {len(out)} vs {len(o)} "
                   f"str={str_vals}")
    else:
        same_meta = ((out["id"].to_numpy() == o["id"].to_numpy()).all()
                     and (out["pos"].to_numpy() == o["pos"].to_numpy()).all())
        ev, dv = out["v"], o["v"]
        if str_vals:
            same_v = (ev.fillna("\0") == dv.fillna("\0")).all()
        else:
            same_v = np.allclose(ev.to_numpy(float, na_value=np.nan),
                                 dv.to_numpy(float, na_value=np.nan),
                                 equal_nan=True)
        if not (same_meta and same_v):
            bad.append(f"explode seed {seed}: value mismatch str={str_vals}")

    # collect_list round trip over the exploded rows: per-id list rebuilt
    # in ordinality order must string-agg identically to DuckDB
    back = collect_list(rd.from_pandas(out).repartition(rng.randint(1, 9)),
                        "id", "v", sort_by="pos").to_pandas()
    joined = {int(r["id"]): ",".join("∅" if e is None or
                                     (isinstance(e, float) and np.isnan(e))
                                     else (e if str_vals else f"{e:.1f}")
                                     for e in r["v_list"])
              for _, r in back.iterrows()}
    cast = "v" if str_vals else "printf('%.1f', v)"
    con.register("o", o)
    od = con.execute(
        f"SELECT id, string_agg(COALESCE({cast}, '∅'), ',' ORDER BY pos) s "
        "FROM o GROUP BY id").df()
    con.close()
    want = dict(zip(od["id"].astype(int), od["s"]))
    if joined != want:
        ks = [k for k in set(joined) | set(want)
              if joined.get(k) != want.get(k)][:3]
        bad.append(f"collect_list seed {seed}: mismatch ids {ks} "
                   f"str={str_vals}")
    return bad


# ---------------------------------------------------------------------------
# quantile sketch (global + per-key) vs exact rank intervals
# ---------------------------------------------------------------------------

def fuzz_qsketch(seed: int, rows: int, rd) -> list[str]:
    from openmldb_ray.stages.qsketch import (quantile_sketch,
                                             quantile_sketch_by_key)

    rng = random.Random(seed + 970_000)
    nrng = np.random.default_rng(seed + 970_000)
    n = rows * 30
    dist = rng.choice(["uniform", "lognormal", "ties", "sorted"])
    v = {"uniform": lambda: nrng.random(n),
         "lognormal": lambda: nrng.lognormal(0, 2, n),
         "ties": lambda: np.floor(1 / (nrng.random(n) + 1e-9)),
         "sorted": lambda: np.sort(nrng.random(n))}[dist]()
    v = np.where(nrng.random(n) < 0.05, np.nan, v)
    k = rng.choice([128, 256])
    bs = rng.choice([512, 4096, 65536])
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    eps = 0.06 if k == 128 else 0.04
    df = pd.DataFrame({"k": nrng.integers(0, 4, n), "v": v})
    clean = v[~np.isnan(v)]
    srt = np.sort(clean)
    nn = len(srt)

    def rank_err(q: float, est: float) -> float:
        rl = np.searchsorted(srt, est, "left") / nn
        rr = np.searchsorted(srt, est, "right") / nn
        return max(0.0, rl - q, q - rr)

    bad = []
    got = quantile_sketch(_part(rng, rd.from_pandas(df)), "v", qs,
                          k=k, batch_size=bs)
    for q, est in got.items():
        e = rank_err(q, est)
        if e > eps:
            bad.append(f"qsketch seed {seed}: global q={q} rank err "
                       f"{e:.4f} > {eps} dist={dist} k={k} bs={bs}")
        if not (est in clean or np.isnan(est)):
            bad.append(f"qsketch seed {seed}: q={q} value {est} not an "
                       f"input item dist={dist}")
    keyed = quantile_sketch_by_key(
        _part(rng, rd.from_pandas(df)), "k", "v", [0.1, 0.5, 0.9],
        k=k, batch_size=bs).to_pandas()
    if sorted(keyed["k"]) != [0, 1, 2, 3]:
        return bad + [f"qsketch seed {seed}: keyed keys {sorted(keyed['k'])}"]
    for _, r in keyed.iterrows():
        kv = df.loc[(df["k"] == r["k"]) & df["v"].notna(), "v"].to_numpy()
        ks = np.sort(kv)
        for q, c in [(0.1, "q_0_1"), (0.5, "q_0_5"), (0.9, "q_0_9")]:
            rl = np.searchsorted(ks, r[c], "left") / len(ks)
            rr = np.searchsorted(ks, r[c], "right") / len(ks)
            e = max(0.0, rl - q, q - rr)
            if e > eps:
                bad.append(f"qsketch seed {seed}: key {r['k']} q={q} rank "
                           f"err {e:.4f} > {eps} dist={dist} k={k}")
    return bad


OPS = [fuzz_rank, fuzz_pivot, fuzz_rollup, fuzz_joins, fuzz_resample,
       fuzz_reshape, fuzz_qsketch]


def run_seed(seed: int, rows: int, rd) -> list[str]:
    bad = []
    for op in OPS:
        bad.extend(op(seed, rows, rd))
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=40)
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

    failures = 0
    for seed in range(args.start, args.start + args.seeds):
        for line in run_seed(seed, args.rows, rd):
            print(line)
            failures += 1
        if seed % 10 == 9:
            print(f"... {seed + 1 - args.start} seeds done, "
                  f"{failures} mismatches", file=sys.stderr)
    ray.shutdown()
    print(f"TOTAL mismatching relational results: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
