"""Differential fuzzer for the Python-API stages vs DuckDB oracles.

Covers the stages the SQL fuzzers can't reach: sessionize (gap windows),
request_window_agg (long-window point-in-time backfill) and interval_join
(point-in-interval containment). Random keys / nullable values / null
timestamps / empty sides; timestamps unique per key so orderings are
deterministic on both sides.

Usage: python tools/fuzz_stages.py [--seeds 60] [--start 0] [--rows 200]
Each seed runs all three ops.
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


def _keyed_unique_ts(rng, n, keys, null_p=0.0, span=20):
    used = set()
    out_k, out_t = [], []
    for _ in range(n):
        k = rng.choice(keys)
        if rng.random() < null_p:
            out_k.append(k)
            out_t.append(None)
            continue
        while True:
            t = rng.randint(0, span * n)
            if (k, t) not in used:
                used.add((k, t))
                break
        out_k.append(k)
        out_t.append(t)
    return out_k, out_t


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------

def fuzz_sessionize(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.session_stage import sessionize

    rng = random.Random(seed + 200_000)
    keys = [f"k{i}" for i in range(rng.randint(1, 6))]
    ks, ts = _keyed_unique_ts(rng, rows, keys, null_p=0.1)
    gap = rng.choice([1, 5, 20, 100, 10_000])
    tbl = pa.table({
        "k": pa.array(ks, pa.string()),
        "ts": pa.array(ts, pa.int64()),
        "__rid": pa.array(range(rows), pa.int64()),
    })
    eng = sessionize(rd.from_arrow(tbl), "k", "ts", gap=gap) \
        .to_pandas().sort_values("__rid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("tbl", tbl)
    duck = con.execute(f"""
        WITH t AS (SELECT k, ts, __rid FROM tbl WHERE ts IS NOT NULL),
             l AS (SELECT *, lag(ts) OVER (PARTITION BY k ORDER BY ts)
                             AS pts FROM t)
        SELECT __rid,
               sum(CASE WHEN pts IS NULL OR ts - pts > {gap}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY k ORDER BY ts) - 1 AS session_id
        FROM l ORDER BY __rid
    """).fetch_arrow_table().to_pandas()
    con.close()
    if len(eng) != len(duck):
        return [f"sessionize seed {seed}: rows engine={len(eng)} "
                f"duck={len(duck)} (gap={gap})"]
    ea = eng["session_id"].to_numpy(dtype=float)
    da = duck["session_id"].to_numpy(dtype=float)
    if not (eng["__rid"].tolist() == duck["__rid"].tolist()
            and np.array_equal(ea, da)):
        i = int(np.argmax(ea != da))
        return [f"sessionize seed {seed} row {i}: engine={ea[i]} "
                f"duck={da[i]} gap={gap}"]
    return []


# ---------------------------------------------------------------------------
# request_window_agg
# ---------------------------------------------------------------------------

def fuzz_request_window(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.stages.request_window import request_window_agg

    rng = random.Random(seed + 300_000)
    keys = [f"k{i}" for i in range(rng.randint(1, 6))]
    rk, rts = _keyed_unique_ts(rng, rows, keys, null_p=0.08)
    hk, hts = _keyed_unique_ts(rng, rng.randint(0, 3 * rows), keys,
                               null_p=0.08)
    prec = rng.choice([0, 1, 10, 100, 5_000])
    req = pa.table({
        "k": pa.array(rk, pa.string()),
        "ts": pa.array(rts, pa.int64()),
        "__rid": pa.array(range(rows), pa.int64()),
    })
    hist = pa.table({
        "k": pa.array(hk, pa.string()),
        "ts": pa.array(hts, pa.int64()),
        "v": pa.array([None if rng.random() < 0.15 else rng.randint(-50, 50)
                       for _ in range(len(hk))], pa.int64()),
    })
    aggs = [AggSpec(name="s", kind="sum", col="v"),
            AggSpec(name="c", kind="count", col="v"),
            AggSpec(name="a", kind="avg", col="v"),
            AggSpec(name="mn", kind="min", col="v"),
            AggSpec(name="mx", kind="max", col="v"),
            AggSpec(name="cs", kind="count_star")]
    eng = request_window_agg(
        rd.from_arrow(req), rd.from_arrow(hist), "k", "ts", aggs,
        preceding_ms=prec) \
        .to_pandas().sort_values("__rid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("req", req)
    con.register("hist", hist)
    win = (f"hist h WHERE h.k = r.k AND h.ts IS NOT NULL "
           f"AND h.ts >= r.ts - {prec} AND h.ts <= r.ts")
    duck = con.execute(f"""
        SELECT r.__rid,
               (SELECT sum(h.v) FROM {win}) AS s,
               (SELECT count(h.v) FROM {win}) AS c,
               (SELECT avg(h.v) FROM {win}) AS a,
               (SELECT min(h.v) FROM {win}) AS mn,
               (SELECT max(h.v) FROM {win}) AS mx,
               (SELECT count(*) FROM {win}) AS cs
        FROM req r ORDER BY r.__rid
    """).fetch_arrow_table().to_pandas()
    con.close()
    bad = []
    for nm in ("s", "c", "a", "mn", "mx", "cs"):
        ea = eng[nm].to_numpy(dtype=float, na_value=np.nan)
        da = duck[nm].to_numpy(dtype=float, na_value=np.nan)
        ok = np.isclose(ea, da, rtol=1e-9, atol=1e-12, equal_nan=True)
        if not ok.all():
            i = int(np.argmax(~ok))
            bad.append(f"request_window seed {seed} {nm} row {i}: "
                       f"engine={ea[i]} duck={da[i]} prec={prec}")
    return bad


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------

def fuzz_interval_join(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.interval_join import interval_join

    rng = random.Random(seed + 400_000)
    keys = [f"k{i}" for i in range(rng.randint(1, 5))]
    how = rng.choice(["inner", "left"])
    keyed = rng.random() < 0.6
    left = pa.table({
        "k": pa.array([rng.choice(keys) for _ in range(rows)], pa.string()),
        "ts": pa.array([rng.randint(0, 500) for _ in range(rows)],
                       pa.int64()),
        "__rid": pa.array(range(rows), pa.int64()),
    })
    n_r = rng.randint(0, rows)
    starts = [rng.randint(0, 500) for _ in range(n_r)]
    right = pa.table({
        "k": pa.array([rng.choice(keys) for _ in range(n_r)], pa.string()),
        "s": pa.array(starts, pa.int64()),
        "e": pa.array([st + rng.randint(0, 80) for st in starts], pa.int64()),
        "rid": pa.array(range(n_r), pa.int64()),
    })
    eng = interval_join(
        rd.from_arrow(left), rd.from_arrow(right),
        ts_col="ts", start_col="s", end_col="e",
        on="k" if keyed else None, how=how,
        right_cols=["rid"]).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    onk = " AND l.k = r.k" if keyed else ""
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    duck = con.execute(
        f"SELECT l.__rid AS __rid, r.rid AS rid FROM l {jt} r "
        f"ON l.ts >= r.s AND l.ts <= r.e{onk}").fetch_arrow_table() \
        .to_pandas()
    con.close()
    e_pairs = sorted(map(tuple, np.nan_to_num(
        eng[["__rid", "rid"]].to_numpy(dtype=float, na_value=np.nan),
        nan=-1).astype(int).tolist()))
    d_pairs = sorted(map(tuple, np.nan_to_num(
        duck[["__rid", "rid"]].to_numpy(dtype=float, na_value=np.nan),
        nan=-1).astype(int).tolist()))
    if e_pairs != d_pairs:
        extra = [p for p in e_pairs if p not in d_pairs][:3]
        miss = [p for p in d_pairs if p not in e_pairs][:3]
        return [f"interval_join seed {seed} how={how} keyed={keyed}: "
                f"engine {len(e_pairs)} pairs vs duck {len(d_pairs)}; "
                f"engine-extra={extra} engine-missing={miss}"]
    return []


# ---------------------------------------------------------------------------
# target_encode / count_encode
# ---------------------------------------------------------------------------

def fuzz_encoders(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.encoders import count_encode, target_encode

    rng = random.Random(seed + 500_000)
    keys = [f"k{i}" for i in range(rng.randint(1, 6))]
    smoothing = rng.choice([0.0, 1.0, 5.5])
    loo = rng.random() < 0.5
    tbl = pa.table({
        "k": pa.array([None if rng.random() < 0.1 else rng.choice(keys)
                       for _ in range(rows)], pa.string()),
        "y": pa.array([None if rng.random() < 0.2 else rng.randint(0, 40)
                       for _ in range(rows)], pa.int64()),
        "__rid": pa.array(range(rows), pa.int64()),
    })
    eng_te = target_encode(rd.from_arrow(tbl), "k", "y",
                           smoothing=smoothing, loo=loo) \
        .to_pandas().sort_values("__rid").reset_index(drop=True)
    eng_ce = count_encode(rd.from_arrow(tbl), "k", normalize=True) \
        .to_pandas().sort_values("__rid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", tbl)
    s = smoothing
    duck = con.execute(f"""
        WITH g AS (SELECT k, coalesce(sum(y), 0)::DOUBLE AS tsum,
                          count(y)::DOUBLE AS tcnt
                   FROM t GROUP BY k),
             p AS (SELECT sum(y)::DOUBLE / count(y) AS prior FROM t)
        SELECT t.__rid,
               CASE WHEN g.tcnt + {s} > 0
                    THEN (g.tsum + {s} * p.prior) / (g.tcnt + {s})
                    ELSE p.prior END AS te,
               CASE WHEN t.y IS NULL THEN
                    CASE WHEN g.tcnt + {s} > 0
                         THEN (g.tsum + {s} * p.prior) / (g.tcnt + {s})
                         ELSE p.prior END
                    WHEN g.tcnt - 1 + {s} > 0
                    THEN (g.tsum - t.y + {s} * p.prior) / (g.tcnt - 1 + {s})
                    ELSE p.prior END AS te_loo,
               (SELECT count(*) FROM t t2
                WHERE t2.k IS NOT DISTINCT FROM t.k)::DOUBLE
                   / (SELECT count(*) FROM t) AS ce
        FROM t LEFT JOIN g ON t.k IS NOT DISTINCT FROM g.k, p
        ORDER BY t.__rid
    """).fetch_arrow_table().to_pandas()
    con.close()
    bad = []
    pairs = [("k_te", "te", eng_te), ("k_count", "ce", eng_ce)]
    if loo:
        pairs.append(("k_te_loo", "te_loo", eng_te))
    for eng_col, duck_col, frame in pairs:
        ea = frame[eng_col].to_numpy(dtype=float, na_value=np.nan)
        da = duck[duck_col].to_numpy(dtype=float, na_value=np.nan)
        ok = np.isclose(ea, da, rtol=1e-9, atol=1e-12, equal_nan=True)
        if not ok.all():
            i = int(np.argmax(~ok))
            bad.append(f"encoders seed {seed} {eng_col} row {i}: "
                       f"engine={ea[i]} duck={da[i]} "
                       f"smoothing={s} loo={loo}")
    return bad


# ---------------------------------------------------------------------------
# exact quantiles (global + by key)
# ---------------------------------------------------------------------------

def fuzz_quantiles(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.quantile import (exact_quantiles,
                                              exact_quantiles_by_key)

    rng = random.Random(seed + 600_000)
    qs = sorted({round(rng.random(), 3) for _ in range(rng.randint(1, 4))})
    if not qs:
        qs = [0.5]
    # heavy ties + nulls + negatives: the refinement's hardest inputs
    vals = [None if rng.random() < 0.15
            else rng.choice([-7, -1, 0, 3, 3, 3, 11, rng.randint(-50, 50)])
            for _ in range(rows)]
    keys = [f"k{i}" for i in range(rng.randint(1, 5))]
    tbl = pa.table({
        "v": pa.array(vals, pa.int64()),
        "k": pa.array([rng.choice(keys) for _ in range(rows)], pa.string()),
    })
    interp = rng.choice(["disc", "cont"])
    eng = exact_quantiles(rd.from_arrow(tbl), "v", qs,
                          interpolation=interp, bins=16)
    ek = exact_quantiles_by_key(rd.from_arrow(tbl), "v", qs, "k",
                                interpolation=interp, bins=16) \
        .sort_values(["k", "q"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", tbl)
    fn = "quantile_disc" if interp == "disc" else "quantile_cont"
    qlist = ", ".join(str(q) for q in qs)
    dg = con.execute(
        f"SELECT unnest({fn}(v, [{qlist}]))::DOUBLE AS val FROM t"
    ).fetch_arrow_table().to_pandas()
    dk = con.execute(
        f"SELECT k, unnest([{qlist}]) AS q, "
        f"unnest({fn}(v, [{qlist}]))::DOUBLE AS val "
        f"FROM t GROUP BY k ORDER BY k, q"
    ).fetch_arrow_table().to_pandas()
    con.close()
    bad = []
    ea = eng["value"].to_numpy(dtype=float, na_value=np.nan)
    da = dg["val"].to_numpy(dtype=float, na_value=np.nan)
    if not np.isclose(ea, da, rtol=1e-12, atol=0, equal_nan=True).all():
        bad.append(f"quantiles seed {seed} global {interp} qs={qs}: "
                   f"engine={ea.tolist()} duck={da.tolist()}")
    ea = ek["value"].to_numpy(dtype=float, na_value=np.nan)
    da = dk["val"].to_numpy(dtype=float, na_value=np.nan)
    if len(ea) != len(da) or ek["k"].tolist() != dk["k"].tolist() or \
            not np.isclose(ea, da, rtol=1e-12, atol=0, equal_nan=True).all():
        bad.append(f"quantiles seed {seed} by-key {interp} qs={qs}: "
                   f"engine={ea.tolist()} duck={da.tolist()}")
    return bad


# ---------------------------------------------------------------------------
# feature-selection statistics (corr / anova / assoc)
# ---------------------------------------------------------------------------

def fuzz_featsel(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.featsel import (anova_f, categorical_assoc,
                                             corr_matrix)

    rng = random.Random(seed + 700_000)
    keys = [f"g{i}" for i in range(rng.randint(2, 5))]
    labs = [f"l{i}" for i in range(rng.randint(2, 4))]
    tbl = pa.table({
        "a": pa.array([None if rng.random() < 0.1 else rng.randint(-40, 40)
                       for _ in range(rows)], pa.int64()),
        "b": pa.array([None if rng.random() < 0.1 else rng.randint(-9, 9)
                       for _ in range(rows)], pa.int64()),
        "k": pa.array([None if rng.random() < 0.1 else rng.choice(keys)
                       for _ in range(rows)], pa.string()),
        "lab": pa.array([None if rng.random() < 0.1 else rng.choice(labs)
                         for _ in range(rows)], pa.string()),
    })
    bad = []
    con = duckdb.connect()
    con.register("t", tbl)

    cm = corr_matrix(rd.from_arrow(tbl), ["a", "b"])
    dc = con.execute("""
        WITH m AS (SELECT count(*) AS n, sum(a) AS sa, sum(b) AS sb,
                          sum(a*a) AS paa, sum(a*b) AS pab,
                          sum(b*b) AS pbb
                   FROM t WHERE a IS NOT NULL AND b IS NOT NULL)
        SELECT CASE WHEN n = 0 OR n*paa - sa*sa <= 0
                      OR n*pbb - sb*sb <= 0 THEN NULL
               ELSE CAST(n*pab - sa*sb AS DOUBLE)
                    / (sqrt(CAST(n*paa - sa*sa AS DOUBLE))
                       * sqrt(CAST(n*pbb - sb*sb AS DOUBLE))) END AS c
        FROM m
    """).fetchone()[0]
    ev = cm["corr"].iloc[0]
    if not np.isclose(np.float64(ev), np.float64(
            np.nan if dc is None else dc), rtol=1e-9, atol=1e-12,
            equal_nan=True):
        bad.append(f"featsel seed {seed} corr: engine={ev} duck={dc}")

    af = anova_f(rd.from_arrow(tbl), "a", "k")
    da = con.execute("""
        WITH g AS (SELECT k, count(a) AS c, sum(a) AS s, sum(a*a) AS ss
                   FROM t GROUP BY k HAVING count(a) > 0),
        tt AS (SELECT count(*) AS kk, sum(c) AS n,
                      sum(CAST(s AS DOUBLE) * s / c) AS sbp,
                      sum(CAST(ss AS DOUBLE)
                          - CAST(s AS DOUBLE) * s / c) AS ssw,
                      CAST(sum(s) AS DOUBLE) AS grand
               FROM g)
        SELECT CASE WHEN kk < 2 OR n <= kk OR ssw <= 0 THEN NULL
               ELSE ((sbp - grand * grand / n) / (kk - 1))
                    / (ssw / (n - kk)) END AS f,
               kk - 1 AS dfb, n - kk AS dfw FROM tt
    """).fetchone()
    ev = af["f_stat"].iloc[0]
    dv = np.nan if da[0] is None else da[0]
    if not np.isclose(np.float64(ev), np.float64(dv), rtol=1e-9,
                      atol=1e-12, equal_nan=True):
        bad.append(f"featsel seed {seed} anova_f: engine={ev} duck={dv}")

    ca = categorical_assoc(rd.from_arrow(tbl), "k", "lab")
    dd = con.execute("""
        WITH d AS (SELECT k AS a, lab AS b FROM t
                   WHERE k IS NOT NULL AND lab IS NOT NULL),
        ct AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS o
               FROM d GROUP BY a, b),
        r AS (SELECT a, sum(o) AS ra FROM ct GROUP BY a),
        c AS (SELECT b, sum(o) AS cb FROM ct GROUP BY b),
        s AS (SELECT (SELECT sum(o) FROM ct) AS n,
                     (SELECT count(*) FROM r) AS nr,
                     (SELECT count(*) FROM c) AS nc),
        x AS (SELECT sum(pow(ct.o - r.ra * c.cb / s.n, 2)
                         / (r.ra * c.cb / s.n)) AS chi2,
                     sum((ct.o / s.n)
                         * ln(ct.o * s.n / (r.ra * c.cb))) AS mi
              FROM ct JOIN r USING (a) JOIN c USING (b) CROSS JOIN s)
        SELECT CASE WHEN s.nr < 2 OR s.nc < 2 THEN NULL
                    ELSE x.chi2 END,
               CASE WHEN s.nr < 2 OR s.nc < 2 THEN NULL
                    ELSE x.mi END
        FROM x CROSS JOIN s
    """).fetchone()
    for col, dv in (("chi2", dd[0]), ("mi", dd[1])):
        ev = ca[col].iloc[0]
        dv = np.nan if dv is None else dv
        if not np.isclose(np.float64(ev), np.float64(dv), rtol=1e-9,
                          atol=1e-12, equal_nan=True):
            bad.append(f"featsel seed {seed} {col}: engine={ev} duck={dv}")
    con.close()
    return bad


# ---------------------------------------------------------------------------
# robust scaling / imputation / quantile binning / WoE
# ---------------------------------------------------------------------------

def fuzz_scale_ops(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.encoders import category_stats, woe_table
    from openmldb_ray.stages.scale import impute, quantile_bin, robust_scale

    rng = random.Random(seed + 800_000)
    keys = [f"k{i}" for i in range(rng.randint(1, 4))]
    # heavy ties on purpose: quantile-edge collapse is the hard path
    vals = [None if rng.random() < 0.15
            else rng.choice([0, 2, 2, 2, 5, rng.randint(-30, 30)])
            for _ in range(rows)]
    tbl = pa.table({
        "v": pa.array(vals, pa.int64()),
        "k": pa.array([rng.choice(keys) for _ in range(rows)], pa.string()),
        "y": pa.array([rng.randint(0, 1) for _ in range(rows)], pa.int64()),
        "__rid": pa.array(range(rows), pa.int64()),
    })
    bad = []
    con = duckdb.connect()
    con.register("t", tbl)

    rs = robust_scale(rd.from_arrow(tbl), "v") \
        .to_pandas().sort_values("__rid")
    drs = con.execute("""
        WITH q AS (SELECT quantile_disc(v, 0.25) AS q1,
                          quantile_disc(v, 0.5) AS med,
                          quantile_disc(v, 0.75) AS q3 FROM t)
        SELECT (t.v - q.med) / CAST(NULLIF(q.q3 - q.q1, 0) AS DOUBLE) AS z
        FROM t CROSS JOIN q ORDER BY t.__rid
    """).fetch_arrow_table().to_pandas()
    ea = rs["v_rs"].to_numpy(dtype=float, na_value=np.nan)
    da = drs["z"].to_numpy(dtype=float, na_value=np.nan)
    if not np.isclose(ea, da, rtol=1e-12, atol=0, equal_nan=True).all():
        i = int(np.argmax(~np.isclose(ea, da, equal_nan=True)))
        bad.append(f"scale_ops seed {seed} robust_scale row {i}: "
                   f"engine={ea[i]} duck={da[i]}")

    strat = rng.choice(["mean", "median"])
    imp = impute(rd.from_arrow(tbl), "v", strategy=strat, by="k") \
        .to_pandas().sort_values("__rid")
    fill_sql = ("CAST(sum(v) AS DOUBLE) / count(v)" if strat == "mean"
                else "CAST(quantile_disc(v, 0.5) AS DOUBLE)")
    dimp = con.execute(f"""
        WITH m AS (SELECT k, {fill_sql} AS fill FROM t GROUP BY k)
        SELECT CAST(COALESCE(t.v, m.fill) AS DOUBLE) AS x
        FROM t JOIN m ON t.k = m.k ORDER BY t.__rid
    """).fetch_arrow_table().to_pandas()
    ea = imp["v_filled"].to_numpy(dtype=float, na_value=np.nan)
    da = dimp["x"].to_numpy(dtype=float, na_value=np.nan)
    if not np.isclose(ea, da, rtol=1e-12, atol=0, equal_nan=True).all():
        i = int(np.argmax(~np.isclose(ea, da, equal_nan=True)))
        bad.append(f"scale_ops seed {seed} impute[{strat}] row {i}: "
                   f"engine={ea[i]} duck={da[i]}")

    nb = rng.choice([2, 3, 4, 8])
    qb = quantile_bin(rd.from_arrow(tbl), "v", nb) \
        .to_pandas().sort_values("__rid")
    qlist = ", ".join(str(i / nb) for i in range(nb + 1))
    dqb = con.execute(f"""
        WITH e AS (SELECT DISTINCT v FROM
                     (SELECT unnest(quantile_disc(t.v, [{qlist}])) AS v
                      FROM t)
                   WHERE v IS NOT NULL)
        SELECT CASE WHEN t.v IS NULL THEN NULL
               WHEN (SELECT count(*) FROM e) < 2 THEN 0
               ELSE LEAST(GREATEST(
                   (SELECT count(*) FROM e WHERE e.v <= t.v) - 1, 0),
                   (SELECT count(*) - 2 FROM e)) END AS bin
        FROM t ORDER BY t.__rid
    """).fetch_arrow_table().to_pandas()
    ea = qb["v_qbin"].to_numpy(dtype=float, na_value=np.nan)
    da = dqb["bin"].to_numpy(dtype=float, na_value=np.nan)
    if not np.array_equal(ea, da, equal_nan=True):
        i = int(np.argmax(~(np.isclose(ea, da, equal_nan=True))))
        bad.append(f"scale_ops seed {seed} quantile_bin[{nb}] row {i}: "
                   f"engine={ea[i]} duck={da[i]}")

    st = category_stats(rd.from_arrow(tbl), "k", "y")
    wt = woe_table(st, smoothing=0.5).sort_values("key")
    dwt = con.execute("""
        WITH g AS (SELECT k, sum(y) AS pos, count(y) - sum(y) AS neg
                   FROM t GROUP BY k),
        s AS (SELECT sum(pos) AS pt, sum(neg) AS nt, count(*) AS kk FROM g)
        SELECT g.k, ln(((g.pos + 0.5) / (s.pt + 0.5 * s.kk))
                       / ((g.neg + 0.5) / (s.nt + 0.5 * s.kk))) AS woe
        FROM g CROSS JOIN s ORDER BY g.k
    """).fetch_arrow_table().to_pandas()
    ea = wt["woe"].to_numpy(dtype=float, na_value=np.nan)
    da = dwt["woe"].to_numpy(dtype=float, na_value=np.nan)
    if len(ea) != len(da) or not np.isclose(ea, da, rtol=1e-9,
                                            equal_nan=True).all():
        bad.append(f"scale_ops seed {seed} woe: engine={ea.tolist()} "
                   f"duck={da.tolist()}")
    con.close()
    return bad


# ---------------------------------------------------------------------------
# get_json_object vs DuckDB json_extract_string
# ---------------------------------------------------------------------------

def _rand_json(rng, depth=0):
    r = rng.random()
    if depth >= 3 or r < 0.35:
        return rng.choice([
            rng.randint(-1000, 1000), rng.random() * 100, True, False, None,
            "".join(rng.choice("ab c\"d\\eé") for _ in range(rng.randint(0, 6))),
        ])
    if r < 0.7:
        return {f"k{rng.randint(0, 4)}": _rand_json(rng, depth + 1)
                for _ in range(rng.randint(0, 4))}
    return [_rand_json(rng, depth + 1) for _ in range(rng.randint(0, 4))]


def _rand_jsonpath(rng):
    steps = ["$"]
    for _ in range(rng.randint(1, 3)):
        if rng.random() < 0.7:
            steps.append(f".k{rng.randint(0, 4)}")
        else:
            steps.append(f"[{rng.randint(0, 4)}]")
    return "".join(steps)


def fuzz_json(seed: int, rows: int, rd) -> list[str]:
    import json

    import duckdb

    from openmldb_ray.functions.scalar import get

    rng = random.Random(seed + 900_000)
    docs = []
    for _ in range(rows):
        r = rng.random()
        if r < 0.05:
            docs.append(None)
        elif r < 0.1:
            docs.append("not json {")
        else:
            docs.append(json.dumps(_rand_json(rng)))
    s = pa.array(docs, pa.string())
    f = get("get_json_object")
    con = duckdb.connect()
    bad = []
    for _ in range(4):
        path = _rand_jsonpath(rng)
        got = f(s, path).to_pylist()
        want = [con.execute(
            "SELECT json_extract_string(TRY_CAST(? AS JSON), ?)",
            [d, path]).fetchone()[0] if d is not None else None
            for d in docs]
        mism = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
        # known benign float-format divergence: json.dumps(1.0) == "1.0"
        # vs DuckDB "1.0" — both canonical; filter only true diffs
        if mism:
            i = mism[0]
            bad.append(f"json seed {seed} path {path} row {i}: "
                       f"engine={got[i]!r} duck={want[i]!r} doc={docs[i]!r}")
    con.close()
    return bad


OPS = [fuzz_sessionize, fuzz_request_window, fuzz_interval_join,
       fuzz_encoders, fuzz_quantiles, fuzz_featsel, fuzz_scale_ops,
       fuzz_json]


def run_seed(seed: int, rows: int, rd) -> list[str]:
    bad = []
    for op in OPS:
        bad.extend(op(seed, rows, rd))
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=60)
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

    failures = 0
    for seed in range(args.start, args.start + args.seeds):
        for line in run_seed(seed, args.rows, rd):
            print(line)
            failures += 1
        if seed % 10 == 9:
            print(f"... {seed + 1 - args.start} seeds done, "
                  f"{failures} mismatches", file=sys.stderr)
    ray.shutdown()
    print(f"TOTAL mismatching stage results: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
