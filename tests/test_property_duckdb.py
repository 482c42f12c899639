"""Randomized cross-engine property tests: seeded synthetic streams with
NULL values and NULL/negative order keys, window results compared against
DuckDB SQL (unique ts per key — tie semantics are locked separately by the
reference YAML golden cases, where DuckDB's RANGE peer rules differ)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from openmldb_ray.core.aggregates import Agg
from openmldb_ray.core.frames import FrameSpec


def make_stream(seed: int, n: int = 400, keys: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    key = rng.integers(0, keys, n)
    ts = np.zeros(n, dtype=np.float64)
    for k in range(keys):
        m = key == k
        ts[m] = np.sort(rng.choice(np.arange(1, 500_000), size=m.sum(), replace=False))
    v = rng.normal(50, 20, n)
    v[rng.random(n) < 0.1] = np.nan
    # invalid order keys: no output, not buffered
    bad = rng.random(n) < 0.05
    ts[bad] = np.where(rng.random(bad.sum()) < 0.5, np.nan, -5)
    return pd.DataFrame({"rid": np.arange(n), "k": key, "ts": ts, "v": v})


FRAMES = {
    "rows4": (FrameSpec(rows_preceding=4),
              "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW"),
    "range10k": (FrameSpec(range_preceding=10_000),
                 "RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW"),
    "unbounded": (FrameSpec(),
                  "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"),
}


@pytest.mark.parametrize("seed", [11, 12, 13])
@pytest.mark.parametrize("frame_name", list(FRAMES))
@pytest.mark.parametrize("force_exact", [False, True], ids=["fast", "exact"])
def test_window_vs_duckdb(ray_session, seed, frame_name, force_exact):
    import ray.data as rd

    from openmldb_ray.stages.window_stage import window_agg

    frame, sql_frame = FRAMES[frame_name]
    df = make_stream(seed)
    aggs = [Agg.sum("v", "s"), Agg.count("v", "c"), Agg.avg("v", "a"),
            Agg.min("v", "mn"), Agg.max("v", "mx"), Agg.lag("v", 2, "l2")]
    if force_exact:
        aggs.append(Agg.top("v", 2, "_med"))  # pushes dispatch to the exact kernel

    out = window_agg(rd.from_pandas(df), "k", "ts", aggs, frame,
                     tiebreak="rid").to_pandas()
    if force_exact:
        out = out.drop(columns=["_med"])

    con = duckdb.connect()
    con.register("t", df)
    lag_expr = ("LAG(v, 2) OVER (PARTITION BY k ORDER BY ts)" if frame_name == "unbounded"
                else "NULL")  # buffer-based lag vs SQL partition lag differ on bounded frames
    oracle = con.sql(f"""
        SELECT rid, k, ts, v,
               SUM(v) OVER w AS s, COUNT(v) OVER w AS c, AVG(v) OVER w AS a,
               MIN(v) OVER w AS mn, MAX(v) OVER w AS mx,
               {lag_expr} AS l2
        FROM t WHERE ts IS NOT NULL AND ts >= 0
        WINDOW w AS (PARTITION BY k ORDER BY ts {sql_frame})
    """).df()

    m = out.merge(oracle, on="rid", suffixes=("", "_o"))
    assert len(m) == len(oracle) == len(out)
    for c in ["s", "c", "a", "mn", "mx"]:
        a = pd.to_numeric(m[c], errors="coerce").astype(float)
        b = pd.to_numeric(m[f"{c}_o"], errors="coerce").astype(float)
        assert np.allclose(a, b, equal_nan=True), f"{c} seed={seed} frame={frame_name}"
    if frame_name == "unbounded":
        a = pd.to_numeric(m["l2"], errors="coerce").astype(float)
        b = pd.to_numeric(m["l2_o"], errors="coerce").astype(float)
        assert np.allclose(a, b, equal_nan=True)


@pytest.mark.parametrize("seed", [21, 22])
def test_where_aggs_window_vs_duckdb(ray_session, seed):
    """count_where/sum_where/avg_where OVER a window (exact kernel) vs
    DuckDB CASE-filtered window aggregates."""
    import ray.data as rd

    from openmldb_ray.stages.window_stage import window_agg

    df = make_stream(seed, n=300)
    df["flag"] = df["v"] > 50
    df.loc[df["v"].isna(), "flag"] = False
    out = window_agg(
        rd.from_pandas(df), "k", "ts",
        [Agg.sum_where("v", "flag", "sw"), Agg.count_where("v", "flag", "cw"),
         Agg.avg_where("v", "flag", "aw")],
        FrameSpec(range_preceding=20_000), tiebreak="rid",
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.sql("""
        SELECT rid,
               SUM(CASE WHEN flag THEN v END) OVER w AS sw,
               COUNT(CASE WHEN flag THEN v END) OVER w AS cw,
               AVG(CASE WHEN flag THEN v END) OVER w AS aw
        FROM t WHERE ts IS NOT NULL AND ts >= 0
        WINDOW w AS (PARTITION BY k ORDER BY ts
                     RANGE BETWEEN 20000 PRECEDING AND CURRENT ROW)
    """).df()
    m = out.merge(oracle, on="rid", suffixes=("", "_o"))
    assert len(m) == len(out) == len(oracle)
    for c in ["sw", "cw", "aw"]:
        a = pd.to_numeric(m[c], errors="coerce").astype(float)
        b = pd.to_numeric(m[f"{c}_o"], errors="coerce").astype(float)
        assert np.allclose(a, b, equal_nan=True), c
