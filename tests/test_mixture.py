"""mixture_sample: derive-rates-from-counts downsampling to target mix."""

import duckdb
import numpy as np
import pandas as pd
import ray

from openmldb_ray.stages.curation import (knuth_hash_u32, mixture_sample,
                                          mixture_thresholds)


def _data():
    rng = np.random.default_rng(31)
    sizes = {"a": 6000, "b": 3000, "c": 1000, "nolabel": 500}
    frames = []
    base = 0
    for s, n in sizes.items():
        frames.append(pd.DataFrame({
            "doc_id": np.arange(base, base + n),
            "source": s,
            "x": rng.normal(size=n)}))
        base += n
    return pd.concat(frames, ignore_index=True)


WEIGHTS = {"a": 1, "b": 2, "c": 1, "ghost": 5}


def test_thresholds_math():
    n, thr = mixture_thresholds({"a": 6000, "b": 3000, "c": 1000},
                                WEIGHTS)
    # W = 4 (ghost absent); N = min(6000*4/1, 3000*4/2, 1000*4/1) = 4000
    assert n == 4000
    # c needs every row: thr = 2^32 exactly
    assert thr["c"] == 1 << 32
    assert set(thr) == {"a", "b", "c"}
    assert mixture_thresholds({}, WEIGHTS) == (0, {})


def test_mixture_proportions_and_determinism():
    df = _data()
    outs = []
    for nparts in (1, 9):
        out = mixture_sample(ray.data.from_pandas(df).repartition(nparts),
                             WEIGHTS).to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # unweighted stratum dropped entirely
    assert "nolabel" not in set(out["source"])
    # kept counts near the target mixture 1:2:1 of N=4000
    got = out["source"].value_counts()
    assert abs(got["a"] - 1000) < 120
    assert abs(got["b"] - 2000) < 150
    assert got["c"] == 1000  # rate 1.0 keeps every row


def test_exact_sql_replay():
    df = _data()
    out = mixture_sample(ray.data.from_pandas(df), WEIGHTS).to_pandas()
    con = duckdb.connect()
    con.register("docs", df)
    o = con.execute("""
        WITH w(source, wt) AS (
          VALUES ('a', 1), ('b', 2), ('c', 1), ('ghost', 5)
        ), j AS (
          SELECT d.source, COUNT(*) AS n, ANY_VALUE(w.wt) AS wt
          FROM docs d JOIN w USING (source) GROUP BY d.source
        ), tot AS (SELECT SUM(wt) AS W FROM j),
        nn AS (SELECT MIN(n * W // wt) AS nsel FROM j, tot),
        thr AS (
          SELECT source,
                 LEAST((nsel * wt * 4294967296 + (W * n) - 1) // (W * n),
                       4294967296) AS t
          FROM j, tot, nn
        )
        SELECT d.* FROM docs d JOIN thr USING (source)
        WHERE ((d.doc_id % 1048576) * 2654435761) % 4294967296 < thr.t
    """).df()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = o[a.columns].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_hash_matches_sql_form():
    ids = np.array([0, 1, 7, 1048575, 1048576, 12345678])
    h = knuth_hash_u32(ids, 20).astype(np.int64)
    ref = ((ids % (1 << 20)) * 2654435761) % (1 << 32)
    np.testing.assert_array_equal(h, ref)
