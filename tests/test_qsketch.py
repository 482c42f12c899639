"""One-pass mergeable quantile sketch: error bounds, merge invariance,
weight exactness, and the distributed global/keyed paths vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.qsketch import (_Sketch, quantile_sketch,
                                         quantile_sketch_by_key)

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _max_rank_err(data: np.ndarray, ests: dict) -> float:
    srt = np.sort(data)
    n = len(data)
    errs = []
    for q, est in ests.items():
        rl = np.searchsorted(srt, est, "left") / n
        rr = np.searchsorted(srt, est, "right") / n
        errs.append(max(0.0, rl - q, q - rr))
    return max(errs)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "ties"])
def test_kernel_error_bound(dist):
    rng = np.random.default_rng(7)
    n = 400_000
    data = {"uniform": rng.random(n),
            "lognormal": rng.lognormal(0, 2, n),
            "ties": np.floor(1 / (rng.random(n) + 1e-9))}[dist]
    parts = np.array_split(data, 97)
    sks = []
    for p in parts:
        s = _Sketch(512)
        s.add_batch(p)
        sks.append(s)
    final = _Sketch(512)
    for s in sks:
        final.merge(_Sketch.from_bytes(s.to_bytes()))
    assert final.n == n  # weight exactness through every compaction
    ests = dict(zip(QS, final.quantiles(QS)))
    assert _max_rank_err(data, ests) < 0.02


def test_merge_order_bounded_and_serialization_roundtrip():
    rng = np.random.default_rng(3)
    data = rng.normal(0, 1, 200_000)
    parts = np.array_split(data, 53)
    for seed in (0, 1):
        order = np.random.default_rng(seed).permutation(len(parts))
        final = _Sketch(256)
        for i in order:
            s = _Sketch(256)
            s.add_batch(parts[i])
            final.merge(_Sketch.from_bytes(s.to_bytes()))
        assert final.n == len(data)
        ests = dict(zip(QS, final.quantiles(QS)))
        assert _max_rank_err(data, ests) < 0.03
    # roundtrip preserves the exact answer
    blob = final.to_bytes()
    assert _Sketch.from_bytes(blob).quantiles(QS) == final.quantiles(QS)


def test_empty_and_nulls():
    s = _Sketch(64)
    assert np.isnan(s.quantiles([0.5])[0])
    s.add_batch(np.array([np.nan, np.nan]))
    assert s.n == 0
    s.add_batch(np.array([np.nan, 5.0, np.nan]))
    assert s.n == 1 and s.quantiles([0.0, 1.0]) == [5.0, 5.0]


def test_quantile_sketch_distributed_vs_duckdb(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"v": np.where(rng.random(120_000) < 0.02, np.nan,
                                     rng.lognormal(1, 1.5, 120_000))})
    ds = ray.data.from_pandas(df).repartition(16)
    got = quantile_sketch(ds, "v", QS, k=512, batch_size=8192)
    exact = duckdb.sql(
        "SELECT " + ", ".join(
            f"quantile_disc(v, {q}) AS q{i}" for i, q in enumerate(QS))
        + " FROM df").df().iloc[0]
    clean = df["v"].dropna().to_numpy()
    srt = np.sort(clean)
    n = len(clean)
    for i, q in enumerate(QS):
        rl = np.searchsorted(srt, got[q], "left") / n
        rr = np.searchsorted(srt, got[q], "right") / n
        assert max(0.0, rl - q, q - rr) < 0.02
        # and the estimate brackets DuckDB's exact value loosely in rank
        assert got[q] <= exact[f"q{i}"] or rl <= q + 0.02


def test_quantile_sketch_by_key_vs_duckdb(ray_session):
    rng = np.random.default_rng(13)
    n = 90_000
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n).astype(str),
        "v": rng.normal(rng.integers(0, 12, n) * 10, 5, n),
    })
    df.loc[rng.random(n) < 0.01, "k"] = None  # null keys dropped
    ds = ray.data.from_pandas(df).repartition(8)
    out = quantile_sketch_by_key(ds, "k", "v", (0.5, 0.9),
                                 k=256, batch_size=4096).to_pandas()
    assert set(out.columns) == {"k", "q_0_5", "q_0_9"}
    assert len(out) == df["k"].dropna().nunique()
    for _, row in out.iterrows():
        grp = np.sort(df.loc[df["k"] == row["k"], "v"].to_numpy())
        gn = len(grp)
        for q, col in ((0.5, "q_0_5"), (0.9, "q_0_9")):
            rl = np.searchsorted(grp, row[col], "left") / gn
            rr = np.searchsorted(grp, row[col], "right") / gn
            assert max(0.0, rl - q, q - rr) < 0.05


def test_dirty_data_fails_fast(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"v": ["1", "oops"]}))
    with pytest.raises(Exception, match="(?i)oops|convert|numeric"):
        quantile_sketch(ds, "v", [0.5])
