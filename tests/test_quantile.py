"""exact_quantiles: distributed order statistics vs DuckDB ground truth."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.quantile import exact_quantiles

QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _duck(vals, qs, kind):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    fn = "quantile_disc" if kind == "disc" else "quantile_cont"
    return [con.execute(f"SELECT {fn}(x, {q}) FROM t").fetchone()[0]
            for q in qs]


@pytest.mark.parametrize("kind", ["disc", "cont"])
def test_matches_duckdb(ray_session, kind):
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(100, 15, 20_000),
        rng.lognormal(3, 1.5, 5_000),          # heavy tail
        np.full(3_000, 42.0),                  # massive tie run
        np.round(rng.uniform(0, 10, 2_000)),   # small-int ties
    ])
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(9)
    got = exact_quantiles(ds, "x", QS, interpolation=kind,
                          collect_cap=500)
    exp = _duck(vals, QS, kind)
    np.testing.assert_allclose(got["value"].to_numpy(), exp,
                               rtol=0, atol=1e-9)


def test_nulls_excluded(ray_session):
    vals = [1.0, None, 2.0, 3.0, None, 4.0]
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals}))
    got = exact_quantiles(ds, "x", [0.5], interpolation="disc")
    assert got["value"].iloc[0] == 2.0  # ceil(0.5*4)-1 = rank 1


def test_split_invariance(ray_session):
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50, 5_000).astype(float)
    df = pd.DataFrame({"x": vals})
    a = exact_quantiles(ray.data.from_pandas(df).repartition(1),
                        "x", [0.5, 0.9], collect_cap=64)
    b = exact_quantiles(ray.data.from_pandas(df).repartition(13),
                        "x", [0.5, 0.9], collect_cap=64)
    assert a["value"].tolist() == b["value"].tolist()


def test_empty_and_bad_q(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"x": [np.nan, np.nan]}))
    got = exact_quantiles(ds, "x", [0.5])
    assert np.isnan(got["value"].iloc[0])
    with pytest.raises(ValueError):
        exact_quantiles(ds, "x", [1.5])


def test_by_key_matches_duckdb(ray_session):
    from openmldb_ray.stages.quantile import exact_quantiles_by_key
    rng = np.random.default_rng(3)
    n = 20_000
    df = pd.DataFrame({
        "k": [f"s{i % 7}" for i in range(n)],
        "x": np.concatenate([rng.normal(50 + 10 * (i % 7), 5 + (i % 7), 1)
                             for i in range(n)]).round(3),
    })
    df.loc[::97, "x"] = 42.0      # tie runs
    df.loc[::131, "x"] = np.nan   # nulls
    got = exact_quantiles_by_key(
        ray.data.from_pandas(df).repartition(9), "x",
        [0.25, 0.5, 0.95], "k", interpolation="both", collect_cap=200)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT k, 0.25 AS q, quantile_disc(x, 0.25) AS disc,
               quantile_cont(x, 0.25) AS cont FROM t GROUP BY k
        UNION ALL
        SELECT k, 0.5, quantile_disc(x, 0.5), quantile_cont(x, 0.5)
        FROM t GROUP BY k
        UNION ALL
        SELECT k, 0.95, quantile_disc(x, 0.95), quantile_cont(x, 0.95)
        FROM t GROUP BY k
        ORDER BY k, q
    """).fetchdf()
    got = got.sort_values(["k", "q"]).reset_index(drop=True)
    np.testing.assert_allclose(got["disc"], exp["disc"], rtol=0, atol=1e-9)
    np.testing.assert_allclose(got["cont"], exp["cont"], rtol=0, atol=1e-9)


def test_by_key_split_invariance(ray_session):
    from openmldb_ray.stages.quantile import exact_quantiles_by_key
    rng = np.random.default_rng(8)
    df = pd.DataFrame({"k": [f"g{i % 3}" for i in range(3000)],
                       "x": rng.integers(0, 40, 3000).astype(float)})
    outs = [exact_quantiles_by_key(
        ray.data.from_pandas(df).repartition(p), "x", [0.5, 0.9], "k",
        collect_cap=32).sort_values(["k", "q"]).reset_index(drop=True)
        for p in (1, 13)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
