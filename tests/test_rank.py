"""cume_dist: exact percentile-rank normalization vs pandas/DuckDB."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.rank import cume_dist


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(21)
    n = 12_000
    df = pd.DataFrame({"rid": np.arange(n),
                       "src": rng.integers(0, 6, n).astype(str),
                       # few distinct scores -> heavy ties
                       "score": rng.integers(0, 300, n).astype("float64")})
    df.loc[rng.random(n) < 0.03, "score"] = np.nan
    return df


def _ref(df, key):
    out = df.copy()
    if key:
        out["cume_dist"] = out.groupby(key)["score"] \
            .rank(method="max", pct=True)
    else:
        out["cume_dist"] = out["score"].rank(method="max", pct=True)
    return out


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_keyed_parity(data, strategy):
    out = cume_dist(ray.data.from_pandas(data).repartition(8), "score",
                    key_col="src", strategy=strategy).to_pandas()
    ref = _ref(data, "src")
    a = out.sort_values("rid").reset_index(drop=True)
    b = ref[a.columns].sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # null scores stay null
    assert a.loc[a["score"].isna(), "cume_dist"].isna().all()


def test_keyless_global_cdf(data):
    out = cume_dist(ray.data.from_pandas(data).repartition(5), "score",
                    strategy="broadcast").to_pandas()
    ref = _ref(data, None)
    a = out.sort_values("rid").reset_index(drop=True)
    b = ref[a.columns].sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_auto_routes_by_distinct_bound(data):
    # tiny cap forces the shuffle path; generous cap takes broadcast —
    # results identical either way
    outs = []
    for cap in (10, 10_000_000):
        out = cume_dist(ray.data.from_pandas(data).repartition(4), "score",
                        key_col="src", strategy="auto",
                        distinct_cap=cap).to_pandas()
        outs.append(out.sort_values("rid").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)


def test_matches_duckdb_cume_dist(data):
    import duckdb

    d = data.dropna(subset=["score"])  # SQL parity contract: non-null data
    out = cume_dist(ray.data.from_pandas(d), "score", key_col="src",
                    strategy="broadcast").to_pandas()
    con = duckdb.connect()
    con.register("t", d)
    o = con.execute("""
        SELECT rid, CUME_DIST() OVER (PARTITION BY src ORDER BY score) AS cd
        FROM t""").df()
    a = out.sort_values("rid")["cume_dist"].to_numpy()
    b = o.sort_values("rid")["cd"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_shuffle_requires_key():
    ds = ray.data.from_pandas(pd.DataFrame({"score": [1.0]}))
    with pytest.raises(ValueError):
        cume_dist(ds, "score", strategy="shuffle")
