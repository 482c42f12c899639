"""semi_join / anti_join: EXISTS semantics vs pandas reference."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.semijoin import anti_join, semi_join


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(23)
    left = pd.DataFrame({
        "lid": np.arange(5000),
        "k": rng.integers(0, 400, 5000).astype("float64"),
        "txt": rng.integers(0, 50, 5000).astype(str)})
    left.loc[rng.random(5000) < 0.05, "k"] = np.nan
    right = pd.DataFrame({
        "k": rng.integers(200, 600, 800).astype("float64"),
        "other": np.arange(800)})
    right.loc[rng.random(800) < 0.05, "k"] = np.nan
    return left, right


def _ref(left, right, on, anti):
    rk = right.dropna(subset=[on]).drop_duplicates(subset=[on])
    hit = left[on].isin(rk[on]) & left[on].notna()
    return left[~hit if anti else hit]


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
@pytest.mark.parametrize("anti", [False, True])
def test_parity(data, strategy, anti):
    left, right = data
    out = semi_join(ray.data.from_pandas(left).repartition(7),
                    ray.data.from_pandas(right).repartition(3),
                    "k", anti=anti, strategy=strategy).to_pandas()
    ref = _ref(left, right, "k", anti)
    a = out.sort_values("lid").reset_index(drop=True)
    b = ref.sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_null_semantics(data):
    left, right = data
    # EXISTS: null left keys never match -> dropped by semi, kept by anti
    semi = semi_join(ray.data.from_pandas(left),
                     ray.data.from_pandas(right), "k",
                     strategy="shuffle").to_pandas()
    assert semi["k"].notna().all()
    anti = anti_join(ray.data.from_pandas(left),
                     ray.data.from_pandas(right), "k",
                     strategy="shuffle").to_pandas()
    n_null = int(left["k"].isna().sum())
    assert int(anti["k"].isna().sum()) == n_null


def test_multi_key_and_duckdb_parity(data):
    import duckdb

    left, right = data
    right2 = right.copy()
    right2["txt"] = (right2["other"] % 50).astype(str)
    out = semi_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right2), ["k", "txt"],
                    strategy="shuffle").to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right2)
    o = con.execute("""
        SELECT l.* FROM l WHERE EXISTS (
          SELECT 1 FROM r WHERE r.k = l.k AND r.txt = l.txt)""").df()
    a = out.sort_values("lid").reset_index(drop=True)
    b = o[a.columns].sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_split_invariance(data):
    left, right = data
    outs = []
    for nparts in (1, 13):
        out = anti_join(ray.data.from_pandas(left).repartition(nparts),
                        ray.data.from_pandas(right).repartition(
                            min(nparts, 4)),
                        "k", strategy="shuffle").to_pandas()
        outs.append(out.sort_values("lid").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)


def test_empty_right():
    left = pd.DataFrame({"lid": [0, 1], "k": [1.0, np.nan]})
    right = pd.DataFrame({"k": pd.Series([], dtype="float64")})
    semi = semi_join(ray.data.from_pandas(left),
                     ray.data.from_pandas(right), "k",
                     strategy="broadcast").to_pandas()
    assert len(semi) == 0
    anti = anti_join(ray.data.from_pandas(left),
                     ray.data.from_pandas(right), "k",
                     strategy="broadcast").to_pandas()
    assert len(anti) == 2
