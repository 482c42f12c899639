"""inner_join / full_outer_join: ANSI equi-join semantics vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.join_stage import (cross_join, full_outer_join,
                                            inner_join)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    L = pd.DataFrame({
        "k": np.where(rng.random(4000) < 0.05, np.nan,
                      rng.integers(0, 50, 4000).astype(float)),
        "a": rng.random(4000),
    })
    # evens only → unmatched rows on both sides; duplicate right keys →
    # many-to-many fanout; a null right key that must match nothing
    R = pd.DataFrame({
        "rk": np.concatenate([np.arange(0, 80, 2, dtype=float),
                              [4.0, 4.0, np.nan]]),
        "b": rng.random(43),
    })
    return L, R


def _sorted(df, cols):
    return (df[cols].sort_values(cols, na_position="last")
            .reset_index(drop=True))


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_inner_parity(ray_session, data, strategy):
    L, R = data
    lds = ray.data.from_pandas(L).repartition(6)
    rds = ray.data.from_pandas(R).repartition(3)
    out = inner_join(lds, rds, ("k", "rk"), strategy=strategy).to_pandas()
    oracle = duckdb.sql(
        "SELECT k, a, b FROM L JOIN R ON k = rk").df()
    cols = ["k", "a", "b"]
    pd.testing.assert_frame_equal(_sorted(out, cols), _sorted(oracle, cols),
                                  check_dtype=False)


def test_inner_right_cols(ray_session, data):
    L, R = data
    out = inner_join(ray.data.from_pandas(L), ray.data.from_pandas(R),
                     ("k", "rk"), right_cols={"b": "bee"},
                     strategy="broadcast").to_pandas()
    assert "bee" in out.columns and "b" not in out.columns


def test_full_outer_parity(ray_session, data):
    L, R = data
    lds = ray.data.from_pandas(L).repartition(6)
    rds = ray.data.from_pandas(R).repartition(3)
    out = full_outer_join(lds, rds, ("k", "rk")).to_pandas()
    # Ray coalesces the join key into the left key column (USING-style)
    oracle = duckdb.sql(
        "SELECT COALESCE(k, rk) AS k, a, b FROM L FULL OUTER JOIN R ON k = rk"
    ).df()
    assert len(out) == len(oracle)
    cols = ["k", "a", "b"]
    pd.testing.assert_frame_equal(_sorted(out, cols), _sorted(oracle, cols),
                                  check_dtype=False)


def test_cross_join(ray_session):
    L = pd.DataFrame({"x": [1, 2, 3], "a": [1.0, 2.0, 3.0]})
    R = pd.DataFrame({"h": [10, 20]})
    out = cross_join(ray.data.from_pandas(L).repartition(2),
                     ray.data.from_pandas(R)).to_pandas()
    o = duckdb.sql("SELECT x, a, h FROM L CROSS JOIN R").df()
    cols = ["x", "a", "h"]
    pd.testing.assert_frame_equal(_sorted(out, cols), _sorted(o, cols),
                                  check_dtype=False)
    with pytest.raises(ValueError, match="right_limit"):
        cross_join(ray.data.from_pandas(L), ray.data.from_pandas(R),
                   right_limit=1)
    with pytest.raises(Exception, match="both sides"):
        cross_join(ray.data.from_pandas(L),
                   pd.DataFrame({"a": [1.0]})).to_pandas()


def test_null_keys_never_match(ray_session):
    L = pd.DataFrame({"k": [1.0, None], "a": [1.0, 2.0]})
    R = pd.DataFrame({"rk": [1.0, None], "b": [10.0, 90.0]})
    inner = inner_join(ray.data.from_pandas(L), ray.data.from_pandas(R),
                       ("k", "rk"), strategy="broadcast").to_pandas()
    assert len(inner) == 1 and inner["b"].iloc[0] == 10.0
    fo = full_outer_join(ray.data.from_pandas(L), ray.data.from_pandas(R),
                         ("k", "rk")).to_pandas()
    assert len(fo) == 3  # match + left-null + right-null rows
