"""group_aggregate_sets: ROLLUP / CUBE / GROUPING SETS vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.core.aggregates import Agg
from openmldb_ray.stages.relational import group_aggregate_sets

KEY = ["grouping_id", "a", "b"]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(9)
    n = 8_000
    return pd.DataFrame({
        # real NULL keys: a rollup NULL must stay distinguishable via gid
        "a": rng.choice(["x", "y", None], n, p=[.5, .4, .1]),
        "b": rng.integers(0, 4, n),
        "v": np.where(rng.random(n) < .05, np.nan, rng.random(n) * 10),
    })


def _cmp(out, oracle, val_cols):
    s1 = out.sort_values(KEY, na_position="last").reset_index(drop=True)
    s2 = oracle.sort_values(KEY, na_position="last").reset_index(drop=True)
    assert len(s1) == len(s2)
    assert (s1["grouping_id"].to_numpy() == s2["grouping_id"].to_numpy()).all()
    assert (s1["a"].isna().to_numpy() == s2["a"].isna().to_numpy()).all()
    m = s1["a"].notna().to_numpy()
    assert (s1["a"][m].to_numpy() == s2["a"][m].to_numpy()).all()
    for c in val_cols:
        assert np.allclose(s1[c].to_numpy(float), s2[c].to_numpy(float),
                           equal_nan=True), c


@pytest.mark.parametrize("mode,sqlmode", [
    ("rollup", "ROLLUP(a, b)"), ("cube", "CUBE(a, b)")])
def test_mergeable_parity(ray_session, data, mode, sqlmode):
    df = data  # noqa: F841
    ds = ray.data.from_pandas(data).repartition(5)
    out = group_aggregate_sets(
        ds, ["a", "b"],
        [Agg.sum("v", "v_sum"), Agg.count("v", "v_cnt"),
         Agg.avg("v", "v_avg"), Agg.min("v", "v_min"),
         Agg.max("v", "v_max"), Agg.count_star("n_rows")],
        sets=mode).to_pandas()
    oracle = duckdb.sql(f"""
        SELECT a, b, SUM(v) AS v_sum, COUNT(v) AS v_cnt, AVG(v) AS v_avg,
               MIN(v) AS v_min, MAX(v) AS v_max, COUNT(*) AS n_rows,
               GROUPING(a, b) AS grouping_id
        FROM df GROUP BY {sqlmode}""").df()
    _cmp(out, oracle, ["v_sum", "v_cnt", "v_avg", "v_min", "v_max",
                       "n_rows"])


def test_explicit_sets(ray_session, data):
    df = data  # noqa: F841
    ds = ray.data.from_pandas(data).repartition(3)
    out = group_aggregate_sets(ds, ["a", "b"], [Agg.sum("v", "v_sum")],
                               sets=[("a",), ()]).to_pandas()
    oracle = duckdb.sql("""
        SELECT a, CAST(NULL AS BIGINT) AS b, SUM(v) AS v_sum,
               CASE WHEN GROUPING(a) = 0 THEN 1 ELSE 3 END AS grouping_id
        FROM df GROUP BY GROUPING SETS ((a), ())""").df()
    _cmp(out, oracle, ["v_sum"])
    with pytest.raises(ValueError, match="not a subset"):
        group_aggregate_sets(ds, ["a"], [Agg.sum("v", "s")], sets=[("b",)])


def test_exotic_fallback(ray_session, data):
    df = data  # noqa: F841
    ds = ray.data.from_pandas(data).repartition(4)
    out = group_aggregate_sets(ds, ["a"], [Agg.median("v", "v_med")],
                               sets="rollup").to_pandas()
    oracle = duckdb.sql("""
        SELECT a, MEDIAN(v) AS v_med, GROUPING(a) AS grouping_id
        FROM df GROUP BY ROLLUP(a)""").df()
    s1 = out.sort_values(["grouping_id", "a"],
                         na_position="last").reset_index(drop=True)
    s2 = oracle.sort_values(["grouping_id", "a"],
                            na_position="last").reset_index(drop=True)
    assert len(s1) == len(s2)
    assert np.allclose(s1["v_med"].to_numpy(float),
                       s2["v_med"].to_numpy(float), equal_nan=True)


def test_split_invariance(ray_session, data):
    aggs = [Agg.sum("v", "v_sum"), Agg.avg("v", "v_avg")]
    a = group_aggregate_sets(ray.data.from_pandas(data).repartition(2),
                             ["a", "b"], aggs, sets="rollup").to_pandas()
    b = group_aggregate_sets(ray.data.from_pandas(data).repartition(17),
                             ["a", "b"], aggs, sets="rollup").to_pandas()
    s1 = a.sort_values(KEY, na_position="last").reset_index(drop=True)
    s2 = b.sort_values(KEY, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s2, check_dtype=False)
