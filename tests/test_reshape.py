"""pivot_agg / unpivot: wide<->long reshaping vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.reshape import pivot_agg, unpivot


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(2)
    n = 6_000
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n),
        "cat": rng.choice(["a", "b", "c", None], n, p=[.4, .3, .2, .1]),
        "v": np.where(rng.random(n) < 0.05, np.nan, rng.random(n) * 100),
    })
    # a (key, category) hole: count must be 0 there, sum/min/max/mean NULL
    return df[~((df.k == 29) & (df.cat == "c"))].reset_index(drop=True)


@pytest.mark.parametrize("agg,sqlagg", [
    ("sum", "SUM"), ("count", "COUNT"), ("min", "MIN"),
    ("max", "MAX"), ("mean", "AVG")])
def test_pivot_parity(ray_session, data, agg, sqlagg):
    df = data  # noqa: F841 - duckdb replacement scan
    ds = ray.data.from_pandas(data).repartition(5)
    out = pivot_agg(ds, "k", "cat", "v", agg=agg).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    o = duckdb.sql(f"""
        SELECT k, {sqlagg}(CASE WHEN cat='a' THEN v END) AS a,
               {sqlagg}(CASE WHEN cat='b' THEN v END) AS b,
               {sqlagg}(CASE WHEN cat='c' THEN v END) AS c
        FROM df GROUP BY k ORDER BY k""").df()
    assert len(out) == len(o)
    for c in ["a", "b", "c"]:
        assert np.allclose(out[f"v_{agg}_{c}"].to_numpy(float),
                           o[c].to_numpy(float), equal_nan=True), c


def test_pivot_hole_semantics(ray_session, data):
    ds = ray.data.from_pandas(data)
    cnt = pivot_agg(ds, "k", "cat", "v", agg="count").to_pandas()
    s = pivot_agg(ds, "k", "cat", "v", agg="sum").to_pandas()
    row_c = cnt[cnt.k == 29].iloc[0]
    row_s = s[s.k == 29].iloc[0]
    assert row_c["v_count_c"] == 0 and cnt["v_count_c"].dtype == np.int64
    assert pd.isna(row_s["v_sum_c"])


def test_pivot_split_invariance(ray_session, data):
    a = pivot_agg(ray.data.from_pandas(data).repartition(2),
                  "k", "cat", "v", agg="mean").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    b = pivot_agg(ray.data.from_pandas(data).repartition(13),
                  "k", "cat", "v", agg="mean", num_buckets=7).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pivot_fixed_categories_and_guards(ray_session, data):
    ds = ray.data.from_pandas(data)
    out = pivot_agg(ds, "k", "cat", "v", agg="sum",
                    categories=["a", "zzz"]).to_pandas()
    assert "v_sum_zzz" in out.columns
    assert out["v_sum_zzz"].isna().all()
    with pytest.raises(ValueError, match="agg"):
        pivot_agg(ds, "k", "cat", "v", agg="median")
    with pytest.raises(ValueError, match="collide"):
        pivot_agg(ds, "k", "cat", "v", categories=["x y", "x_y"])


def test_unpivot_parity(ray_session, data):
    wide = data.assign(v2=data["v"] * 2).drop(columns="cat")
    df = wide  # noqa: F841
    ds = ray.data.from_pandas(wide).repartition(4)
    out = unpivot(ds, "k", ["v", "v2"], var_name="var",
                  value_name="val").to_pandas()
    o = duckdb.sql("""
        SELECT k, 'v' AS var, v AS val FROM df
        UNION ALL SELECT k, 'v2', v2 FROM df""").df()
    key = ["k", "var", "val"]
    pd.testing.assert_frame_equal(
        out.sort_values(key, na_position="last").reset_index(drop=True),
        o.sort_values(key, na_position="last").reset_index(drop=True),
        check_dtype=False)
