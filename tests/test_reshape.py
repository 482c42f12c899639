"""pivot_agg / unpivot: wide<->long reshaping vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.reshape import (collect_list, explode, pivot_agg,
                                         unpivot)


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


def test_explode_parity(ray_session):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(400):
        n = rng.integers(0, 6)
        rows.append({"id": i, "xs": None if rng.random() < 0.1
                     else rng.integers(0, 100, n).tolist()})
    df = pd.DataFrame(rows)
    import pyarrow as pa
    tbl = pa.table({"id": pa.array(df["id"], pa.int64()),
                    "xs": pa.array(df["xs"], pa.list_(pa.int64()))})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = explode(ds, "xs", out_col="x", pos_col="pos").to_pandas() \
        .sort_values(["id", "pos"]).reset_index(drop=True)
    o = duckdb.sql("""
        SELECT id, CAST(unnest(xs) AS BIGINT) AS x,
               CAST(generate_subscripts(xs, 1) - 1 AS BIGINT) AS pos
        FROM tbl ORDER BY id, pos""").df()
    pd.testing.assert_frame_equal(out[["id", "x", "pos"]], o,
                                  check_dtype=False)


def test_collect_list_roundtrip(ray_session):
    rng = np.random.default_rng(5)
    n = 3_000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "v": np.where(rng.random(n) < 0.05, np.nan, rng.random(n)),
        "ord": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = collect_list(ds, "k", "v", sort_by="ord",
                       out_col="vs").to_pandas()
    assert len(out) == df["k"].nunique()
    got = {r.k: list(r.vs) for r in out.itertuples()}
    for k, g in df.sort_values("ord").groupby("k"):
        exp = g["v"].tolist()
        a = got[k]
        assert len(a) == len(exp)
        assert np.allclose(np.array(a, float), np.array(exp, float),
                           equal_nan=True)
    # split invariance
    out2 = collect_list(ray.data.from_pandas(df).repartition(2), "k", "v",
                        sort_by="ord", out_col="vs",
                        num_buckets=8).to_pandas()
    got2 = {r.k: list(r.vs) for r in out2.itertuples()}
    for k in got:
        assert np.allclose(np.array(got[k], float),
                           np.array(got2[k], float), equal_nan=True)


def test_explode_collect_inverse(ray_session):
    import pyarrow as pa
    tbl = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                    "xs": pa.array([[1, 2], [], [5, 6, 7]],
                                   pa.list_(pa.int64()))})
    ds = ray.data.from_arrow(tbl)
    long = explode(ds, "xs", out_col="x", pos_col="p")
    back = collect_list(long, "k", "x", sort_by="p",
                        out_col="xs").to_pandas()
    got = {r.k: list(r.xs) for r in back.itertuples()}
    assert got == {1: [1, 2], 3: [5, 6, 7]}  # empty list drops (SQL UNNEST)


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
