"""Numeric scaling / discretization (stages/scale.py): stats fold vs
pandas, per-key + global z-score and min-max, degenerate groups,
bucketize clamp + null passthrough, dtype guards."""

import numpy as np
import pandas as pd
import pytest

from openmldb_ray.stages.scale import (
    bucketize,
    minmax_scale,
    numeric_stats,
    standard_scale,
)


@pytest.fixture(scope="module")
def toy(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame({
        "k": rng.choice(["p", "q", None], n).astype(object),
        "x": rng.integers(-100, 100, n).astype(np.int64),
        "f": rng.normal(3.0, 2.0, n),
        "id": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    return df, ds


def test_numeric_stats_global_and_keyed(toy):
    df, ds = toy
    g = numeric_stats(ds, "x")
    assert len(g) == 1
    assert int(g["cnt"].iloc[0]) == len(df)
    assert int(g["vsum"].iloc[0]) == int(df["x"].sum())
    assert int(g["vsumsq"].iloc[0]) == int((df["x"].astype(object) ** 2).sum())
    assert g["vmin"].iloc[0] == df["x"].min()
    assert g["vmax"].iloc[0] == df["x"].max()
    assert g["vsum"].dtype == np.int64  # integer input → exact fold

    k = numeric_stats(ds, "x", by="k")
    ref = df.groupby("k", dropna=False)["x"].agg(["count", "sum", "min",
                                                  "max"])
    assert len(k) == 3
    for kk, r in ref.iterrows():
        row = k[k["key"].isna()] if pd.isna(kk) else k[k["key"] == kk]
        assert int(row["cnt"].iloc[0]) == r["count"]
        assert int(row["vsum"].iloc[0]) == r["sum"]
        assert row["vmin"].iloc[0] == r["min"]
        assert row["vmax"].iloc[0] == r["max"]


def test_numeric_stats_null_values_excluded(ray_session):
    import ray.data

    df = pd.DataFrame({"x": pd.array([1, None, 3, None], dtype="Int64"),
                       "k": ["a", "a", "b", "b"]})
    st = numeric_stats(ray.data.from_pandas(df), "x", by="k")
    a = st[st["key"] == "a"].iloc[0]
    b = st[st["key"] == "b"].iloc[0]
    assert (a["cnt"], int(a["vsum"])) == (1, 1)
    assert (b["cnt"], int(b["vsum"])) == (1, 3)
    # all-null key → cnt 0, nan min/max
    df2 = pd.DataFrame({"x": pd.array([None, None], dtype="Int64"),
                        "k": ["z", "z"]})
    st2 = numeric_stats(ray.data.from_pandas(df2), "x", by="k")
    assert int(st2["cnt"].iloc[0]) == 0
    assert np.isnan(st2["vmin"].iloc[0]) and np.isnan(st2["vmax"].iloc[0])


def test_standard_scale_matches_pandas(toy):
    df, ds = toy
    out = (standard_scale(ds, "x", by="k").to_pandas()
           .sort_values("id").reset_index(drop=True))
    gi = df.groupby("k", dropna=False)["x"]
    n = gi.transform("count").to_numpy(np.float64)
    s = gi.transform("sum").to_numpy(np.float64)
    sq = gi.transform(lambda v: (v.astype(np.float64) ** 2).sum()) \
           .to_numpy(np.float64)
    mean = s / n
    std = np.sqrt((sq - s * s / n) / n)
    ref = (df["x"].to_numpy(np.float64) - mean) / std
    assert np.allclose(out["x_z"].to_numpy(), ref)
    # global variant
    outg = (standard_scale(ds, "f").to_pandas().sort_values("id"))
    x = df["f"].to_numpy()
    m = x.mean()
    v = (x ** 2).sum() / len(x) - (x.sum() / len(x)) ** 2
    assert np.allclose(outg["f_z"].to_numpy(),
                       (x - x.sum() / len(x)) / np.sqrt(v), rtol=1e-9)


def test_standard_scale_zero_variance_null(ray_session):
    import ray.data

    df = pd.DataFrame({"x": [5, 5, 5, 1, 2], "k": ["c", "c", "c", "d", "d"]})
    out = standard_scale(ray.data.from_pandas(df), "x", by="k").to_pandas()
    assert out.loc[out["k"] == "c", "x_z"].isna().all()
    assert out.loc[out["k"] == "d", "x_z"].notna().all()


def test_minmax_scale(toy):
    df, ds = toy
    out = (minmax_scale(ds, "f", by="k").to_pandas()
           .sort_values("id").reset_index(drop=True))
    gi = df.groupby("k", dropna=False)["f"]
    lo = gi.transform("min").to_numpy()
    hi = gi.transform("max").to_numpy()
    assert np.allclose(out["f_mm"].to_numpy(),
                       (df["f"].to_numpy() - lo) / (hi - lo))
    assert out["f_mm"].between(0, 1).all()
    # constant group → null
    df2 = pd.DataFrame({"f": [2.0, 2.0], "k": ["c", "c"]})
    import ray.data

    out2 = minmax_scale(ray.data.from_pandas(df2), "f", by="k").to_pandas()
    assert out2["f_mm"].isna().all()


def test_scale_null_inputs_stay_null(ray_session):
    import ray.data

    df = pd.DataFrame({"x": pd.array([1, None, 3], dtype="Int64"),
                       "k": ["a", "a", "a"]})
    ds = ray.data.from_pandas(df)
    z = standard_scale(ds, "x", by="k").to_pandas()
    assert z["x_z"].isna().tolist() == [False, True, False]
    mm = minmax_scale(ds, "x").to_pandas()
    assert mm["x_mm"].isna().tolist() == [False, True, False]


def test_bucketize(toy):
    df, ds = toy
    edges = [-50, 0, 50]
    out = (bucketize(ds, "x", edges).to_pandas()
           .sort_values("id").reset_index(drop=True))
    x = df["x"].to_numpy(np.float64)
    exp = np.clip(np.searchsorted(edges, x, side="right") - 1, 0, 1)
    assert (out["x_bin"].to_numpy(np.int64) == exp).all()
    # clamping: everything below -50 lands in bin 0, above 50 in bin 1
    assert out.loc[df["x"].to_numpy() < -50, "x_bin"].eq(0).all()
    assert out.loc[df["x"].to_numpy() >= 50, "x_bin"].eq(1).all()


def test_bucketize_null_and_guards(ray_session):
    import ray.data

    df = pd.DataFrame({"x": pd.array([10, None], dtype="Int64")})
    out = bucketize(ray.data.from_pandas(df), "x", [0, 100]).to_pandas()
    assert out["x_bin"].tolist()[0] == 0
    assert pd.isna(out["x_bin"].iloc[1])
    with pytest.raises(ValueError, match="ascending"):
        bucketize(ray.data.from_pandas(df), "x", [1, 1])


def test_scale_nullable_float_blocks(ray_session):
    """Nullable Float64 columns with an NA must scale, not crash: the
    apply pass converts with na_value=np.nan unconditionally."""
    import ray.data

    df = pd.DataFrame({"x": pd.array([1.0, None, 3.0], dtype="Float64"),
                       "k": ["a", "a", "a"]})
    ds = ray.data.from_pandas(df)
    mm = minmax_scale(ds, "x").to_pandas()
    assert mm["x_mm"].isna().tolist() == [False, True, False]
    assert mm["x_mm"].dropna().tolist() == [0.0, 1.0]


def test_int_sums_exact_past_2_53_with_nulls(ray_session):
    """A null anywhere used to float-promote the block before the fold,
    rounding int64 values past 2^53; the Arrow-side nullable-Int64
    conversion keeps sums exact. numeric_stats itself can never show
    this (any |x| > 2^53 has a square past int64, so the sumsq guard
    fires first — asserted here), so the exactness half is checked on
    category_stats, which folds plain sums."""
    import pyarrow as pa
    import ray.data
    from openmldb_ray.stages.encoders import category_stats

    big = 2 ** 53 + 3  # rounds to 2^53 + 4 in float64
    t = pa.table({"x": pa.array([big, None], pa.int64()),
                  "k": pa.array(["a", "a"])})
    ds = ray.data.from_arrow(t)
    st = category_stats(ds, "k", "x")
    assert int(st["tsum"].iloc[0]) == big  # not big + 1
    with pytest.raises(Exception, match="cast"):
        numeric_stats(ds, "x", by="k")


def test_sumsq_overflow_raises_loud(ray_session):
    """int64 squares wrap silently in numpy (unlike SQL BIGINT, which
    errors) — magnitudes whose exact sumsq cannot fit int64 must raise
    the cast-to-float64 guidance, not return garbage variance."""
    import ray.data

    df = pd.DataFrame({"x": np.array([4_000_000_000, 4_000_000_001],
                                     dtype=np.int64)})
    with pytest.raises(Exception, match="cast"):
        numeric_stats(ray.data.from_pandas(df), "x")
    # float64 input of the same magnitudes works (approximate contract)
    st = numeric_stats(ray.data.from_pandas(
        pd.DataFrame({"x": np.array([4e9, 4e9 + 1])})), "x")
    assert st["vsumsq"].iloc[0] > 0


def test_bucketize_nan_edges_rejected(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"x": [1.0]}))
    with pytest.raises(ValueError, match="finite"):
        bucketize(ds, "x", [0.0, float("nan"), 1.0])


def test_non_numeric_rejected(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"t": ["a", "b"]}))
    with pytest.raises(TypeError, match="numeric"):
        numeric_stats(ds, "t")
