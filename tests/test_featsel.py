"""Feature-selection statistics (stages/featsel.py) + the new scaling /
imputation / WoE ops: naive-parity vs pandas/numpy, null semantics,
split invariance, exactness of the integer paths."""

import math

import numpy as np
import pandas as pd
import pytest

from openmldb_ray.stages.encoders import category_stats, woe_encode, woe_table
from openmldb_ray.stages.featsel import (
    anova_f,
    categorical_assoc,
    contingency,
    corr_matrix,
)
from openmldb_ray.stages.scale import impute, quantile_bin, robust_scale


@pytest.fixture(scope="module")
def toy(ray_session):
    import ray.data

    rng = np.random.default_rng(42)
    n = 2000
    x = rng.integers(-50, 50, n).astype(np.int64)
    df = pd.DataFrame({
        "x": x,
        "y": x * 3 + rng.integers(0, 7, n),        # strongly correlated
        "z": rng.integers(-1000, 1000, n).astype(np.int64),
        "f": rng.normal(0, 1, n),
        "k": rng.choice(["a", "b", "c", None], n).astype(object),
        "lab": rng.choice(["pos", "neg"], n, p=[0.3, 0.7]).astype(object),
        "id": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(7)
    return df, ds


# ---------------------------------------------------------------- corr


def naive_corr(a, b):
    m = ~(pd.isna(a) | pd.isna(b))
    return float(np.corrcoef(np.asarray(a, float)[m],
                             np.asarray(b, float)[m])[0, 1])


def test_corr_matrix_int_parity(toy):
    df, ds = toy
    out = corr_matrix(ds, ["x", "y", "z"])
    assert list(out.columns) == ["col_a", "col_b", "corr"]
    assert len(out) == 3
    got = {(r.col_a, r.col_b): r.corr for r in out.itertuples()}
    assert got[("x", "y")] == pytest.approx(naive_corr(df.x, df.y), abs=1e-12)
    assert got[("x", "z")] == pytest.approx(naive_corr(df.x, df.z), abs=1e-12)
    assert got[("x", "y")] > 0.99


def test_corr_matrix_split_invariance_exact_int(toy, ray_session):
    import ray.data

    df, _ = toy
    a = corr_matrix(ray.data.from_pandas(df).repartition(2),
                    ["x", "y", "z"])
    b = corr_matrix(ray.data.from_pandas(df).repartition(23),
                    ["x", "y", "z"])
    # integer moment folds are exact → bit-identical across partitionings
    assert np.array_equal(a["corr"].to_numpy(), b["corr"].to_numpy())


def test_corr_matrix_complete_case_nulls(ray_session):
    import ray.data

    df = pd.DataFrame({
        "a": pd.array([1, 2, None, 4, 5, 6], dtype="Int64"),
        "b": pd.array([2, 4, 6, None, 10, 12], dtype="Int64"),
    })
    out = corr_matrix(ray.data.from_pandas(df).repartition(3), ["a", "b"])
    keep = df.dropna()
    exp = naive_corr(keep["a"].astype(float), keep["b"].astype(float))
    assert out["corr"].iloc[0] == pytest.approx(exp, abs=1e-12)


def test_corr_matrix_float_and_constant(toy, ray_session):
    import ray.data

    df, ds = toy
    out = corr_matrix(ds, ["f", "x"])
    assert out["corr"].iloc[0] == pytest.approx(naive_corr(df.f, df.x),
                                                rel=1e-9)
    cdf = pd.DataFrame({"c": np.full(50, 7, np.int64),
                        "x": np.arange(50, dtype=np.int64)})
    out = corr_matrix(ray.data.from_pandas(cdf), ["c", "x"])
    assert math.isnan(out["corr"].iloc[0])  # zero variance → null


def test_corr_matrix_big_int_object_path(ray_session):
    import ray.data

    # two huge values force the block past the vectorized-int64 bound
    # (mx² · nrow ≥ 2^62) so the exact object fold runs — while the true
    # product sums still fit int64 (≈7.2e18 < 2^63)
    rng = np.random.default_rng(7)
    v = rng.integers(-100, 100, 200).astype(np.int64)
    w = rng.integers(-100, 100, 200).astype(np.int64)
    v[0], v[1] = 1_900_000_000, -1_900_000_003
    df = pd.DataFrame({"v": v, "w": w})
    out = corr_matrix(ray.data.from_pandas(df), ["v", "w"])
    assert out["corr"].iloc[0] == pytest.approx(naive_corr(v, w), rel=1e-12)


def test_corr_matrix_int64_overflow_is_loud(ray_session):
    import ray.data

    # squares sum past int64 → the exact path must raise, not wrap
    v = np.full(60, 2**31 + 7, np.int64)
    w = np.arange(60, dtype=np.int64)
    df = pd.DataFrame({"v": v, "w": w})
    with pytest.raises(Exception, match="exceeds int64"):
        corr_matrix(ray.data.from_pandas(df), ["v", "w"])


def test_corr_matrix_validation(toy):
    _, ds = toy
    with pytest.raises(ValueError):
        corr_matrix(ds, ["x"])
    with pytest.raises(ValueError):
        corr_matrix(ds, ["x", "x"])
    with pytest.raises(TypeError):
        corr_matrix(ds, ["x", "k"])


# ---------------------------------------------------------------- anova


def naive_anova_f(df, val, grp):
    d = df[[val, grp]].copy()
    d = d[d[val].notna()]
    groups = [g[val].to_numpy(float)
              for _, g in d.groupby(grp, dropna=False)]
    k, n = len(groups), sum(len(g) for g in groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    return (ssb / (k - 1)) / (ssw / (n - k)), k - 1, n - k


def test_anova_f_parity(toy):
    df, ds = toy
    out = anova_f(ds, "x", "k")
    f, dfb, dfw = naive_anova_f(df, "x", "k")
    assert out["f_stat"].iloc[0] == pytest.approx(f, rel=1e-9)
    assert int(out["df_between"].iloc[0]) == dfb
    assert int(out["df_within"].iloc[0]) == dfw


def test_anova_f_signal(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 900
    grp = rng.choice(["lo", "mid", "hi"], n)
    shift = pd.Series(grp).map({"lo": 0, "mid": 50, "hi": 100}).to_numpy()
    df = pd.DataFrame({"v": (rng.integers(0, 10, n) + shift).astype(np.int64),
                       "g": grp})
    strong = anova_f(ray.data.from_pandas(df).repartition(5), "v", "g")
    noise = pd.DataFrame({"v": rng.integers(0, 10, n).astype(np.int64),
                          "g": grp})
    weak = anova_f(ray.data.from_pandas(noise).repartition(5), "v", "g")
    assert strong["f_stat"].iloc[0] > 100 * weak["f_stat"].iloc[0]


def test_anova_f_degenerate(ray_session):
    import ray.data

    df = pd.DataFrame({"v": [1, 2], "g": ["a", "a"]})
    out = anova_f(ray.data.from_pandas(df), "v", "g")
    assert math.isnan(out["f_stat"].iloc[0])


# ---------------------------------------------------------- contingency


def test_contingency_parity(toy):
    df, ds = toy
    ct = contingency(ds, "k", "lab")
    keep = df[df["k"].notna() & df["lab"].notna()]
    exp = (keep.groupby(["k", "lab"]).size().reset_index(name="cnt")
           .sort_values(["k", "lab"]).reset_index(drop=True))
    assert len(ct) == len(exp)
    assert (ct["cnt"].to_numpy() == exp["cnt"].to_numpy()).all()
    assert list(ct["a"]) == list(exp["k"])
    assert list(ct["b"]) == list(exp["lab"])


def naive_assoc(df, a, b):
    keep = df[df[a].notna() & df[b].notna()]
    ct = pd.crosstab(keep[a], keep[b])
    o = ct.to_numpy(float)
    n = o.sum()
    e = np.outer(o.sum(1), o.sum(0)) / n
    chi2 = ((o - e) ** 2 / e)[o + e > 0].sum()
    v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    p = o / n
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = p * np.log(o * n / np.outer(o.sum(1), o.sum(0)))
    mi = terms[o > 0].sum()
    return chi2, v, mi


def test_categorical_assoc_parity(toy):
    df, ds = toy
    out = categorical_assoc(ds, "k", "lab")
    chi2, v, mi = naive_assoc(df, "k", "lab")
    assert out["chi2"].iloc[0] == pytest.approx(chi2, rel=1e-9)
    assert out["cramers_v"].iloc[0] == pytest.approx(v, rel=1e-9)
    assert out["mi"].iloc[0] == pytest.approx(mi, rel=1e-9, abs=1e-12)
    assert int(out["n_rows_a"].iloc[0]) == 3
    assert int(out["n_cols_b"].iloc[0]) == 2


def test_categorical_assoc_dependence_orders(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    n = 2000
    a = rng.choice(["u", "v", "w"], n)
    # b copies a 80% of the time → strong association
    b = np.where(rng.random(n) < 0.8, a, rng.choice(["u", "v", "w"], n))
    dep = categorical_assoc(
        ray.data.from_pandas(pd.DataFrame({"a": a, "b": b})), "a", "b")
    ind = categorical_assoc(
        ray.data.from_pandas(pd.DataFrame(
            {"a": a, "b": rng.choice(["u", "v", "w"], n)})), "a", "b")
    assert dep["mi"].iloc[0] > 10 * max(ind["mi"].iloc[0], 1e-9)
    assert dep["cramers_v"].iloc[0] > 0.5


# --------------------------------------------------------- robust_scale


def disc_q(vals, q):
    v = np.sort(np.asarray(vals, float))
    return v[max(int(np.ceil(q * len(v))) - 1, 0)]


def test_robust_scale_global(toy):
    df, ds = toy
    out = robust_scale(ds, "x").to_pandas().sort_values("id")
    med = disc_q(df["x"], 0.5)
    iqr = disc_q(df["x"], 0.75) - disc_q(df["x"], 0.25)
    exp = (df.sort_values("id")["x"].to_numpy(float) - med) / iqr
    assert np.array_equal(out["x_rs"].to_numpy(), exp)


def test_robust_scale_by_key(toy):
    df, ds = toy
    out = robust_scale(ds, "x", by="k").to_pandas().sort_values("id")
    joined = out.merge(df[["id", "k", "x"]], on="id", suffixes=("", "_r"))
    for key, g in df[df["k"].notna()].groupby("k"):
        med = disc_q(g["x"], 0.5)
        iqr = disc_q(g["x"], 0.75) - disc_q(g["x"], 0.25)
        sub = joined[joined["k"] == key]
        exp = (sub["x"].to_numpy(float) - med) / iqr
        assert np.allclose(sub["x_rs"].to_numpy(), exp, rtol=0, atol=0)
    # null keys: exact_quantiles_by_key has no null group → null output
    assert out.loc[df.sort_values("id")["k"].isna().to_numpy(),
                   "x_rs"].isna().all()


def test_robust_scale_constant_group(ray_session):
    import ray.data

    df = pd.DataFrame({"x": [5] * 10, "id": range(10)})
    out = robust_scale(ray.data.from_pandas(df), "x").to_pandas()
    assert out["x_rs"].isna().all()  # zero IQR → null


# --------------------------------------------------------------- impute


@pytest.fixture(scope="module")
def holey(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    n = 1200
    x = rng.integers(0, 100, n).astype(float)
    x[rng.random(n) < 0.2] = np.nan
    df = pd.DataFrame({"x": x,
                       "k": rng.choice(["a", "b"], n).astype(object),
                       "id": np.arange(n, dtype=np.int64)})
    return df, ray.data.from_pandas(df).repartition(6)


def test_impute_mean_global(holey):
    df, ds = holey
    out = impute(ds, "x").to_pandas().sort_values("id")
    mean = df["x"].mean()
    exp = df.sort_values("id")["x"].fillna(mean).to_numpy()
    assert np.allclose(out["x_filled"].to_numpy(), exp, rtol=0, atol=0)
    assert out["x_filled"].notna().all()


def test_impute_mean_by_key(holey):
    df, ds = holey
    out = impute(ds, "x", by="k").to_pandas().sort_values("id")
    ref = df.sort_values("id")
    exp = ref["x"].fillna(ref["k"].map(df.groupby("k")["x"].mean()))
    assert np.allclose(out["x_filled"].to_numpy(), exp.to_numpy(),
                       rtol=0, atol=1e-12)


def test_impute_median_and_constant(holey):
    df, ds = holey
    med = impute(ds, "x", strategy="median").to_pandas().sort_values("id")
    mval = disc_q(df["x"].dropna(), 0.5)
    exp = df.sort_values("id")["x"].fillna(mval).to_numpy()
    assert np.array_equal(med["x_filled"].to_numpy(), exp)

    cst = impute(ds, "x", strategy="constant",
                 fill_value=-1.0).to_pandas().sort_values("id")
    exp = df.sort_values("id")["x"].fillna(-1.0).to_numpy()
    assert np.array_equal(cst["x_filled"].to_numpy(), exp)


def test_impute_validation(holey):
    _, ds = holey
    with pytest.raises(ValueError):
        impute(ds, "x", strategy="constant")  # needs fill_value
    with pytest.raises(ValueError):
        impute(ds, "x", strategy="constant", fill_value=1.0, by="k")
    with pytest.raises(ValueError):
        impute(ds, "x", strategy="mode")


# ----------------------------------------------------------- quantile_bin


def test_quantile_bin_parity(toy):
    df, ds = toy
    out = quantile_bin(ds, "z", 4).to_pandas().sort_values("id")
    edges = np.unique([disc_q(df["z"], q) for q in
                       (0.0, 0.25, 0.5, 0.75, 1.0)])
    exp = np.clip(np.searchsorted(edges, df.sort_values("id")["z"],
                                  side="right") - 1, 0, len(edges) - 2)
    assert np.array_equal(out["z_qbin"].to_numpy(np.int64), exp)
    # equal-frequency: each quartile bin holds roughly n/4
    counts = out["z_qbin"].value_counts()
    assert counts.min() > 0.2 * len(df) and counts.max() < 0.3 * len(df)


def test_quantile_bin_heavy_ties(ray_session):
    import ray.data

    # 90% of the mass on one value → adjacent quantile edges collapse
    df = pd.DataFrame({"v": np.r_[np.full(900, 5), np.arange(100)],
                       "id": np.arange(1000)})
    out = quantile_bin(ray.data.from_pandas(df).repartition(4),
                       "v", 4).to_pandas()
    assert out["v_qbin"].notna().all()
    assert out["v_qbin"].nunique() >= 2


def test_quantile_bin_constant_and_null(ray_session):
    import ray.data

    df = pd.DataFrame({"v": pd.array([3, 3, 3, None], dtype="Int64")})
    out = quantile_bin(ray.data.from_pandas(df), "v", 4).to_pandas()
    assert (out["v_qbin"].dropna() == 0).all()
    assert out["v_qbin"].isna().sum() == 1


# ------------------------------------------------------------------ woe


def naive_woe(df, key, tgt, s=0.5):
    keep = df.copy()
    g = keep.groupby(key, dropna=False)[tgt].agg(
        pos=lambda v: v.sum(), cnt="count")
    g["neg"] = g["cnt"] - g["pos"]
    kk = len(g)
    pt, nt = g["pos"].sum(), g["neg"].sum()
    p = (g["pos"] + s) / (pt + s * kk)
    q = (g["neg"] + s) / (nt + s * kk)
    return dict(zip(g.index, np.log(p / q)))


def test_woe_table_parity(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    n = 3000
    k = rng.choice(["low", "mid", "high"], n)
    prob = pd.Series(k).map({"low": 0.1, "mid": 0.4, "high": 0.8})
    df = pd.DataFrame({"k": k,
                       "y": (rng.random(n) < prob).astype(np.int64),
                       "id": np.arange(n, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(5)
    st = category_stats(ds, "k", "y")
    wt = woe_table(st)
    exp = naive_woe(df.dropna(), "k", "y")
    got = dict(zip(wt["key"], wt["woe"]))
    for key, w in exp.items():
        assert got[key] == pytest.approx(w, rel=1e-12)
    assert got["high"] > 0 > got["low"]  # direction of evidence
    assert (wt["iv"] >= 0).all()  # IV terms are always non-negative

    out = woe_encode(ds, "k", "y").to_pandas().sort_values("id")
    ref = df.sort_values("id")["k"].map(exp).to_numpy()
    assert np.allclose(out["k_woe"].to_numpy(), ref, rtol=1e-12)


def test_woe_rejects_non_binary(ray_session):
    import ray.data

    df = pd.DataFrame({"k": ["a", "b"], "y": [2, 0]})
    st = category_stats(ray.data.from_pandas(df), "k", "y")
    with pytest.raises(ValueError):
        woe_table(st)
