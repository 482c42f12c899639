"""Categorical encoders (stages/encoders.py): correctness vs in-process
pandas references, null-category / null-target semantics, train→apply
split, cardinality guards, determinism."""

import numpy as np
import pandas as pd
import pytest

from openmldb_ray.stages.encoders import (
    category_stats,
    count_encode,
    feature_cross,
    one_hot,
    scan_vocab,
    target_encode,
)


@pytest.fixture(scope="module")
def toy(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "None", None], n).astype(object),
        "y": rng.integers(0, 50, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(9)
    return df, ds


def test_category_stats_matches_pandas(toy):
    df, ds = toy
    st = category_stats(ds, "k", "y")
    ref = (df.groupby("k", dropna=False)
             .agg(cnt=("id", "size"), tcnt=("y", "count"), tsum=("y", "sum"))
             .reset_index())
    assert len(st) == len(ref) == 5  # incl. the null group AND literal "None"
    for _, r in ref.iterrows():
        k = r["k"] if not pd.isna(r["k"]) else None
        row = st[st["key"].isna()] if k is None else st[st["key"] == k]
        assert len(row) == 1
        assert int(row["cnt"].iloc[0]) == r["cnt"]
        assert int(row["tcnt"].iloc[0]) == r["tcnt"]
        assert int(row["tsum"].iloc[0]) == r["tsum"]
    # integer target → exact int64 sums
    assert st["tsum"].dtype == np.int64


def test_null_category_distinct_from_literal_none(toy):
    df, ds = toy
    st = category_stats(ds, "k")
    n_null = int(df["k"].isna().sum())
    n_lit = int((df["k"] == "None").sum())
    assert int(st.loc[st["key"].isna(), "cnt"].iloc[0]) == n_null
    assert int(st.loc[st["key"] == "None", "cnt"].iloc[0]) == n_lit
    assert n_null > 0 and n_lit > 0 and n_null != n_lit


def test_target_encode_values_and_loo(toy):
    df, ds = toy
    s = 25.0
    out = (target_encode(ds, "k", "y", smoothing=s, loo=True, out_col="te")
           .to_pandas().sort_values("id").reset_index(drop=True))
    prior = df["y"].sum() / df["y"].count()
    g = df.groupby("k", dropna=False)["y"].agg(["sum", "count"])
    enc = (g["sum"] + s * prior) / (g["count"] + s)

    def exp_row(i):
        return enc.loc[df.loc[i, "k"] if df.loc[i, "k"] is not None
                       else np.nan]

    expect = np.array([exp_row(i) for i in range(len(df))])
    assert np.allclose(out["te"].to_numpy(), expect)
    # leave-one-out excludes the row's own label
    gi = df.groupby("k", dropna=False)["y"]
    ts = gi.transform("sum").to_numpy(np.float64)
    tc = gi.transform("count").to_numpy(np.float64)
    loo = (ts - df["y"].to_numpy(np.float64) + s * prior) / (tc - 1 + s)
    assert np.allclose(out["te_loo"].to_numpy(), loo)
    assert not np.allclose(out["te"].to_numpy(), out["te_loo"].to_numpy())


def test_target_encode_singleton_and_unseen(ray_session):
    import ray.data

    train = pd.DataFrame({"k": ["a", "a", "b"], "y": [10, 20, 7]})
    apply_df = pd.DataFrame({"k": ["a", "b", "zzz", None],
                             "id": np.arange(4)})
    tds = ray.data.from_pandas(train)
    stats = category_stats(tds, "k", "y")
    prior = train["y"].mean()
    # smoothing=0, loo on the singleton group 'b' → denominator 0 → prior
    out = (target_encode(tds, "k", "y", smoothing=0.0, loo=True,
                         out_col="te", stats=stats)
           .to_pandas())
    brow = out[out["k"] == "b"].iloc[0]
    assert brow["te"] == 7.0
    assert brow["te_loo"] == pytest.approx(prior)
    # train→apply: unseen category encodes to the prior
    ads = ray.data.from_pandas(apply_df)
    ap = (target_encode(ads, "k", "y", smoothing=0.0, out_col="te",
                        stats=stats)
          .to_pandas().sort_values("id"))
    assert ap["te"].tolist() == pytest.approx(
        [15.0, 7.0, prior, prior])  # null key unseen in train → prior too


def test_target_encode_all_null_targets_raises(ray_session):
    import ray.data

    df = pd.DataFrame({"k": ["a", "b"], "y": pd.array([None, None],
                                                      dtype="Int64")})
    with pytest.raises(ValueError, match="no non-null targets"):
        target_encode(ray.data.from_pandas(df), "k", "y")


def test_count_encode(toy):
    df, ds = toy
    out = (count_encode(ds, "k", normalize=True, out_col="f")
           .to_pandas().sort_values("id"))
    ref = (df.groupby("k", dropna=False)["id"].transform("size")
           / len(df)).to_numpy()
    assert np.allclose(out["f"].to_numpy(), ref)
    raw = (count_encode(ds, "k", out_col="c").to_pandas().sort_values("id"))
    assert np.allclose(
        raw["c"].to_numpy(),
        df.groupby("k", dropna=False)["id"].transform("size").to_numpy())


def test_one_hot_scan_and_fixed_vocab(toy):
    df, ds = toy
    out = one_hot(ds, "k").to_pandas().sort_values("id")
    # scanned vocab: non-null distinct values only (a, b, c, "None")
    cols = sorted(c for c in out.columns if c.startswith("k_"))
    assert cols == ["k_None", "k_a", "k_b", "k_c"]
    for v, c in (("a", "k_a"), ("b", "k_b"), ("None", "k_None")):
        assert (out[c].to_numpy()
                == (df["k"] == v).astype(np.int64).to_numpy()).all()
        assert out[c].dtype == np.int64
    # real-null rows are all zeros (distinct from the literal "None" rows)
    nulls = out[df.sort_values("id")["k"].isna().to_numpy()]
    assert (nulls[cols].to_numpy() == 0).all()
    # fixed vocab keeps unseen values as all-zeros and fixes column order
    out2 = one_hot(ds, "k", vocab=["a", "zz"]).to_pandas().sort_values("id")
    assert (out2["k_a"].to_numpy()
            == (df["k"] == "a").astype(np.int64).to_numpy()).all()
    assert (out2["k_zz"].to_numpy() == 0).all()


def test_one_hot_guards(ray_session):
    import ray.data

    df = pd.DataFrame({"k": [f"v{i}" for i in range(50)]})
    ds = ray.data.from_pandas(df)
    # the per-block cap fires inside the Ray task (wrapped), bounding
    # what any block can ship to the driver — match on the message
    with pytest.raises(Exception, match="max_categories"):
        scan_vocab(ds, "k", max_categories=10)
    # sanitized collision: "x!y" and "x?y" → both "x_y"
    ds2 = ray.data.from_pandas(pd.DataFrame({"k": ["x!y", "x?y"]}))
    with pytest.raises(ValueError, match="collision"):
        one_hot(ds2, "k")


def test_category_stats_cardinality_guard(ray_session):
    import ray.data

    df = pd.DataFrame({"k": [f"v{i}" for i in range(100)]})
    with pytest.raises(ValueError, match="max_categories"):
        category_stats(ray.data.from_pandas(df), "k", max_categories=10)


def test_feature_cross_deterministic(toy):
    df, ds = toy
    a = feature_cross(ds, ["k", "y"], num_buckets=64).to_pandas()
    b = feature_cross(ds.repartition(3), ["k", "y"],
                      num_buckets=64).to_pandas()
    assert a["cross_k_y"].between(0, 63).all()
    am = a.set_index("id")["cross_k_y"]
    bm = b.set_index("id")["cross_k_y"]
    assert (am.sort_index() == bm.sort_index()).all()
    # same (k, y) pair → same bucket everywhere
    assert (a.groupby(["k", "y"], dropna=False)["cross_k_y"]
            .nunique() == 1).all()


def test_one_hot_unsorted_and_numeric_vocab(ray_session):
    """User-supplied vocab arrives in caller order — searchsorted must
    run against a sorted view mapped back through the permutation, or
    'a' under vocab=['b','a'] silently encodes all-zeros. Numeric vocabs
    str-convert lexically UNSORTED (['2','10'])."""
    import ray.data

    df = pd.DataFrame({"k": ["a", "b", "a"], "n": [2, 10, 7],
                       "id": np.arange(3)})
    ds = ray.data.from_pandas(df)
    out = one_hot(ds, "k", vocab=["b", "a"]).to_pandas().sort_values("id")
    assert out["k_a"].tolist() == [1, 0, 1]
    assert out["k_b"].tolist() == [0, 1, 0]
    out2 = one_hot(ds, "n", vocab=[2, 10]).to_pandas().sort_values("id")
    assert out2["n_2"].tolist() == [1, 0, 0]
    assert out2["n_10"].tolist() == [0, 1, 0]
    with pytest.raises(ValueError, match="duplicate"):
        one_hot(ds, "k", vocab=["a", "a"])


def test_numeric_key_with_nulls_single_category(ray_session):
    """Ray's Arrow→pandas conversion turns an int64 block with a null
    into float64, stringifying the same key as '1.0' there and '1' in
    null-free blocks — the canonical key form must give ONE category with
    correct counts regardless of which block a row lands in."""
    import pyarrow as pa
    import ray.data

    t1 = pa.table({"k": pa.array([1, 1, None], pa.int64()),
                   "y": pa.array([10, 20, 30], pa.int64())})
    t2 = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "y": pa.array([40, 50], pa.int64())})
    ds = ray.data.from_arrow([t1, t2])
    st = category_stats(ds, "k", "y")
    assert len(st) == 3  # "1", "2", null — NOT "1.0" as a fourth
    r1 = st[st["key"] == "1"].iloc[0]
    assert int(r1["cnt"]) == 3 and int(r1["tsum"]) == 70
    # the broadcast apply resolves the same canonical key
    out = (count_encode(ds, "k", out_col="c").to_pandas())
    assert (out.loc[out["k"].notna() & (out["k"] == 1), "c"] == 3.0).all()


def test_feature_cross_int_nulls_deterministic(ray_session):
    """stable_hash64 must hash an int column by integer bits whether or
    not the block carries a null (null blocks convert to float64 via
    numpy) — value 5 lands in ONE bucket across both block kinds."""
    import pyarrow as pa
    import ray.data

    t1 = pa.table({"a": pa.array([5, None, 7], pa.int64()),
                   "b": pa.array(["x", "x", "x"])})
    t2 = pa.table({"a": pa.array([5, 7], pa.int64()),
                   "b": pa.array(["x", "x"])})
    ds = ray.data.from_arrow([t1, t2])
    out = feature_cross(ds, ["a", "b"], num_buckets=4096).to_pandas()
    per = out.groupby("a", dropna=False)["cross_a_b"].nunique()
    assert (per == 1).all()


def test_empty_input(ray_session):
    import ray.data

    df = pd.DataFrame({"k": pd.Series(dtype=object),
                       "y": pd.Series(dtype=np.int64)})
    ds = ray.data.from_pandas(df)
    st = category_stats(ds, "k", "y")
    assert len(st) == 0
    assert target_encode(ds, "k", "y", prior=0.5).count() == 0
