"""keyed_threshold_filter (domain-level filtering) + hash_split."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.curation import (hash_split, keyed_threshold_filter,
                                          knuth_hash_u32)


def _df():
    rng = np.random.default_rng(3)
    n = 2000
    return pd.DataFrame({
        "id": np.arange(n),
        "dom": [f"d{i % 37}" for i in range(n)],
        "score": rng.normal(50, 20, n).round(2),
    })


@pytest.mark.parametrize("agg,op,thr", [
    ("mean", ">=", 50.0), ("mean", "<", 48.0), ("sum", ">", 2700.0),
    ("count", ">=", 55), ("min", ">", -5.0), ("max", "<=", 110.0),
])
def test_matches_sql(ray_session, agg, op, thr):
    df = _df()
    con = duckdb.connect()
    con.register("t", df)
    fn = {"mean": "avg"}.get(agg, agg)
    arg = "score" if agg != "count" else "score"
    exp = con.execute(
        f"SELECT * FROM t WHERE dom IN "
        f"(SELECT dom FROM t GROUP BY dom HAVING {fn}({arg}) {op} {thr}) "
        f"ORDER BY id").fetchdf()
    got = keyed_threshold_filter(
        ray.data.from_pandas(df).repartition(7), "dom", "score",
        agg=agg, threshold=thr, op=op).to_pandas().sort_values(
        "id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_nulls_excluded_from_agg(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "dom": ["a", "a", "b", "b"],
                       "score": [10.0, None, None, None]})
    got = keyed_threshold_filter(ray.data.from_pandas(df), "dom", "score",
                                 agg="mean", threshold=5.0).to_pandas()
    # 'a' mean=10 passes (null excluded); 'b' all-null never passes
    assert sorted(got["id"]) == [1, 2]


def test_split_invariance(ray_session):
    df = _df()
    outs = [keyed_threshold_filter(
        ray.data.from_pandas(df).repartition(p), "dom", "score",
        agg="mean", threshold=50.0).to_pandas().sort_values("id")
        .reset_index(drop=True) for p in (1, 11)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_hash_split_deterministic_and_proportional(ray_session):
    n = 50_000
    df = pd.DataFrame({"doc_id": np.arange(n)})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(ray.data.from_pandas(df).repartition(3), fr).to_pandas()
    b = hash_split(ray.data.from_pandas(df).repartition(17), fr).to_pandas()
    pd.testing.assert_frame_equal(a.sort_values("doc_id").reset_index(drop=True),
                                  b.sort_values("doc_id").reset_index(drop=True))
    props = a["split"].value_counts(normalize=True)
    for k, v in fr.items():
        assert abs(props[k] - v) < 0.01
    # SQL replay: the rule is integer-exact
    h = ((df["doc_id"].to_numpy() % (1 << 20)) * 2654435761) % (1 << 32)
    t1 = int(np.floor(0.8 * (1 << 32)))
    t2 = int(np.floor(0.9 * (1 << 32)))
    exp = np.where(h < t1, "train", np.where(h < t2, "val", "test"))
    assert (a.sort_values("doc_id")["split"].to_numpy() == exp).all()


def test_hash_split_validation(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1]}))
    with pytest.raises(ValueError):
        hash_split(ds, {"a": 0.5, "b": 0.4})


def test_hll_by_key_accuracy_and_merge_invariance(ray_session):
    from openmldb_ray.stages.curation import hll_by_key
    rng = np.random.default_rng(13)
    n = 60_000
    df = pd.DataFrame({
        "k": [f"s{i % 5}" for i in range(n)],
        "v": [f"u{rng.integers(0, 2000 * (1 + i % 5))}" for i in range(n)],
    })
    exact = df.groupby("k")["v"].nunique()
    sigma = 1.04 / np.sqrt(1 << 12)
    for parts in (1, 9):
        got = hll_by_key(ray.data.from_pandas(df).repartition(parts),
                         "v", "k", num_partitions=4).to_pandas()
        got = got.set_index("k")["distinct_est"]
        for k in exact.index:
            assert abs(got[k] / exact[k] - 1) <= 5 * sigma, (k, got[k],
                                                             exact[k])
