"""knn_join: dataset-to-dataset cosine top-k (broadcast exact + IVF)."""
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.simsearch import _normalize, knn_join


def _mk(n, dim=16, seed=0, id0=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    return pd.DataFrame({"vec_id": np.arange(id0, id0 + n),
                         "embedding": list(v)})


def _naive(ldf, rdf, k):
    xl = _normalize(np.stack(ldf["embedding"].to_numpy()))
    xr = _normalize(np.stack(rdf["embedding"].to_numpy()))
    rids = rdf["vec_id"].to_numpy()
    s = xl @ xr.T
    rows = []
    for i, lid in enumerate(ldf["vec_id"]):
        order = np.lexsort((rids, -s[i]))[:k]
        for r, j in enumerate(order):
            rows.append({"query_id": lid, "neighbor_id": rids[j],
                         "rank": r + 1})
    return pd.DataFrame(rows)


def test_broadcast_exact(ray_session):
    ldf, rdf = _mk(120, seed=1), _mk(300, seed=2, id0=1000)
    got = knn_join(ray.data.from_pandas(ldf).repartition(5),
                   ray.data.from_pandas(rdf).repartition(3),
                   k=3, strategy="broadcast").to_pandas()
    exp = _naive(ldf, rdf, 3)
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[exp.columns],
        exp.sort_values(key).reset_index(drop=True))


def test_ivf_recall(ray_session):
    # clustered data so IVF buckets are meaningful
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(8, 16)) * 4
    rvecs = np.vstack([c + rng.normal(size=(80, 16)) * 0.4 for c in centers])
    lvecs = np.vstack([c + rng.normal(size=(10, 16)) * 0.4 for c in centers])
    rdf = pd.DataFrame({"vec_id": np.arange(len(rvecs)),
                        "embedding": list(rvecs)})
    ldf = pd.DataFrame({"vec_id": np.arange(5000, 5000 + len(lvecs)),
                        "embedding": list(lvecs)})
    exact = _naive(ldf, rdf, 3)
    got = knn_join(ray.data.from_pandas(ldf).repartition(4),
                   ray.data.from_pandas(rdf).repartition(6),
                   k=3, strategy="ivf", num_centroids=8, nprobe=3,
                   num_partitions=4).to_pandas()
    hits = 0
    for lid in ldf["vec_id"]:
        a = set(got.loc[got["query_id"] == lid, "neighbor_id"])
        e = set(exact.loc[exact["query_id"] == lid, "neighbor_id"])
        hits += len(a & e) / 3
    assert hits / len(ldf) >= 0.9
    # every left row answered, exactly k rows each
    assert (got.groupby("query_id").size() == 3).all()
    assert len(got) == 3 * len(ldf)


def test_auto_routes_by_size(ray_session):
    ldf, rdf = _mk(10, seed=4), _mk(40, seed=5, id0=100)
    got = knn_join(ray.data.from_pandas(ldf),
                   ray.data.from_pandas(rdf), k=1,
                   strategy="auto", broadcast_limit=5,
                   num_centroids=4, nprobe=4,
                   num_partitions=2).to_pandas()
    # with nprobe == num_centroids the IVF path is exhaustive -> exact
    exp = _naive(ldf, rdf, 1)
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[exp.columns],
        exp.sort_values(key).reset_index(drop=True))
    with pytest.raises(ValueError):
        knn_join(ray.data.from_pandas(ldf),
                 ray.data.from_pandas(rdf).filter(lambda r: False), k=1)


def test_boundary_tie_determinism(ray_session):
    # two identical right vectors tie exactly at the k boundary: the
    # lexicographically smaller id must win, independent of block order
    rng = np.random.default_rng(2)
    base = rng.normal(size=(1, 8))
    dup = np.repeat(base, 3, axis=0)          # ids 10, 11, 12 identical
    other = rng.normal(size=(5, 8))
    rdf = pd.DataFrame({"vec_id": [10, 11, 12, 20, 21, 22, 23, 24],
                        "embedding": list(np.vstack([dup, other]))})
    ldf = pd.DataFrame({"vec_id": [0], "embedding": [base[0]]})
    outs = []
    for parts in (1, 4, 8):
        got = knn_join(ray.data.from_pandas(ldf),
                       ray.data.from_pandas(rdf).repartition(parts),
                       k=2, strategy="broadcast").to_pandas()
        outs.append(got.sort_values("rank")["neighbor_id"].tolist())
    assert outs[0] == outs[1] == outs[2] == [10, 11]
