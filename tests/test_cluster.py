"""kmeans_fit / kmeans_assign: distributed Lloyd vs single-process numpy."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.cluster import kmeans_assign, kmeans_fit


def _naive_lloyd(X, init, iters):
    c = init.copy()
    inertia = []
    for _ in range(iters):
        scores = X @ c.T - 0.5 * (c * c).sum(axis=1)
        a = scores.argmax(axis=1)
        inertia.append(float(((X * X).sum(axis=1)
                              - 2.0 * scores.max(axis=1)).sum()))
        sums = np.zeros_like(c)
        np.add.at(sums, a, X)
        cnt = np.bincount(a, minlength=len(c)).astype(np.float64)
        nz = cnt > 0
        c = c.copy()
        c[nz] = sums[nz] / cnt[nz, None]
    return c, inertia


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(17)
    # 5 well-separated blobs
    centers = rng.normal(scale=10, size=(5, 12))
    X = np.concatenate([centers[i] + rng.normal(size=(800, 12))
                        for i in range(5)])
    # interleave blobs so the deterministic init sample (ds.limit) is
    # representative of all of them
    perm = rng.permutation(len(X))
    X = X[perm]
    blob = (perm // 800)
    df = pd.DataFrame({"vid": np.arange(len(X)), "blob": blob,
                       "vec": list(X)})
    return df, X


def test_matches_single_process(data):
    df, X = data
    ds = ray.data.from_pandas(df).repartition(7)
    model = kmeans_fit(ds, "vec", 5, iters=6, seed=3)
    ref_c, ref_inertia = _naive_lloyd(X.astype(np.float64),
                                      model["init"], 6)
    # the distributed moment fold must match the same-init numpy Lloyd
    np.testing.assert_allclose(model["centroids"], ref_c,
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(model["inertia"], ref_inertia,
                               rtol=1e-12, atol=1e-6)


def test_inertia_nonincreasing(data):
    df, _ = data
    model = kmeans_fit(ray.data.from_pandas(df).repartition(3),
                       "vec", 5, iters=6, seed=3)
    inertia = np.asarray(model["inertia"])
    assert (np.diff(inertia) <= 1e-6).all()


def test_split_invariance(data):
    df, _ = data
    cents = []
    for nparts in (2, 9):
        m = kmeans_fit(ray.data.from_pandas(df).repartition(nparts),
                       "vec", 5, iters=4, seed=3)
        cents.append(m["centroids"])
    np.testing.assert_allclose(cents[0], cents[1], atol=1e-8)


def test_assign_blobs_pure(data):
    df, X = data
    ds = ray.data.from_pandas(df).repartition(4)
    model = kmeans_fit(ds, "vec", 5, iters=6, seed=3)
    out = kmeans_assign(ds, model, dist_col="d2").to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    # well-separated blobs: every true blob maps to exactly one cluster
    tab = pd.crosstab(df["blob"], out["cluster"])
    assert (tab.gt(0).sum(axis=1) == 1).all()
    assert out["d2"].min() >= -1e-9  # squared distances (fp slack)
    # assignment is the argmin distance to the fitted centroids
    c = model["centroids"]
    d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    np.testing.assert_array_equal(out["cluster"].to_numpy(),
                                  d2.argmin(axis=1))


def test_empty_cluster_keeps_centroid():
    # k=3 over 2 distinct points: one centroid never wins a point and must
    # stay exactly at its init position
    df = pd.DataFrame({"vec": [np.array([0.0, 0.0])] * 5
                       + [np.array([10.0, 10.0])] * 5})
    model = kmeans_fit(ray.data.from_pandas(df), "vec", 3, iters=3, seed=1)
    assert len(model["centroids"]) == 3
    assert model["n"] == 10
