"""Distributed PCA / whitening (stages/pca): numpy parity, whitening
variance, split invariance, sign determinism."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _mk(n=600, d=16, seed=0):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so the principal axes are well separated
    scales = np.linspace(5.0, 0.2, d)
    X = rng.normal(size=(n, d)) * scales
    X = X @ np.linalg.qr(rng.normal(size=(d, d)))[0]  # rotate
    X += rng.normal(size=d)                           # shift mean
    return X


def _ds_of(X, parts=4):
    df = pd.DataFrame({"vec_id": np.arange(len(X)),
                       "embedding": [row.astype(np.float32) for row in X]})
    return rd.from_pandas(df).repartition(parts)


def test_fit_matches_numpy(ray_session):
    from openmldb_ray.stages.pca import fit_pca

    X = _mk()
    Xf = X.astype(np.float32).astype(np.float64)  # what the ds stores
    model = fit_pca(_ds_of(X), k=5)
    np.testing.assert_allclose(model["mean"], Xf.mean(axis=0), atol=1e-8)
    cov = np.cov(Xf, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:5]
    np.testing.assert_allclose(model["eigvals"], evals, rtol=1e-6)
    # components span the same subspace: |c_i . v_i| == 1 after sign fix
    evecs = np.linalg.eigh(cov)[1]
    order = np.argsort(np.linalg.eigvalsh(cov))[::-1][:5]
    for i, j in enumerate(order):
        dot = abs(model["components"][i] @ evecs[:, j])
        assert dot > 1 - 1e-6


def test_project_and_whiten(ray_session):
    from openmldb_ray.stages.pca import fit_pca, pca_project

    X = _mk(seed=3)
    ds = _ds_of(X)
    model = fit_pca(ds, k=4, whiten=True)
    out = pca_project(ds, model, out_col="z").to_pandas() \
        .sort_values("vec_id")
    Z = np.stack(out["z"].to_numpy()).astype(np.float64)
    assert Z.shape == (len(X), 4)
    # whitened projections: ~unit variance, ~uncorrelated
    C = np.cov(Z, rowvar=False)
    np.testing.assert_allclose(np.diag(C), np.ones(4), rtol=5e-3)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 5e-3


def test_fit_split_invariant_and_sign_deterministic(ray_session):
    from openmldb_ray.stages.pca import fit_pca

    X = _mk(n=300, d=8, seed=7)
    m1 = fit_pca(_ds_of(X, parts=1), k=3)
    m9 = fit_pca(_ds_of(X, parts=9), k=3)
    np.testing.assert_allclose(m1["components"], m9["components"], atol=1e-7)
    np.testing.assert_allclose(m1["eigvals"], m9["eigvals"], rtol=1e-9)
    # sign convention: the largest-|.| coordinate of each component is +
    for c in m1["components"]:
        assert c[np.abs(c).argmax()] > 0
