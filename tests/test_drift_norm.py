"""drift_psi (snapshot PSI) + normalize_text."""
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.drift import drift_psi
from openmldb_ray.stages.textstats import normalize_text


def test_psi_matches_naive(ray_session):
    rng = np.random.default_rng(7)
    ref = rng.normal(100, 20, 30_000)
    cur = rng.normal(110, 25, 20_000)  # real drift
    edges = np.array([0, 60, 80, 100, 120, 140, 1e9])
    got = drift_psi(ray.data.from_pandas(pd.DataFrame({"x": ref})).repartition(7),
                    ray.data.from_pandas(pd.DataFrame({"x": cur})).repartition(3),
                    "x", edges)
    # naive single-process recompute
    hb = lambda v: np.bincount(
        np.clip(np.searchsorted(edges, v, side="right") - 1, 0, 5),
        minlength=6)
    p = np.maximum(hb(ref) / len(ref), 1e-6)
    q = np.maximum(hb(cur) / len(cur), 1e-6)
    term = (q - p) * np.log(q / p)
    np.testing.assert_allclose(got["psi_term"].to_numpy(), term, atol=1e-12)
    np.testing.assert_allclose(got["psi"].to_numpy(), term.sum(), atol=1e-12)
    assert got["psi"].iloc[0] > 0.01  # drift detected


def test_psi_identical_is_zeroish(ray_session):
    v = np.arange(1000, dtype=float)
    ds = ray.data.from_pandas(pd.DataFrame({"x": v}))
    got = drift_psi(ds, ds, "x", [0, 250, 500, 750, 1000.5])
    np.testing.assert_allclose(got["psi"].to_numpy(), 0.0, atol=1e-12)


def test_psi_clamps_and_nulls(ray_session):
    ref = ray.data.from_pandas(pd.DataFrame({"x": [-5.0, 0.5, 99.0, None]}))
    cur = ray.data.from_pandas(pd.DataFrame({"x": [0.1, 0.2, 1e12]}))
    got = drift_psi(ref, cur, "x", [0, 1, 10])
    # -5 clamps to bin 0, 99/1e12 clamp to bin 1, null excluded
    np.testing.assert_allclose(got["ref_frac"].to_numpy(), [2 / 3, 1 / 3])
    np.testing.assert_allclose(got["cur_frac"].to_numpy(), [2 / 3, 1 / 3])
    with pytest.raises(ValueError):
        drift_psi(ref, cur, "x", [3, 2, 1])


def test_normalize_text(ray_session):
    df = pd.DataFrame({"text": ["  Hello,   WORLD!!  ", "a\tb\nc",
                                "unchanged text"]})
    out = normalize_text(ray.data.from_pandas(df), strip_punct=True) \
        .to_pandas()["text"].tolist()
    assert out == ["hello world", "a b c", "unchanged text"]
    # out_col + nfkc path
    df2 = pd.DataFrame({"text": ["ﬁne Ｗide"]})  # ligature + fullwidth
    out2 = normalize_text(ray.data.from_pandas(df2), nfkc=True,
                          out_col="norm").to_pandas()
    assert out2["norm"].iloc[0] == "fine ｗide".replace("ｗ", "w")
    assert out2["text"].iloc[0] == "ﬁne Ｗide"  # original kept
