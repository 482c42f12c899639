"""weighted_sample: Efraimidis-Spirakis exactly-k without replacement."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.curation import knuth_hash_u32, weighted_sample


def _keys(df, id_col="doc_id", w_col="w"):
    u = (knuth_hash_u32(df[id_col].to_numpy()).astype(np.float64)
         + 0.5) / float(1 << 32)
    with np.errstate(divide="ignore"):
        k = np.log(u) / df[w_col].to_numpy(np.float64)
    return k


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(29)
    n = 15_000
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "w": rng.gamma(2.0, 2.0, n)})
    df.loc[rng.random(n) < 0.02, "w"] = 0.0
    df.loc[rng.random(n) < 0.02, "w"] = np.nan
    return df


def test_exact_topk(data):
    k = 500
    out = weighted_sample(ray.data.from_pandas(data).repartition(6),
                          k, "w").to_pandas()
    assert len(out) == k
    keys = _keys(data)
    valid = data["w"].to_numpy() > 0
    order = np.lexsort((data["doc_id"].to_numpy(), -np.where(
        valid, keys, -np.inf)))
    ref = set(data["doc_id"].to_numpy()[order[:k]])
    assert set(out["doc_id"]) == ref
    # excluded weights never sampled
    assert (out["w"] > 0).all()


def test_split_invariance(data):
    ids = []
    for nparts in (1, 11):
        out = weighted_sample(
            ray.data.from_pandas(data).repartition(nparts), 200,
            "w").to_pandas()
        ids.append(sorted(out["doc_id"]))
    assert ids[0] == ids[1]


def test_weight_proportionality():
    # one row with overwhelming weight is (essentially) always included
    df = pd.DataFrame({"doc_id": np.arange(2000),
                       "w": np.ones(2000)})
    df.loc[1234, "w"] = 1e9
    out = weighted_sample(ray.data.from_pandas(df), 50, "w").to_pandas()
    assert 1234 in set(out["doc_id"])
    assert len(out) == 50
