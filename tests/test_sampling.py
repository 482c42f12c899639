"""core/sampling.hash_sample: deterministic, partition-independent,
representative driver-side init sampling (replaces limit(n), which is
position-biased and scheduling-dependent)."""

import numpy as np
import pandas as pd
import ray

from openmldb_ray.core.sampling import hash_sample


def _df(n=3000, d=8, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"embedding": list(rng.normal(size=(n, d)))})


def test_partition_invariant_and_deterministic(ray_session):
    df = _df()
    outs = [hash_sample(ray.data.from_pandas(df).repartition(p),
                        "embedding", 256) for p in (1, 3, 11)]
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
    assert outs[0].shape == (256, 8)


def test_representative_not_head_biased(ray_session):
    # rows sorted by value: limit(n) would take only the smallest values;
    # the hash sample must span the whole range
    df = pd.DataFrame({"embedding": [np.full(4, float(i))
                                     for i in range(5000)]})
    s = hash_sample(ray.data.from_pandas(df).repartition(5),
                    "embedding", 200)
    first = s[:, 0]
    assert first.max() > 4000 and first.min() < 1000
    assert len(s) == 200


def test_small_table_returns_all(ray_session):
    df = _df(50)
    s = hash_sample(ray.data.from_pandas(df), "embedding", 256)
    assert s.shape == (50, 8)
