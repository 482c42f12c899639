"""Connected components + near-duplicate clustering (round 3)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from openmldb_ray.stages.graph import connected_components, dup_clusters


def _cc(edges, **kw):
    ds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, b in edges]),
        "dst": pa.array([b for a, b in edges])}))
    out = connected_components(ds, **kw).to_pandas()
    return dict(zip(out["node"], out["cluster_id"]))


import pytest


@pytest.mark.parametrize("strategy", ["driver", "distributed"])
def test_cc_chain_and_star(ray_session, strategy):
    # chain 1-2-3-4 plus star 10<-11,12 plus isolated pair (20,21)
    got = _cc([(2, 1), (3, 2), (4, 3), (11, 10), (12, 10), (21, 20)],
              strategy=strategy)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


@pytest.mark.parametrize("strategy", ["driver", "distributed"])
def test_cc_merging_components(ray_session, strategy):
    # two stars joined by one bridge edge -> single component, min label
    edges = [(i, 100) for i in range(101, 106)] \
        + [(i, 200) for i in range(201, 206)] + [(105, 205)]
    got = _cc(edges, strategy=strategy)
    assert set(got.values()) == {100}
    assert len(got) == 12


def test_cc_string_ids(ray_session):
    # auto strategy: tiny edge set routes to the driver union-find
    got = _cc([("b", "a"), ("c", "b"), ("e", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}
    # distributed path agrees on string ids
    got2 = _cc([("b", "a"), ("c", "b"), ("e", "d")], strategy="distributed")
    assert got2 == got


def test_dup_clusters_planted(ray_session):
    rng = np.random.default_rng(21)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(30)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    # plant: 3 exact copies of doc 2 and 2 copies of doc 5
    for j, src in enumerate([2, 2, 2, 5, 5]):
        rows.append({"doc_id": 100 + j, "text": texts[src]})
    ds = rd.from_items(rows)
    out = dup_clusters(ds, "text", "doc_id").to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    for j, src in enumerate([2, 2, 2, 5, 5]):
        assert got[100 + j] == got.get(src, src) == src
    # only the two planted clusters (plus whatever chance collisions the
    # LSH verifies — with 12-word vocab and 40-word docs Jaccard<0.8 holds)
    assert set(got.values()) == {2, 5}
