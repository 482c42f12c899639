"""DSIR importance resampling: fit/score/select vs a naive reference."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.curation import knuth_hash_u32
from openmldb_ray.stages.dsir import (_bucketize, _explode_grams, dsir_fit,
                                      dsir_score, dsir_select)

M = 512


def _naive_counts(texts, m):
    cnt = np.zeros(m, dtype=np.int64)
    for t in texts:
        ws = str(t).lower().split()
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if grams:
            b = _bucketize(np.array(grams, dtype=object), m)
            np.add.at(cnt, b, 1)
    return cnt


def _naive_logw(text, table, m):
    ws = str(text).lower().split()
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    if not grams:
        return 0.0
    return float(table[_bucketize(np.array(grams, dtype=object), m)].sum())


@pytest.fixture(scope="module")
def corpora():
    rng = np.random.default_rng(41)
    sci = ["quantum field theory lattice gauge model",
           "neural network gradient descent optimization",
           "protein folding molecular dynamics simulation"]
    chat = ["lol that was so funny omg", "see you tomorrow at the mall",
            "what are you doing this weekend haha"]
    def mk(pool, n, base):
        rows = []
        for i in range(n):
            k = int(rng.integers(2, 6))
            rows.append(" ".join(rng.choice(pool[0].split() + pool[1].split()
                                            + pool[2].split(), size=k)))
        return pd.DataFrame({"doc_id": np.arange(base, base + n),
                             "text": rows})
    target = mk(sci, 150, 0)
    raw = pd.concat([mk(sci, 200, 10_000), mk(chat, 200, 20_000)],
                    ignore_index=True)
    return target, raw


def test_explode_grams_shape():
    gdoc, grams = _explode_grams(pd.Series(["a b c", "", "x y"]))
    got = sorted(zip(gdoc.tolist(), grams.tolist()))
    assert got == [(0, "a"), (0, "a b"), (0, "b"), (0, "b c"), (0, "c"),
                   (2, "x"), (2, "x y"), (2, "y")]


def test_fit_matches_naive_counts(corpora):
    target, raw = corpora
    model = dsir_fit(ray.data.from_pandas(target).repartition(4),
                     ray.data.from_pandas(raw).repartition(5),
                     num_buckets=M)
    ct = _naive_counts(target["text"], M).astype(np.float64)
    cq = _naive_counts(raw["text"], M).astype(np.float64)
    ref = (np.log(ct + 1) - np.log(ct.sum() + M)
           - np.log(cq + 1) + np.log(cq.sum() + M))
    np.testing.assert_allclose(model["table"], ref, atol=1e-12)


def test_score_matches_naive(corpora):
    target, raw = corpora
    tds = ray.data.from_pandas(target)
    rds = ray.data.from_pandas(raw).repartition(6)
    model = dsir_fit(tds, rds, num_buckets=M)
    out = dsir_score(rds, model).to_pandas().sort_values("doc_id")
    ref = np.array([_naive_logw(t, model["table"], M)
                    for t in raw.sort_values("doc_id")["text"]])
    np.testing.assert_allclose(out["dsir_logw"].to_numpy(), ref,
                               atol=1e-9)
    # gumbel key is deterministic from the id
    u = (knuth_hash_u32(out["doc_id"].to_numpy()).astype(np.float64)
         + 0.5) / float(1 << 32)
    np.testing.assert_allclose(
        out["dsir_key"].to_numpy(), ref - np.log(-np.log(u)), atol=1e-9)


def test_select_topk_and_domain_preference(corpora):
    target, raw = corpora
    k = 120
    sel, model = dsir_select(ray.data.from_pandas(raw).repartition(5),
                             ray.data.from_pandas(target), k,
                             num_buckets=M)
    out = sel.to_pandas()
    assert len(out) == k
    # exact top-k by the gumbel-perturbed key (driver recompute)
    scored = dsir_score(ray.data.from_pandas(raw), model).to_pandas()
    ref_ids = set(scored.sort_values(
        ["dsir_key", "doc_id"], ascending=[False, True])
        .head(k)["doc_id"])
    assert set(out["doc_id"]) == ref_ids
    # importance resampling prefers the in-domain half of the raw corpus
    n_sci = int((out["doc_id"] < 20_000).sum())
    assert n_sci > 0.7 * k


def test_select_split_invariance(corpora):
    target, raw = corpora
    ids = []
    for nparts in (1, 8):
        sel, _ = dsir_select(ray.data.from_pandas(raw).repartition(nparts),
                             ray.data.from_pandas(target), 50,
                             num_buckets=M)
        ids.append(sorted(sel.to_pandas()["doc_id"]))
    assert ids[0] == ids[1]
