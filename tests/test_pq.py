"""Product quantization: fit parity, encode roundtrip, ADC recall."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.pq import (_encode_mat, pq_adc_topk, pq_encode,
                                    pq_fit)
from openmldb_ray.stages.simsearch import _normalize, knn_brute_force

M, NBITS = 4, 5  # small codebooks keep the fit-parity tests fast


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(19)
    centers = rng.normal(scale=5, size=(10, 16))
    X = np.concatenate([c + rng.normal(size=(300, 16)) for c in centers])
    perm = rng.permutation(len(X))
    X = X[perm]
    df = pd.DataFrame({"vec_id": np.arange(len(X)),
                       "embedding": list(X.astype(np.float32))})
    return df, _normalize(X.astype(np.float64))


def _naive_fit(Xn, init, iters):
    m, ksub, dsub = init.shape
    books = init.copy()
    xs = Xn.reshape(len(Xn), m, dsub)
    for _ in range(iters):
        for j in range(m):
            xj = np.ascontiguousarray(xs[:, j, :])
            cj = books[j]
            a = (xj @ cj.T - 0.5 * (cj * cj).sum(axis=1)).argmax(axis=1)
            for c in range(ksub):
                sel = a == c
                if sel.any():
                    books[j, c] = xj[sel].mean(axis=0)
    return books


def test_fit_matches_naive(data):
    df, Xn = data
    ds = ray.data.from_pandas(df).repartition(5)
    model = pq_fit(ds, m=M, nbits=NBITS, iters=3, seed=7)
    # reconstruct the deterministic init and run the same Lloyd naively
    from openmldb_ray.stages.cluster import _kmeanspp
    from openmldb_ray.core.sampling import hash_sample
    sample = _normalize(hash_sample(ds, "embedding", 2048))
    rng = np.random.default_rng(7)
    dsub = Xn.shape[1] // M
    init = np.stack([_kmeanspp(
        np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub]),
        1 << NBITS, rng) for j in range(M)])
    ref = _naive_fit(Xn, init, 3)
    np.testing.assert_allclose(model["codebooks"], ref, atol=1e-8)
    assert (np.diff(np.asarray(model["inertia"])) <= 1e-6).all()


def test_encode_and_reconstruction(data):
    df, Xn = data
    ds = ray.data.from_pandas(df).repartition(4)
    model = pq_fit(ds, m=M, nbits=NBITS, iters=4, seed=7)
    out = pq_encode(ds, model).to_pandas().sort_values("vec_id")
    codes = np.frombuffer(b"".join(out["pq_code"]), dtype=np.uint8) \
        .reshape(len(out), M)
    np.testing.assert_array_equal(
        codes, _encode_mat(Xn, model["codebooks"]))
    # reconstruction beats the crude 1-codeword-per-subspace baseline
    books = model["codebooks"]
    dsub = model["dsub"]
    rec = np.concatenate([books[j][codes[:, j]] for j in range(M)], axis=1)
    mse = ((Xn - rec) ** 2).mean()
    mean_rec = np.concatenate(
        [np.tile(Xn.reshape(len(Xn), M, dsub)[:, j, :].mean(axis=0),
                 (len(Xn), 1)) for j in range(M)], axis=1)
    assert mse < 0.5 * ((Xn - mean_rec) ** 2).mean()


def test_adc_recall_vs_exact(data):
    # realistic codebook size (m=8 subspaces x 256 codewords) for recall
    df, _ = data
    ds = ray.data.from_pandas(df).repartition(4)
    model = pq_fit(ds, m=8, nbits=8, iters=4, seed=7)
    coded = pq_encode(ds, model)
    q = np.stack(df["embedding"].to_numpy()[:8]).astype(np.float64)
    qids = df["vec_id"].to_numpy()[:8]
    approx = pq_adc_topk(coded, model, q, qids, k=5).to_pandas()
    exact = knn_brute_force(ds, q, qids, k=5).to_pandas()
    recall = np.mean([
        len(set(approx.loc[approx["query_id"] == i, "neighbor_id"])
            & set(exact.loc[exact["query_id"] == i, "neighbor_id"])) / 5
        for i in qids])
    assert recall >= 0.6
    # each query's own vector lands in its own ADC top-5
    hit = np.mean([qid in set(
        approx.loc[approx["query_id"] == qid, "neighbor_id"])
        for qid in qids])
    assert hit >= 0.9


def test_split_invariance(data):
    """Partitioning must not change the fit. At iters=1 this holds to
    float-sum rounding (same deterministic driver-side init → identical
    assignments everywhere; only the partial-sum fold order differs), so
    the codebooks compare at tight tolerance. At iters>=2 k-means is
    chaotic to rounding — a ~1e-16 fold difference can flip ONE boundary
    assignment and move that centroid by O(1/cnt) — so the invariant is
    checked at the assignment level: both models encode the corpus almost
    identically."""
    df, _ = data
    books = []
    models = []
    for nparts in (2, 7):
        rds = ray.data.from_pandas(df).repartition(nparts)
        books.append(pq_fit(rds, m=M, nbits=NBITS, iters=1,
                            seed=7)["codebooks"])
        models.append(pq_fit(rds, m=M, nbits=NBITS, iters=3, seed=7))
    np.testing.assert_allclose(books[0], books[1], atol=1e-8)
    base = ray.data.from_pandas(df).repartition(3)
    codes = [pq_encode(base, m).to_pandas().sort_values("vec_id")
             for m in models]
    a = np.stack(codes[0]["pq_code"].to_numpy())
    b = np.stack(codes[1]["pq_code"].to_numpy())
    assert (a == b).mean() >= 0.99


def test_bad_dim():
    df = pd.DataFrame({"vec_id": [0], "embedding": [np.ones(10)]})
    with pytest.raises(ValueError):
        pq_fit(ray.data.from_pandas(df), m=4, nbits=2, iters=1)


def test_nbits_over_8(ray_session):
    # uint16 code path: 512 codewords
    import numpy as np
    import pandas as pd
    import ray
    from openmldb_ray.stages.pq import pq_adc_topk, pq_encode, pq_fit
    rng = np.random.default_rng(2)
    v = rng.normal(size=(1200, 16))
    df = pd.DataFrame({"vec_id": np.arange(1200), "embedding": list(v)})
    ds = ray.data.from_pandas(df).repartition(3)
    model = pq_fit(ds, "embedding", m=4, nbits=9, iters=2,
                   sample_init=1200)
    out = pq_adc_topk(pq_encode(ds, model), model, v[:3],
                      np.arange(3), k=5).to_pandas()
    assert len(out) == 15
    assert (out.groupby("query_id").size() == 5).all()


def test_adc_rerank_exact_when_covering(data):
    """rerank >= corpus size makes the shortlist the whole corpus, so the
    exact re-scoring pass must reproduce brute-force top-k exactly
    (IVFADC+R; sf0.1 oracle sweep found ADC-only recall at 0.44 vs the
    0.6 floor — rerank=50 lifts it to 0.94 there)."""
    df, Xn = data
    ds = ray.data.from_pandas(df).repartition(4)
    model = pq_fit(ds, m=M, nbits=NBITS, iters=2, seed=7)
    qm = Xn[:4]
    qids = np.arange(4)
    exact = knn_brute_force(ds, qm, qids, k=5).to_pandas()
    rr = pq_adc_topk(pq_encode(ds, model), model, qm, qids, k=5,
                     rerank=len(df)).to_pandas()
    for qid in qids:
        e = exact[exact["query_id"] == qid].sort_values("rank")
        a = rr[rr["query_id"] == qid].sort_values("rank")
        assert list(a["neighbor_id"]) == list(e["neighbor_id"])
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   e["score"].to_numpy(), atol=1e-9)


def test_adc_rerank_beats_plain_adc(data):
    df, Xn = data
    ds = ray.data.from_pandas(df).repartition(4)
    model = pq_fit(ds, m=M, nbits=NBITS, iters=2, seed=7)
    qm = Xn[:8]
    qids = np.arange(8)
    enc = pq_encode(ds, model)
    exact = knn_brute_force(ds, qm, qids, k=5).to_pandas()

    def recall(approx):
        hits = 0
        for qid in qids:
            a = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
            e = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
            hits += len(a & e) / max(len(e), 1)
        return hits / len(qids)

    plain = recall(pq_adc_topk(enc, model, qm, qids, k=5).to_pandas())
    r50 = recall(pq_adc_topk(enc, model, qm, qids, k=5,
                             rerank=50).to_pandas())
    r150 = recall(pq_adc_topk(enc, model, qm, qids, k=5,
                              rerank=150).to_pandas())
    # monotone in shortlist depth, and a real lift over plain ADC
    # (measured 0.4 plain / 0.725 @50 / 0.925 @150 at these tiny M=4
    # NBITS=5 codebooks)
    assert plain <= r50 <= r150
    assert r50 >= 0.6 and r150 >= 0.85
