"""Naive Bayes quality classifier (stages/classify): distributed count
training vs a naive reference, vocab-cap behavior, batch-split invariance."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _naive_model(texts, labels, max_vocab=None):
    c1, c0, n1, n0 = {}, {}, 0, 0
    for t, l in zip(texts, labels):
        if l is None or (isinstance(l, float) and math.isnan(l)):
            continue
        if l == 1:
            n1 += 1
        else:
            n0 += 1
        for w in str(t).strip().split():
            d = c1 if l == 1 else c0
            d[w] = d.get(w, 0) + 1
    vocab = sorted(set(c1) | set(c0))
    if max_vocab is not None and len(vocab) > max_vocab:
        vocab = sorted(vocab, key=lambda w: (-(c1.get(w, 0) + c0.get(w, 0)), w))
        vocab = sorted(vocab[:max_vocab])
    return vocab, c1, c0, n1, n0


def _naive_logit(text, vocab, c1, c0, n1, n0):
    V = len(vocab)
    vs = set(vocab)
    t1 = sum(c1.get(w, 0) for w in vocab)
    t0 = sum(c0.get(w, 0) for w in vocab)
    s = math.log(n1 / n0)
    for w in str(text).strip().split():
        if w in vs:
            s += math.log((c1.get(w, 0) + 1) / (t1 + V + 1))
            s -= math.log((c0.get(w, 0) + 1) / (t0 + V + 1))
        else:
            s += math.log(1 / (t1 + V + 1)) - math.log(1 / (t0 + V + 1))
    return s


def _mk_docs(n=300, seed=0):
    rng = np.random.default_rng(seed)
    pos_w = [f"good{i}" for i in range(20)] + ["the", "a", "of"]
    neg_w = [f"spam{i}" for i in range(20)] + ["the", "a", "buy"]
    rows = []
    for i in range(n):
        lab = [1, 0, None][i % 3]
        pool = pos_w if lab == 1 else neg_w if lab == 0 else pos_w + neg_w
        words = rng.choice(pool, size=rng.integers(3, 25))
        rows.append({"doc_id": i, "text": " ".join(words),
                     "label": lab})
    return pd.DataFrame(rows)


def test_nb_matches_naive(ray_session):
    from openmldb_ray.stages.classify import nb_score, train_nb

    df = _mk_docs()
    ds = rd.from_pandas(df).repartition(5)
    model = train_nb(ds, "text", "label")
    vocab, c1, c0, n1, n0 = _naive_model(df["text"], df["label"])
    np.testing.assert_array_equal(model["vocab"], np.array(vocab, dtype=object))
    assert model["n_docs_1"] == n1 and model["n_docs_0"] == n0
    out = nb_score(ds, model).to_pandas().sort_values("doc_id")
    for i in (0, 1, 2, 77, 299):
        ref = _naive_logit(df["text"].iloc[i], vocab, c1, c0, n1, n0)
        assert abs(out["nb_logit"].iloc[i] - ref) < 1e-9
    # the classifier actually separates: labeled positives score higher on
    # average than labeled negatives
    lp = out.merge(df[["doc_id", "label"]], on="doc_id", suffixes=("", "_y"))
    assert lp[lp["label_y"] == 1]["nb_logit"].mean() > \
        lp[lp["label_y"] == 0]["nb_logit"].mean()


def test_nb_vocab_cap_and_oov(ray_session):
    from openmldb_ray.stages.classify import nb_score, train_nb

    df = _mk_docs(seed=4)
    ds = rd.from_pandas(df).repartition(4)
    model = train_nb(ds, "text", "label", max_vocab=10, num_buckets=8)
    assert len(model["vocab"]) == 10
    vocab, c1, c0, n1, n0 = _naive_model(df["text"], df["label"], max_vocab=10)
    np.testing.assert_array_equal(model["vocab"], np.array(vocab, dtype=object))
    out = nb_score(ds, model).to_pandas().sort_values("doc_id")
    ref = _naive_logit(df["text"].iloc[5], vocab, c1, c0, n1, n0)
    assert abs(out["nb_logit"].iloc[5] - ref) < 1e-9


def test_nb_split_invariant(ray_session):
    from openmldb_ray.stages.classify import train_nb

    df = _mk_docs(n=120, seed=9)
    m1 = train_nb(rd.from_pandas(df).repartition(1), "text", "label")
    m8 = train_nb(rd.from_pandas(df).repartition(8), "text", "label")
    np.testing.assert_array_equal(m1["vocab"], m8["vocab"])
    np.testing.assert_array_equal(m1["c1"], m8["c1"])
    np.testing.assert_array_equal(m1["c0"], m8["c0"])
    assert (m1["n_docs_1"], m1["n_docs_0"]) == (m8["n_docs_1"], m8["n_docs_0"])


def test_nb_single_class_raises(ray_session):
    from openmldb_ray.stages.classify import train_nb

    df = pd.DataFrame({"text": ["a b", "b c"], "label": [1, 1]})
    with pytest.raises(ValueError):
        train_nb(rd.from_pandas(df), "text", "label")
