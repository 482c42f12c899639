"""DSIR: Data Selection with Importance Resampling (Xie et al., 2023).

Select raw-corpus documents whose hashed-n-gram distribution looks like a
TARGET domain: fit bag-of-hashed-ngram (unigram + bigram) bucket
distributions p (target) and q (raw), score every raw doc with
``log w = sum_grams [log p(b) - log q(b)]`` (Laplace-smoothed), add
deterministic per-doc Gumbel noise, and keep the top-k — importance
resampling without ever materializing weights driver-side.

Scale design:
* fitting is SHUFFLE-FREE: each batch emits its sparse (bucket, count)
  partials (at most m = ``num_buckets`` rows per block, ~32 KB), the
  driver folds them with one bincount — the raw corpus is never moved;
* the log-ratio table (m floats) is broadcast ONCE via the object store;
  scoring is one streaming pass — grams are exploded vectorized
  (pandas str.split + np.repeat doc ids), bucketed with the engine-wide
  SipHash (core/hashing.stable_hash64 % m), and per-doc sums are one
  ``np.bincount`` with the table as weights;
* selection reuses :func:`openmldb_ray.stages.select.budget_select`
  (histogram-refinement order statistics) — exact global top-k with NO
  global sort.

Gumbel noise is hash-deterministic per doc id (u = (h + 0.5) / 2^32,
g = -log(-log u)), so the selected set is stable under reruns,
repartitioning and resume — the same property every sampler in this repo
guarantees.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _explode_grams(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, gram) arrays for unigrams + bigrams of lowercased
    whitespace-split words.  Vectorized: one split, np.repeat ids,
    bigrams by shifted concat within doc bounds."""
    words = texts.astype(str).str.lower().str.split()
    lens = words.map(len).to_numpy(np.int64)
    if int(lens.sum()) == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    flat = np.concatenate([w if len(w) else [] for w in words.to_numpy()])
    flat = flat.astype(object)
    doc = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    # bigrams: pair (i, i+1) where both in the same doc
    same = doc[:-1] == doc[1:] if len(doc) > 1 else np.empty(0, bool)
    big = (pd.Series(flat[:-1][same]).str.cat(
        pd.Series(flat[1:][same]), sep=" ").to_numpy(dtype=object)
        if same.any() else np.empty(0, object))
    grams = np.concatenate([flat, big])
    gdoc = np.concatenate([doc, doc[:-1][same] if len(doc) > 1
                           else np.empty(0, np.int64)])
    return gdoc, grams


def _bucketize(grams: np.ndarray, m: int) -> np.ndarray:
    from ..core.hashing import stable_hash64

    if not len(grams):
        return np.empty(0, np.int64)
    return (stable_hash64(grams) % np.uint64(m)).astype(np.int64)


def _count_pass(ds, text_col: str, m: int) -> np.ndarray:
    """Total hashed-gram bucket counts: sparse per-block partials folded
    on the driver (shuffle-free)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs
        quiet_ray_data_logs()
        _, grams = _explode_grams(df[text_col])
        b = _bucketize(grams, m)
        cnt = np.bincount(b, minlength=m)
        occ = np.nonzero(cnt)[0]
        return pd.DataFrame({"b": occ, "c": cnt[occ]})

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pandas", batch_size=None).to_pandas()
    out = np.zeros(m, dtype=np.int64)
    np.add.at(out, parts["b"].to_numpy(), parts["c"].to_numpy())
    return out


def dsir_fit(target_ds, raw_ds, *, text_col: str = "text",
             num_buckets: int = 4096, alpha: float = 1.0) -> dict:
    """Laplace-smoothed log-ratio table log p_target(b) - log q_raw(b)."""
    ct = _count_pass(target_ds, text_col, num_buckets).astype(np.float64)
    cq = _count_pass(raw_ds, text_col, num_buckets).astype(np.float64)
    logp = np.log(ct + alpha) - np.log(ct.sum() + alpha * num_buckets)
    logq = np.log(cq + alpha) - np.log(cq.sum() + alpha * num_buckets)
    return {"table": logp - logq, "num_buckets": num_buckets,
            "alpha": alpha}


def dsir_score(ds, model: dict, *, text_col: str = "text",
               id_col: str = "doc_id", out_col: str = "dsir_logw",
               gumbel_col: str | None = "dsir_key"):
    """Append each doc's importance log-weight (and, when ``gumbel_col``
    is set, the resampling key logw + deterministic per-id Gumbel)."""
    import ray

    m = model["num_buckets"]
    ref = ray.put(np.ascontiguousarray(model["table"]))

    class _Score:
        def __init__(self):
            self.table = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            from ..core.hashing import quiet_ray_data_logs
            quiet_ray_data_logs()
            df = df.copy()
            gdoc, grams = _explode_grams(df[text_col])
            b = _bucketize(grams, m)
            logw = np.bincount(gdoc, weights=self.table[b],
                               minlength=len(df))
            df[out_col] = logw
            if gumbel_col:
                from .curation import knuth_hash_u32
                u = (knuth_hash_u32(df[id_col].to_numpy())
                     .astype(np.float64) + 0.5) / float(1 << 32)
                df[gumbel_col] = logw - np.log(-np.log(u))
            return df

    return ds.map_batches(_Score, batch_format="pandas",
                          concurrency=(1, 16))


def dsir_select(raw_ds, target_ds, k: int, *, text_col: str = "text",
                id_col: str = "doc_id", num_buckets: int = 4096,
                alpha: float = 1.0, model: dict | None = None):
    """End-to-end DSIR: fit on (target, raw), score raw, keep the top-k
    by Gumbel-perturbed log-weight via sort-free order statistics."""
    from .select import budget_select

    model = model or dsir_fit(target_ds, raw_ds, text_col=text_col,
                              num_buckets=num_buckets, alpha=alpha)
    scored = dsir_score(raw_ds, model, text_col=text_col, id_col=id_col)
    return budget_select(scored, "dsir_key", budget=k, id_col=id_col,
                         materialize_narrow=True), model
