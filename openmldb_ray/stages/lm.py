"""Bigram language-model quality scoring (CCNet-style perplexity filter).

The reference engine has no LM scoring; this is one of the LLM-training-
data curation extensions (SURVEY §8). CCNet (Wenzek et al., 2020) filters
web text by per-document LM score; here the LM itself is trained
DISTRIBUTEDLY over the corpus — unigram/bigram counts via a batch-local
combiner + coarse hash shuffle (same shape as curation.ngram_counts, so
the shuffle carries (gram, partial_count) rows, never one row per word
occurrence) — and the resulting count tables are broadcast ONCE via
``ray.put`` to an actor-pool scoring stage, so scoring is a single
shuffle-free streaming pass.

Model: stupid backoff (Brants et al., 2007, "Large Language Models in
Machine Translation") over bigrams, with a +1-smoothed unigram floor so
every word — including OOV under a pruned model — has finite log-prob:

  p_uni(w)         = (count(w) + 1) / (total + 1)
  lp(w_0)          = ln p_uni(w_0)
  lp(w_i | w_i-1)  = ln( big(w_i-1, w_i) / uni(w_i-1) )   if bigram seen
                   = ln( 0.4 * p_uni(w_i) )                otherwise

Document score = mean negative log-prob over word positions (nats/word);
lower = more fluent under the training corpus. Trained uncapped this is
exactly SQL-expressible (oracle_sql()['lm_score'] recomputes it in DuckDB
with LAG + count joins). ``max_vocab`` / ``max_bigrams`` bound the
broadcast model at web scale — CCNet likewise ships a pruned LM — at the
cost of routing pruned grams through the backoff/OOV branches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _explode_words(texts: pd.Series) -> pd.Series:
    """All whitespace-split words of each doc, exploded with the doc's
    POSITIONAL index as the series index (empty docs contribute nothing)."""
    words = texts.fillna("").astype(str).str.strip().str.split()
    ex = words.reset_index(drop=True).explode()
    return ex[ex.notna()].astype(str)


class _GramCountPartial:
    """Per-batch combiner: batch-local unigram (kind=0) and bigram (kind=1)
    value_counts, so the shuffle moves one row per DISTINCT gram per batch."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        ex = _explode_words(df[self.text_col])
        uni = ex.value_counts()
        nxt = ex.groupby(level=0).shift(-1)
        mask = nxt.notna()
        big = (ex[mask] + " " + nxt[mask].astype(str)).value_counts()
        return pd.DataFrame({
            "gram": np.concatenate([uni.index.to_numpy(dtype=object),
                                    big.index.to_numpy(dtype=object)]).astype(object),
            "kind": np.concatenate([np.zeros(len(uni), np.int8),
                                    np.ones(len(big), np.int8)]),
            "cnt": np.concatenate([uni.to_numpy(np.int64),
                                   big.to_numpy(np.int64)]),
        })


def train_bigram_lm(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    *,
    max_vocab: int | None = None,
    max_bigrams: int | None = None,
    num_buckets: int | None = None,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> dict:
    """Distributed count pass → driver-side model dict.

    The driver materializes only the AGGREGATED (gram, count) table — the
    model must fit one worker's memory anyway to be broadcast for scoring,
    which is the inherent contract of LM filtering (the LM is small, the
    corpus is not). At web scale pass max_vocab/max_bigrams: each shuffle
    bucket keeps its own top-k by count (a gram lives in exactly one
    bucket, so the global top-k is a subset of the union of bucket top-ks)
    and the driver applies the exact global cap; ``total`` is always the
    FULL pre-cap corpus word count, kept exact via a per-bucket sum.
    """
    from ..core.hashing import add_bucket_column, default_num_buckets

    nb = num_buckets or default_num_buckets()
    cap = {0: max_vocab, 1: max_bigrams}
    partial = ds.map_batches(_GramCountPartial, batch_format="pandas",
                             batch_size=batch_size, concurrency=concurrency,
                             fn_constructor_kwargs=dict(text_col=text_col))
    add_b = add_bucket_column(["gram", "kind"], "__b", nb)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["gram", "kind"], as_index=False)["cnt"].sum()
        # exact per-bucket word total rides along as a kind=2 row so
        # pruning never skews the denominator ``total``
        word_total = int(agg.loc[agg["kind"] == 0, "cnt"].sum())
        parts = []
        for kind, sub in agg.groupby("kind"):
            k = cap[int(kind)]
            if k is not None:
                sub = sub.sort_values(["cnt", "gram"], ascending=[False, True],
                                      kind="stable").head(k)
            parts.append(sub)
        out = pd.concat(parts, ignore_index=True) if parts else agg
        return pd.concat(
            [out, pd.DataFrame({"gram": ["\x00total"], "kind": [np.int8(2)],
                                "cnt": [np.int64(word_total)]})],
            ignore_index=True)

    counts = (partial.map_batches(add_b, batch_format="pyarrow", batch_size=None)
              .groupby("__b").map_groups(bucket_sum, batch_format="pandas")
              ).to_pandas()
    total = int(counts.loc[counts["kind"] == 2, "cnt"].sum())
    uni = counts[counts["kind"] == 0]
    big = counts[counts["kind"] == 1]
    if max_vocab is not None and len(uni) > max_vocab:
        uni = uni.sort_values(["cnt", "gram"], ascending=[False, True],
                              kind="stable").head(max_vocab)
    if max_bigrams is not None and len(big) > max_bigrams:
        big = big.sort_values(["cnt", "gram"], ascending=[False, True],
                              kind="stable").head(max_bigrams)
    uni_d = dict(zip(uni["gram"], uni["cnt"].astype(np.int64)))
    # a bigram whose context word was pruned can't be scored (its
    # denominator uni(prev) is gone) — drop it so both engines agree that
    # "bigram seen" implies "context count known"
    big_d = {g: int(c) for g, c in zip(big["gram"], big["cnt"].astype(np.int64))
             if g.split(" ", 1)[0] in uni_d}
    return {"uni": uni_d, "big": big_d, "total": total}


class LmScorer:
    """Actor-pool scoring stage: model fetched ONCE per actor (``ray.put``
    ref in __init__), per-batch work is exploded-word dict maps + numpy
    branch arithmetic — no per-row Python."""

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id", alpha: float = 0.4):
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.uni, self.big = m["uni"], m["big"]
        self.total = float(m["total"])
        self.text_col, self.id_col, self.alpha = text_col, id_col, alpha

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        idc = self.id_col
        if len(df) == 0:
            return pd.DataFrame({idc: df[idc],  # keep the id dtype
                                 "n_words": pd.Series([], dtype="int64"),
                                 "nll": pd.Series([], dtype="float64")})
        ex = _explode_words(df[self.text_col])
        n = len(df)
        if len(ex) == 0:
            cnts = np.zeros(n, np.int64)
            return pd.DataFrame({idc: df[idc].to_numpy(), "n_words": cnts,
                                 "nll": np.full(n, np.nan)})
        uc = ex.map(self.uni).to_numpy(np.float64)          # NaN if OOV
        p_uni = (np.nan_to_num(uc) + 1.0) / (self.total + 1.0)
        prev = ex.groupby(level=0).shift(1)
        has_prev = prev.notna().to_numpy()
        bc = (prev.fillna("\x00") + " " + ex).map(self.big).to_numpy(np.float64)
        puc = prev.map(self.uni).to_numpy(np.float64)
        seen = has_prev & ~np.isnan(bc) & ~np.isnan(puc)
        with np.errstate(invalid="ignore", divide="ignore"):
            lp = np.where(seen,
                          np.log(np.where(seen, bc, 1.0)
                                 / np.where(seen, puc, 1.0)),
                          np.log(np.where(has_prev, self.alpha, 1.0) * p_uni))
        idx = ex.index.to_numpy()
        sums = np.zeros(n, np.float64)
        np.add.at(sums, idx, -lp)
        cnts = np.bincount(idx, minlength=n).astype(np.int64)
        return pd.DataFrame({
            idc: df[idc].to_numpy(),
            "n_words": cnts,
            "nll": np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan),
        })


def lm_score(ds: "ray.data.Dataset", model: dict, *, text_col: str = "text",
             id_col: str = "doc_id", alpha: float = 0.4,
             concurrency=(1, 8), batch_size: int = 4096) -> "ray.data.Dataset":
    """Score every document's mean word negative-log-prob under a trained
    bigram model (see module docstring for the exact formula). One
    broadcast (ray.put) + one shuffle-free map_batches pass."""
    mref = ray.put(model)
    return ds.map_batches(LmScorer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              model_ref=mref, text_col=text_col,
                              id_col=id_col, alpha=alpha))
