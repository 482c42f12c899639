"""Fasttext-style document quality classifier (multinomial Naive Bayes).

The standard LLM-data curation move (GPT-3, CCNet, RefinedWeb): train a
cheap linear text classifier on "high quality" (e.g. wiki/books) vs "raw
web" labels, score every document, keep the confident positives. A
multinomial NB over unigrams IS a linear classifier over token counts
(fasttext without the trained embedding), and unlike an SGD model its
training is a pure counting problem — embarrassingly distributable and
exactly SQL-replayable (the driver oracle recomputes every branch in
DuckDB).

Training (one pass over the labeled rows, same scale shape as
lm.train_bigram_lm): batch-local (word, class) count combiner -> word-hash
coarse-bucket shuffle (the shuffle carries distinct-word partial counts,
never per-occurrence rows) -> per-bucket exact sums + per-bucket top-V cap
(a word lives in exactly one bucket, so the global top-V is a subset of
the union of bucket top-Vs) -> tiny driver fold. Per-class doc counts ride
the same shuffle as a sentinel row, so priors cost no extra pass.

Model (+1 smoothing over the CAPPED vocab, V = len(vocab)):

  lp(w|c)  = ln((cnt(w,c) + 1) / (tot_c + V + 1))   for w in vocab
  lp(OOV|c)= ln(          1   / (tot_c + V + 1))
  logit(d) = ln(n_docs_1 / n_docs_0)
             + sum_w [lp(w|1) - lp(w|0)]            (>0 leans positive)

where tot_c sums the capped vocab's class-c counts — both engines agree
that "in vocab" is the only smoothed-seen state.

Scoring is shuffle-free: the model (two float arrays + a vocab index) is
``ray.put`` once and fetched per actor; each batch is one vectorized
explode + get_indexer + bincount.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

_DOCS_SENTINEL = "\x00docs"


def _explode_words(texts: pd.Series):
    """(doc positional index, word) for all whitespace-split words."""
    words = texts.fillna("").astype(str).str.strip().str.split()
    return words.explode().dropna()


class _NbCountPartial:
    """Batch combiner: distinct (word, class) partial counts + a sentinel
    row carrying the batch's per-class labeled-doc counts."""

    def __init__(self, text_col: str, label_col: str):
        self.text_col, self.label_col = text_col, label_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        lab = pd.to_numeric(df[self.label_col], errors="coerce")
        m = lab.notna()
        sub = df.loc[m.to_numpy()]
        lab = lab[m].astype(np.int64).to_numpy()
        n1, n0 = int((lab == 1).sum()), int((lab == 0).sum())
        ex = _explode_words(sub[self.text_col].reset_index(drop=True))
        if len(ex):
            wlab = lab[ex.index.to_numpy()]
            key = pd.DataFrame({"word": ex.to_numpy(), "c": wlab})
            agg = key.groupby(["word", "c"]).size().unstack(fill_value=0)
            out = pd.DataFrame({
                "word": agg.index.to_numpy(dtype=object),
                "c1": agg[1].to_numpy(np.int64) if 1 in agg else 0,
                "c0": agg[0].to_numpy(np.int64) if 0 in agg else 0,
            })
        else:
            out = pd.DataFrame({"word": pd.Series(dtype=object),
                                "c1": pd.Series(dtype=np.int64),
                                "c0": pd.Series(dtype=np.int64)})
        sent = pd.DataFrame({"word": [_DOCS_SENTINEL], "c1": [n1], "c0": [n0]})
        return pd.concat([out, sent], ignore_index=True)


def train_nb(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    label_col: str = "label",
    *,
    max_vocab: int | None = None,
    num_buckets: int | None = None,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> dict:
    """Distributed count pass → driver-side model dict (vocab words sorted,
    per-class counts, totals, doc priors). Rows with a null ``label_col``
    are unlabeled and contribute nothing; labels must be 0/1."""
    from ..core.hashing import add_bucket_column, default_num_buckets

    nb = num_buckets or default_num_buckets()
    partial = ds.map_batches(
        _NbCountPartial, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(text_col=text_col, label_col=label_col))
    add_b = add_bucket_column(["word"], "__b", nb)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("word", as_index=False)[["c1", "c0"]].sum()
        sent = agg[agg["word"] == _DOCS_SENTINEL]
        agg = agg[agg["word"] != _DOCS_SENTINEL]
        if max_vocab is not None and len(agg) > max_vocab:
            tot = agg["c1"] + agg["c0"]
            agg = agg.assign(__t=tot).sort_values(
                ["__t", "word"], ascending=[False, True], kind="stable"
            ).head(max_vocab).drop(columns="__t")
        return pd.concat([agg, sent], ignore_index=True).drop(
            columns="__b", errors="ignore")

    counts = (partial.map_batches(add_b, batch_format="pyarrow",
                                  batch_size=None)
              .groupby("__b").map_groups(bucket_sum, batch_format="pandas")
              ).to_pandas()
    sent = counts[counts["word"] == _DOCS_SENTINEL]
    n1, n0 = int(sent["c1"].sum()), int(sent["c0"].sum())
    words = counts[counts["word"] != _DOCS_SENTINEL]
    if max_vocab is not None and len(words) > max_vocab:
        tot = words["c1"] + words["c0"]
        words = words.assign(__t=tot).sort_values(
            ["__t", "word"], ascending=[False, True], kind="stable"
        ).head(max_vocab).drop(columns="__t")
    words = words.sort_values("word", kind="stable")
    if n1 == 0 or n0 == 0:
        raise ValueError("train_nb: both classes need at least one doc")
    return {
        "vocab": words["word"].to_numpy(dtype=object),
        "c1": words["c1"].to_numpy(np.int64),
        "c0": words["c0"].to_numpy(np.int64),
        "n_docs_1": n1, "n_docs_0": n0,
    }


class NbScorer:
    """Actor-pool scoring stage: model fetched once per actor, per-batch
    one explode + get_indexer + two bincounts."""

    def __init__(self, model_ref, text_col: str = "text",
                 out_col: str = "nb_logit"):
        model = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.text_col, self.out_col = text_col, out_col
        self.index = pd.Index(model["vocab"])
        V = len(self.index)
        t1, t0 = int(model["c1"].sum()), int(model["c0"].sum())
        lp1 = np.log((model["c1"] + 1.0) / (t1 + V + 1.0))
        lp0 = np.log((model["c0"] + 1.0) / (t0 + V + 1.0))
        self.diff = lp1 - lp0
        self.oov_diff = float(np.log(1.0 / (t1 + V + 1.0))
                              - np.log(1.0 / (t0 + V + 1.0)))
        self.prior = float(np.log(model["n_docs_1"] / model["n_docs_0"]))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        ex = _explode_words(df[self.text_col].reset_index(drop=True))
        logit = np.full(len(df), self.prior)
        if len(ex):
            idx = self.index.get_indexer(ex.to_numpy())
            d = np.where(idx >= 0, self.diff[np.clip(idx, 0, None)],
                         self.oov_diff)
            logit += np.bincount(ex.index.to_numpy(), weights=d,
                                 minlength=len(df))
        df[self.out_col] = logit
        return df


def nb_score(ds: "ray.data.Dataset", model: dict, *, text_col: str = "text",
             out_col: str = "nb_logit", concurrency=(1, 8),
             batch_size: int = 4096) -> "ray.data.Dataset":
    """Score every row under a trained NB model: one broadcast (ray.put) +
    one shuffle-free actor-pool pass."""
    mref = ray.put(model)
    return ds.map_batches(
        NbScorer, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(model_ref=mref, text_col=text_col,
                                   out_col=out_col))
