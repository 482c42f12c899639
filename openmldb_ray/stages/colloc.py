"""Corpus-wide collocation extraction (bigram lift / PMI top-k).

The classic corpus-analysis op (Church & Hanks 1990 association ratio):
find word pairs that co-occur far more than chance — phrase mining,
tokenizer-merge candidates, boilerplate discovery. Score is the PMI
argument ("lift"):

    lift(a,b) = count(ab) * N / (count(a) * count(b))

(PMI = ln(lift); ln is monotone, so ranking by lift avoids libm and the
float64 expression ``(c_ab * N) / (c_a * c_b)`` is BIT-identical across
engines — IEEE multiply/divide are exactly specified, unlike ln.)

Scale shape:
1. COMBINER pass: each batch emits per-DISTINCT unigram and bigram
   partial counts plus one total-token row — the shuffle carries distinct
   grams per batch, not occurrences (same shape as curation.ngram_counts,
   tokenops.learn_bpe).
2. One gram-hash bucket reduce folds the partials; pairs below
   ``min_count`` drop THERE (and since count(a) >= count(ab), unigrams
   prune at the same threshold without affecting any surviving pair).
3. The pruned unigram table broadcasts once (bounded by the min_count
   prune; at web scale min_count >= 5 keeps it ~millions of rows); a
   final streaming pass over the reduced bigram table computes lift and
   keeps the per-bucket top-k — the global top-k is a subset of bucket
   top-ks because each pair lives in exactly one bucket.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

# words come from whitespace splitting, so a space can never appear inside
# one — and unlike "\x00" it survives numpy's U-dtype concatenation
# (np.char.add treats NUL as a terminator and silently drops it)
_SEP = " "


def _gram_partials(text_col: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        parts = df[text_col].fillna("").astype(str).str.split()
        counts = parts.str.len().to_numpy(np.int64)
        import itertools

        flat = np.fromiter(itertools.chain.from_iterable(parts),
                           dtype=object, count=int(counts.sum()))
        total = len(flat)
        uni = pd.Series(flat).value_counts()
        # adjacent pairs within a doc: mask out cross-doc seams
        if total >= 2:
            seam = np.zeros(total - 1, dtype=bool)
            ends = np.cumsum(counts)[:-1]
            seam[ends[(ends > 0) & (ends < total)] - 1] = True
            a, b = flat[:-1][~seam], flat[1:][~seam]
            bi = pd.Series(np.char.add(np.char.add(
                a.astype(str), _SEP), b.astype(str))).value_counts()
        else:
            bi = pd.Series(dtype=np.int64)
        frames = [
            pd.DataFrame({"g": uni.index.to_numpy(dtype=object),
                          "cnt": uni.to_numpy(np.int64),
                          "kind": np.int8(0)}),
            pd.DataFrame({"g": bi.index.to_numpy(dtype=object),
                          "cnt": bi.to_numpy(np.int64),
                          "kind": np.int8(1)}),
            pd.DataFrame({"g": [_SEP], "cnt": np.int64(total),
                          "kind": np.int8(2)}),
        ]
        return pd.concat(frames, ignore_index=True)
    return fn


def collocations(ds: "ray.data.Dataset", text_col: str = "text", *,
                 top_k: int = 50, min_count: int = 5,
                 num_buckets: int | None = None,
                 num_partitions: int | None = None,
                 batch_size: int = 8192) -> pd.DataFrame:
    """Top-k word bigrams by lift (ties: lift desc, then (w1, w2) asc).
    Returns a small driver DataFrame
    ``(w1, w2, pair_cnt, w1_cnt, w2_cnt, lift)`` — top-k is
    driver-sized by construction."""
    import ray

    from ..core.grouping import map_groups_typed
    from ..core.hashing import add_bucket_column, default_num_buckets

    nb = num_buckets or default_num_buckets()
    partials = ds.select_columns([text_col]).map_batches(
        _gram_partials(text_col), batch_format="pandas",
        batch_size=batch_size)
    add_b = add_bucket_column(["g", "kind"], "__b", nb)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        agg = g.groupby(["g", "kind"], as_index=False, sort=False)["cnt"].sum()
        keep = (agg["cnt"] >= min_count) | (agg["kind"] == 2)
        return agg[keep]

    reduced = map_groups_typed(
        partials.map_batches(add_b, batch_format="pyarrow",
                             batch_size=None),
        "__b", fold, num_partitions=num_partitions).materialize()

    # unigram table + N to the driver (bounded by the min_count prune)
    uparts, n_total = [], 0
    for b in reduced.iter_batches(batch_format="pandas"):
        kind = b["kind"].to_numpy()
        n_total += int(b["cnt"].to_numpy()[kind == 2].sum())
        u = b[kind == 0]
        if len(u):
            uparts.append(u[["g", "cnt"]])
    if not uparts or n_total == 0:
        return pd.DataFrame({"w1": [], "w2": [], "pair_cnt": [],
                             "w1_cnt": [], "w2_cnt": [], "lift": []})
    uni = pd.concat(uparts, ignore_index=True)
    udict = dict(zip(uni["g"].tolist(), uni["cnt"].astype(np.int64).tolist()))
    uref = ray.put(udict)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        bi = b[b["kind"].to_numpy() == 1]
        if not len(bi):
            return pd.DataFrame({"w1": [], "w2": [], "pair_cnt": [],
                                 "w1_cnt": [], "w2_cnt": [], "lift": []})
        ud = ray.get(uref)
        pairs = bi["g"].str.split(_SEP, n=1, expand=True)
        w1 = pairs[0].to_numpy(dtype=object)
        w2 = pairs[1].to_numpy(dtype=object)
        cab = bi["cnt"].to_numpy(np.int64)
        ca = np.fromiter((ud.get(w, 0) for w in w1), np.int64, len(w1))
        cb = np.fromiter((ud.get(w, 0) for w in w2), np.int64, len(w2))
        # a surviving pair implies surviving unigrams; guard anyway
        ok = (ca > 0) & (cb > 0)
        w1, w2, cab, ca, cb = w1[ok], w2[ok], cab[ok], ca[ok], cb[ok]
        lift = (cab.astype(np.float64) * np.float64(n_total)) \
            / (ca.astype(np.float64) * cb.astype(np.float64))
        out = pd.DataFrame({"w1": w1, "w2": w2, "pair_cnt": cab,
                            "w1_cnt": ca, "w2_cnt": cb, "lift": lift})
        out = out.sort_values(["lift", "w1", "w2"],
                              ascending=[False, True, True], kind="stable")
        return out.head(top_k)

    cands = reduced.map_batches(score, batch_format="pandas",
                                batch_size=None).to_pandas()
    cands = cands.sort_values(["lift", "w1", "w2"],
                              ascending=[False, True, True], kind="stable")
    return cands.head(top_k).reset_index(drop=True)
