"""Training-data curation stages (north-rule extensions, round 3).

Four first-class curation operators a 100 TB text pipeline needs, each an
embarrassingly-parallel actor-pool ``map_batches`` over pandas/Arrow
batches — NO shuffle anywhere, so all four stream at read speed:

- ``quality_filter``   — Gopher/C4-style rule scoring + keep decision
  (Rae et al. 2021 "Scaling Language Models" §A1.1; Raffel et al. 2020 C4).
- ``PiiRedactor``      — regex redaction of emails / IPv4 / phone numbers
  with per-doc match counts (patterns chosen to behave identically under
  Python ``re`` and RE2, so a SQL oracle can replay them).
- ``decontaminate``    — drop documents containing any needle n-gram from a
  benchmark set (broadcast small side: the needle list ships ONCE per actor
  in ``__init__``, never per batch — the classic eval-decontamination step).
- ``stratified_sample``— deterministic per-stratum hash sampling (domain
  mixing): keep iff multiplicative-hash(id) < rate(stratum) * 2^32.

Every rule is defined so DuckDB can replay it exactly (the driver's
correctness gate hash-compares values); the semantics are therefore pinned
by SQL, not by pandas implementation accidents.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from ..core.stagecache import task_stage

# NOTE (round 5): the light-state stages in this module run as TASK
# functions with a per-worker-process instance cache (core/stagecache.py)
# instead of actor pools. Chaining several actor-pool stages deadlocks
# the streaming executor when free CPU slots < pools + 1 (each pool pins
# >= 1 CPU for the dataset's lifetime — observed at num_cpus=2 in the
# curation scaling protocol). The ``concurrency`` parameters remain in
# the public signatures for API compatibility but are no-ops for these
# stages; setup still runs once per worker process.

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

# The fixed stopword set used by the quality rules (tiny on purpose: the
# rule is "document contains common function words", per Gopher §A1.1).
QUALITY_STOPWORDS = ("the", "a", "of", "to", "and", "in")


class QualityRules:
    """Gopher/C4-style quality metrics + keep decision, vectorized.

    Metrics (all replayable in SQL):
      n_words        — count of \\s+-separated words in trimmed text
      mean_word_len  — total non-space chars / n_words
      stopword_hits  — words in QUALITY_STOPWORDS
      alpha_frac     — fraction of words containing an ascii letter
    Keep iff  min_words <= n_words <= max_words
          and 3 <= mean_word_len <= 10
          and stopword_hits >= min_stopword_hits
          and alpha_frac >= min_alpha_frac.
    """

    def __init__(self, text_col: str = "text", min_words: int = 30,
                 max_words: int = 100_000, min_stopword_hits: int = 2,
                 min_alpha_frac: float = 0.8):
        self.text_col = text_col
        self.min_words = min_words
        self.max_words = max_words
        self.min_stopword_hits = min_stopword_hits
        self.min_alpha_frac = min_alpha_frac
        self.stopwords = frozenset(QUALITY_STOPWORDS)
        self.alpha_re = re.compile(r"[A-Za-z]")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df[self.text_col].fillna("").astype(str).str.strip()
        words = s.str.split()  # \s+ splitting on trimmed text
        n_words = words.map(len).to_numpy(np.int64)
        n_wchars = s.str.replace(r"\s+", "", regex=True).str.len().to_numpy(np.int64)
        # explode once, one isin / one regex over the exploded series.
        # dropna: an EMPTY word list explodes to one NaN row, which would
        # stringify to "nan" and count as an alpha word for empty docs
        ex = words.reset_index(drop=True).explode().dropna()
        idx = pd.RangeIndex(len(s))
        stop_hits = ex.isin(self.stopwords).groupby(level=0).sum() \
            .reindex(idx, fill_value=0).to_numpy(np.int64)
        alpha_words = ex.astype(str).str.contains(self.alpha_re).groupby(level=0).sum() \
            .reindex(idx, fill_value=0).to_numpy(np.float64)
        mean_wlen = n_wchars / np.maximum(n_words, 1)
        alpha_frac = alpha_words / np.maximum(n_words, 1)
        df["n_words"] = n_words
        df["mean_word_len"] = mean_wlen
        df["stopword_hits"] = stop_hits
        df["alpha_frac"] = alpha_frac
        df["keep"] = ((n_words >= self.min_words) & (n_words <= self.max_words)
                      & (mean_wlen >= 3) & (mean_wlen <= 10)
                      & (stop_hits >= self.min_stopword_hits)
                      & (alpha_frac >= self.min_alpha_frac))
        return df


def quality_filter(ds: "ray.data.Dataset", text_col: str = "text",
                   keep_only: bool = True, concurrency=(1, 8),
                   batch_size: int = 4096, **rules) -> "ray.data.Dataset":
    """Score + (optionally) filter. Streaming, shuffle-free."""
    out = ds.map_batches(task_stage(QualityRules, text_col=text_col,
                                    **rules),
                         batch_format="pandas", batch_size=batch_size)
    if keep_only:
        out = out.filter(expr="keep == True")
    return out


# Patterns chosen so Python re and RE2 (DuckDB) agree: no backrefs, no
# lookaround, \b is common to both. Application order is fixed
# (email -> ipv4 -> phone) so digit runs freed by one rule can't be
# re-matched differently by the next.
PII_PATTERNS = (
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("n_ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("n_phones", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
)


class PiiRedactor:
    """Redact emails / IPv4 / phone numbers; emit per-doc match counts.

    Regexes compile once per actor; per-batch work is vectorized pandas
    ``str.count`` + ``str.replace``. Shuffle-free, streams at read speed.
    """

    def __init__(self, text_col: str = "text", out_col: str = "text_redacted"):
        self.text_col = text_col
        self.out_col = out_col
        self.patterns = [(name, re.compile(pat), repl)
                         for name, pat, repl in PII_PATTERNS]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df[self.text_col].fillna("").astype(str)
        for name, rx, repl in self.patterns:
            df[name] = s.str.count(rx).to_numpy(np.int64)
            s = s.str.replace(rx, repl, regex=True)
        df[self.out_col] = s
        return df


def pii_redact(ds: "ray.data.Dataset", text_col: str = "text",
               concurrency=(1, 8), batch_size: int = 4096) -> "ray.data.Dataset":
    return ds.map_batches(task_stage(PiiRedactor, text_col=text_col),
                          batch_format="pandas", batch_size=batch_size)


class NeedleFilter:
    """Benchmark-decontamination predicate: does the text contain any needle?

    The needle list is the broadcast small side: it ships once per actor in
    ``__init__`` (``fn_constructor_kwargs`` pins it in the actor, Ray stores
    it once in the object store). Few needles -> per-needle vectorized
    ``str.contains(..., regex=False)``; many needles -> one compiled
    alternation regex (RE2-style linear scan; for truly large benchmark
    sets an Aho-Corasick automaton slots in here, same actor contract).
    """

    def __init__(self, needles: list[str], text_col: str = "text",
                 out_col: str = "contaminated"):
        self.text_col = text_col
        self.out_col = out_col
        self.needles = [n for n in needles if n]
        self.alt_re = (re.compile("|".join(re.escape(n) for n in self.needles))
                       if len(self.needles) > 8 else None)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df[self.text_col].fillna("").astype(str)
        if not self.needles:
            hit = np.zeros(len(df), dtype=bool)
        elif self.alt_re is not None:
            hit = s.str.contains(self.alt_re).to_numpy(bool)
        else:
            hit = np.logical_or.reduce(
                [s.str.contains(n, regex=False).to_numpy(bool)
                 for n in self.needles])
        df[self.out_col] = hit
        return df


def decontaminate(ds: "ray.data.Dataset", needles: list[str],
                  text_col: str = "text", keep_only: bool = True,
                  concurrency=(1, 8), batch_size: int = 4096) -> "ray.data.Dataset":
    """Drop documents containing any benchmark needle string."""
    out = ds.map_batches(task_stage(NeedleFilter, needles=list(needles),
                                    text_col=text_col),
                         batch_format="pandas", batch_size=batch_size)
    if keep_only:
        out = out.filter(expr="contaminated == False") \
                 .drop_columns(["contaminated"])
    return out


def _doc_bigrams(texts: pd.Series) -> pd.Series:
    """All word bigrams ('w1 w2') of each doc, exploded with the doc's
    positional index as the series index. One groupby-shift, no row loop."""
    words = texts.fillna("").astype(str).str.strip().str.split()
    ex = words.reset_index(drop=True).explode()
    nxt = ex.groupby(level=0).shift(-1)
    mask = nxt.notna() & ex.notna()
    return ex[mask].astype(str) + " " + nxt[mask].astype(str)


class _NgramPartial:
    """Per-batch COMBINER for corpus n-gram counting: batch-local
    value_counts so the shuffle carries (ngram, partial_count) rows, not
    one row per occurrence (SURVEY §4 'push aggregation partial')."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        grams = _doc_bigrams(df[self.text_col])
        vc = grams.value_counts()
        return pd.DataFrame({"ngram": vc.index.astype(str),
                             "cnt": vc.to_numpy(np.int64)})


def ngram_counts(ds: "ray.data.Dataset", text_col: str = "text",
                 top_k: int = 100, num_buckets: int | None = None,
                 concurrency=(1, 8), batch_size: int = 8192) -> "ray.data.Dataset":
    """Global top-k word-bigram counts.

    batch-local partial counts (combiner) -> hash shuffle on the ngram ->
    per-bucket sum + per-bucket top-k (safe: an ngram lives in exactly one
    bucket, so the global top-k is a subset of the union of bucket top-ks)
    -> tiny global sort+limit. The shuffle moves one row per DISTINCT ngram
    per batch instead of one per occurrence."""
    from ..core.hashing import add_bucket_column, default_num_buckets

    nb = num_buckets or default_num_buckets()
    partial = ds.map_batches(task_stage(_NgramPartial, text_col=text_col),
                             batch_format="pandas",
                             batch_size=batch_size)
    add_b = add_bucket_column(["ngram"], "__b", nb)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("ngram", as_index=False)["cnt"].sum()
        agg = agg.sort_values(["cnt", "ngram"], ascending=[False, True],
                              kind="stable").head(top_k)
        return agg[["ngram", "cnt"]]

    return (partial.map_batches(add_b, batch_format="pyarrow", batch_size=None)
            .groupby("__b").map_groups(bucket_topk, batch_format="pandas")
            .sort(["cnt", "ngram"], descending=[True, False])
            .limit(top_k))


class RepetitionStats:
    """Gopher-style repetition metrics per doc, vectorized:
    dup_word_frac = 1 - distinct words / words;
    top_bigram_frac = occurrences of the doc's most frequent bigram /
    total bigrams (0 for docs with < 2 words)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        words = df[self.text_col].fillna("").astype(str).str.strip().str.split()
        n = words.map(len).to_numpy(np.int64)
        nuniq = words.map(lambda ws: len(set(ws))).to_numpy(np.int64)
        df["dup_word_frac"] = np.where(n > 0, 1 - nuniq / np.maximum(n, 1), 0.0)
        grams = _doc_bigrams(df[self.text_col])
        if len(grams):
            per = grams.to_frame("g").groupby([grams.index, "g"]).size()
            top = per.groupby(level=0).max()
            tot = per.groupby(level=0).sum()
            frac = (top / tot).reindex(pd.RangeIndex(len(df)), fill_value=0.0)
        else:
            frac = pd.Series(np.zeros(len(df)))
        df["top_bigram_frac"] = frac.to_numpy(np.float64)
        return df


def repetition_stats(ds: "ray.data.Dataset", text_col: str = "text",
                     concurrency=(1, 8), batch_size: int = 4096) -> "ray.data.Dataset":
    return ds.map_batches(task_stage(RepetitionStats, text_col=text_col),
                          batch_format="pandas", batch_size=batch_size)


class BloomFilter:
    """Vectorized Bloom filter over 64-bit element hashes with
    Kirsch–Mitzenmacher double hashing (k index hashes from two halves of
    one 64-bit hash). No false negatives by construction; false-positive
    rate ~ (1 - e^{-kn/m})^k. The bitmap is a plain numpy bool array, so
    it broadcasts once per actor through fn_constructor_kwargs."""

    def __init__(self, n_bits: int = 1 << 22, k: int = 4):
        self.m = int(n_bits)
        self.k = int(k)
        self.bits = np.zeros(self.m, bool)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, np.uint64)
        h1 = h % np.uint64(self.m)
        h2 = ((h >> np.uint64(32)) | np.uint64(1)) % np.uint64(self.m)
        j = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + j * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h):
            self.bits[self._indices(h).ravel()] = True

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, bool)
        return self.bits[self._indices(h)].all(axis=0)


def _word_ngram_hashes(texts: pd.Series, n: int) -> tuple:
    """64-bit hashes of every word n-gram of each doc, with the doc's
    positional index per hash. Vectorized: one explode, n-1 grouped shifts,
    one hash call."""
    from ..core.hashing import stable_hash64

    words = texts.fillna("").astype(str).str.strip().str.split()
    ex = words.reset_index(drop=True).explode()
    g = ex.astype(str)
    grp = ex.groupby(level=0)
    for j in range(1, n):
        g = g + " " + grp.shift(-j).astype(str)
    last = grp.shift(-(n - 1))
    valid = last.notna() & ex.notna()
    g = g[valid]
    if not len(g):
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    return stable_hash64(g).astype(np.uint64), g.index.to_numpy(np.int64)


def build_ngram_bloom(needle_texts, n: int = 8, n_bits: int = 1 << 22,
                      k: int = 4) -> BloomFilter:
    """Bloom filter of every word n-gram of the benchmark texts — the
    at-scale decontamination set (GPT-3-style n-gram filtering): millions
    of eval n-grams compress to one bitmap that ships once per actor."""
    bf = BloomFilter(n_bits=n_bits, k=k)
    h, _ = _word_ngram_hashes(pd.Series(list(needle_texts)), n)
    bf.add_hashes(h)
    return bf


class BloomNeedleFilter:
    """Per-batch contamination check: a doc is contaminated iff ANY of its
    word n-grams hits the bloom. The bitmap lands in the actor once."""

    def __init__(self, bloom: BloomFilter, n: int = 8,
                 text_col: str = "text", out_col: str = "contaminated"):
        self.bloom = bloom
        self.n = int(n)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h, rows = _word_ngram_hashes(
            df[self.text_col].reset_index(drop=True), self.n)
        hit_rows = rows[self.bloom.contains_hashes(h)]
        mask = np.zeros(len(df), bool)
        mask[np.unique(hit_rows)] = True
        df[self.out_col] = mask
        return df


def decontaminate_bloom(ds: "ray.data.Dataset", needle_texts, n: int = 8,
                        n_bits: int = 1 << 22, k: int = 4,
                        text_col: str = "text", keep_only: bool = True,
                        concurrency=(1, 8),
                        batch_size: int = 4096) -> "ray.data.Dataset":
    """Drop documents sharing any word n-gram with the benchmark texts.
    Supersets plain substring decontamination (any overlap, not only
    needle prefixes); no false negatives, false positives bounded by the
    bloom parameters."""
    bloom = build_ngram_bloom(needle_texts, n=n, n_bits=n_bits, k=k)
    out = ds.map_batches(task_stage(BloomNeedleFilter, bloom=bloom, n=n,
                                    text_col=text_col),
                         batch_format="pandas", batch_size=batch_size)
    if keep_only:
        out = out.filter(expr="contaminated == False") \
                 .drop_columns(["contaminated"])
    return out


KNUTH_MULT = 2654435761  # Knuth's multiplicative-hash constant (2^32 * phi)


def knuth_hash_u32(ids: np.ndarray, mod_bits: int = 64) -> np.ndarray:
    """Deterministic uniform u32 from an int id: (id * 2654435761) mod 2^32.

    ``mod_bits`` < 64 first reduces the id mod 2^mod_bits — that variant is
    replayable in engines whose BIGINT would overflow on the full product
    (the SQL oracle uses mod_bits=20); the engine default is the full
    64-bit wrap-around multiply (numpy uint64), collision-free structure
    for dense ids at 10^12 scale.
    """
    ids = np.asarray(ids, dtype=np.uint64)
    if mod_bits < 64:
        ids = ids & np.uint64((1 << mod_bits) - 1)
    return ((ids * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def bottomk_sample(ds: "ray.data.Dataset", k: int,
                   strata_col: str = "source", id_col: str = "doc_id",
                   concurrency=(1, 8), batch_size: int = 8192,
                   num_partitions: int | None = None,
                   mod_bits: int = 64) -> "ray.data.Dataset":
    """Exactly-k uniform sample per stratum via distributed bottom-k:
    keep the k rows with the smallest hash(id) per stratum.

    min-k is a semilattice merge, so the per-batch pre-filter (a COMBINER
    that keeps at most k rows per stratum per batch) composes exactly with
    the per-stratum reduce — the shuffle carries at most k × #batches rows
    per stratum instead of the whole stratum. Deterministic (hash order,
    id tiebreak), so the sample is stable under reruns, repartitioning,
    and resume.

    ``mod_bits=64`` (default) uses the full 64-bit multiply — required
    for uniformity at scale: reducing the id first (small mod_bits) makes
    ids congruent mod 2^mod_bits hash IDENTICALLY, so strata larger than
    2^mod_bits rows would sample whole residue classes together instead
    of independent rows. Pass ``mod_bits=20`` only when a SQL engine
    must replay the rule in signed-BIGINT arithmetic (the driver oracle
    does; its test strata are far below 2^20 rows)."""
    import pyarrow as pa

    from ..core.hashing import add_bucket_column, quiet_ray_data_logs

    def keep_bottomk(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash_u32(df[id_col].to_numpy(),
                           mod_bits).astype(np.int64)
        df = df.assign(__h=h)
        return (df.sort_values(["__h", id_col], kind="stable")
                  .groupby(strata_col, sort=False).head(k))

    # plain task (not an actor pool): the combiner is stateless
    pre = ds.map_batches(keep_bottomk, batch_format="pandas",
                         batch_size=batch_size)
    add_b = add_bucket_column([strata_col], "__b", 256)

    def reduce_bottomk(g: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        return (g.sort_values(["__h", id_col], kind="stable")
                 .groupby(strata_col, sort=False).head(k)
                 .drop(columns=["__h", "__b"]))

    return (pre.map_batches(add_b, batch_format="pyarrow", batch_size=None)
            .groupby("__b", num_partitions=num_partitions)
            .map_groups(reduce_bottomk, batch_format="pandas"))


class HeavyHitterSketch:
    """Misra–Gries heavy-hitter COMBINER over word bigrams (one sketch per
    batch, capacity m): any item with global frequency > N/m survives every
    sketch it passes through, and merged sketch counts underestimate true
    counts by at most N/m (Misra & Gries 1982; merge rule per Agarwal et
    al. 2013 'Mergeable Summaries'). The shuffle carries at most m rows
    per batch regardless of corpus size — the bounded-memory alternative
    to exact ngram_counts when the ngram universe doesn't fit anywhere."""

    def __init__(self, m: int = 512, text_col: str = "text"):
        self.m = int(m)
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        vc = _doc_bigrams(df[self.text_col]).value_counts()
        # batch-local Misra-Gries: keep top-m, subtract the (m+1)-th count
        # (equivalent to decrementing all counters to zero simultaneously)
        if len(vc) > self.m:
            cut = int(vc.iloc[self.m])
            vc = (vc.iloc[:self.m] - cut)
            vc = vc[vc > 0]
        return pd.DataFrame({"ngram": vc.index.astype(str),
                             "cnt": vc.to_numpy(np.int64)})


def heavy_hitters(ds: "ray.data.Dataset", top_k: int = 20, m: int = 512,
                  text_col: str = "text", concurrency=(1, 8),
                  batch_size: int = 8192) -> "ray.data.Dataset":
    """Approximate global top-k bigrams with bounded memory everywhere:
    per-batch Misra-Gries sketches -> ngram-hash shuffle of (ngram,
    residual count) -> per-bucket sum -> global sort+limit. Counts are
    underestimates within N/m of truth; items with share > 1/m are
    guaranteed present."""
    from ..core.hashing import add_bucket_column, default_num_buckets

    nb = default_num_buckets()
    partial = ds.map_batches(task_stage(HeavyHitterSketch, m=m,
                                        text_col=text_col),
                             batch_format="pandas",
                             batch_size=batch_size)
    add_b = add_bucket_column(["ngram"], "__b", nb)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("ngram", as_index=False)["cnt"].sum()
        return agg.sort_values(["cnt", "ngram"], ascending=[False, True],
                               kind="stable").head(top_k)

    return (partial.map_batches(add_b, batch_format="pyarrow", batch_size=None)
            .groupby("__b").map_groups(bucket_sum, batch_format="pandas")
            .sort(["cnt", "ngram"], descending=[True, False])
            .limit(top_k))


def sample_quantiles(ds: "ray.data.Dataset", col: str, qs, k: int = 4096,
                     id_col: str | None = None,
                     batch_size: int = 65536) -> np.ndarray:
    """Approximate quantiles of ``col`` from a deterministic k-row uniform
    sample: keep the k rows with the smallest hash (hash of ``id_col`` if
    given, else of the value itself) — a bottom-k sample IS a uniform
    sample, min-k merges exactly, and the shuffle carries at most
    k rows per batch (same shape as bottomk_sample, global). Rank error
    is the binomial sqrt(q(1-q)/k) (~0.8% at k=4096, q=0.5) — the engine
    primitive behind percentile-based skew detection (the reference uses
    Spark percentile_approx for this, SkewDataFrameUtils.scala:26-65)."""
    import pyarrow as pa

    from ..core.hashing import quiet_ray_data_logs, stable_hash64

    key_col = id_col or col

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash64(df[key_col]).astype(np.uint64)
        df = df[[col]].assign(__h=h.astype(np.int64))
        return df.nsmallest(k, "__h", keep="first")

    def add_b(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        return t.replace_schema_metadata(None).append_column(
            "__b", pa.array(np.zeros(t.num_rows, np.int64)))

    def reduce_k(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(k, "__h", keep="first")[[col]]

    sample = (ds.map_batches(keep, batch_format="pandas", batch_size=batch_size)
              .map_batches(add_b, batch_format="pyarrow", batch_size=None)
              .groupby("__b").map_groups(reduce_k, batch_format="pandas")
              .to_pandas())[col].to_numpy(np.float64)
    return np.quantile(sample, np.asarray(qs, np.float64)) if len(sample) \
        else np.full(len(list(qs)), np.nan)


class _HllPartial:
    """Per-batch HyperLogLog registers (Flajolet et al. 2007): one
    2^p-byte register row per batch, so the merge moves KILOBYTES per
    batch regardless of input size. Registers are mergeable by
    element-wise max — the canonical mergeable summary."""

    def __init__(self, col: str, p: int = 12):
        self.col = col
        self.p = int(p)
        self.m = 1 << self.p

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        idx, rho = _hll_idx_rho(df[self.col], self.p)
        regs = np.zeros(self.m, np.uint8)
        np.maximum.at(regs, idx, rho)
        return pd.DataFrame({"__regs": [regs.tobytes()]})


def _hll_idx_rho(col, p: int):
    """(register index, rho) per value — the HLL hash decomposition."""
    from ..core.hashing import stable_hash64

    h = stable_hash64(col).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rho = position of the leftmost 1-bit in the remaining 64-p bits
    rho = np.zeros(len(h), np.uint8)
    if len(h):
        # count leading zeros via float64 exponent would lose precision
        # past 2^53; do it with a 6-step binary search, branch-free
        x = rest.copy()
        lz = np.zeros(len(h), np.uint64)
        for s in (32, 16, 8, 4, 2, 1):
            s64 = np.uint64(s)
            hi = x >> np.uint64(64 - s)
            zero = hi == 0
            lz = np.where(zero, lz + s64, lz)
            x = np.where(zero, x << s64, x)
        rho = (lz + 1).astype(np.uint8)
    return idx, rho


def _hll_estimate(regs: np.ndarray, m: int) -> float:
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:  # linear-counting small-range correction
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds: "ray.data.Dataset", col: str, p: int = 12,
                 batch_size: int = 65536) -> float:
    """Approximate COUNT(DISTINCT col) with bounded memory everywhere:
    per-batch HLL registers -> two-level max-merge (bucketed groupby, then
    a <=64-row driver fold) -> standard HLL estimator with the linear-
    counting small-range correction. Standard error ~ 1.04/sqrt(2^p)
    (~1.6% at p=12)."""
    import pyarrow as pa

    from ..core.hashing import quiet_ray_data_logs

    m = 1 << p
    partial = ds.map_batches(task_stage(_HllPartial, col=col, p=p),
                             batch_format="pandas",
                             batch_size=batch_size)

    def add_bucket(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        b = np.arange(t.num_rows, dtype=np.int64) % 64
        return t.replace_schema_metadata(None) \
                .append_column("__b", pa.array(b))

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, np.uint8)
        for buf in g["__regs"]:
            np.maximum(regs, np.frombuffer(buf, np.uint8), out=regs)
        return pd.DataFrame({"__regs": [regs.tobytes()]})

    rows = (partial.map_batches(add_bucket, batch_format="pyarrow",
                                batch_size=None)
            .groupby("__b").map_groups(merge_group, batch_format="pandas")
            .take_all())  # <= 64 tiny rows
    regs = np.zeros(m, np.uint8)
    for r in rows:
        np.maximum(regs, np.frombuffer(r["__regs"], np.uint8), out=regs)
    return _hll_estimate(regs, m)


def hll_by_key(ds: "ray.data.Dataset", col: str, key_col: str, *,
               p: int = 12, batch_size: int = 65536,
               num_partitions: int | None = None) -> "ray.data.Dataset":
    """Approximate COUNT(DISTINCT col) GROUP BY key — "distinct users per
    domain" at corpus scale with bounded memory: each batch emits ONE
    2^p-byte register row per key it contains (mergeable by element-wise
    max), one key groupby folds them and emits the per-key estimate.
    The shuffle carries #distinct-keys-per-batch x 2^p bytes instead of
    the raw values; pick p by the per-key error you need (sigma =
    1.04/sqrt(2^p): ~1.6% at p=12, 4 KB/row). Returns a Dataset
    ``(key_col, distinct_est)`` — keys may be many; nothing lands on the
    driver."""
    from ..core.grouping import map_groups_typed
    from ..core.hashing import quiet_ray_data_logs

    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        df = df[df[key_col].notna()]  # null keys: no group (SQL IN shape)
        keys = df[key_col].to_numpy()
        idx, rho = _hll_idx_rho(df[col], p)
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        bounds = np.flatnonzero(ks[1:] != ks[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(ks)]))
        out_k, out_r = [], []
        for s, e in zip(starts, ends):
            sel = order[s:e]
            regs = np.zeros(m, np.uint8)
            np.maximum.at(regs, idx[sel], rho[sel])
            out_k.append(ks[s])
            out_r.append(regs.tobytes())
        return pd.DataFrame({key_col: out_k, "__regs": out_r})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        regs = np.zeros(m, np.uint8)
        for buf in g["__regs"]:
            np.maximum(regs, np.frombuffer(buf, np.uint8), out=regs)
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "distinct_est": [_hll_estimate(regs, m)]})

    partials = ds.select_columns([key_col, col]).map_batches(
        partial, batch_format="pandas", batch_size=batch_size)
    return map_groups_typed(partials, key_col, merge,
                            num_partitions=num_partitions)


class StratumSampler:
    """Per-stratum deterministic hash sampling (domain mixing).

    ``rates`` is the broadcast small side ({stratum -> keep fraction}),
    pinned per actor. keep iff knuth_hash_u32(id) < rate * 2^32 — stable
    under reruns, resumable, and independent of row order / partitioning.
    """

    def __init__(self, rates: dict[str, float], strata_col: str = "source",
                 id_col: str = "doc_id", default_rate: float = 0.0,
                 mod_bits: int = 64):
        self.rates = dict(rates)
        self.strata_col = strata_col
        self.id_col = id_col
        self.default_rate = float(default_rate)
        self.mod_bits = mod_bits

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash_u32(df[self.id_col].to_numpy(), self.mod_bits)
        rates = df[self.strata_col].map(self.rates).fillna(self.default_rate) \
            .to_numpy(np.float64)
        thresh = (rates * float(1 << 32)).astype(np.uint64)
        return df[h.astype(np.uint64) < thresh]


def stratified_sample(ds: "ray.data.Dataset", rates: dict[str, float],
                      strata_col: str = "source", id_col: str = "doc_id",
                      default_rate: float = 0.0, mod_bits: int = 64,
                      concurrency=(1, 8), batch_size: int = 8192) -> "ray.data.Dataset":
    return ds.map_batches(task_stage(StratumSampler, rates=rates,
                                     strata_col=strata_col, id_col=id_col,
                                     default_rate=default_rate,
                                     mod_bits=mod_bits),
                          batch_format="pandas", batch_size=batch_size)


# --------------------------------------------------------------------------
# Fuzzy (near-duplicate) benchmark decontamination
# --------------------------------------------------------------------------

def _band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) polynomial band hashes over a MinHash signature matrix —
    the same wraparound polynomial as dedup.minhash_lsh_dedup, so both ops
    bucket identically."""
    n, num_perm = sigs.shape
    r = sigs.reshape(n, bands, num_perm // bands).astype(np.uint64)
    B = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        h = np.zeros((n, bands), np.uint64)
        for j in range(num_perm // bands):
            h = h * B + r[:, :, j]
    return h


class FuzzyNeedleFlagger:
    """Actor-pool stage: the needle-side MinHash band index is fetched ONCE
    per actor; each batch computes corpus signatures (one vectorized
    rolling-hash pass), probes the index per band (dict map over the batch
    column), and verifies every (row, needle) candidate pair with one
    vectorized component-agreement count — no per-row Python beyond the
    sparse candidate gather."""

    def __init__(self, ref, text_col: str, num_perm: int, bands: int,
                 shingle_k: int, need: int, seed: int):
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        import ray as _ray

        self.nsigs, self.index = _ray.get(ref)
        self.text_col = text_col
        self.num_perm, self.bands = num_perm, bands
        self.k, self.need, self.seed = shingle_k, need, seed

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import minhash_signatures

        out = df.copy()
        if len(df) == 0:
            out["contaminated"] = pd.Series([], dtype=bool)
            return out
        sigs = minhash_signatures(list(df[self.text_col]), self.num_perm,
                                  self.k, self.seed)
        bh = _band_hashes(sigs, self.bands)
        rows, needles = [], []
        for t in range(self.bands):
            hits = pd.Series(bh[:, t]).map(self.index[t])
            hit_rows = np.nonzero(hits.notna().to_numpy())[0]
            if len(hit_rows) == 0:
                continue
            cand = [hits.iloc[i] for i in hit_rows]
            rows.append(np.repeat(hit_rows,
                                  np.fromiter(map(len, cand), np.int64)))
            needles.append(np.concatenate(cand))
        flag = np.zeros(len(df), bool)
        if rows:
            pr = np.concatenate(rows)
            pn = np.concatenate(needles).astype(np.int64)
            pairs = np.unique(np.stack([pr, pn], axis=1), axis=0)
            agree = (sigs[pairs[:, 0]] == self.nsigs[pairs[:, 1]]).sum(axis=1)
            flag[np.unique(pairs[agree >= self.need, 0])] = True
        out["contaminated"] = flag
        return out


def fuzzy_decontaminate(ds: "ray.data.Dataset", needle_texts, *,
                        text_col: str = "text", num_perm: int = 64,
                        bands: int = 16, shingle_k: int = 5,
                        jaccard_threshold: float = 0.8, seed: int = 42,
                        keep_only: bool = True, concurrency=(1, 8),
                        batch_size: int = 4096) -> "ray.data.Dataset":
    """Cross-corpus NEAR-DUPLICATE decontamination: flag (or drop) every
    corpus document whose estimated Jaccard similarity to ANY needle
    document (benchmark/eval text) reaches the threshold — the fuzzy
    complement to ``decontaminate_bloom``'s exact n-gram overlap, catching
    lightly-edited eval leaks that exact n-grams miss.

    The needle side is tiny by contract (eval suites), so this is the
    broadcast shape: needle signatures + a per-band ``{band_hash:
    needle_rows}`` index are built once on the driver and shipped via
    ``ray.put``; the corpus streams through ONE shuffle-free actor-pool
    pass. Candidate generation is standard LSH banding (identical banding
    to minhash_lsh_dedup), verification is exact signature-component
    agreement >= ceil(threshold * num_perm)."""
    import ray as _ray

    texts = list(needle_texts)
    from .dedup import minhash_signatures

    nsigs = minhash_signatures(texts, num_perm, shingle_k, seed)
    nbh = _band_hashes(nsigs, bands)
    index: list[dict] = []
    for t in range(bands):
        d: dict = {}
        for row, h in enumerate(nbh[:, t]):
            d.setdefault(h, []).append(row)
        index.append({h: np.asarray(v, np.int64) for h, v in d.items()})
    ref = _ray.put((nsigs, index))
    need = int(np.ceil(jaccard_threshold * num_perm))
    flagged = ds.map_batches(
        task_stage(FuzzyNeedleFlagger, ref=ref, text_col=text_col,
                   num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                   need=need, seed=seed),
        batch_format="pandas", batch_size=batch_size)
    if not keep_only:
        return flagged
    import pyarrow as pa

    def drop(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(t["contaminated"])) \
                .drop_columns(["contaminated"])

    return flagged.map_batches(drop, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# Mixture resampling: derive per-stratum keep rates from TARGET proportions
# --------------------------------------------------------------------------

def mixture_thresholds(counts: dict, weights: dict,
                       mod_bits: int = 20) -> tuple[int, dict]:
    """Exact integer keep-thresholds that downsample strata to target
    mixture ``weights`` (the DoReMi / data-mixing reweight shape).

    Only strata present in BOTH ``counts`` and ``weights`` participate;
    W = sum of their weights.  The achievable output size is
    ``N = min_s floor(n_s * W / w_s)`` (the largest total for which no
    stratum must be upsampled).  A row is kept iff
    ``knuth_hash_u32(id) < thr_s`` with ``thr_s = ceil(N*w_s*2^32 /
    (W*n_s))`` — computed in arbitrary-precision Python ints, so the rule
    is EXACTLY ``h < N*w_s*2^32 / (W*n_s)`` with no float boundary, and a
    SQL engine replays it with the same integer ceil-division.
    Returns ``(N, {stratum: thr})``."""
    live = {s: (int(counts[s]), int(weights[s]))
            for s in weights if s in counts and counts[s] > 0
            and weights[s] > 0}
    if not live:
        return 0, {}
    W = sum(w for _, w in live.values())
    N = min(n * W // w for n, w in live.values())
    thr = {s: min((N * w * (1 << 32) + (W * n) - 1) // (W * n), 1 << 32)
           for s, (n, w) in live.items()}
    return N, thr


def mixture_sample(ds: "ray.data.Dataset", weights: dict,
                   strata_col: str = "source", id_col: str = "doc_id",
                   mod_bits: int = 20, concurrency=(1, 8),
                   batch_size: int = 8192) -> "ray.data.Dataset":
    """Deterministically downsample to target mixture proportions: one
    shuffle-free counting pass (per-batch value_counts partials summed on
    the driver — #strata rows, never data), exact integer thresholds via
    :func:`mixture_thresholds`, then the same broadcast hash filter as
    :func:`stratified_sample`.  Strata without a weight are dropped."""
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[strata_col].value_counts()
        return pd.DataFrame({"s": vc.index.to_numpy(), "n": vc.to_numpy()})

    parts = ds.select_columns([strata_col]) \
        .map_batches(count_partial, batch_format="pandas",
                     batch_size=None).to_pandas()
    counts = parts.groupby("s")["n"].sum().to_dict()
    _, thr = mixture_thresholds(counts, weights, mod_bits)

    class _MixFilter:
        def __init__(self):
            self.thr = thr

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            h = knuth_hash_u32(df[id_col].to_numpy(), mod_bits) \
                .astype(np.uint64)
            t = df[strata_col].map(self.thr).fillna(0).to_numpy(np.uint64)
            return df[h < t]

    return ds.map_batches(_MixFilter, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


def weighted_sample(ds: "ray.data.Dataset", k: int, weight_col: str,
                    id_col: str = "doc_id", key_col: str = "__ws_key"):
    """Exactly-k weighted sampling WITHOUT replacement (probability
    proportional to ``weight_col``), deterministic and distributed.

    Efraimidis–Spirakis A-ES keys: each row gets
    ``key = ln(u) / w`` with ``u = (knuth_hash_u32(id)+0.5) / 2^32`` —
    the k LARGEST keys are exactly a weight-proportional sample without
    replacement, and because u is a hash of the id the sample is stable
    under reruns, repartitioning and resume.  Selection reuses
    ``select.budget_select`` (sort-free order statistics), so no global
    sort and no driver materialization.  Rows with null or non-positive
    weight are never selected.  The key column is dropped from the
    output."""
    from .select import budget_select

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        w = df[weight_col].to_numpy(np.float64)
        u = (knuth_hash_u32(df[id_col].to_numpy()).astype(np.float64)
             + 0.5) / float(1 << 32)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.log(u) / w
        key[~(w > 0)] = np.nan          # null/zero/negative: never sampled
        df[key_col] = key
        return df

    keyed = ds.map_batches(add_key, batch_format="pandas",
                           batch_size=8192)
    out = budget_select(keyed, key_col, budget=k, id_col=id_col,
                        materialize_narrow=True)
    return out.drop_columns([key_col])


def keyed_threshold_filter(ds: "ray.data.Dataset", key_col: str,
                           value_col: str, *, agg: str = "mean",
                           threshold: float, op: str = ">=",
                           num_buckets: int = 256,
                           num_partitions: int | None = None):
    """Two-pass group-level filtering — the RefinedWeb / C4 "drop bad
    DOMAINS, not bad documents" shape: keep every row whose ``key_col``
    group's aggregate of ``value_col`` clears ``threshold``.

    Pass 1 computes the per-key aggregate with a per-block COMBINER
    (each block emits at most #distinct-keys-in-block narrow partial
    rows: sum/count/min/max — all mergeable), folded by one coarse
    key-hash shuffle; integer sums stay int64 so ``mean`` is (exact
    integer sum)/count — bit-identical to a SQL engine's AVG. Pass 2
    hands the (small) passing-key set to :func:`semijoin.semi_join`,
    which broadcasts it below its limit or co-shuffles above — millions
    of web domains never land on the driver.

    SQL equivalent (the oracle):
    ``WHERE key IN (SELECT key FROM t GROUP BY key HAVING agg(v) >= thr)``.
    Null values are excluded from the aggregate (SQL semantics); keys
    whose values are all null never pass.
    """
    from ..core.grouping import map_groups_typed
    from ..core.hashing import bucket_ids, quiet_ray_data_logs
    from .semijoin import semi_join

    if agg not in ("mean", "sum", "count", "min", "max"):
        raise ValueError(f"unsupported agg {agg!r}")
    if op not in (">=", ">", "<=", "<"):
        raise ValueError(f"unsupported op {op!r}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        v = pd.to_numeric(df[value_col], errors="coerce")
        g = pd.DataFrame({key_col: df[key_col], "v": v}).groupby(
            key_col, dropna=True, sort=False)["v"]
        out = pd.DataFrame({"s": g.sum(), "c": g.count(),
                            "mn": g.min(), "mx": g.max()}).reset_index()
        out["__kb"] = bucket_ids(out, [key_col], num_buckets)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        f = g.groupby(key_col, sort=False).agg(
            s=("s", "sum"), c=("c", "sum"), mn=("mn", "min"),
            mx=("mx", "max")).reset_index()
        f = f[f["c"] > 0]
        if agg == "mean":
            val = f["s"].to_numpy(np.float64) / f["c"].to_numpy(np.float64)
        elif agg == "sum":
            val = f["s"].to_numpy()
        elif agg == "count":
            val = f["c"].to_numpy()
        elif agg == "min":
            val = f["mn"].to_numpy()
        else:
            val = f["mx"].to_numpy()
        keep = {"<": val < threshold, "<=": val <= threshold,
                ">": val > threshold, ">=": val >= threshold}[op]
        return f.loc[keep, [key_col]]

    partials = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pandas", batch_size=None)
    # materialize the passing-key table (it is #passing-keys rows — the
    # small side by contract): semi_join's auto strategy counts it and
    # its broadcast path reads it, which would otherwise re-run the
    # combiner + fold shuffle twice
    passing = map_groups_typed(partials, "__kb", fold,
                               num_partitions=num_partitions).materialize()
    return semi_join(ds, passing, key_col)


def hash_split(ds: "ray.data.Dataset", fractions: dict[str, float],
               id_col: str = "doc_id", *, split_col: str = "split",
               mod_bits: int = 20):
    """Deterministic train/val/test assignment by an integer-exact hash
    rule — stable under reruns, repartitioning and resume, and replayable
    bit-for-bit by a SQL engine (the same knuth-multiply rule
    mixture_sample's oracle replays).

    Each row lands in the split whose cumulative-fraction interval
    contains ``knuth_hash_u32(id)``; interval edges are exact integers
    ``floor(cum_frac * 2^32)``. One shuffle-free streaming pass appending
    one column. Fractions must sum to 1 (±1e-9); iteration order of
    ``fractions`` fixes the interval order."""
    names = list(fractions)
    fr = np.array([fractions[n] for n in names], np.float64)
    if (fr < 0).any() or abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError("fractions must be >= 0 and sum to 1")
    edges = np.floor(np.cumsum(fr) * float(1 << 32)).astype(np.uint64)
    edges[-1] = np.uint64(1 << 32)  # guard the last interval exactly
    labels = np.array(names, dtype=object)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = knuth_hash_u32(df[id_col].to_numpy(),
                           mod_bits=mod_bits).astype(np.uint64)
        df[split_col] = labels[np.searchsorted(edges, h, side="right")]
        return df

    return ds.map_batches(assign, batch_format="pandas", batch_size=None)
