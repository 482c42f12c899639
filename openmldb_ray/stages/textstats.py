"""Text analysis stages for training-data curation (north-rule extension).

All stages are actor-pool ``map_batches`` over pandas batches: regexes and
frequency tables compile once per actor in ``__init__``, per-batch work is
vectorized pandas string ops. At 100 TB these run embarrassingly parallel —
no shuffle anywhere.
"""

from __future__ import annotations

import hashlib
import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

# Tiny per-language stopword/character profiles for the n-gram heuristic
# language ID (public knowledge; deliberately dependency-free).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"},
    "fr": {"le", "la", "les", "et", "des", "est", "un", "une", "que", "dans"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "per", "non", "sono"},
}

_STOPWORDS_EN = _LANG_PROFILES["en"] | {"a", "an", "on", "at", "as", "by", "be", "are"}


class TextQuality:
    """Quality scoring: length, punctuation/digit/upper ratios, stopword
    ratio, mean word length — the standard cheap quality heuristics."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[A-Za-z']+")
        self.punct_re = re.compile(r"[^\w\s]")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # null text is EMPTY text, not the literal 'None' (library
        # convention) — a null doc must score 0 chars / 0 words, not 4/1
        s = df[self.text_col].fillna("").astype(str).reset_index(drop=True)
        n_chars = s.str.len().to_numpy(np.int64)
        # vectorized word stats (r4, VERDICT "wrong #4"): the per-row
        # Python lambdas are gone — n_words/word lengths come from one
        # findall + Series.str.len, mean word length from a char-class
        # count (every [A-Za-z'] char is inside some "[A-Za-z']+" match,
        # so word_chars / n_words == the old per-row np.mean exactly),
        # and stopword hits from one explode + isin + level-0 sum
        words = s.str.findall(self.word_re)
        n_words = words.str.len().to_numpy(np.int64)
        word_chars = s.str.count(r"[A-Za-z']").to_numpy(np.int64)
        df["q_n_chars"] = n_chars
        df["q_n_words"] = n_words
        df["q_punct_ratio"] = s.str.count(self.punct_re).to_numpy(float) / np.maximum(n_chars, 1)
        df["q_digit_ratio"] = s.str.count(r"\d").to_numpy(float) / np.maximum(n_chars, 1)
        df["q_upper_ratio"] = s.str.count(r"[A-Z]").to_numpy(float) / np.maximum(n_chars, 1)
        df["q_mean_word_len"] = np.where(
            n_words > 0, word_chars / np.maximum(n_words, 1), 0.0)
        ex = words.explode().dropna()
        if len(ex):
            hits = ex.str.lower().isin(_STOPWORDS_EN).groupby(level=0).sum()
            hits = hits.reindex(pd.RangeIndex(len(s)),
                                fill_value=0).to_numpy(np.int64)
        else:
            hits = np.zeros(len(s), dtype=np.int64)
        df["q_stopword_ratio"] = hits / np.maximum(n_words, 1)
        return df


class LangId:
    """Stopword-profile language ID heuristic (n-gram-free but same spirit:
    score = fraction of tokens hitting each language's top-word profile).

    ``model_path`` loads custom profiles ONCE PER ACTOR (the actor-pool
    contract: pass LangId as a class to ``map_batches(LangId,
    fn_constructor_kwargs=..., concurrency=...)`` so the load happens in
    ``__init__``, never per batch). The file format is JSON
    ``{lang: [words...]}`` — a stand-in for a fasttext-style model file
    (the real fasttext lib is not in this sandbox; the load-once plumbing,
    fallback, and per-batch vectorized scoring are identical). A missing or
    unreadable file falls back to the built-in heuristic profiles."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred",
                 model_path: str | None = None):
        self.text_col = text_col
        self.out_col = out_col
        profiles = _LANG_PROFILES
        if model_path is not None:
            import json
            import os

            if os.path.isfile(model_path):
                try:
                    loaded = json.load(open(model_path))
                    profiles = {str(k): [str(w).lower() for w in v]
                                for k, v in loaded.items() if v}
                except (ValueError, TypeError, OSError):
                    pass  # unreadable model → heuristic fallback
        self.profiles = {k: frozenset(v) for k, v in profiles.items()}

    def classify(self, text: str) -> str:
        return self._classify_frame(pd.Series([text], dtype=object))[0]

    def _classify_frame(self, s: pd.Series) -> np.ndarray:
        """Vectorized: explode tokens once, one isin per language profile,
        groupby-sum back — no per-row Python loop."""
        toks = s.fillna("").astype(str).str.lower().str.split()
        n_tok = toks.map(len).to_numpy(np.float64)
        ex = toks.explode()
        idx = pd.RangeIndex(len(s))
        scores = np.zeros((len(s), len(self.profiles)))
        for j, words in enumerate(self.profiles.values()):
            hits = ex.isin(words).groupby(level=0).sum()
            scores[:, j] = hits.reindex(idx, fill_value=0).to_numpy(np.float64) \
                / np.maximum(n_tok, 1.0)
        langs = np.array(list(self.profiles), dtype=object)
        # strict > keeps the first profile on ties, matching dict order
        return np.where(scores.max(axis=1) > 0.02,
                        langs[scores.argmax(axis=1)], "unk")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[self.out_col] = self._classify_frame(
            df[self.text_col].reset_index(drop=True))
        return df


class TokenCounter:
    """Token counting: whitespace tokens plus a BPE-ish regex token count
    (GPT-2-style pretokenizer pattern, public)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bpe_re = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?\d+| ?[^\sA-Za-z\d]+|\s+(?!\S)|\s+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df[self.text_col].fillna("").astype(str)
        # match counts instead of findall-materialized lists (r4): same
        # values, no per-row Python list building
        df["n_ws_tokens"] = s.str.count(r"\S+").to_numpy(np.int64)
        df["n_bpe_tokens"] = s.str.count(self.bpe_re).to_numpy(np.int64)
        return df


class Fingerprinter:
    """Document fingerprinting: 64-bit content hash + winnowed rolling-hash
    k-gram fingerprint set hash (MOSS-style winnowing, public algorithm)."""

    def __init__(self, text_col: str = "text", k: int = 7, window: int = 4):
        self.text_col = text_col
        self.k = k
        self.window = window

    def fingerprint(self, text: str) -> tuple[int, int]:
        from .dedup import _txt, rolling_hashes

        t = " ".join(_txt(text).lower().split()).encode("utf-8", "ignore")
        content = int.from_bytes(
            hashlib.blake2b(t, digest_size=8).digest(), "big") >> 1
        if len(t) <= self.k:
            return content, content
        # k-gram hashes via the vectorized rolling polynomial (one batch of
        # uint64 ops per doc — no per-k-gram Python hashing)
        hashes = (rolling_hashes(t, self.k) >> np.uint64(1)).astype(np.int64)
        # winnowing: min hash per sliding window of k-gram hashes
        w = min(self.window, len(hashes))
        mins = pd.Series(hashes).rolling(w, min_periods=1).min().to_numpy(np.int64)[w - 1:]
        selected = np.unique(mins)
        combined = int.from_bytes(
            hashlib.blake2b(selected.tobytes(), digest_size=8).digest(), "big") >> 1
        return content, combined

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        pairs = [self.fingerprint(t) for t in df[self.text_col]]
        df["content_hash"] = np.asarray([p[0] for p in pairs], dtype=np.int64)
        df["winnow_hash"] = np.asarray([p[1] for p in pairs], dtype=np.int64)
        return df


class HashEmbedder:
    """Feature-hashing bag-of-words embedding (the 'hashing trick',
    Weinberger et al. 2009): word w contributes sign(h(w)) at index
    h(w) mod dim; the vector is L2-normalized. Deterministic, vocabulary-
    free, and vectorized (one explode + one hash call + one np.add.at per
    batch) — the stand-in embedding stage that lets text flow into the
    embedding ops (knn/embedding_dedup) when no model embeddings exist."""

    def __init__(self, dim: int = 64, text_col: str = "text",
                 out_col: str = "embedding"):
        self.dim = int(dim)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import stable_hash64

        df = df.copy()
        words = df[self.text_col].fillna("").astype(str).str.lower().str.split()
        ex = words.reset_index(drop=True).explode().dropna()
        vecs = np.zeros((len(df), self.dim), np.float64)
        if len(ex):
            h = stable_hash64(ex.astype(str))
            idx = (h % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            rows = ex.index.to_numpy(np.int64)
            np.add.at(vecs, (rows, idx), sign)
        norm = np.linalg.norm(vecs, axis=1)
        vecs = vecs / np.maximum(norm, 1e-12)[:, None]
        df[self.out_col] = [v.astype(np.float32) for v in vecs]
        return df


def hash_embed(ds: "ray.data.Dataset", dim: int = 64, text_col: str = "text",
               concurrency=(1, 8), batch_size: int = 4096) -> "ray.data.Dataset":
    return ds.map_batches(HashEmbedder, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(dim=dim, text_col=text_col))


def text_stats(ds: "ray.data.Dataset", text_col: str = "text",
               concurrency=(1, 8), batch_size: int = 4096) -> "ray.data.Dataset":
    """Convenience: quality + token counts in one actor-pool pass."""
    ds = ds.map_batches(TextQuality, batch_format="pandas", batch_size=batch_size,
                        fn_constructor_kwargs=dict(text_col=text_col),
                        concurrency=concurrency)
    return ds.map_batches(TokenCounter, batch_format="pandas", batch_size=batch_size,
                          fn_constructor_kwargs=dict(text_col=text_col),
                          concurrency=concurrency)


# --------------------------------------------------------------------------
# TF-IDF top terms
# --------------------------------------------------------------------------

class _DfCountPartial:
    """Per-batch combiner for document-frequency counts: each word counted
    AT MOST ONCE per doc (drop_duplicates), plus a sentinel row carrying
    the batch's count of docs with >= 1 word, so N rides the same shuffle."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs
        from .lm import _explode_words

        quiet_ray_data_logs()
        ex = _explode_words(df[self.text_col])
        t = pd.DataFrame({"i": ex.index.to_numpy(), "w": ex.to_numpy()})
        dfreq = t.drop_duplicates().groupby("w", as_index=False).size()
        n_docs = t["i"].nunique()
        return pd.DataFrame({
            "w": np.concatenate([dfreq["w"].to_numpy(dtype=object),
                                 np.array(["\x00docs"], dtype=object)]),
            "cnt": np.concatenate([dfreq["size"].to_numpy(np.int64),
                                   [np.int64(n_docs)]]),
        })


class TfIdfScorer:
    """Actor-pool scoring stage: (df table, N) fetched once per actor;
    per batch: explode words, tf via one C-level groupby size, score =
    tf * ln(N/df), per-doc top-k by (score DESC, term ASC)."""

    def __init__(self, ref, text_col: str, id_col: str, top_k: int):
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        import ray as _ray

        self.dfc, self.n_docs = _ray.get(ref)
        self.text_col, self.id_col, self.top_k = text_col, id_col, top_k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .lm import _explode_words

        idc = self.id_col
        # keep the INPUT id dtype on the empty path (same class as the
        # LmScorer fix): a hardcoded int64 here conflicts with string ids
        # when a batch holds only empty/whitespace docs
        empty = pd.DataFrame({idc: pd.Series([], dtype=df[idc].dtype),
                              "term": pd.Series([], dtype="string"),
                              "tfidf": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        ex = _explode_words(df[self.text_col])
        if len(ex) == 0:
            return empty
        t = pd.DataFrame({"i": ex.index.to_numpy(), "w": ex.to_numpy()})
        tf = t.groupby(["i", "w"], as_index=False).size()
        dfreq = tf["w"].map(self.dfc).to_numpy(np.float64)
        # words unseen at DF time (scoring foreign data) get df=1
        dfreq = np.nan_to_num(dfreq, nan=1.0)
        tf["tfidf"] = tf["size"].to_numpy(np.float64) * \
            np.log(self.n_docs / dfreq)
        tf = tf.sort_values(["i", "tfidf", "w"],
                            ascending=[True, False, True], kind="stable") \
            .groupby("i", sort=False).head(self.top_k)
        ids = df[idc].to_numpy()
        return pd.DataFrame({idc: ids[tf["i"].to_numpy()],
                             "term": tf["w"].to_numpy(),
                             "tfidf": tf["tfidf"].to_numpy()})


def tfidf_top_terms(ds: "ray.data.Dataset", *, text_col: str = "text",
                    id_col: str = "doc_id", top_k: int = 3,
                    num_buckets: int | None = None,
                    concurrency=(1, 8), batch_size: int = 4096
                    ) -> "ray.data.Dataset":
    """Per-document top-k terms by TF-IDF, score = tf * ln(N/df).

    Document-frequency counts are distributed (per-batch distinct-(doc,
    word) combiner -> word-hash shuffle -> per-bucket sum — the shuffle
    carries DISTINCT-word partials), then the df table is collected once
    (a vocabulary fits one worker by the same contract as the LM /
    compact_vocab broadcast) and shipped via ray.put to a shuffle-free
    actor-pool scoring pass."""
    import ray as _ray

    from ..core.hashing import add_bucket_column, default_num_buckets

    nb = num_buckets or default_num_buckets()
    partial = ds.map_batches(_DfCountPartial, batch_format="pandas",
                             batch_size=batch_size, concurrency=concurrency,
                             fn_constructor_kwargs=dict(text_col=text_col))
    add_b = add_bucket_column(["w"], "__b", nb)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", as_index=False)["cnt"].sum()

    counts = (partial.map_batches(add_b, batch_format="pyarrow",
                                  batch_size=None)
              .groupby("__b").map_groups(bucket_sum, batch_format="pandas")
              ).to_pandas()
    n_docs = float(counts.loc[counts["w"] == "\x00docs", "cnt"].sum())
    dfc = counts[counts["w"] != "\x00docs"]
    ref = _ray.put((dict(zip(dfc["w"], dfc["cnt"].astype(np.int64))), n_docs))
    return ds.map_batches(TfIdfScorer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              ref=ref, text_col=text_col, id_col=id_col,
                              top_k=top_k))


class CompressionRatio:
    """Per-document zlib deflate ratio — the classic cheap redundancy
    signal (Gopher/RefinedWeb-style rules drop pages whose text compresses
    far below prose: boilerplate, keyword stuffing, templated spam).

    ratio = len(zlib.compress(utf8)) / len(utf8); null/empty text scores
    1.0 by convention (incompressible), so it never trips a low-ratio
    "too repetitive" filter. zlib is stdlib C — the per-doc loop body is
    one C call, the same per-doc shape as the BPE token counter."""

    def __init__(self, text_col: str = "text",
                 out_col: str = "q_compress_ratio", level: int = 6):
        import zlib

        self.text_col, self.out_col = text_col, out_col
        self.level = level
        self._compress = zlib.compress

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df[self.text_col].fillna("").astype(str)
        lvl, comp = self.level, self._compress
        df[self.out_col] = np.array(
            [len(comp(b, lvl)) / len(b) if b else 1.0
             for b in (t.encode("utf-8") for t in s)],
            dtype=np.float64)
        return df


def compression_ratio(ds: "ray.data.Dataset", text_col: str = "text", *,
                      out_col: str = "q_compress_ratio", level: int = 6,
                      concurrency=(1, 8),
                      batch_size: int = 4096) -> "ray.data.Dataset":
    """Append the zlib compression-ratio quality column (shuffle-free)."""
    return ds.map_batches(CompressionRatio, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              text_col=text_col, out_col=out_col,
                              level=level))


#: (pattern, replacement, is_regex) pipeline of html_to_text — declared
#: once so the DuckDB oracle can replay the IDENTICAL sequence (all
#: patterns are RE2-compatible: no backreferences, non-greedy allowed)
HTML_STRIP_STEPS: list[tuple[str, str, bool]] = [
    (r"(?is)<script[^>]*>.*?</script\s*>", " ", True),
    (r"(?is)<style[^>]*>.*?</style\s*>", " ", True),
    (r"(?s)<!--.*?-->", " ", True),
    (r"(?s)<[^>]+>", " ", True),
    # entity subset with &amp; LAST so "&amp;lt;" decodes to "&lt;"
    # (double-encoded stays encoded once — standard single-pass decode)
    ("&lt;", "<", False),
    ("&gt;", ">", False),
    ("&quot;", '"', False),
    ("&#39;", "'", False),
    ("&nbsp;", " ", False),
    ("&amp;", "&", False),
    (r"\s+", " ", True),
]


def html_to_text(ds: "ray.data.Dataset", text_col: str = "text", *,
                 out_col: str | None = None,
                 batch_size: int | None = None):
    """HTML → plain text, the first pass of every web-scrape curation
    pipeline (C4/CCNet/RefinedWeb operate on extracted text): drop
    <script>/<style> blocks and comments, strip all tags, decode the
    common entities (&lt; &gt; &quot; &#39; &nbsp; &amp; — amp last, so
    double-encoded text decodes exactly once), collapse whitespace.

    One shuffle-free streaming pass of vectorized pandas str kernels.
    The step sequence is declared in :data:`HTML_STRIP_STEPS` with
    RE2-compatible patterns, so a SQL engine replays it verbatim as a
    regexp_replace/replace chain — the driver oracle does exactly that.
    Boilerplate-aware extraction (readability scoring, main-content
    detection) is a model decision layered on top; this is the
    deterministic mechanical layer. Writes ``out_col`` (default: in
    place)."""
    out_col = out_col or text_col

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        df = df.copy()
        s = df[text_col].fillna("").astype(str)  # nulls -> "" not "None"
        for pat, rep, is_re in HTML_STRIP_STEPS:
            s = s.str.replace(pat, rep, regex=is_re)
        df[out_col] = s.str.strip()
        return df

    return ds.map_batches(strip, batch_format="pandas",
                          batch_size=batch_size)


def normalize_text(ds: "ray.data.Dataset", text_col: str = "text", *,
                   lowercase: bool = True, collapse_ws: bool = True,
                   strip_punct: bool = False, nfkc: bool = False,
                   out_col: str | None = None,
                   batch_size: int | None = None):
    """Canonical text normalization — the pass every dedup/decontamination
    pipeline runs FIRST so that trivial variants ("Hello  World!" vs
    "hello world") hash identically (CCNet normalizes before line dedup,
    Lee et al. 2021 before suffix-array dedup).

    One shuffle-free streaming pass of vectorized pandas str kernels:
    optional lowercase, Unicode NFKC folding, punctuation strip
    (everything outside [\\w\\s]), and whitespace collapse (runs -> one
    space, ends trimmed) — applied in that order. All steps except
    ``nfkc`` are SQL-replayable (lower + regexp_replace), which is what
    the driver oracle checks; NFKC is exposed because real corpora need
    it but is off by default. Writes ``out_col`` (default: in place)."""
    out_col = out_col or text_col

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        df = df.copy()
        s = df[text_col].fillna("").astype(str)  # nulls -> "" not "None"
        if lowercase:
            s = s.str.lower()
        if nfkc:
            s = s.str.normalize("NFKC")
        if strip_punct:
            s = s.str.replace(r"[^\w\s]", " ", regex=True)
        if collapse_ws:
            s = s.str.replace(r"\s+", " ", regex=True).str.strip()
        df[out_col] = s
        return df

    return ds.map_batches(norm, batch_format="pandas",
                          batch_size=batch_size)
