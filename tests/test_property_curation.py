"""Randomized cross-engine property tests for the curation stages: seeded
synthetic texts (messy whitespace, digits, punctuation, planted PII) run
through the pandas kernels and compared field-by-field against the SAME
rules replayed in DuckDB SQL — the generalized form of the driver's
oracle gate over adversarial inputs the sf corpus doesn't contain."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from openmldb_ray.stages.curation import (
    PiiRedactor,
    QualityRules,
    RepetitionStats,
)

WORDS = ["the", "a", "of", "to", "and", "in", "table", "window", "scan",
         "merge", "data", "42", "3.14", "x", "zz", "hash", "...", "-",
         "Word", "UPPER", "mixedCase9"]


def make_texts(seed: int, n: int = 120) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 60))
        ws = list(rng.choice(WORDS, size=k))
        sep = rng.choice([" ", "  ", " \t ", "   "], size=max(k - 1, 0))
        t = "".join(w + (s if j < len(sep) else "")
                    for j, (w, s) in enumerate(zip(ws, list(sep) + [" "])))
        if rng.random() < 0.2:
            t = "  " + t + "   "
        if rng.random() < 0.15:
            t += f" mail{i}@ex{i % 7}.org"
        if rng.random() < 0.1:
            t += f" at 10.{i % 256}.0.{(i * 7) % 256}"
        if rng.random() < 0.1:
            t += " call 555-000-1234"
        texts.append(t)
    texts[0] = ""        # empty
    texts[1] = "   "     # whitespace-only
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_quality_rules_vs_duckdb(seed):
    df = make_texts(seed)
    got = QualityRules(min_words=5)(df.copy())
    con = duckdb.connect()
    con.register("documents", df)
    sql = r"""
        SELECT doc_id, n_words,
               length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                   / GREATEST(n_words, 1) AS mean_word_len,
               len(list_filter(words,
                   w -> w IN ('the','a','of','to','and','in'))) AS stopword_hits,
               len(list_filter(words,
                   w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                   / GREATEST(n_words, 1) AS alpha_frac
        FROM (SELECT doc_id, text, words,
                     CASE WHEN trim(text) = '' THEN 0 ELSE len(words) END AS n_words
              FROM (SELECT doc_id, text,
                           regexp_split_to_array(trim(text), '\s+') AS words
                    FROM documents) t0) t1
        ORDER BY doc_id
    """
    want = con.execute(sql).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(got["n_words"].to_numpy(np.int64),
                                  want["n_words"].to_numpy(np.int64))
    np.testing.assert_array_equal(got["stopword_hits"].to_numpy(np.int64),
                                  want["stopword_hits"].to_numpy(np.int64))
    np.testing.assert_allclose(got["mean_word_len"], want["mean_word_len"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(got["alpha_frac"], want["alpha_frac"],
                               rtol=0, atol=0)


@pytest.mark.parametrize("seed", [201, 202, 203])
def test_pii_redactor_vs_duckdb(seed):
    df = make_texts(seed)
    got = PiiRedactor()(df.copy()).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    sql = r"""
        WITH s1 AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                     AS n_emails,
                 regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '[EMAIL]', 'g') AS t1
          FROM documents),
        s2 AS (
          SELECT doc_id, n_emails,
                 CAST(len(regexp_extract_all(t1,
                      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
                 regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                                '[IP]', 'g') AS t2
          FROM s1)
        SELECT doc_id, n_emails, n_ips,
               CAST(len(regexp_extract_all(t2,
                    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
               regexp_replace(t2, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b',
                              '[PHONE]', 'g') AS text_redacted
        FROM s2 ORDER BY doc_id
    """
    want = con.execute(sql).df()
    for c in ("n_emails", "n_ips", "n_phones"):
        np.testing.assert_array_equal(got[c].to_numpy(np.int64),
                                      want[c].to_numpy(np.int64), err_msg=c)
    assert got["text_redacted"].tolist() == want["text_redacted"].tolist()


@pytest.mark.parametrize("seed", [301, 302])
def test_repetition_stats_vs_duckdb(seed):
    df = make_texts(seed)
    got = RepetitionStats()(df.copy()).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    sql = r"""
        WITH ws AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents
        ), words AS (
          SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS i FROM ws
        ), grams AS (
          SELECT a.doc_id, a.tok || ' ' || b.tok AS g
          FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        ), gcnt AS (
          SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
        ), gtot AS (
          SELECT doc_id, MAX(c) AS m, SUM(c) AS t FROM gcnt GROUP BY doc_id
        )
        SELECT ws.doc_id,
               CASE WHEN len(w) > 0 AND NOT (len(w) = 1 AND w[1] = '')
                    THEN 1 - len(list_distinct(w))::DOUBLE / len(w)
                    ELSE 0 END AS dup_word_frac,
               COALESCE(gtot.m::DOUBLE / gtot.t, 0) AS top_bigram_frac
        FROM ws LEFT JOIN gtot ON ws.doc_id = gtot.doc_id
        ORDER BY ws.doc_id
    """
    want = con.execute(sql).df()
    np.testing.assert_allclose(got["dup_word_frac"], want["dup_word_frac"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(got["top_bigram_frac"], want["top_bigram_frac"],
                               rtol=0, atol=0)
