"""Curation stages (round 3): quality rules, PII redaction,
decontamination, stratified sampling. DuckDB parity for the SQL-replayable
rules is enforced by the driver oracle entries; these tests pin semantics
and edge cases."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from openmldb_ray.stages.curation import (
    HeavyHitterSketch,
    NeedleFilter,
    PiiRedactor,
    QualityRules,
    RepetitionStats,
    StratumSampler,
    _doc_bigrams,
    bottomk_sample,
    decontaminate,
    heavy_hitters,
    knuth_hash_u32,
    ngram_counts,
    pii_redact,
    quality_filter,
    stratified_sample,
)


def test_quality_rules_boundaries():
    rules = QualityRules(min_words=3, min_stopword_hits=1)
    df = pd.DataFrame({"text": [
        "the cats rest inside a barn",   # keep
        "a b",                           # too few words
        "wow zap pow bam",               # no stopwords
        "the aaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbb ccccccccccccccccc",  # mean_word_len > 10
        "  the   spaced   out   text  ",  # \s+ splitting, trim
        "the 123 456 789 000 111",       # alpha_frac 1/6 < 0.8
    ]})
    out = rules(df)
    assert out["keep"].tolist() == [True, False, False, False, True, False]
    assert out["n_words"].tolist() == [6, 2, 4, 4, 4, 6]
    assert out["stopword_hits"].tolist() == [2, 1, 0, 1, 1, 1]
    # mean word length counts non-space chars only
    assert out["mean_word_len"].iloc[4] == pytest.approx(len("thespacedouttext") / 4)


def test_quality_filter_dataset(ray_session):
    ds = rd.from_items([{"doc_id": i,
                         "text": "the value of a row in the table " * (1 + i % 3)}
                        for i in range(20)])
    kept = quality_filter(ds, min_words=10).to_pandas()
    # 8-word base text: only the x2 / x3 repeats clear min_words=10
    assert set(kept["doc_id"]) == {i for i in range(20) if i % 3 != 0}
    scored = quality_filter(ds, keep_only=False, min_words=10).to_pandas()
    assert len(scored) == 20 and {"n_words", "keep"} <= set(scored.columns)


def test_pii_redactor_counts_and_text():
    r = PiiRedactor()
    df = pd.DataFrame({"text": [
        "mail a.b-c_d%x+1@sub.example.co.uk now",
        "server at 10.0.255.3 and 192.168.1.17, call 555-123-4567 or 800 555 1234",
        "no pii here",
        "double x@y.io z@w.ai",
    ]})
    out = r(df)
    assert out["n_emails"].tolist() == [1, 0, 0, 2]
    assert out["n_ips"].tolist() == [0, 2, 0, 0]
    assert out["n_phones"].tolist() == [0, 2, 0, 0]
    assert out["text_redacted"].iloc[0] == "mail [EMAIL] now"
    assert out["text_redacted"].iloc[1] == \
        "server at [IP] and [IP], call [PHONE] or [PHONE]"
    assert out["text_redacted"].iloc[2] == "no pii here"


def test_pii_redact_dataset(ray_session):
    ds = rd.from_items([{"doc_id": 1, "text": "write to me@example.com"}])
    out = pii_redact(ds).to_pandas()
    assert out["text_redacted"].iloc[0] == "write to [EMAIL]"
    assert out["n_emails"].iloc[0] == 1


def test_needle_filter_modes():
    texts = pd.DataFrame({"text": ["alpha beta gamma", "delta epsilon", "zeta"]})
    # few needles: per-needle contains path
    few = NeedleFilter(["beta", "zeta"])(texts)
    assert few["contaminated"].tolist() == [True, False, True]
    # many needles (>8): compiled alternation path, regex chars escaped
    many = NeedleFilter([f"x{i}" for i in range(8)] + ["eps.lon", "alpha b"])(texts)
    assert many["contaminated"].tolist() == [True, False, False]  # 'eps.lon' is literal
    # empty needle list: nothing contaminated
    none = NeedleFilter([])(texts)
    assert not none["contaminated"].any()


def test_decontaminate_dataset(ray_session):
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(
        ["clean text one", "contains the secret benchmark prompt", "clean two"])])
    out = decontaminate(ds, ["secret benchmark"]).to_pandas()
    assert set(out["doc_id"]) == {0, 2}
    assert "contaminated" not in out.columns


def test_knuth_hash_variants():
    ids = np.arange(10_000, dtype=np.int64)
    full = knuth_hash_u32(ids)
    assert full.dtype == np.uint32
    # 20-bit variant agrees with full for ids < 2^20 (low bits untouched)
    assert np.array_equal(full, knuth_hash_u32(ids, mod_bits=20))
    # roughly uniform: half below 2^31 within 3%
    assert abs((full < 2**31).mean() - 0.5) < 0.03
    # wrap-around multiply never raises for huge ids
    big = knuth_hash_u32(np.array([2**62, 2**63 - 1], dtype=np.uint64))
    assert big.shape == (2,)


def test_stratified_sample_deterministic(ray_session):
    rows = [{"doc_id": i, "source": f"src{i % 4}"} for i in range(4000)]
    ds = rd.from_items(rows)
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out1 = stratified_sample(ds, rates, default_rate=0.25).to_pandas()
    out2 = stratified_sample(ds, rates, default_rate=0.25).to_pandas()
    # deterministic across runs, independent of partitioning
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    by_src = out1.groupby("source").size()
    assert by_src.get("src0", 0) == 1000          # rate 1.0 keeps all
    assert "src2" not in by_src                   # rate 0.0 drops all
    assert abs(by_src.get("src1", 0) / 1000 - 0.5) < 0.06
    assert abs(by_src.get("src3", 0) / 1000 - 0.25) < 0.06   # default rate


def test_ngram_counts_exact(ray_session):
    rows = [{"doc_id": 0, "text": "a b a b c"},
            {"doc_id": 1, "text": "a b x"},
            {"doc_id": 2, "text": "solo"}]
    out = ngram_counts(rd.from_items(rows), top_k=3).to_pandas()
    # 'a b' x3 (twice doc0, once doc1), then alphabetical among count-1
    assert out["ngram"].tolist() == ["a b", "b a", "b c"]
    assert out["cnt"].tolist() == [3, 1, 1]


def test_repetition_stats_values():
    df = pd.DataFrame({"text": ["a b a b a", "w x y z", "", "solo"]})
    out = RepetitionStats()(df)
    # doc0: 5 words 2 distinct -> dup 0.6; bigrams [ab,ba,ab,ba] top 2/4
    assert out["dup_word_frac"].tolist() == [0.6, 0.0, 0.0, 0.0]
    # doc1: 3 distinct bigrams -> top 1/3
    assert out["top_bigram_frac"].tolist() == pytest.approx([0.5, 1 / 3, 0.0, 0.0])


def test_bottomk_sample_exact_k_and_deterministic(ray_session):
    rows = [{"doc_id": i, "source": f"s{i % 3}"} for i in range(600)]
    ds = rd.from_items(rows)
    out1 = bottomk_sample(ds, k=5, batch_size=64).to_pandas()
    # exactly 5 per stratum regardless of batch boundaries
    assert out1.groupby("source").size().tolist() == [5, 5, 5]
    # equals the global (non-distributed) bottom-k by the same hash order
    df = pd.DataFrame(rows)
    h = knuth_hash_u32(df["doc_id"].to_numpy(), 20).astype(np.int64)
    want = (df.assign(h=h).sort_values(["h", "doc_id"])
              .groupby("source", sort=False).head(5))
    assert set(map(tuple, out1[["doc_id", "source"]].to_numpy())) == \
        set(map(tuple, want[["doc_id", "source"]].to_numpy()))


def test_heavy_hitter_sketch_guarantees(ray_session):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(200)]
    # plant a dominant bigram: 'hot pair' repeated heavily in 50 docs
    for i in range(50):
        texts[i] = "hot pair " * 20 + texts[i]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    m = 256
    sk = heavy_hitters(ds, top_k=10, m=m, batch_size=64).to_pandas()
    exact = _doc_bigrams(pd.Series(texts)).value_counts()
    bound_per_batch = -(-int(exact.sum()) // m)
    est = dict(zip(sk["ngram"], sk["cnt"]))
    assert "hot pair" in est and sk["ngram"].iloc[0] == "hot pair"
    # never overestimates; underestimates within the merged-sketch bound
    for g, c in est.items():
        assert c <= exact.get(g, 0)
        assert exact.get(g, 0) - c <= bound_per_batch * 4  # <= N/m per merge level
    # single-sketch unit check: top item survives the cut with count >= true - N/m
    one = HeavyHitterSketch(m=64)(pd.DataFrame({"text": texts}))
    got = dict(zip(one["ngram"], one["cnt"]))
    assert got["hot pair"] >= exact["hot pair"] - -(-int(exact.sum()) // 64)


def test_stratum_sampler_threshold_exact():
    # keep decision is strict <: rate 0 keeps nothing even at hash 0
    df = pd.DataFrame({"doc_id": [0], "source": ["s"]})
    assert len(StratumSampler({"s": 0.0})(df)) == 0
    assert len(StratumSampler({"s": 1.0})(df)) == 1


def test_run_curation_job_resume(ray_session, tmp_path):
    """End-to-end curation job: full run, then kill-sim (drop one lineage
    record) -> only that partition is rewritten, row totals unchanged."""
    import glob
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    out = str(tmp_path / "curated")
    env = dict(os.environ)
    cmd = [sys.executable, "scripts/run_curation.py",
           "--input", "/root/testdata/sf0.001/documents.parquet",
           "--out", out]

    def run():
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd="/root/repo", check=True)
        return __import__("json").loads(p.stdout.strip().splitlines()[-1])

    r1 = run()
    assert r1["partitions_written"] and not r1["partitions_skipped_on_resume"]

    def total_rows():
        files = glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    n1 = total_rows()
    victim = r1["partitions_written"][0]
    os.remove(os.path.join(out, "lineage", f"{victim}.json"))
    r2 = run()
    assert r2["partitions_written"] == [victim]
    assert victim not in r2["partitions_skipped_on_resume"]
    assert total_rows() == n1  # no duplicated rows after resume


def test_hll_distinct_accuracy_and_merge(ray_session):
    from openmldb_ray.stages.curation import hll_distinct

    n, dups = 120_000, 3
    rows = [{"doc_id": i, "val": f"item-{i % (n // dups)}"}
            for i in range(n)]
    ds = rd.from_items(rows)
    est = hll_distinct(ds, "val", p=12, batch_size=4096)
    exact = n // dups
    sigma = 1.04 / np.sqrt(4096)
    assert abs(est / exact - 1) <= 5 * sigma
    # batch-size independence (mergeability): same data, different splits
    est2 = hll_distinct(ds, "val", p=12, batch_size=257)
    assert est == pytest.approx(est2)
    # small-range linear counting: tiny cardinalities are near-exact
    small = rd.from_items([{"val": f"v{i % 10}"} for i in range(1000)])
    assert abs(hll_distinct(small, "val", p=12) - 10) < 1


def test_sample_quantiles_accuracy_and_determinism(ray_session):
    from openmldb_ray.stages.curation import sample_quantiles

    rng = np.random.default_rng(23)
    vals = rng.lognormal(3, 1.2, size=80_000)
    rows = [{"doc_id": i, "v": float(x)} for i, x in enumerate(vals)]
    ds = rd.from_items(rows)
    qs = [0.05, 0.5, 0.95]
    est = sample_quantiles(ds, "v", qs, k=4096, id_col="doc_id",
                           batch_size=4096)
    for q, e in zip(qs, est):
        rank = (vals <= e).mean()
        assert abs(rank - q) <= 5 * np.sqrt(q * (1 - q) / 4096), (q, rank)
    # deterministic under different batch splits (min-k merges exactly)
    est2 = sample_quantiles(ds, "v", qs, k=4096, id_col="doc_id",
                            batch_size=333)
    np.testing.assert_allclose(est, est2)
    # k >= n degenerates to the exact quantiles
    small = rd.from_items(rows[:100])
    exact = np.quantile(vals[:100], qs)
    np.testing.assert_allclose(
        sample_quantiles(small, "v", qs, k=4096, id_col="doc_id"), exact)


def test_bloom_filter_no_false_negatives_and_fp_rate():
    from openmldb_ray.stages.curation import BloomFilter

    rng = np.random.default_rng(29)
    inserted = rng.integers(0, 2**63, size=10_000, dtype=np.uint64)
    other = rng.integers(0, 2**63, size=50_000, dtype=np.uint64)
    bf = BloomFilter(n_bits=1 << 18, k=4)
    bf.add_hashes(inserted)
    assert bf.contains_hashes(inserted).all()          # no false negatives
    fp = bf.contains_hashes(other).mean()
    # theoretical fp at n=10k, m=2^18, k=4 is ~0.3%; allow 4x slack
    assert fp < 0.012, fp


def test_decontaminate_bloom_dataset(ray_session):
    from openmldb_ray.stages.curation import decontaminate_bloom

    needle = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        {"doc_id": 0, "text": "prefix words " + needle + " suffix words"},
        {"doc_id": 1, "text": "totally unrelated content with many words "
                              "that keep going for a while and a while"},
        {"doc_id": 2, "text": "short doc"},  # < 8 words: never contaminated
    ]
    out = decontaminate_bloom(rd.from_items(rows), [needle], n=8).to_pandas()
    assert set(out["doc_id"]) == {1, 2}
    assert "contaminated" not in out.columns


def test_compression_ratio_signal(ray_session):
    """Repetitive text scores far below high-entropy text; null/empty score
    exactly 1.0; values are independent of batch splits."""
    import hashlib

    import ray.data as rd

    from openmldb_ray.stages.textstats import compression_ratio

    h, parts = b"seed", []
    for _ in range(32):
        h = hashlib.sha256(h).digest()
        parts.append(h.hex())
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["spam " * 400, "".join(parts), None, ""],
    })
    out = (compression_ratio(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id")["q_compress_ratio"])
    assert out.loc[1] < 0.1 < 0.45 < out.loc[2]
    assert out.loc[3] == 1.0 and out.loc[4] == 1.0

    split = (compression_ratio(rd.from_pandas(df).repartition(4),
                               batch_size=1).to_pandas()
             .set_index("doc_id")["q_compress_ratio"])
    assert split.sort_index().tolist() == out.sort_index().tolist()


def test_html_to_text(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.textstats import html_to_text

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "<html><body><h1>Title</h1><p>Hello <b>world</b>!</p></body></html>",
        "<script>var x = '<p>not text</p>';</script>before"
        "<style>p{}</style>after<!-- gone -->",
        "A &amp;amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end",
        None,
    ]})
    out = html_to_text(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == [
        "Title Hello world !",
        "before after",
        # single-pass decode: &amp;amp; -> &amp; (stays), entities decode
        'A &amp; B <tag> "q" \'s\' end',
        "",
    ]


def test_html_to_text_multiline_script(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.textstats import html_to_text

    doc = "<div>keep</div>\n<script>\nline1\nline2\n</script>\n<p>tail</p>"
    out = html_to_text(rd.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": [doc]}))).to_pandas()
    assert out["text"].iloc[0] == "keep tail"
