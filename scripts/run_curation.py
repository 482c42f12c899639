"""Job driver for the end-to-end curation pipeline — the second
``ray job submit`` entry point (the flagship covers the feature suite;
this one covers the training-data curation surface):

    ray job submit -- python scripts/run_curation.py \
        --input /root/testdata/sf0.1/documents.parquet --out /tmp/curated

One streaming pass: quality rules -> PII redaction -> benchmark
decontamination -> MinHash-LSH near-dup removal -> stratified hash
sampling -> hive-partitioned parquet by ``source`` with per-partition
lineage records. Resumable: a killed run restarted with the same --out
skips completed source partitions (--no-resume forces a full rerun).
"""

import argparse
import json
import sys
import time


def _quiet_logs():
    """worker_process_setup_hook: drop cosmetic ray.data warnings (schema
    hash, zero-column reduce blocks, empty-block size sampling). Defined
    at module level in the SCRIPT so workers can unpickle it without
    needing the repo on their sys.path."""
    import logging

    for name in ("ray.data._internal.arrow_ops.transform_pyarrow",
                 "ray.data._internal.execution.streaming_executor_state",
                 "ray.data._internal.pandas_block"):
        logging.getLogger(name).setLevel(logging.ERROR)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input",
                    default="/root/testdata/sf0.001/documents.parquet")
    ap.add_argument("--out", default="/tmp/curated")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--keep-rate", type=float, default=0.5,
                    help="per-source sampling rate")
    ap.add_argument("--needles-file", default=None,
                    help="newline-separated benchmark needles; default "
                         "derives 8-word needles from doc_id < 5")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (omit on a real cluster)")
    args = ap.parse_args()

    import os

    if os.path.isdir(args.input):
        # an sf table DIRECTORY was passed: curation runs on the documents
        # table (reading the whole dir would union unrelated tables into
        # one cryptic Acero schema error)
        cand = os.path.join(args.input, "documents.parquet")
        if not os.path.exists(cand):
            ap.error(f"--input {args.input} is a directory without "
                     f"documents.parquet")
        args.input = cand

    import ray

    if not ray.is_initialized():
        kw = dict(include_dashboard=False, ignore_reinit_error=True,
                  logging_level="ERROR",
                  runtime_env={"worker_process_setup_hook": _quiet_logs})
        if args.num_cpus:
            kw.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import ray.data as rd

    from openmldb_ray.stages.curation import (decontaminate, pii_redact,
                                              quality_filter,
                                              stratified_sample)
    from openmldb_ray.stages.dedup import minhash_lsh_dedup
    from openmldb_ray.state.lineage import write_partitioned_with_lineage

    t0 = time.time()
    docs = rd.read_parquet(args.input) \
        .map_batches(lambda t: t.replace_schema_metadata(None),
                     batch_format="pyarrow", batch_size=None)
    n_in = docs.count()

    if args.needles_file:
        needles = [ln.strip() for ln in open(args.needles_file)
                   if ln.strip()]
    else:
        bench = docs.filter(expr="doc_id < 5").to_pandas()
        needles = [" ".join(t.strip().split()[:8]) for t in bench["text"]]

    out = quality_filter(docs)
    out = pii_redact(out)
    out = decontaminate(out, needles)
    # minhash_lsh_dedup consumes its input TWICE (signature pass + the
    # anti-join back over the original rows); materialize the filtered/
    # redacted stream once so the quality->pii->decontaminate chain does
    # not re-execute — the object store spills to disk under pressure,
    # which is exactly the post-filter checkpoint a large job wants
    # (same materialize-once convention as join right sides)
    out = out.materialize()
    out = minhash_lsh_dedup(out, "text", "doc_id")
    out = stratified_sample(out, rates={}, default_rate=args.keep_rate)

    summary = write_partitioned_with_lineage(
        out, args.out, "source", checksum_col="doc_id",
        resume=not args.no_resume)
    print(json.dumps({
        "out": args.out,
        "wall_sec": round(time.time() - t0, 2),
        "rows_in": int(n_in),
        "partitions_written": summary["written"],
        "partitions_skipped_on_resume": summary["skipped"],
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
