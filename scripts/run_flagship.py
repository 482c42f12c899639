"""Job driver for the flagship suite — the ``ray job submit`` entry point.

    ray job submit -- python scripts/run_flagship.py \
        --num-docs 4000000 --out /tmp/flagship_out

Resumable: output is partitioned parquet with per-partition lineage
records (state/lineage.py); a killed run restarted with the same --out
skips completed partitions (pass --no-resume to force a full rerun).
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
    ap.add_argument("--num-docs", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="/tmp/flagship_out")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (omit on a real cluster)")
    args = ap.parse_args()
    if args.num_docs <= 0:
        ap.error(f"--num-docs must be positive (got {args.num_docs})")

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
    from openmldb_ray.pipelines.flagship import flagship
    from openmldb_ray.state.lineage import completed_partitions

    t0 = time.time()
    pre_done = completed_partitions(args.out)
    flagship(num_docs=args.num_docs, seed=args.seed, out_dir=args.out,
             resume=not args.no_resume)
    done = completed_partitions(args.out)
    print(json.dumps({
        "out": args.out,
        "wall_sec": round(time.time() - t0, 2),
        "partitions_complete": sorted(done),
        "partitions_skipped_on_resume": sorted(pre_done),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
