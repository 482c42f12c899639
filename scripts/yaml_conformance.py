#!/usr/bin/env python
"""Sweep the reference YAML conformance corpus through the SQL engine.

Usage:
    python scripts/yaml_conformance.py [--files glob ...] [--out report.json]

Writes a JSON report (one entry per case variant) plus a summary to stdout.
Default file set: the function/ categories the engine targets.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

DEFAULT_GLOBS = [
    "/root/reference/cases/function/select/*.yaml",
    "/root/reference/cases/function/window/*.yaml",
    "/root/reference/cases/function/join/*.yaml",
    "/root/reference/cases/function/expression/*.yaml",
    "/root/reference/cases/function/function/*.yaml",
    "/root/reference/cases/function/dml/*.yaml",
    "/root/reference/cases/function/cluster/*.yaml",
    "/root/reference/cases/function/test_feature_zero_function.yaml",
    "/root/reference/cases/function/out_in/*.yaml",
    "/root/reference/cases/function/v040/*.yaml",
    "/root/reference/cases/function/multiple_databases/*.yaml",
    "/root/reference/cases/function/long_window/*.yaml",
    "/root/reference/cases/function/test_fz_sql.yaml",
    "/root/reference/cases/function/test_index_optimized.yaml",
    "/root/reference/cases/function/spark/*.yaml",
    "/root/reference/cases/function/test_performance_insensitive/*.yaml",
    "/root/reference/cases/function/fz_ddl/*.yaml",
    "/root/reference/cases/query/*.yaml",
    "/root/reference/cases/integration_test/select/*.yaml",
    "/root/reference/cases/integration_test/expression/*.yaml",
    "/root/reference/cases/integration_test/window/*.yaml",
    "/root/reference/cases/integration_test/join/*.yaml",
    "/root/reference/cases/integration_test/function/*.yaml",
    "/root/reference/cases/integration_test/dml/*.yaml",
    "/root/reference/cases/integration_test/out_in/*.yaml",
    "/root/reference/cases/integration_test/long_window/*.yaml",
    "/root/reference/cases/integration_test/multiple_databases/*.yaml",
    "/root/reference/cases/integration_test/spark/*.yaml",
    "/root/reference/cases/integration_test/cluster/*.yaml",
    "/root/reference/cases/integration_test/fz_ddl/*.yaml",
    "/root/reference/cases/integration_test/v040/*.yaml",
    "/root/reference/cases/integration_test/test_performance_insensitive/*.yaml",
    "/root/reference/cases/integration_test/test_fz_sql.yaml",
    "/root/reference/cases/integration_test/test_index_optimized.yaml",
    "/root/reference/cases/integration_test/test_feature_zero_function.yaml",
    "/root/reference/cases/function/tmp/*.yaml",
    "/root/reference/cases/function/ut_case/*.yaml",
    "/root/reference/cases/function/disk_table/*.yaml",
    "/root/reference/cases/function/data_expiration/*.yaml",
    "/root/reference/cases/integration_test/data_expiration/*.yaml",
]

# excluded: request-mode-only files, DDL/deploy/out_in (no SELECT surface),
# multi-DB, long-running thousand-union cluster case
EXCLUDE_SUBSTR = [
    # (round 4) test_window_union_cluster_thousand is back in the sweep —
    # the 1000-row union stress runs in ~2 s on this engine and is also
    # pinned as a slow-marked pytest (tests/test_sql_conformance.py)
    "test_batch_request",                  # request-mode protocol cases
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", nargs="*", default=None)
    ap.add_argument("--out", default="/tmp/yaml_conformance.json")
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--only", default=None, help="substring filter on file path")
    args = ap.parse_args()

    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, log_to_driver=False)
    for name in ("ray.data", "ray", "ray.data.exceptions"):
        logging.getLogger(name).setLevel(logging.CRITICAL)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from openmldb_ray.sql.yaml_runner import run_file

    files = []
    for g in (args.files or DEFAULT_GLOBS):
        files.extend(sorted(glob.glob(g)))
    files = [f for f in files if not any(x in f for x in EXCLUDE_SUBSTR)]
    if args.only:
        files = [f for f in files if args.only in f]

    all_out = []
    t_start = time.time()
    for f in files:
        t0 = time.time()
        try:
            outcomes = run_file(f)
        except Exception as e:  # file-level loader crash
            outcomes = []
            print(f"[LOADER ERROR] {f}: {e}", flush=True)
        dt = time.time() - t0
        from collections import Counter
        c = Counter(o.status for o in outcomes)
        print(f"{f.split('cases/')[-1]:60s} {dict(c)} {dt:.1f}s", flush=True)
        all_out.extend(outcomes)
        with open(args.out, "w") as fh:
            json.dump([o.__dict__ for o in all_out], fh, indent=0)

    from collections import Counter
    total = Counter(o.status for o in all_out)
    print(f"\nTOTAL {dict(total)} in {time.time()-t_start:.0f}s", flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
