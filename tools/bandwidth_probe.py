"""Single-box scaling ceiling probe (evidence for BASELINE.md §3).

Two workloads at 1, 8, 32 concurrent processes:
- cpu:  pure-ALU loop (no memory traffic)  → scales with cores
- mem:  numpy streaming kernel over ~100MB → saturates shared DRAM

Prints one JSON line with aggregate throughput ratios. On a multi-node
cluster each node brings its own memory system, so the `mem` ceiling is a
single-box artifact, not a property of the pipeline.
"""

import json
import multiprocessing as mp
import time

import numpy as np


def cpu_burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += 1
    return x


def mem_burn(_):
    a = np.random.default_rng(0).integers(0, 1 << 40, 12_000_000, dtype=np.uint64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2.0:
        b = a * np.uint64(0xBF58476D1CE4E5B9)
        b ^= b >> np.uint64(27)
        n += int(b[0] & np.uint64(1))
    return n + 1


def agg_rate(fn, workers):
    t0 = time.time()
    with mp.Pool(workers) as p:
        res = p.map(fn, range(workers))
    return sum(res) / (time.time() - t0)


def main():
    out = {}
    for name, fn in (("cpu", cpu_burn), ("mem", mem_burn)):
        base = agg_rate(fn, 1)
        out[name] = {str(w): round(agg_rate(fn, w) / base, 2) for w in (8, 32)}
    print(json.dumps({"speedup_vs_1_worker": out}))


if __name__ == "__main__":
    main()
