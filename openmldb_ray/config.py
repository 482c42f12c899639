"""Cluster-scaling knobs, env-overridable without code changes.

The same pipeline code runs on a laptop and a 256-node cluster; what
changes with cluster size is the ROUTING THRESHOLDS, not the operators
(RUNBOOK.md "Running on a real cluster"):

- ``OMR_NUM_BUCKETS``   — coarse-bucket fanout for every keyed exchange
  (joins, dedup, rank, collect_list, ...). Default: max(256, 4 x cluster
  CPUs), which already scales with the cluster; set explicitly to pin
  reduce-side parallelism (e.g. 4 x total cores).
- ``OMR_BROADCAST_LIMIT`` — rows below which a small side is broadcast
  (``ray.put`` once, read per actor) instead of co-shuffled. Scale with
  WORKER HEAP, not cluster size: a 2M-row broadcast index costs the same
  per worker on 4 nodes as on 256.
- ``OMR_DRIVER_LIMIT``  — rows a driver-side fold (union-find edge
  lists, shortlists) may materialize before the distributed fallback
  kicks in. Scale with DRIVER heap.

Each knob overrides only the library DEFAULT: an explicit keyword
argument at a call site always wins. Values are read at call time, so
tests and job scripts can set/unset them freely.
"""

from __future__ import annotations

import os


def _env_int(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def broadcast_limit(explicit: int | None, default: int) -> int:
    """Resolve a stage's broadcast-routing threshold (rows): an explicit
    call-site value wins, else the ``OMR_BROADCAST_LIMIT`` env var, else
    the stage's ``default``."""
    if explicit is not None:
        return explicit
    env = _env_int("OMR_BROADCAST_LIMIT")
    return env if env is not None else default


def driver_limit(explicit: int | None, default: int) -> int:
    """Resolve a driver-side materialization cap (rows): explicit value,
    else ``OMR_DRIVER_LIMIT``, else ``default``."""
    if explicit is not None:
        return explicit
    env = _env_int("OMR_DRIVER_LIMIT")
    return env if env is not None else default


def num_buckets() -> int | None:
    """Explicit exchange fanout from ``OMR_NUM_BUCKETS``, or None to use
    the CPU-scaled default (core.hashing.default_num_buckets)."""
    return _env_int("OMR_NUM_BUCKETS")
