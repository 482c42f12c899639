"""Per-worker-process instance cache for light-state map_batches stages.

A callable-CLASS stage makes Ray Data reserve a dedicated ACTOR POOL:
every pool pins at least one CPU for the dataset's whole lifetime, so a
pipeline chaining k such stages needs k+1 free CPU slots just to make
progress. On a small session (or a busy cluster node) the streaming
executor then deadlocks outright — found by the round-5 curation scaling
protocol: quality → pii → decontaminate → sample at ``num_cpus=2`` sat
forever with one pool stuck ``pending=1`` while the read task and two
sibling pools held both CPUs (the 8-CPU leg ran in 28 s).

For stages whose state is cheap to build (compiled regexes, needle
sets/blooms, broadcast-ref fetches) the actor pool buys nothing: a plain
TASK function with a per-process instance cache amortizes setup exactly
the same way — Ray reuses worker processes across tasks and datasets —
while sharing the common task pool: no reservation, no deadlock, no
per-dataset pool spin-up/tear-down (which dominates short queries).

Keep REAL actor pools for heavy state (models, ANN shards, decoded
codebooks) where per-actor memory control matters.
"""

from __future__ import annotations

import hashlib
import pickle

_CACHE: dict = {}


def _key_token(v):
    """A plain-pickle-safe identity token for one kwarg value (plain
    pickle rejects ObjectRefs outside Ray's serializer, and hashing a
    big ndarray through pickle would copy it)."""
    try:
        import ray

        if isinstance(v, ray.ObjectRef):
            return ("__objref__", v.hex())
    except Exception:  # pragma: no cover - ray always importable here
        pass
    import numpy as np

    if isinstance(v, np.ndarray):
        return ("__ndarray__", v.dtype.str, v.shape,
                hashlib.md5(v.tobytes()).hexdigest())
    return v


def task_stage(cls, /, **kwargs):
    """A pickle-stable task function wrapping ``cls(**kwargs).__call__``,
    constructing the instance ONCE per worker process per distinct
    (class, kwargs) and caching it in module state.

    The cache key is computed on the DRIVER (md5 of the tokenized,
    pickled kwargs), so workers pay a dict lookup per batch, never a
    pickle. kwargs must be Ray-serializable — ObjectRefs are fine and
    keep their plasma zero-copy semantics (``ray.get`` inside the
    constructor, once per process).
    """
    key = (cls.__module__, cls.__qualname__,
           hashlib.md5(pickle.dumps(
               [(k, _key_token(v)) for k, v in sorted(kwargs.items())],
               protocol=4)).hexdigest())

    def fn(batch):
        inst = _CACHE.get(key)
        if inst is None:
            inst = _CACHE.setdefault(key, cls(**kwargs))
        return inst(batch)

    fn.__name__ = fn.__qualname__ = cls.__name__  # operator label parity
    return fn
