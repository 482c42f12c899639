"""Deterministic representative sampling for driver-side model init.

``limit(n)`` takes the FIRST n rows of a dataset — on a 100 TB table that
is position-biased (tables are usually clustered by ingest time, source,
or key), and under Ray's default ``preserve_order=False`` it is also
scheduling-dependent. Every k-means-style init (cluster.kmeans_fit,
pq.pq_fit, simsearch's IVF quantizers) needs a sample that is

* deterministic — same rows for every run,
* partition-independent — same rows however the table is split
  (split-invariance tests depend on this), and
* representative — drawn from the WHOLE table, not its head.

``hash_sample`` achieves all three with one narrow streaming pass: each
row's float64 bit pattern is folded into a 64-bit value hash (per-dim odd
multipliers, wraparound sum — vectorized, no per-row Python), each BLOCK
keeps only its n smallest hashes (the global n-smallest must be among
them — no row count, no threshold, no second execution of the upstream
pipeline), and the driver folds to the n smallest overall. The hash
depends only on the VALUES, so the choice cannot vary with ordering or
partitioning; duplicates of a vector hash identically (either copy is
the same sample point).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_SEED = 0x5EED_5A3E


def _row_hashes(x: np.ndarray) -> np.ndarray:
    """(n, d) float64 -> (n,) uint64 value hash (vectorized)."""
    u = np.ascontiguousarray(x, dtype=np.float64).view(np.uint64)
    rng = np.random.default_rng(_HASH_SEED + u.shape[1])
    mults = rng.integers(1, 2**63, size=u.shape[1], dtype=np.uint64) * 2 + 1
    with np.errstate(over="ignore"):
        h = (u * mults).sum(axis=1, dtype=np.uint64)
        # one xorshift-multiply finalizer so near-identical bit patterns
        # (common in low-entropy dims) spread over the full range
        h ^= h >> 33
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> 33
    return h


def hash_sample(ds, col: str, n: int, *, margin: float = 4.0,
                stack=None) -> np.ndarray:
    """Up to ``n`` vectors from ``col`` as an (n, d) float64 matrix,
    chosen by smallest value hash. ONE narrow scan + a tiny driver fold:
    each block keeps only its n smallest hashes (the global n-smallest
    are necessarily among them), so no row count — and therefore no
    second execution of the upstream pipeline — is needed. Candidate
    volume is ≤ n rows per block. ``margin`` is kept for API
    compatibility; the bottom-n-per-block bound makes it unnecessary."""
    del margin  # superseded by the per-block bottom-n bound
    if stack is None:
        def stack(c):
            return np.ascontiguousarray(np.stack(c.to_numpy()),
                                        dtype=np.float64)

    narrow = ds.select_columns([col])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        from .hashing import quiet_ray_data_logs
        quiet_ray_data_logs()
        if not len(df):
            return pd.DataFrame({col: pd.Series([], dtype=object),
                                 "__h": pd.Series([], dtype=np.uint64)})
        x = stack(df[col])
        h = _row_hashes(x)
        if len(h) > n:
            keep = np.argpartition(h, n - 1)[:n]
        else:
            keep = np.arange(len(h))
        return pd.DataFrame({col: df[col].to_numpy()[keep],
                             "__h": h[keep]})

    cand = narrow.map_batches(pick, batch_format="pandas",
                              batch_size=None).to_pandas()
    if not len(cand):
        raise ValueError(f"hash_sample: no rows in column {col!r}")
    # ascending-HASH order, not candidate-arrival order: the returned row
    # order seeds k-means++, so it must be value-determined too (equal
    # hashes are either identical vectors — order irrelevant — or ~2^-64
    # collisions)
    order = np.argsort(cand["__h"].to_numpy(), kind="stable")[:n]
    return stack(cand[col].iloc[order])
