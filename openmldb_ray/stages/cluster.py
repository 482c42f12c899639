"""Distributed Lloyd k-means over an embedding column.

``kmeans_fit`` trains on the FULL dataset (unlike the driver-sample coarse
quantizer ``simsearch._kmeans_lite``, which this reuses only for a seeded
deterministic init): each iteration is one streaming pass where every
batch assigns its vectors with a single ``(n,d)@(d,k)`` matmul (the
``argmin ||x-c||^2 == argmax (x.c - ||c||^2/2)`` identity — no (n,k,d)
difference tensor) and emits exactly k partial rows (count, sum-vector,
SSE), so the per-iteration reduce is k × #blocks tiny rows folded on the
driver — the classic mergeable-summaries shape.  Centroids travel to
workers via ONE object-store put per iteration; empty clusters keep their
previous centroid (deterministic, matches the single-process reference).

Use cases: SemDeDup-style cluster-then-dedup (stages/dedup.py), corpus
topic bucketing, IVF index training at full-corpus fidelity.

``kmeans_assign`` appends the nearest-centroid id (and optionally the
squared distance) with the same broadcast + matmul per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _stack(col) -> np.ndarray:
    return np.ascontiguousarray(np.stack(col.to_numpy()), dtype=np.float64)


def _kmeanspp(sample: np.ndarray, k: int, rng) -> np.ndarray:
    """Seeded k-means++ seeding (Arthur & Vassilvitskii 2007) on a
    driver-side sample: each next centroid drawn proportional to squared
    distance from the chosen set — avoids Lloyd's several-centroids-in-
    one-blob local optima that uniform seeding hits."""
    first = int(rng.integers(len(sample)))
    cents = [sample[first]]
    d2 = ((sample - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = float(d2.sum())
        if tot <= 0:
            idx = int(rng.integers(len(sample)))
        else:
            idx = int(rng.choice(len(sample), p=d2 / tot))
        cents.append(sample[idx])
        d2 = np.minimum(d2, ((sample - cents[-1]) ** 2).sum(axis=1))
    return np.stack(cents)


def kmeans_fit(
    ds,
    col: str,
    k: int,
    *,
    iters: int = 8,
    sample_init: int = 2048,
    seed: int = 13,
    materialize_narrow: bool = False,
) -> dict:
    """Full-dataset Lloyd iterations; returns
    ``{"centroids": (k, d) float64, "inertia": [per-iteration SSE],
    "n": row count}``. ``materialize_narrow`` pins the single-column
    projection once — each Lloyd iteration (plus the init sample) scans
    it, so an expensive upstream would otherwise re-execute per
    iteration (the budget_select materialize_narrow trade)."""
    import ray

    narrow = ds.select_columns([col])
    if materialize_narrow:
        narrow = narrow.materialize()

    # deterministic seeded k-means++ init from a driver sample (init only
    # — every Lloyd iteration below sees the full dataset); value-hash
    # selection: representative of the whole table and independent of
    # partitioning/scheduling (core/sampling.py)
    from ..core.sampling import hash_sample

    sample = hash_sample(narrow, col, sample_init, stack=_stack)
    rng = np.random.default_rng(seed)
    centroids = _kmeanspp(sample, min(k, len(sample)), rng)
    init = centroids.copy()
    k = len(centroids)
    d = centroids.shape[1]
    inertia = []
    n_total = 0

    for it in range(iters):
        ref = ray.put(np.ascontiguousarray(centroids))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            from ..core.hashing import quiet_ray_data_logs
            quiet_ray_data_logs()
            c = ray.get(ref)
            if not len(df):  # np.stack crashes on an empty block
                return pd.DataFrame({
                    "cl": np.array([], np.int64),
                    "cnt": np.array([], np.int64),
                    "sse": np.array([], np.float64),
                    "s": pd.Series([], dtype=object)})
            x = _stack(df[col])
            scores = x @ c.T - 0.5 * (c * c).sum(axis=1)
            a = scores.argmax(axis=1)
            # one C-speed bincount per dimension beats np.add.at's
            # buffered scatter on wide batches
            sums = np.stack([np.bincount(a, weights=x[:, j],
                                         minlength=len(c))
                             for j in range(x.shape[1])], axis=1)
            cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
            # SSE via ||x||^2 - 2 max_score (exact, no second pass)
            sse_row = (x * x).sum(axis=1) - 2.0 * scores.max(axis=1)
            sse = np.bincount(a, weights=sse_row, minlength=len(c))
            return pd.DataFrame({
                "cl": np.arange(len(c), dtype=np.int64),
                "cnt": cnt,
                "sse": sse,
                "s": [v.tobytes() for v in sums]})

        parts = narrow.map_batches(
            partial, batch_format="pandas", batch_size=None).to_pandas()
        sums = np.zeros((k, d))
        for cl, g in parts.groupby("cl"):
            sums[cl] = np.sum(np.stack(
                [np.frombuffer(b, dtype=np.float64) for b in g["s"]]),
                axis=0)
        cnts = parts.groupby("cl")["cnt"].sum().reindex(
            range(k), fill_value=0).to_numpy()
        inertia.append(float(parts["sse"].sum()))
        n_total = int(cnts.sum())
        nz = cnts > 0
        centroids = centroids.copy()
        centroids[nz] = sums[nz] / cnts[nz, None]

    return {"centroids": centroids, "init": init, "inertia": inertia,
            "n": n_total, "col": col}


def kmeans_assign(ds, model: dict, *, col: str | None = None,
                  out_col: str = "cluster",
                  dist_col: str | None = None):
    """Append each row's nearest-centroid id (+ squared distance when
    ``dist_col`` is set).  Centroids ride the object store once."""
    import ray

    col = col or model["col"]
    ref = ray.put(np.ascontiguousarray(model["centroids"]))

    class _Assign:
        def __init__(self):
            self.c = ray.get(ref)
            self.half = 0.5 * (self.c * self.c).sum(axis=1)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            from ..core.hashing import quiet_ray_data_logs
            quiet_ray_data_logs()
            df = df.copy()
            if not len(df):
                df[out_col] = pd.Series([], dtype="int64")
                if dist_col:
                    df[dist_col] = pd.Series([], dtype="float64")
                return df
            x = _stack(df[col])
            scores = x @ self.c.T - self.half
            df[out_col] = scores.argmax(axis=1).astype(np.int64)
            if dist_col:
                df[dist_col] = ((x * x).sum(axis=1)
                                - 2.0 * scores.max(axis=1))
            return df

    return ds.map_batches(_Assign, batch_format="pandas",
                          concurrency=(1, 16))
