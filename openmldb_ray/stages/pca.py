"""Distributed PCA / whitening over an embedding column.

The standard preprocessing step before embedding dedup / ANN at corpus
scale (SemDeDup whitens; IVF quantizers train on reduced vectors): project
``list<float>`` embeddings onto the top-k principal axes, optionally
whitening (unit variance per axis).

Fitting is a pure MOMENT problem, so it distributes exactly: one pass of
batch-local combiners, each emitting (n, sum(d), XᵀX(d,d)) — a few KB per
block regardless of block size — reduced two-level (a 64-way bucket
groupby, then a tiny driver fold) so the driver never sees O(#blocks)
rows. The driver eigendecomposes the d×d covariance (d is small by
contract — 64..4096; the 100 TB lives in n, not d) and broadcasts the
component matrix once; projection is one matmul per batch, shuffle-free.

Sign convention: each component's largest-|.| coordinate is made
positive, so fits are deterministic and comparable across runs/engines
(eigenvectors are defined up to sign).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _embed_matrix(col) -> np.ndarray:
    """list<float> arrow column -> (n, d) float64 matrix (zero-copy when
    the list layout is contiguous)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):      # ray.data tensor extension
        col = col.storage
    if isinstance(col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        n = len(col)
        if col.null_count:
            # ListArray.flatten() silently DROPS null slots, so the
            # reshape below would either crash opaquely or — when the
            # lengths happen to divide — shift every later row's values
            # into the wrong row. Nulls are a data bug here; say so.
            raise ValueError(
                "embedding column contains null rows — drop or impute "
                "them before PCA")
        if n and not isinstance(col, pa.FixedSizeListArray):
            lens = pa.compute.unique(pa.compute.list_value_length(col))
            if len(lens) > 1:
                # a ragged column whose total length happens to divide n
                # would reshape cleanly into MISALIGNED rows — check the
                # actual per-row lengths, not divisibility
                raise ValueError(
                    "embedding column is ragged (row lengths differ) — "
                    "PCA needs a fixed dimension")
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(n, -1) if n else flat.reshape(0, 0)
    return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])


def fit_pca(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    k: int = 8,
    *,
    whiten: bool = False,
    reduce_buckets: int = 64,
) -> dict:
    """One moment pass → model dict {mean, components (k,d), eigvals,
    whiten}. Deterministic; exact (no sampling)."""

    def moments(t):
        import hashlib

        import pyarrow as pa

        X = _embed_matrix(t.column(col))
        if X.size == 0:
            return pa.table({"b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "s": pa.array([], pa.binary()),
                             "xtx": pa.array([], pa.binary())})
        d = X.shape[1]
        s = X.sum(axis=0)
        xtx = X.T @ X
        # content-derived bucket (sums commute, so placement is free to be
        # arbitrary — it only spreads the fold)
        b = hashlib.blake2b(s.tobytes(), digest_size=2).digest()[0] \
            % reduce_buckets
        return pa.table({
            "b": pa.array([b], pa.int64()),
            "n": pa.array([len(X)], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "s": pa.array([s.tobytes()], pa.binary()),
            "xtx": pa.array([xtx.tobytes()], pa.binary()),
        })

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = int(g["d"].iloc[0])
        s = np.zeros(d)
        xtx = np.zeros((d, d))
        for sb, xb in zip(g["s"], g["xtx"]):
            s += np.frombuffer(sb, dtype=np.float64)
            xtx += np.frombuffer(xb, dtype=np.float64).reshape(d, d)
        return pd.DataFrame({"b": [0], "n": [int(g["n"].sum())], "d": [d],
                             "s": [s.tobytes()], "xtx": [xtx.tobytes()]})

    part = ds.map_batches(moments, batch_format="pyarrow")
    folded = part.groupby("b").map_groups(bucket_fold, batch_format="pandas") \
        .to_pandas()
    if len(folded) == 0 or int(folded["n"].sum()) < 2:
        raise ValueError("fit_pca needs at least 2 rows")
    d = int(folded["d"].iloc[0])
    n = int(folded["n"].sum())
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for sb, xb in zip(folded["s"], folded["xtx"]):
        s += np.frombuffer(sb, dtype=np.float64)
        xtx += np.frombuffer(xb, dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T                   # (k, d)
    # deterministic sign: largest-|.| coordinate of each component positive
    flip = comps[np.arange(len(comps)),
                 np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1.0
    return {"mean": mean, "components": comps, "eigvals": evals,
            "whiten": bool(whiten), "n": n}


class _PcaProject:
    def __init__(self, model_ref, col: str, out_col: str):
        model = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.col, self.out_col = col, out_col
        self.mean = model["mean"]
        W = model["components"].T               # (d, k)
        if model["whiten"]:
            W = W / np.sqrt(np.maximum(model["eigvals"], 1e-12))
        self.W = W

    def __call__(self, t):
        import pyarrow as pa

        k = self.W.shape[1]
        X = _embed_matrix(t.column(self.col))
        if X.size == 0:
            zs = pa.array([], pa.list_(pa.float32(), k))
        else:
            Z = (X - self.mean) @ self.W
            zs = pa.FixedSizeListArray.from_arrays(
                pa.array(Z.reshape(-1).astype(np.float32)), k)
        return t.append_column(self.out_col, zs)


def pca_project(ds: "ray.data.Dataset", model: dict, *,
                col: str = "embedding", out_col: str = "pca",
                concurrency=(1, 8), batch_size: int = 4096):
    """Project every row under a fitted model: one broadcast + one
    shuffle-free actor-pool matmul pass; output is a fixed-size-list
    float32 column (k floats/row instead of d)."""
    mref = ray.put(model)
    return ds.map_batches(
        _PcaProject, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(model_ref=mref, col=col, out_col=out_col))
