"""Distribution-drift monitoring between two corpus snapshots.

The feature-store companion op (OpenMLDB's deployment story is online /
offline feature consistency; the batch-side analog a training-data
platform runs nightly is "did this feature's distribution move between
snapshot T and snapshot T+1?"). Implements the standard Population
Stability Index over FIXED bin edges:

    PSI = sum_bins (p_cur - p_ref) * ln(p_cur / p_ref)

with the conventional epsilon floor on the fractions so empty bins don't
produce infinities. Fixed, caller-supplied edges keep the statistic
deterministic and SQL-replayable (edges derived from data would make the
oracle circular); pair with stages/quantile.exact_quantiles to derive
edges from the REFERENCE snapshot once, then freeze them.

Scale shape: each snapshot contributes ONE streaming pass emitting
per-bin count partials (searchsorted + bincount — at most #bins narrow
rows per block, mergeable by sum); the driver folds two #bins-row
histograms. No shuffle, nothing corpus-sized anywhere. Values below the
first / above the last edge clamp into the end bins; nulls are excluded
(SQL semantics).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _hist(ds: "ray.data.Dataset", col: str, edges: np.ndarray,
          nbins: int) -> np.ndarray:
    def partial(t):
        import pyarrow as pa

        x = np.asarray(t.column(col).to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        x = x[~np.isnan(x)]
        idx = np.clip(np.searchsorted(edges, x, side="right") - 1,
                      0, nbins - 1)
        cnt = np.bincount(idx, minlength=nbins)
        occ = np.flatnonzero(cnt)
        return pa.table({"b": pa.array(occ, pa.int64()),
                         "c": pa.array(cnt[occ], pa.int64())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    out = np.zeros(nbins, np.int64)
    if len(parts):
        np.add.at(out, parts["b"].to_numpy(), parts["c"].to_numpy())
    return out


def drift_psi(ref_ds: "ray.data.Dataset", cur_ds: "ray.data.Dataset",
              col: str, edges, *, eps: float = 1e-6) -> pd.DataFrame:
    """Per-bin PSI between two snapshots of a numeric column.

    ``edges`` (len nbins+1, ascending) fixes the binning: bin i covers
    ``[edges[i], edges[i+1])`` with end-bin clamping. Fractions are
    floored at ``eps`` (``p = max(count/n, eps)``) exactly as the SQL
    oracle replays with GREATEST. Returns one row per bin:
    ``(bin, ref_frac, cur_frac, psi_term, psi)`` where ``psi`` is the
    total, repeated (a window SUM() OVER () in SQL)."""
    edges = np.asarray(edges, np.float64)
    # NaN edges would pass a (diff <= 0).any() check (NaN comparisons are
    # all False) and then bin garbage — require strictly ascending, finite
    if len(edges) < 2 or not np.all(np.isfinite(edges)) \
            or not np.all(np.diff(edges) > 0):
        raise ValueError("edges must be finite, strictly ascending, "
                         ">= 2 entries")
    nbins = len(edges) - 1
    href = _hist(ref_ds, col, edges, nbins)
    hcur = _hist(cur_ds, col, edges, nbins)
    nref, ncur = href.sum(), hcur.sum()
    if nref == 0 or ncur == 0:
        raise ValueError("a snapshot has no non-null values")
    p = np.maximum(href / nref, eps)
    q = np.maximum(hcur / ncur, eps)
    term = (q - p) * np.log(q / p)
    return pd.DataFrame({"bin": np.arange(nbins, dtype=np.int64),
                         "ref_frac": p, "cur_frac": q,
                         "psi_term": term,
                         "psi": np.full(nbins, term.sum())})
