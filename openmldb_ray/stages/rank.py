"""Distributed score normalization: exact CUME_DIST / percentile rank.

``cume_dist(ds, score_col, key_col=...)`` appends each row's exact
cumulative distribution value within its key partition —
``(# rows in partition with score <= this score) / (# rows)`` — i.e. SQL
``CUME_DIST() OVER (PARTITION BY key ORDER BY score)``.  This is the
standard way to put heterogeneous quality scores (length, LM perplexity,
classifier logits) on one comparable [0, 1] scale before mixing corpora.

A naive engine sorts every partition globally.  Two scale paths instead:

* ``broadcast`` (few keys / bounded distinct scores — the per-SOURCE
  normalization case): a per-batch combiner collapses rows to distinct
  (key, score, count) partials, so the driver collects the score
  HISTOGRAM, never the rows (a guard pass sums per-block distinct counts
  first and refuses if the bound exceeds ``distinct_cap``).  Per key the
  histogram is sorted once on the driver (tiny), cumsummed, broadcast
  once via the object store, and every batch resolves its rows with one
  ``searchsorted`` — the row pass is shuffle-free.
* ``shuffle`` (high-cardinality keys): ONE coarse-bucket key-hash
  exchange; each bucket computes its keys' ranks vectorized
  (``groupby(...).rank(method="max", pct=True)`` — exactly CUME_DIST).

Null semantics (documented divergence from SQL's NULLS-LAST ordering):
null scores get a null cume and do NOT count toward the partition size —
the semantics you want for normalization (SQL parity for non-null data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def cume_dist(
    ds,
    score_col: str,
    *,
    key_col: str | None = None,
    out_col: str = "cume_dist",
    strategy: str = "auto",
    distinct_cap: int = 5_000_000,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
    materialize_narrow: bool = False,
):
    import ray

    from ..core.grouping import map_groups_typed
    from ..core.hashing import (add_bucket_column, default_num_buckets,
                                quiet_ray_data_logs)

    keys = [key_col] if key_col else []
    narrow_cols = keys + [score_col]
    narrow = ds.select_columns(narrow_cols)
    if materialize_narrow:
        # the guard pass + histogram pass each scan this projection (and
        # the final row pass scans ds itself) — when the upstream is an
        # expensive pipeline, pin the 1-2 column projection once (the
        # budget_select materialize_narrow trade)
        narrow = narrow.materialize()

    if strategy == "auto":
        # upper-bound the distinct-(key, score) count with one narrow
        # shuffle-free pass (sum of per-block distinct counts)
        def block_distinct(df: pd.DataFrame) -> pd.DataFrame:
            nd = len(df[narrow_cols].drop_duplicates())
            return pd.DataFrame({"nd": [nd]})

        bound = int(narrow
                    .map_batches(block_distinct, batch_format="pandas",
                                 batch_size=None).to_pandas()["nd"].sum())
        strategy = "broadcast" if bound <= distinct_cap else "shuffle"

    if strategy == "shuffle":
        nb = num_buckets or default_num_buckets()
        if not keys:
            raise ValueError(
                "cume_dist strategy='shuffle' needs key_col (a keyless "
                "global CDF has a single partition; use 'broadcast')")
        add_b = add_bucket_column(keys, "__b", nb)
        pre = ds.map_batches(add_b, batch_format="pyarrow",
                             batch_size=None)

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            quiet_ray_data_logs()
            g = g.drop(columns="__b")
            g[out_col] = g.groupby(key_col)[score_col] \
                .rank(method="max", pct=True)
            return g

        return map_groups_typed(pre, "__b", per_bucket,
                                batch_format="pandas",
                                num_partitions=num_partitions)

    if strategy != "broadcast":
        raise ValueError(f"strategy={strategy!r}")

    # ---------------------------------------------- broadcast (histogram)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        d = df[narrow_cols].dropna(subset=[score_col])
        if not keys:
            g = d.groupby(score_col, sort=False).size()
            return pd.DataFrame({"s": g.index.to_numpy(),
                                 "c": g.to_numpy()})
        g = d.groupby([key_col, score_col], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame({"k": idx[key_col].to_numpy(),
                             "s": idx[score_col].to_numpy(),
                             "c": g.to_numpy()})

    parts = narrow \
        .map_batches(partial, batch_format="pandas", batch_size=None) \
        .to_pandas()
    if len(parts) > distinct_cap:
        raise ValueError(
            f"cume_dist: {len(parts)} distinct partials exceed "
            f"distinct_cap={distinct_cap}; use strategy='shuffle'")
    gcols = (["k"] if keys else []) + ["s"]
    hist = parts.groupby(gcols, sort=True)["c"].sum().reset_index()

    lut: dict = {}
    for k, g in (hist.groupby("k") if keys else [(None, hist)]):
        # scores keep their NATIVE dtype: casting int64 to float64 here
        # would merge distinct scores past 2^53 that the shuffle path
        # ranks exactly — auto must not flip between semantics
        scores = g["s"].to_numpy()
        cum = np.cumsum(g["c"].to_numpy(np.float64))
        lut[k] = (scores, cum, float(cum[-1]) if len(cum) else 0.0)
    ref = ray.put(lut)

    class _Score:
        def __init__(self):
            self.lut = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            quiet_ray_data_logs()
            sv = df[score_col]
            notna = ~pd.isna(sv).to_numpy()
            s = sv.to_numpy()
            out = np.full(len(df), np.nan)
            if not keys:
                items = [(None, np.arange(len(df)))]
            else:
                # one C-level factorize pass instead of a full-column
                # equality scan per distinct key
                items = df.groupby(key_col, sort=False).indices.items()
            for k, pos in items:
                ent = self.lut.get(k)
                if ent is None:
                    continue
                scores, cum, n = ent
                pos = pos[notna[pos]]
                if n > 0 and len(pos):
                    idx = np.searchsorted(scores, s[pos],
                                          side="right") - 1
                    out[pos] = np.where(
                        idx >= 0, cum[np.maximum(idx, 0)], 0.0) / n
            df = df.copy()
            df[out_col] = out
            return df

    return ds.map_batches(_Score, batch_format="pandas",
                          concurrency=(1, 16))
