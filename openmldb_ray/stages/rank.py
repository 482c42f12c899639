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

_RANK_FUNCS = ("row_number", "rank", "dense_rank", "percent_rank", "ntile")


def rank_window(
    ds,
    order_col: str,
    *,
    key_col: str,
    outs: dict[str, object],
    tiebreak: str | None = None,
    descending: bool = False,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
):
    """Per-key SQL rank functions over an order column, one co-shuffle.

    ``outs`` maps output column name → ``"row_number" | "rank" |
    "dense_rank" | "percent_rank"`` or ``("ntile", k)``.  Semantics match
    ANSI SQL ``<fn>() OVER (PARTITION BY key ORDER BY order_col [DESC]
    NULLS LAST [, tiebreak])``: ``rank`` is the min row number of the tie
    run, ``dense_rank`` counts distinct order values, ``percent_rank`` is
    ``(rank - 1) / (n - 1)`` (0 for singleton partitions), ``ntile(k)``
    deals row-order buckets with the first ``n % k`` buckets one row
    larger.  NULL order values sort last and tie with each other (DuckDB's
    default null ordering).

    Scale shape: ONE coarse key-hash bucket exchange (the window-stage
    pattern — high-cardinality keys hash into ``4 × CPUs`` buckets, whole
    keys land in one bucket); inside each bucket the kernel is a single
    stable sort plus O(n) numpy passes — no per-row Python, no per-key
    loop.  ``row_number`` / ``ntile`` depend on total row order, so they
    require ``tiebreak`` (a unique column) for a deterministic,
    repartition-stable result; rank/dense_rank/percent_rank are
    tie-invariant and don't.

    Keyless global ranking is a different problem (a global total order);
    use :func:`cume_dist` (histogram broadcast) or
    ``stages.shard.seeded_shard_shuffle`` / ``stages.select.budget_select``
    (analytic range partition) for those shapes.
    """
    from ..core.grouping import map_groups_typed
    from ..core.hashing import (add_bucket_column, default_num_buckets,
                                quiet_ray_data_logs)

    for name, spec in outs.items():
        fn = spec[0] if isinstance(spec, tuple) else spec
        if fn not in _RANK_FUNCS:
            raise ValueError(f"unknown rank function {spec!r} for {name!r}")
        if fn in ("row_number", "ntile") and tiebreak is None:
            raise ValueError(
                f"{fn} needs tiebreak= (a unique column) for a "
                "deterministic row order")
        if fn == "ntile" and (not isinstance(spec, tuple)
                              or int(spec[1]) < 1):
            raise ValueError("ntile spec must be ('ntile', k) with k >= 1")

    nb = num_buckets or default_num_buckets()
    add_b = add_bucket_column([key_col], "__b", nb)
    pre = ds.map_batches(add_b, batch_format="pyarrow", batch_size=None)

    def per_bucket(t) -> "object":
        # Arrow in/out (round 5): only the NARROW (key, order, tiebreak)
        # columns convert to pandas for the sort/factorize; payload rows
        # are re-attached by ``Table.take`` on the sort permutation so
        # payload columns keep exact Arrow types
        import pyarrow as pa

        quiet_ray_data_logs()
        t = t.drop_columns(["__b"])
        n = t.num_rows
        if n == 0:
            out = t
            for name, spec in outs.items():
                fn = spec[0] if isinstance(spec, tuple) else spec
                dt = pa.float64() if fn == "percent_rank" else pa.int64()
                if name in out.column_names:
                    out = out.drop_columns([name])
                out = out.append_column(name, pa.nulls(0, dt))
            return out
        ndf = pd.DataFrame({
            c: t[c].to_pandas()
            for c in dict.fromkeys(
                [key_col, order_col] + ([tiebreak] if tiebreak else []))})
        sort_cols = [key_col, order_col] + ([tiebreak] if tiebreak else [])
        asc = [True, not descending] + ([True] if tiebreak else [])
        ndf = ndf.sort_values(sort_cols, ascending=asc, na_position="last",
                              kind="stable")
        perm = ndf.index.to_numpy(np.int64)
        ndf = ndf.reset_index(drop=True)
        # factorize treats every NULL as one shared code — exactly SQL's
        # "NULLs are equal for ranking" rule — and works for any dtype
        kcodes = pd.factorize(ndf[key_col], use_na_sentinel=False)[0]
        ocodes = pd.factorize(ndf[order_col], use_na_sentinel=False)[0]
        idx = np.arange(n, dtype=np.int64)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = kcodes[1:] != kcodes[:-1]
        grp_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        rn = idx - grp_start + 1
        sizes = np.bincount(kcodes)[kcodes].astype(np.int64)
        new_val = new_key.copy()
        new_val[1:] |= ocodes[1:] != ocodes[:-1]
        run_start = np.maximum.accumulate(np.where(new_val, idx, 0))
        rank = run_start - grp_start + 1
        cnv = np.cumsum(new_val)
        dense = cnv - cnv[grp_start] + 1
        out = t.take(pa.array(perm, pa.int64()))
        for name, spec in outs.items():
            fn = spec[0] if isinstance(spec, tuple) else spec
            if fn == "row_number":
                vals = pa.array(rn, pa.int64())
            elif fn == "rank":
                vals = pa.array(rank, pa.int64())
            elif fn == "dense_rank":
                vals = pa.array(dense, pa.int64())
            elif fn == "percent_rank":
                vals = pa.array(np.where(sizes > 1,
                                         (rank - 1) / np.maximum(sizes - 1,
                                                                 1),
                                         0.0), pa.float64())
            else:  # ntile
                k = int(spec[1])
                base, rem = sizes // k, sizes % k
                head = rem * (base + 1)  # rows covered by the larger tiles
                in_head = rn <= head
                vals = pa.array(np.where(
                    in_head,
                    (rn - 1) // np.maximum(base + 1, 1) + 1,
                    rem + (rn - 1 - head) // np.maximum(base, 1) + 1,
                ).astype(np.int64), pa.int64())
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, vals)
        return out

    return map_groups_typed(pre, "__b", per_bucket, batch_format="pyarrow",
                            num_partitions=num_partitions)


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

        def per_bucket(t) -> "object":
            # Arrow in/out: the rank is computed on a NARROW (key, score)
            # frame and appended to the untouched Arrow payload (rank()
            # preserves row order, so no permutation is even needed)
            import pyarrow as pa

            quiet_ray_data_logs()
            t = t.drop_columns(["__b"])
            s = pd.DataFrame({key_col: t[key_col].to_pandas(),
                              score_col: t[score_col].to_pandas()})
            vals = s.groupby(key_col)[score_col].rank(method="max",
                                                      pct=True)
            if out_col in t.column_names:
                t = t.drop_columns([out_col])
            return t.append_column(
                out_col, pa.Array.from_pandas(vals.astype(np.float64)))

        return map_groups_typed(pre, "__b", per_bucket,
                                batch_format="pyarrow",
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
