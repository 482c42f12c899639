"""Distributed order-statistic selection without a global sort.

``budget_select`` answers the central data-curation question — "keep the
BEST rows (per source) until a count / token budget is exhausted" — with
the exact semantics of::

    SUM(weight) OVER (PARTITION BY key ORDER BY order DESC, id
                      ROWS UNBOUNDED PRECEDING) <= budget

but WITHOUT sorting: a global sort of 100 TB is an all-to-all shuffle of
every byte, while the selection itself only needs the (order, id) cut
point.  The cut is found by iterative histogram refinement (the classic
distributed selection / k-th order statistic scheme): each round is one
narrow-column scan that bins the still-ambiguous rows into ``bins``
buckets, a tiny (#keys × bins) reduce decides which single bucket the
boundary falls in, and the active interval shrinks ~bins×.  Ties on the
order value switch the refinement to the id axis; once the ambiguous set
fits ``collect_cap`` it is resolved exactly on the driver.  Total cost:
O(log_bins n) scans of a 3–4 column projection (column-pruned at the
parquet read) + one final filter pass over the full rows — no shuffle at
all.

Reference analog: OpenMLDB expresses "top rows by score" as a window
rank + filter (full sort); this is the scale-first replacement.  #keys is
assumed small (sources / languages — the per-key state lives on the
driver); for high-cardinality keys use :func:`top_n_per_key` instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bin_stats(x: np.ndarray, w: np.ndarray, edges: np.ndarray, bins: int):
    """Per-bin (wsum, cnt, min, max) via one searchsorted + bincount pass."""
    idx = np.clip(np.searchsorted(edges, x, side="right") - 1, 0, bins - 1)
    wsum = np.bincount(idx, weights=w.astype(np.float64), minlength=bins)
    cnt = np.bincount(idx, minlength=bins)
    bmin = np.full(bins, np.inf)
    bmax = np.full(bins, -np.inf)
    np.minimum.at(bmin, idx, x)
    np.maximum.at(bmax, idx, x)
    return wsum, cnt, bmin, bmax


class _KeyState:
    __slots__ = ("budget_left", "phase", "lo", "hi", "tie_val", "ilo", "ihi",
                 "explicit", "done", "collect")

    def __init__(self, budget):
        self.budget_left = budget
        self.phase = "order"          # refining on the ikey axis
        self.lo, self.hi = -np.inf, np.inf
        self.tie_val = None           # fixed ikey once in the id phase
        self.ilo, self.ihi = None, None
        self.explicit = None          # resolved boundary ids (np.int64)
        self.done = False
        self.collect = False


def budget_select(
    ds,
    order_col: str,
    *,
    budget: int,
    weight_col: str | None = None,
    key_col: str | None = None,
    id_col: str = "doc_id",
    ascending: bool = False,
    bins: int = 4096,
    collect_cap: int = 100_000,
    max_rounds: int = 40,
    materialize_narrow: bool = False,
):
    """Keep, per ``key_col`` value (or globally when None), the maximal
    prefix of rows in ``(order_col`` desc-by-default, ``id_col`` asc)
    order whose cumulative ``weight_col`` (1/row when None) stays within
    ``budget``.  Rows with a null order / id / weight are never selected.
    ``id_col`` must be unique within a key; weights must be >= 0.
    Returns the filtered dataset with all original columns.
    """
    sign = 1.0 if ascending else -1.0
    cols = [c for c in (key_col, order_col, id_col, weight_col) if c]
    narrow = ds.select_columns(list(dict.fromkeys(cols)))
    if materialize_narrow:
        # the refinement loop scans `narrow` O(log n) times; when the
        # upstream pipeline is expensive (model scoring, gram explosion),
        # pin the 3-4 column projection in the object store ONCE — it is
        # orders of magnitude smaller than the rows it derives from, so
        # this is the scale-correct trade (the final full-row filter pass
        # still streams the original ds exactly once)
        narrow = narrow.materialize()

    def _id_f64(t):
        """id column as float64, refusing ids whose tie-break exactness a
        float64 cannot represent (>= 2^53): silent corruption would
        select the wrong boundary rows — remap such ids densely first."""
        raw = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
        if raw.dtype.kind in "iu" and len(raw) and \
                int(np.abs(raw.astype(np.int64)).max()) >= (1 << 53):
            raise ValueError(
                "budget_select: id values >= 2^53 lose exactness in the "
                "float64 tie-break refinement — remap ids to a dense "
                "range (compact_vocab-style) first")
        return raw.astype(np.float64)

    def _keys_of(t):
        """Key column of a pyarrow batch as a str object ndarray. Null
        keys map to a NUL-framed sentinel (one shared group, SQL GROUP BY
        style) that cannot collide with a real key named 'None'."""
        if not key_col:
            return None
        s = t.column(key_col).to_pandas()
        out = s.astype(str).to_numpy(dtype=object)
        na = pd.isna(s).to_numpy()
        if na.any():
            out[na] = "\x00<null>\x00"
        return out

    # ------------------------------------------------ per-round scan body
    def scan_partials(specs):
        # specs: list of (k, phase, lo, hi, tie_val, edges) — broadcast by
        # closure; each batch emits <= len(specs) * occupied-bins rows
        def fn(t):
            import pyarrow as pa

            kcol = _keys_of(t)
            x = np.asarray(t.column(order_col).to_numpy(zero_copy_only=False),
                           dtype=np.float64) * sign
            ids = _id_f64(t)
            w = (np.asarray(t.column(weight_col).to_numpy(zero_copy_only=False),
                            dtype=np.float64)
                 if weight_col else np.ones(len(x)))
            valid = ~(np.isnan(x) | np.isnan(ids) | np.isnan(w))
            out_k, out_b, out_w, out_c, out_m, out_M = [], [], [], [], [], []
            for (k, phase, lo, hi, tie_val, edges) in specs:
                m = valid if kcol is None else (valid & (kcol == k))
                if phase == "order":
                    m = m & (x >= lo) & (x < hi)
                    col = x
                else:
                    m = m & (x == tie_val) & (ids >= lo) & (ids < hi)
                    col = ids
                if not m.any():
                    continue
                ws, cn, bm, bM = _bin_stats(col[m], w[m], edges, len(edges) - 1)
                occ = cn > 0
                nb = int(occ.sum())
                out_k.append(np.full(nb, k, dtype=object))
                out_b.append(np.nonzero(occ)[0])
                out_w.append(ws[occ]); out_c.append(cn[occ])
                out_m.append(bm[occ]); out_M.append(bM[occ])
            if not out_k:
                return pa.table({"k": pa.array([], pa.string()),
                                 "b": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.float64()),
                                 "c": pa.array([], pa.int64()),
                                 "m": pa.array([], pa.float64()),
                                 "M": pa.array([], pa.float64())})
            return pa.table({
                "k": pa.array(np.concatenate(out_k).astype(str)),
                "b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "w": pa.array(np.concatenate(out_w)),
                "c": pa.array(np.concatenate(out_c).astype(np.int64)),
                "m": pa.array(np.concatenate(out_m)),
                "M": pa.array(np.concatenate(out_M)),
            })

        part = narrow.map_batches(fn, batch_format="pyarrow", batch_size=None) \
            .to_pandas()
        if not len(part):
            return part
        return part.groupby(["k", "b"], sort=True).agg(
            w=("w", "sum"), c=("c", "sum"), m=("m", "min"), M=("M", "max")
        ).reset_index()

    # ----------------------------------------- key set + interval pre-pass
    # one narrow scan: per-key min/max of the internal order key — seeds
    # every key's refinement interval (and enumerates keys) with no shuffle
    def minmax_fn(t):
        import pyarrow as pa

        kcol = _keys_of(t)
        x = np.asarray(t.column(order_col).to_numpy(zero_copy_only=False),
                       dtype=np.float64) * sign
        ids = _id_f64(t)
        w = (np.asarray(t.column(weight_col).to_numpy(zero_copy_only=False),
                        dtype=np.float64)
             if weight_col else np.ones(len(x)))
        valid = ~(np.isnan(x) | np.isnan(ids) | np.isnan(w))
        if kcol is None:
            keys = np.array([""], dtype=object)
            codes = np.zeros(len(x), dtype=np.int64)
        else:
            keys, codes = np.unique(kcol[valid], return_inverse=True)
            x = x[valid]
            valid = np.ones(len(x), dtype=bool)
        mn = np.full(len(keys), np.inf)
        mx = np.full(len(keys), -np.inf)
        xv, cv = x[valid], codes[valid] if kcol is None else codes
        if len(xv):
            np.minimum.at(mn, cv, xv)
            np.maximum.at(mx, cv, xv)
        return pa.table({"k": pa.array(keys.astype(str)),
                         "m": pa.array(mn), "M": pa.array(mx)})

    mm = narrow.map_batches(minmax_fn, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    mm = mm.groupby("k").agg(m=("m", "min"), M=("M", "max"))

    # ------------------------------------------------------- driver loop
    states: dict = {}
    for k, row in mm.iterrows():
        s = _KeyState(float(budget))
        if budget <= 0 or not np.isfinite(row["m"]):
            s.done = True
            s.explicit = np.array([], dtype=np.int64)
        else:
            s.lo = float(row["m"])
            s.hi = float(np.nextafter(row["M"], np.inf))
        states[str(k)] = s

    for _ in range(max_rounds):
        active = {k: s for k, s in states.items()
                  if not s.done and not s.collect}
        if not active:
            break
        specs = []
        for k, s in active.items():
            if s.phase == "order":
                edges = np.linspace(s.lo, s.hi, bins + 1)
                specs.append((k, "order", s.lo, s.hi, None, edges))
            else:
                edges = np.linspace(s.ilo, s.ihi, bins + 1)
                specs.append((k, "id", s.ilo, s.ihi, s.tie_val, edges))
        part = scan_partials(specs)
        by_key = dict(iter(part.groupby("k"))) if len(part) else {}
        for (k, phase, lo, hi, tie_val, edges) in specs:
            s = active[k]
            g = by_key.get(k)
            if g is None or not len(g):       # no rows left in interval
                s.done = True
                s.explicit = np.array([], dtype=np.int64)
                continue
            g = g.sort_values("b")
            cw = g["w"].cumsum().to_numpy()
            over = cw > s.budget_left + 1e-9
            if not over.any():                # whole interval fits
                if s.phase == "order":
                    s.lo = np.nextafter(float(g["M"].iloc[-1]), np.inf)
                else:
                    s.ilo = float(g["M"].iloc[-1]) + 1.0
                s.budget_left -= float(cw[-1])
                s.done = True
                s.explicit = np.array([], dtype=np.int64)
                continue
            j = int(np.argmax(over))          # boundary bucket (row idx in g)
            s.budget_left -= float(cw[j - 1]) if j else 0.0
            bm, bM = float(g["m"].iloc[j]), float(g["M"].iloc[j])
            cnt_j = int(g["c"].iloc[j])
            if s.phase == "order":
                s.lo = bm                      # rows with ikey < bm selected
                s.hi = np.nextafter(bM, np.inf)
            else:
                s.ilo = bm
                s.ihi = bM + 1.0
            if cnt_j <= collect_cap:
                s.collect = True
            elif s.phase == "order" and bm == bM:
                # boundary bucket is a single order value: refine on id
                s.phase = "id"
                s.tie_val = bm
                s.ilo, s.ihi = -9.3e18, 9.3e18
    else:
        raise RuntimeError("budget_select: refinement did not converge")

    # ------------------------------------- exact resolution of boundaries
    coll = {k: s for k, s in states.items() if s.collect}
    if coll:
        specs = [(k, s.phase, (s.lo if s.phase == "order" else s.ilo),
                  (s.hi if s.phase == "order" else s.ihi), s.tie_val)
                 for k, s in coll.items()]

        def collect_fn(t):
            import pyarrow as pa

            kcol = _keys_of(t)
            x = np.asarray(t.column(order_col).to_numpy(zero_copy_only=False),
                           dtype=np.float64) * sign
            ids = _id_f64(t)
            w = (np.asarray(t.column(weight_col).to_numpy(zero_copy_only=False),
                            dtype=np.float64)
                 if weight_col else np.ones(len(x)))
            valid = ~(np.isnan(x) | np.isnan(ids) | np.isnan(w))
            ks, xs, iss, wss = [], [], [], []
            for (k, phase, lo, hi, tie_val) in specs:
                m = valid if kcol is None else (valid & (kcol == k))
                if phase == "order":
                    m = m & (x >= lo) & (x < hi)
                else:
                    m = m & (x == tie_val) & (ids >= lo) & (ids < hi)
                if not m.any():
                    continue
                n = int(m.sum())
                ks.append(np.full(n, k, dtype=object))
                xs.append(x[m]); iss.append(ids[m]); wss.append(w[m])
            if not ks:
                return pa.table({"k": pa.array([], pa.string()),
                                 "x": pa.array([], pa.float64()),
                                 "i": pa.array([], pa.float64()),
                                 "w": pa.array([], pa.float64())})
            return pa.table({"k": pa.array(np.concatenate(ks).astype(str)),
                             "x": pa.array(np.concatenate(xs)),
                             "i": pa.array(np.concatenate(iss)),
                             "w": pa.array(np.concatenate(wss))})

        rows = narrow.map_batches(collect_fn, batch_format="pyarrow",
                                  batch_size=None).to_pandas()
        for k, s in coll.items():
            g = rows[rows["k"] == k].sort_values(["x", "i"], kind="stable")
            cw = g["w"].cumsum().to_numpy()
            take = cw <= s.budget_left + 1e-9
            if take.any():
                # maximal prefix: stop at the first violator
                stop = int(np.argmin(take)) if not take.all() else len(take)
                s.explicit = g["i"].to_numpy()[:stop].astype(np.int64)
            else:
                s.explicit = np.array([], dtype=np.int64)
            s.done = True

    # --------------------------------------------------- final filter pass
    final = {k: (s.lo, s.tie_val, s.ilo,
                 s.explicit if s.explicit is not None
                 else np.array([], dtype=np.int64))
             for k, s in states.items()}

    def apply_filter(t):
        kcol = _keys_of(t)
        x = np.asarray(t.column(order_col).to_numpy(zero_copy_only=False),
                       dtype=np.float64) * sign
        ids = _id_f64(t)
        keep = np.zeros(len(x), dtype=bool)
        ok = ~np.isnan(x) & ~np.isnan(ids)
        for k, (cut, tie_val, id_cut, explicit) in final.items():
            m = ok if kcol is None else (ok & (kcol == k))
            if not m.any():
                continue
            sel = x < cut
            if tie_val is not None:
                sel |= (x == tie_val) & (ids < id_cut)
            if len(explicit):
                sel |= np.isin(ids, explicit.astype(np.float64))
            keep |= m & sel
        return t.filter(keep)

    return ds.map_batches(apply_filter, batch_format="pyarrow",
                          batch_size=None)


def top_n_per_key(
    ds,
    key_col: str,
    order_col: str,
    n: int,
    *,
    tiebreak: str | None = None,
    ascending: bool = False,
    num_buckets: int = 1024,
    num_partitions: int | None = None,
):
    """Keep the ``n`` best rows per key — the domain-frequency-cap /
    per-entity-history-cap op ("at most 100 docs per URL domain, highest
    quality first").  Unlike :func:`budget_select` this handles
    high-cardinality keys: a per-block combiner keeps <= n rows per key per
    block, then ONE coarse-bucket hash shuffle (the key itself is never a
    shuffle key) and a vectorized per-bucket head — the exact_dedup /
    latest_snapshot scale shape.  Ties broken by min ``tiebreak``.
    """
    from ..core.grouping import map_groups_typed
    from ..core.hashing import add_bucket_column

    asc = [True, ascending] + ([True] if tiebreak else [])

    def top_take(t):
        """Round 5: survivor positions from a NARROW (key, order,
        tiebreak) frame, rows gathered via Table.take — payload columns
        keep exact Arrow types (no pandas round trip). Null keys never
        group (pandas groupby-head parity); null orders sort last."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        if "__b" in t.column_names:
            t = t.drop_columns(["__b"])
        kcol = t[key_col]
        okk = ~pc.is_null(kcol, nan_is_null=True) \
            .to_numpy(zero_copy_only=False)
        pos = np.flatnonzero(okk).astype(np.int64)
        if not len(pos):
            return t.slice(0, 0)
        idx = pa.array(pos, pa.int64())
        d = {"__k": kcol.combine_chunks().take(idx).to_pandas().to_numpy(),
             "__o": t[order_col].combine_chunks().take(idx)
             .to_pandas().to_numpy(),
             "__rp": pos}
        sort_cols = ["__k", "__o"]
        if tiebreak:
            d["__tb"] = t[tiebreak].combine_chunks().take(idx) \
                .to_pandas().to_numpy()
            sort_cols.append("__tb")
        ndf = pd.DataFrame(d).sort_values(sort_cols, ascending=asc,
                                          kind="stable")
        keep = ndf.groupby("__k", sort=False).head(n)["__rp"] \
            .to_numpy(np.int64)
        keep.sort()  # emit survivors in input order
        return t.take(pa.array(keep, pa.int64()))

    add_b = add_bucket_column([key_col], "__b", num_buckets)

    pre = (ds.map_batches(top_take, batch_format="pyarrow", batch_size=None)
             .map_batches(add_b, batch_format="pyarrow", batch_size=None))
    return map_groups_typed(pre, "__b", top_take, batch_format="pyarrow",
                            num_partitions=num_partitions)
