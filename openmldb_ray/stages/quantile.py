"""Exact distributed quantiles without a global sort.

``sample_quantiles`` (curation.py) answers "roughly where is p50" with a
bounded-error bottom-k sample; this module answers it EXACTLY — the
``quantile_disc`` / ``quantile_cont`` / ``median`` surface a SQL user
expects (reference analog: OpenMLDB's percentile UDAFs run inside one
window partition; a corpus-wide exact percentile has no reference surface
and a naive one is a full sort of the column).

Algorithm — classic iterative histogram refinement for k-th order
statistics (the same scheme budget_select uses for its budget boundary,
select.py:1): every target quantile is a RANK in the sorted order; each
round is ONE streaming scan of the single-column projection that bins the
still-active intervals into ``bins`` linear buckets (per-batch
``searchsorted`` + ``bincount`` partials, tiny mergeable rows), the driver
folds the histograms, locates the bucket containing each rank, and shrinks
that rank's interval to the bucket's OBSERVED [min, max]. An interval
whose population fits ``collect_cap`` (or whose min == max — a tie run) is
resolved exactly. Convergence: values shrink ~bins× per round, so
float64's full range resolves in <= 7 rounds at bins=4096; total cost is
O(log_bins(range)) narrow scans and O(bins × #quantiles) driver state —
no shuffle, no sort, nothing corpus-sized on the driver.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import math

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


class _QState:
    __slots__ = ("rank", "lo", "hi", "n_in", "lo_open", "resolved")

    def __init__(self, rank: int):
        self.rank = rank          # global 0-based rank still to find
        self.lo = -math.inf       # active interval [lo, hi] (closed)
        self.hi = math.inf
        self.n_in = None          # population of the active interval
        self.lo_open = False      # True once lo is an observed value
        self.resolved = None


def _order_stats(narrow, ranks: list[int], col: str, *, bins: int,
                 collect_cap: int, max_rounds: int,
                 init: tuple | None = None) -> dict[int, float]:
    """value at each 0-based ``rank`` of the ascending-sorted non-null
    column of the single-column dataset ``narrow``. Ranks must already be
    validated against the count. ``init=(n, gmin, gmax)`` seeds every
    state from an already-run observe pass (skips the first round)."""
    states = {r: _QState(r) for r in sorted(set(ranks))}
    if init is not None:
        n0, gmin, gmax = init
        for s in states.values():
            s.lo, s.hi, s.n_in = gmin, gmax, n0
            if gmin == gmax:
                s.resolved = gmin

    for _ in range(max_rounds):
        active = [(r, s) for r, s in states.items() if s.resolved is None
                  and (s.n_in is None or s.n_in > collect_cap)]
        if not active:
            break
        specs = []
        for r, s in active:
            if math.isinf(s.lo) or math.isinf(s.hi) or s.lo == s.hi:
                edges = None      # first round / degenerate: observe min/max
            else:
                edges = np.linspace(s.lo, s.hi, bins + 1)[1:-1]
            specs.append((r, s.lo, s.hi, edges))

        def scan(t, specs=specs):
            import pyarrow as pa

            x = np.asarray(t.column(col).to_numpy(zero_copy_only=False),
                           dtype=np.float64)
            x = x[~np.isnan(x)]
            rk, bk, ck, mn, mx = [], [], [], [], []
            for (r, lo, hi, edges) in specs:
                v = x[(x >= lo) & (x <= hi)]
                if edges is None:
                    if len(v):
                        rk.append(r); bk.append(0); ck.append(len(v))
                        mn.append(float(v.min())); mx.append(float(v.max()))
                    continue
                idx = np.searchsorted(edges, v, side="right")
                cnt = np.bincount(idx, minlength=bins)
                occ = np.flatnonzero(cnt)
                bmin = np.full(bins, np.inf)
                bmax = np.full(bins, -np.inf)
                np.minimum.at(bmin, idx, v)
                np.maximum.at(bmax, idx, v)
                rk.extend([r] * len(occ)); bk.extend(occ.tolist())
                ck.extend(cnt[occ].tolist())
                mn.extend(bmin[occ].tolist()); mx.extend(bmax[occ].tolist())
            return pa.table({"r": pa.array(rk, pa.int64()),
                             "b": pa.array(bk, pa.int64()),
                             "c": pa.array(ck, pa.int64()),
                             "mn": pa.array(mn, pa.float64()),
                             "mx": pa.array(mx, pa.float64())})

        parts = narrow.map_batches(scan, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
        agg = parts.groupby(["r", "b"]).agg(
            c=("c", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        for (r, s), (_, lo, hi, edges) in zip(active, specs):
            sub = agg.loc[r] if r in agg.index.get_level_values(0) else None
            if sub is None or sub["c"].sum() == 0:
                raise RuntimeError(
                    f"rank {r}: interval [{lo}, {hi}] lost its population "
                    "(concurrent mutation or NaN drift)")
            counts = sub["c"].to_numpy()
            cum = np.cumsum(counts)
            j = int(np.searchsorted(cum, s.rank + 1))
            if j >= len(cum):
                raise RuntimeError(f"rank {s.rank} beyond interval "
                                   f"population {int(cum[-1])}")
            s.rank -= int(cum[j - 1]) if j else 0
            s.lo = float(sub["mn"].to_numpy()[j])
            s.hi = float(sub["mx"].to_numpy()[j])
            s.n_in = int(counts[j])
            if s.lo == s.hi:
                s.resolved = s.lo

    # collect phase: every unresolved state has a small population.
    # Filter by the UNION of the per-state intervals (bounded by
    # #pend x collect_cap rows), NOT their bounding box — for distant
    # quantiles (p01 and p99) the box spans nearly the whole column and
    # would drag it onto the driver.
    pend = {r: s for r, s in states.items() if s.resolved is None}
    if pend:
        ivals = [(s.lo, s.hi) for s in pend.values()]

        def keep(t, ivals=ivals):
            import pyarrow as pa

            x = np.asarray(t.column(col).to_numpy(zero_copy_only=False),
                           dtype=np.float64)
            m = np.zeros(len(x), dtype=bool)
            for lo, hi in ivals:
                m |= (x >= lo) & (x <= hi)
            v = x[~np.isnan(x) & m]
            return pa.table({col: pa.array(v, pa.float64())})

        vals = np.sort(np.concatenate(
            [b[col].to_numpy() for b in
             narrow.map_batches(keep, batch_format="pyarrow",
                                batch_size=None)
             .iter_batches(batch_format="pandas")] or
            [np.empty(0, np.float64)]))
        for r, s in pend.items():
            inside = vals[(vals >= s.lo) & (vals <= s.hi)]
            if s.rank >= len(inside):
                raise RuntimeError(f"rank {s.rank} beyond collected "
                                   f"population {len(inside)}")
            s.resolved = float(inside[s.rank])
    return {r: states[r].resolved for r in set(ranks)}


def _rank_plan(qs, n: int, interpolation: str):
    """fractions → (0-based ranks, per-q (ranks, weights) mix)."""
    ranks: set[int] = set()
    per_q: list[tuple[float, list[int], list[float]]] = []
    for q in qs:
        if interpolation == "disc":
            r = max(0, math.ceil(q * n) - 1)
            per_q.append((q, [r], [1.0]))
            ranks.add(r)
        elif interpolation == "cont":
            pos = q * (n - 1)
            lo, frac = int(math.floor(pos)), pos - math.floor(pos)
            if frac == 0.0:
                per_q.append((q, [lo], [1.0]))
                ranks.add(lo)
            else:
                per_q.append((q, [lo, lo + 1], [1.0 - frac, frac]))
                ranks.update((lo, lo + 1))
        else:
            raise ValueError(f"unknown interpolation {interpolation!r}")
    return ranks, per_q


def exact_quantiles(ds: "ray.data.Dataset", col: str, qs, *,
                    interpolation: str = "disc", bins: int = 4096,
                    collect_cap: int = 200_000, max_rounds: int = 24,
                    materialize_narrow: bool = False) -> pd.DataFrame:
    """Exact quantiles of a numeric column at fractions ``qs``.

    ``interpolation='disc'`` matches DuckDB/Postgres ``quantile_disc`` /
    ``percentile_disc``: the first element whose cumulative fraction
    reaches q, i.e. the 0-based rank ``ceil(q*n) - 1``.
    ``interpolation='cont'`` matches ``quantile_cont``: linear
    interpolation at position ``q*(n-1)``. ``'both'`` computes the two in
    ONE refinement (their ranks share every scan) and returns columns
    ``(q, disc, cont)``. Nulls/NaNs are excluded (SQL semantics).
    Returns a small driver DataFrame — the aggregate is scalar-sized by
    nature. ``materialize_narrow`` pins the single-column projection in
    the object store once; the refinement scans it O(log) times, so when
    the upstream is a parquet read or an expensive pipeline this is the
    scale-correct trade (same knob as select.budget_select)."""
    qs = [float(q) for q in qs]
    if any(q < 0 or q > 1 for q in qs):
        raise ValueError("quantile fractions must be in [0, 1]")
    kinds = (["disc", "cont"] if interpolation == "both"
             else [interpolation])
    narrow = ds.select_columns([col])
    if materialize_narrow:
        narrow = narrow.materialize()

    # observe pass: global count / min / max in one scan (seeds every
    # state, replacing both the count pass and the first observe round)
    def observe(t):
        import pyarrow as pa

        x = np.asarray(t.column(col).to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        x = x[~np.isnan(x)]
        if not len(x):
            return pa.table({"c": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"c": [len(x)], "mn": [float(x.min())],
                         "mx": [float(x.max())]})

    obs = narrow.map_batches(observe, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    n = int(obs["c"].sum()) if len(obs) else 0
    if n == 0:
        out = {"q": qs}
        for k in kinds:
            out["value" if len(kinds) == 1 else k] = [math.nan] * len(qs)
        return pd.DataFrame(out)
    gmin, gmax = float(obs["mn"].min()), float(obs["mx"].max())

    ranks: set[int] = set()
    plans = {}
    for k in kinds:
        rk, per_q = _rank_plan(qs, n, k)
        ranks |= rk
        plans[k] = per_q
    got = _order_stats(narrow, sorted(ranks), col, bins=bins,
                       collect_cap=collect_cap, max_rounds=max_rounds,
                       init=(n, gmin, gmax))
    out = {"q": qs}
    for k in kinds:
        out["value" if len(kinds) == 1 else k] = [
            sum(w * got[r] for r, w in zip(rs, ws))
            for (_, rs, ws) in plans[k]]
    return pd.DataFrame(out)


def _order_stats_keyed(narrow, kranks, col: str, key_col: str, *,
                       bins: int, collect_cap: int, max_rounds: int,
                       init: dict) -> dict:
    """Keyed variant: value at 0-based ``rank`` within each key's own
    ascending order. ``kranks`` is a set of (key, rank); ``init`` maps
    key -> (n, min, max) from the observe pass. Driver state is
    O(#keys x bins) — keys are assumed small-cardinality (sources /
    languages), the same contract as select.budget_select."""
    states = {}
    for key, r in sorted(set(kranks)):
        s = _QState(r)
        n0, gmin, gmax = init[key]
        s.lo, s.hi, s.n_in = gmin, gmax, n0
        if gmin == gmax:
            s.resolved = gmin
        states[(key, r)] = s

    for _ in range(max_rounds):
        active = [(kr, s) for kr, s in states.items()
                  if s.resolved is None and s.n_in > collect_cap]
        if not active:
            break
        specs = []
        for i, ((key, r), s) in enumerate(active):
            edges = (None if s.lo == s.hi
                     else np.linspace(s.lo, s.hi, bins + 1)[1:-1])
            specs.append((i, key, s.lo, s.hi, edges))

        def scan(t, specs=specs):
            import pyarrow as pa

            x = np.asarray(t.column(col).to_numpy(zero_copy_only=False),
                           dtype=np.float64)
            kk = t.column(key_col).to_numpy(zero_copy_only=False)
            ok = ~np.isnan(x)
            x, kk = x[ok], kk[ok]
            si, bk, ck, mn, mx = [], [], [], [], []
            for (i, key, lo, hi, edges) in specs:
                m = (kk == key) & (x >= lo) & (x <= hi)
                v = x[m]
                if not len(v):
                    continue
                if edges is None:
                    si.append(i); bk.append(0); ck.append(len(v))
                    mn.append(float(v.min())); mx.append(float(v.max()))
                    continue
                idx = np.searchsorted(edges, v, side="right")
                cnt = np.bincount(idx, minlength=bins)
                occ = np.flatnonzero(cnt)
                bmin = np.full(bins, np.inf)
                bmax = np.full(bins, -np.inf)
                np.minimum.at(bmin, idx, v)
                np.maximum.at(bmax, idx, v)
                si.extend([i] * len(occ)); bk.extend(occ.tolist())
                ck.extend(cnt[occ].tolist())
                mn.extend(bmin[occ].tolist()); mx.extend(bmax[occ].tolist())
            return pa.table({"s": pa.array(si, pa.int64()),
                             "b": pa.array(bk, pa.int64()),
                             "c": pa.array(ck, pa.int64()),
                             "mn": pa.array(mn, pa.float64()),
                             "mx": pa.array(mx, pa.float64())})

        parts = narrow.map_batches(scan, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
        agg = parts.groupby(["s", "b"]).agg(
            c=("c", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        have = set(agg.index.get_level_values(0))
        for (kr, s), (i, key, lo, hi, edges) in zip(active, specs):
            if i not in have:
                raise RuntimeError(f"key {key!r} rank {s.rank}: interval "
                                   f"[{lo}, {hi}] lost its population")
            sub = agg.loc[i]
            counts = sub["c"].to_numpy()
            cum = np.cumsum(counts)
            j = int(np.searchsorted(cum, s.rank + 1))
            if j >= len(cum):
                raise RuntimeError(f"key {key!r}: rank {s.rank} beyond "
                                   f"interval population {int(cum[-1])}")
            s.rank -= int(cum[j - 1]) if j else 0
            s.lo = float(sub["mn"].to_numpy()[j])
            s.hi = float(sub["mx"].to_numpy()[j])
            s.n_in = int(counts[j])
            if s.lo == s.hi:
                s.resolved = s.lo

    pend = {kr: s for kr, s in states.items() if s.resolved is None}
    if pend:
        # per-key UNION of pending intervals (not the global bounding
        # box — see _order_stats): bounded by #pend x collect_cap rows
        by_key: dict = {}
        for (key, _), s in pend.items():
            by_key.setdefault(str(key), []).append((s.lo, s.hi))

        def keep(t, by_key=by_key):
            import pyarrow as pa

            x = np.asarray(t.column(col).to_numpy(zero_copy_only=False),
                           dtype=np.float64)
            kk = t.column(key_col).to_numpy(zero_copy_only=False)
            ks = np.asarray([str(k) for k in kk], dtype=object)
            m = np.zeros(len(x), dtype=bool)
            for key, ivals in by_key.items():
                mk = ks == key
                mi = np.zeros(len(x), dtype=bool)
                for lo, hi in ivals:
                    mi |= (x >= lo) & (x <= hi)
                m |= mk & mi
            m &= ~np.isnan(x)
            return pa.table({"k": pa.array(ks[m].astype(str)),
                             "v": pa.array(x[m], pa.float64())})

        frames = [b for b in
                  narrow.map_batches(keep, batch_format="pyarrow",
                                     batch_size=None)
                  .iter_batches(batch_format="pandas")]
        allk = (np.concatenate([f["k"].to_numpy(dtype=object)
                                for f in frames])
                if frames else np.empty(0, object))
        allv = (np.concatenate([f["v"].to_numpy() for f in frames])
                if frames else np.empty(0, np.float64))
        for (key, r), s in pend.items():
            inside = np.sort(allv[(allk == str(key)) & (allv >= s.lo)
                                  & (allv <= s.hi)])
            if s.rank >= len(inside):
                raise RuntimeError(f"key {key!r}: rank {s.rank} beyond "
                                   f"collected population {len(inside)}")
            s.resolved = float(inside[s.rank])
    return {kr: s.resolved for kr, s in states.items()}


def exact_quantiles_by_key(ds: "ray.data.Dataset", col: str, qs,
                           key_col: str, *, interpolation: str = "disc",
                           bins: int = 4096, collect_cap: int = 200_000,
                           max_rounds: int = 24,
                           materialize_narrow: bool = False) -> pd.DataFrame:
    """GROUP BY quantiles with the same exact semantics as
    :func:`exact_quantiles`, one refinement shared across ALL keys: every
    round is still ONE streaming scan of the (key, value) projection —
    each active (key, quantile) bins its own interval inside the scan and
    the driver folds a (#active x bins) histogram table. Keys must be
    small-cardinality (driver state O(#keys x bins) — the
    budget_select contract); for per-window percentiles use the window
    UDAFs instead. Returns (key, q, value) / (key, q, disc, cont)."""
    qs = [float(q) for q in qs]
    if any(q < 0 or q > 1 for q in qs):
        raise ValueError("quantile fractions must be in [0, 1]")
    kinds = (["disc", "cont"] if interpolation == "both"
             else [interpolation])
    narrow = ds.select_columns([key_col, col])
    if materialize_narrow:
        narrow = narrow.materialize()

    def observe(df: pd.DataFrame) -> pd.DataFrame:
        # strict cast, same policy as the refinement/collect scans:
        # non-numeric data fails FAST here instead of mid-refinement
        v = pd.Series(df[col].to_numpy(dtype=np.float64, na_value=np.nan))
        g = pd.DataFrame({key_col: df[key_col].to_numpy(), "v": v}).dropna(
            subset=["v"]).groupby(key_col, sort=False)["v"]
        return pd.DataFrame({"c": g.count(), "mn": g.min(),
                             "mx": g.max()}).reset_index()

    obs = narrow.map_batches(observe, batch_format="pandas",
                             batch_size=None).to_pandas()
    fold = obs.groupby(key_col).agg(c=("c", "sum"), mn=("mn", "min"),
                                    mx=("mx", "max"))
    init = {k: (int(row["c"]), float(row["mn"]), float(row["mx"]))
            for k, row in fold.iterrows() if row["c"] > 0}

    kranks = set()
    plans = {}
    for key, (n, _, _) in init.items():
        for kind in kinds:
            rk, per_q = _rank_plan(qs, n, kind)
            kranks |= {(key, r) for r in rk}
            plans[(key, kind)] = per_q
    got = _order_stats_keyed(narrow, kranks, col, key_col, bins=bins,
                             collect_cap=collect_cap,
                             max_rounds=max_rounds, init=init)
    keys = sorted(init)
    out = {key_col: [k for k in keys for _ in qs],
           "q": [q for _ in keys for q in qs]}
    for kind in kinds:
        cname = "value" if len(kinds) == 1 else kind
        out[cname] = [sum(w * got[(k, r)] for r, w in zip(rs, ws))
                      for k in keys
                      for (_, rs, ws) in plans[(k, kind)]]
    return pd.DataFrame(out)
