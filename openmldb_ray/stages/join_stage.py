"""LAST JOIN — OpenMLDB's point-in-time / as-of join — plus plain joins.

Reference semantics (java/openmldb-batch/.../nodes/JoinPlan.scala):
- sorted LAST JOIN (:153-189): for each left row, among right rows matching
  the equi-key (and any residual condition, here the point-in-time bound
  ``right.order <= left.ts``), keep the one with the MAX order value —
  exactly one output row per left row; no match → right columns NULL.
- unsorted LAST JOIN (:190-196): an arbitrary surviving match
  (Spark ``dropDuplicates``); the reference's conformance expectations pin
  the LAST matching right row in right-table storage order
  (cases/function/join/test_lastjoin_simple.yaml id 4-5).
- LEFT JOIN (:39-151): plain left outer equi-join.

Two execution strategies:
- **broadcast** (small right side): the right table is collected once as an
  Arrow table, ``ray.put`` into the object store, and every map_batches
  task matches against it — no shuffle. This is the 100 TB path whenever
  the right side is a dimension-ish table.
- **shuffle** (both sides large): tag each side into one typed Arrow
  layout, union, hash-shuffle by a COARSE bucket of the join key and match
  all keys of a bucket in one vectorized kernel call — one all-to-all
  exchange, co-partitioning both sides (SURVEY §7.4). Hot join keys are
  salted (``skew_salts``) so one key no longer lands on one worker.

Ties on the order value are broken by ``tiebreak`` (max wins), because a
distributed read has no stable arrival order to fall back on.

Round-5 exchange format: BOTH strategies are Arrow-native end to end.
Matching happens on a NARROW ``(key, order, row-position)`` pandas frame
(nulls removed via Arrow ``take`` first, so int64 never degrades through
float64); the output is assembled by ``Table.take`` on the matched
positions, so payload columns keep their exact Arrow types — nullable
ints stay int64-with-nulls, ints past 2^53 stay exact, list/binary
payloads ride untouched (the `_bucket_equi_join` idiom, VERDICT r4 #1).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ..config import broadcast_limit as _cfg_broadcast_limit

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

SIDE_COL = "__side"
RID_COL = "__rid"


# ---------------------------------------------------------------------------
# Arrow-native LAST JOIN kernel (round 5)
# ---------------------------------------------------------------------------

def _arrow_table_of(ds) -> pa.Table:
    """A materialized Dataset / driver DataFrame → ONE pa.Table, keeping
    the exact block types (never a pandas round-trip: Arrow blocks with
    nullable ints / 2^53+ ints / list payloads must not degrade)."""
    if isinstance(ds, pd.DataFrame):
        return pa.Table.from_pandas(ds, preserve_index=False) \
            .replace_schema_metadata(None)
    from ..core.empty_ds import is_empty_shim

    if is_empty_shim(ds):
        return ds.to_arrow()
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        sch = ds.schema()
        if sch is None:
            return pa.table({})
        base = getattr(sch, "base_schema", sch)
        if isinstance(base, pa.Schema):
            return base.empty_table()
        return pa.Table.from_pandas(
            pd.DataFrame({n: pd.Series(dtype=t)
                          for n, t in zip(base.names, base.types)}),
            preserve_index=False).replace_schema_metadata(None)
    t = (tabs[0] if len(tabs) == 1
         else pa.concat_tables(tabs, promote_options="permissive"))
    return t.combine_chunks().replace_schema_metadata(None)


def _prep_right_arrow(rtab: pa.Table, key: str, order_by: str | None,
                      tiebreak: str | None,
                      right_cols: dict[str, str] | None) -> pa.Table:
    """Right-side layout for the matcher: projection/rename per
    ``right_cols`` (key/order/tiebreak always kept) + a fresh arrival-order
    ``__rid`` column (the unsorted LAST JOIN determinism column; overwrites
    a caller-provided one, whose order it matches under the preserve_order
    materialization in :func:`last_join`)."""
    if right_cols:
        keep = [key] + [c for c in (order_by, tiebreak)
                        if c and c not in right_cols]
        keep = [c for c in dict.fromkeys(list(keep) + list(right_cols))
                if c != RID_COL]
        names = [right_cols.get(c, c) for c in keep]
        rtab = rtab.select(keep).rename_columns(names)
    elif RID_COL in rtab.column_names:
        rtab = rtab.drop_columns([RID_COL])
    return rtab.append_column(
        RID_COL, pa.array(np.arange(rtab.num_rows, dtype=np.int64)))


def _notnull_np(arr) -> np.ndarray:
    """Bool mask of non-null values (float NaN counts as null — SQL rule)."""
    try:
        m = pc.is_null(arr, nan_is_null=True)
    except pa.ArrowNotImplementedError:  # e.g. null-typed column
        return np.zeros(len(arr), dtype=bool)
    return ~m.to_numpy(zero_copy_only=False)


def _col_np(tab: pa.Table, col: str, positions: np.ndarray | None = None):
    """Exact numpy/object values of one Arrow column, optionally gathered
    at ``positions`` FIRST (Arrow-side) so an int column whose other rows
    hold nulls never round-trips through float64."""
    a = tab[col]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if positions is not None:
        a = a.take(pa.array(positions, pa.int64()))
    return a.to_pandas().to_numpy()


def _align_dtypes(lv: np.ndarray, rv: np.ndarray):
    """Make two narrow key/order arrays merge-compatible: numeric pairs
    promote; anything else falls back to object equality."""
    if lv.dtype == rv.dtype:
        return lv, rv
    lk, rk = lv.dtype.kind, rv.dtype.kind
    if lk in "iufb" and rk in "iufb":
        common = np.promote_types(lv.dtype, rv.dtype)
        return lv.astype(common), rv.astype(common)
    if lk == "M" and rk == "M":
        return lv.astype("M8[ns]"), rv.astype("M8[ns]")
    return lv.astype(object), rv.astype(object)


def _narrow_asof_frame(rtab: pa.Table, key: str, order: str,
                       tb: str | None) -> pd.DataFrame:
    """Narrow right frame ``(__k, __o, __rp)`` for merge_asof: null
    key/order rows dropped (they can never satisfy the PIT bound), sorted
    ascending by (order, tiebreak-or-rid) — so backward's bottom-most pick
    is the max-tiebreak winner and forward's top-most the min."""
    ok = _notnull_np(rtab[key]) & _notnull_np(rtab[order])
    pos = np.flatnonzero(ok)
    df = pd.DataFrame({"__k": _col_np(rtab, key, pos),
                       "__o": _col_np(rtab, order, pos),
                       "__rp": pos.astype(np.int64)})
    if tb:
        df["__tb"] = rtab[tb].combine_chunks().take(
            pa.array(pos, pa.int64())).to_pandas().to_numpy()
        df = df.sort_values(["__o", "__tb"], kind="stable")
    else:
        df = df.sort_values(["__o", "__rp"], kind="stable")
    return df[["__k", "__o", "__rp"]].reset_index(drop=True)


def _narrow_singles(rtab: pa.Table, key: str, order: str | None,
                    tb: str | None) -> pd.DataFrame:
    """One surviving right position per key ``(__k, __rp)``: max
    (order, tiebreak) for sorted LAST JOIN — null orders sort FIRST so
    they lose to any real order but still match when a key has only
    null-order candidates (test_lastjoin_complex.yaml id 13-1) — or max
    storage rid for unsorted (test_lastjoin_simple.yaml id 4-5). Null
    keys never match (reference groupby semantics)."""
    pos = np.flatnonzero(_notnull_np(rtab[key]))
    d = {"__k": _col_np(rtab, key, pos), "__rp": pos.astype(np.int64)}
    if order is not None:
        d["__o"] = rtab[order].combine_chunks().take(
            pa.array(pos, pa.int64())).to_pandas().to_numpy()
        sort_cols = ["__k", "__o"]
        if tb:
            d["__tb"] = rtab[tb].combine_chunks().take(
                pa.array(pos, pa.int64())).to_pandas().to_numpy()
            sort_cols.append("__tb")
        else:
            sort_cols.append("__rp")
        df = pd.DataFrame(d).sort_values(sort_cols, kind="stable",
                                         na_position="first")
    else:
        df = pd.DataFrame(d).sort_values(["__k", "__rp"], kind="stable")
    return df.groupby("__k", sort=False).tail(1)[["__k", "__rp"]] \
             .reset_index(drop=True)


def _match_asof(ltab: pa.Table, left_key: str, left_ts: str,
                rnarrow: pd.DataFrame, *, direction: str,
                tolerance) -> np.ndarray:
    """Per left row: position of the PIT-matching right row, or -1.
    Backward = max right order <= left ts (LAST JOIN); forward = min
    right order >= left ts (label join); tolerance bounds the distance."""
    n = ltab.num_rows
    rp = np.full(n, -1, np.int64)
    ok = _notnull_np(ltab[left_key]) & _notnull_np(ltab[left_ts])
    lp = np.flatnonzero(ok)
    if not len(lp) or not len(rnarrow):
        return rp
    lk, rk = _align_dtypes(_col_np(ltab, left_key, lp),
                           rnarrow["__k"].to_numpy())
    lts, ro = _align_dtypes(_col_np(ltab, left_ts, lp),
                            rnarrow["__o"].to_numpy())
    ldf = pd.DataFrame({"__k": lk, "__ts": lts,
                        "__lp": lp.astype(np.int64)}) \
        .sort_values("__ts", kind="stable")
    rdf = pd.DataFrame({"__k": rk, "__o": ro,
                        "__rp": rnarrow["__rp"].to_numpy()})
    merged = pd.merge_asof(ldf, rdf, left_on="__ts", right_on="__o",
                           by="__k", direction=direction,
                           allow_exact_matches=True, tolerance=tolerance)
    got = merged["__rp"].to_numpy()
    hit = ~pd.isna(got)
    rp[merged["__lp"].to_numpy()[hit]] = got[hit].astype(np.int64)
    return rp


def _match_single(ltab: pa.Table, left_key: str,
                  singles: pd.DataFrame) -> np.ndarray:
    """Per left row: the pre-reduced single match position per key, or -1."""
    n = ltab.num_rows
    rp = np.full(n, -1, np.int64)
    lp = np.flatnonzero(_notnull_np(ltab[left_key]))
    if not len(lp) or not len(singles):
        return rp
    lk, rk = _align_dtypes(_col_np(ltab, left_key, lp),
                           singles["__k"].to_numpy())
    m = pd.DataFrame({"__k": lk, "__lp": lp.astype(np.int64)}).merge(
        pd.DataFrame({"__k": rk, "__rp": singles["__rp"].to_numpy()}),
        on="__k", how="inner")
    rp[m["__lp"].to_numpy(np.int64)] = m["__rp"].to_numpy(np.int64)
    return rp


def _match_residual(ltab: pa.Table, rtab: pa.Table, *, left_key: str,
                    right_key: str, left_ts: str | None,
                    right_order: str | None, tiebreak_col: str | None,
                    residual, direction: str, tolerance) -> np.ndarray:
    """Generic path (arbitrary residual ON condition, reference
    JoinPlan.scala:39-151): narrow equi candidates → PIT bound → residual
    mask over an Arrow-assembled candidate frame → per-left argmax.
    O(matches), like the reference's JIT'd nested probe. NaN keys match
    NaN keys here (pandas merge semantics — the SQL engine's null-safe
    LAST JOIN equality rides on this via its encoded key)."""
    n = ltab.num_rows
    rp_out = np.full(n, -1, np.int64)
    if not n or not rtab.num_rows:
        return rp_out
    lk, rk = _align_dtypes(_col_np(ltab, left_key), _col_np(rtab, right_key))
    cand = pd.DataFrame({"__k": lk, "__lp": np.arange(n, dtype=np.int64)}) \
        .merge(pd.DataFrame({"__k": rk,
                             "__rp": np.arange(rtab.num_rows,
                                               dtype=np.int64)}),
               on="__k", how="inner")
    if not len(cand):
        return rp_out
    lp = cand["__lp"].to_numpy(np.int64)
    rpp = cand["__rp"].to_numpy(np.int64)
    ro_np = _col_np(rtab, right_order) if right_order is not None else None
    keep = np.ones(len(lp), dtype=bool)
    if right_order is not None and left_ts is not None:
        # PIT: a null order can never satisfy the bound — drop early.
        # WITHOUT a PIT bound null-order candidates stay ELIGIBLE (they
        # sort FIRST below, so any real order beats them but a key whose
        # only candidate has a null order still matches).
        keep &= ~pd.isna(ro_np[rpp])
    if left_ts is not None:
        lts_np = _col_np(ltab, left_ts)
        lo, ro = lts_np[lp], ro_np[rpp]
        with np.errstate(invalid="ignore"):
            if direction == "forward":
                keep &= ro >= lo
                if tolerance is not None:
                    keep &= ro <= lo + tolerance
            else:
                keep &= ro <= lo
                if tolerance is not None:
                    keep &= ro >= lo - tolerance
    lp, rpp = lp[keep], rpp[keep]
    if residual is not None and len(lp):
        # candidate frame for the vectorized predicate: left columns +
        # right columns (suffixed ``__r`` on collision, key coalesced) —
        # the layout the pandas inner-merge used to produce
        lfr = ltab.take(pa.array(lp, pa.int64())).to_pandas()
        rsel = [c for c in rtab.column_names
                if not (c == right_key and right_key == left_key)]
        rfr = rtab.select(rsel).take(pa.array(rpp, pa.int64())).to_pandas()
        rfr.columns = [c + "__r" if c in lfr.columns else c
                       for c in rfr.columns]
        frame = pd.concat([lfr.reset_index(drop=True),
                           rfr.reset_index(drop=True)], axis=1)
        mask = np.asarray(residual(frame), dtype=bool)
        lp, rpp = lp[mask], rpp[mask]
    if not len(lp):
        return rp_out
    if right_order is not None:
        d = {"__lp": lp, "__o": ro_np[rpp], "__rp": rpp}
        sort_cols = ["__o"]
        if tiebreak_col:
            d["__tb"] = _col_np(rtab, tiebreak_col)[rpp]
            sort_cols.append("__tb")
        else:
            sort_cols.append("__rp")
        g = (pd.DataFrame(d)
             .sort_values(sort_cols, kind="stable", na_position="first")
             .groupby("__lp", sort=False))
        pick = g.head(1) if direction == "forward" else g.tail(1)
    else:
        pick = (pd.DataFrame({"__lp": lp, "__rp": rpp})
                .sort_values("__rp", kind="stable")
                .groupby("__lp", sort=False).tail(1))
    rp_out[pick["__lp"].to_numpy(np.int64)] = pick["__rp"].to_numpy(np.int64)
    return rp_out


def _assemble_take(ltab: pa.Table, rtab: pa.Table, rp: np.ndarray,
                   rpay: list[str], types: dict | None = None) -> pa.Table:
    """Join output = left batch columns (zero-copy, exact types) + right
    payload columns gathered by matched position (-1 → a null row, via a
    null take index). ``types`` optionally re-casts columns degraded to
    null-type by the exchange (all-null slices) back to the plan types so
    every bucket's output schema unifies."""
    idx = pa.array(rp, type=pa.int64(), mask=rp < 0)
    taken = rtab.select(rpay).take(idx) if rpay else None
    arrays, names = [], []
    for c, tab in [(c, ltab) for c in ltab.column_names] + \
                  [(c, taken) for c in rpay]:
        a = tab[c]
        want = types.get(c) if types else None
        if want is not None and a.type != want:
            a = pc.cast(a, want)
        arrays.append(a)
        names.append(c)
    return pa.Table.from_arrays(arrays, names=names)


def _promote_pa(a: "pa.DataType", b: "pa.DataType") -> "pa.DataType":
    """One physical type for a key pair across both exchange sides."""
    if a == b:
        return a
    return pa.unify_schemas(
        [pa.schema([("k", a)]), pa.schema([("k", b)])],
        promote_options="permissive").field("k").type


class _BroadcastLastJoin:
    """Broadcast LAST JOIN stage: right Arrow table + pre-built narrow
    matching frame fetched ONCE per actor (``lazy=True`` → used as a plain
    pickled task fn; refs resolve in the worker on first call — per-batch
    plasma get of a small table is ~free and task workers are reused)."""

    def __init__(self, right_ref, narrow_ref, mode, left_key, right_key,
                 left_ts, right_order, tiebreak_col, out_cols, residual,
                 direction="backward", tolerance=None, lazy=False):
        self._right_ref, self._narrow_ref = right_ref, narrow_ref
        self.rtab = None if lazy else ray.get(right_ref)
        self.narrow = (None if (lazy or narrow_ref is None)
                       else ray.get(narrow_ref))
        self.mode = mode
        self.left_key, self.right_key = left_key, right_key
        self.left_ts, self.right_order = left_ts, right_order
        self.tiebreak_col, self.out_cols = tiebreak_col, out_cols
        self.residual = residual
        self.direction, self.tolerance = direction, tolerance

    def __call__(self, ltab: pa.Table) -> pa.Table:
        if self.rtab is None:
            self.rtab = ray.get(self._right_ref)
            if self._narrow_ref is not None:
                self.narrow = ray.get(self._narrow_ref)
        if self.mode == "residual":
            rp = _match_residual(
                ltab, self.rtab, left_key=self.left_key,
                right_key=self.right_key, left_ts=self.left_ts,
                right_order=self.right_order,
                tiebreak_col=self.tiebreak_col, residual=self.residual,
                direction=self.direction, tolerance=self.tolerance)
        elif self.mode == "asof":
            rp = _match_asof(ltab, self.left_key, self.left_ts, self.narrow,
                             direction=self.direction,
                             tolerance=self.tolerance)
        else:
            rp = _match_single(ltab, self.left_key, self.narrow)
        lnames = ltab.column_names
        rpay = ([c for c in self.out_cols if c not in lnames]
                if self.out_cols is not None
                else [c for c in self.rtab.column_names
                      if c not in lnames and c != RID_COL])
        return _assemble_take(ltab, self.rtab, rp, rpay)


def _named_pandas(ds) -> pd.DataFrame:
    """``ds.to_pandas()`` with columns restored from the Dataset schema:
    Ray drops column names when every block is empty, which would crash a
    broadcast join's key projection on a legitimately rowless side."""
    df = ds.to_pandas()
    if df.shape[1] == 0:
        sch = ds.schema()
        if sch is not None and sch.names:
            import pyarrow as pa

            # fresh construction, not reindex: the degenerate empty frame
            # Ray returns can hold a 2-D manager block that reindex chokes
            # on (pandas take_2d ValueError)
            if all(isinstance(t, pa.DataType) for t in sch.types):
                df = pa.table({n: pa.nulls(0, t) for n, t
                               in zip(sch.names, sch.types)}).to_pandas()
            else:
                df = pd.DataFrame(columns=list(sch.names))
    return df


def _seed_typed_empty(out_ds, out_types: dict, planned: list[str]):
    """Union ONE 0-row typed Arrow block onto a join output so an all-empty
    result keeps its schema: Ray's map machinery skips empty blocks, so a
    join over a rowless left collapses ``schema()`` to None downstream
    (fuzzer-found via resample_asof's span<step empty grids). No-op when
    any planned column's Arrow type is unknown (pandas-block inputs)."""
    import pyarrow as pa

    from ..core.empty_ds import is_empty_shim

    if is_empty_shim(out_ds) or not planned \
            or not all(isinstance(out_types.get(c), pa.DataType)
                       for c in planned):
        return out_ds
    import ray.data as rd

    seed = pa.table({c: pa.nulls(0, out_types[c]) for c in planned})
    return out_ds.union(rd.from_arrow(seed))


def last_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    *,
    order_by: str | None = None,
    asof_left_ts: str | None = None,
    tiebreak: str | None = None,
    right_cols: dict[str, str] | None = None,
    strategy: str = "auto",
    broadcast_limit: int | None = None,
    num_partitions: int | None = None,
    concurrency=None,
    residual=None,
    skew_salts: int = 0,
    hot_key_threshold: float = 0.05,
    direction: str = "backward",
    tolerance=None,
) -> "ray.data.Dataset":
    """OpenMLDB ``LAST JOIN`` (JoinPlan.scala:153-196).

    on: join key — a str (same name both sides) or (left_key, right_key).
    order_by: right order column; max wins (sorted LAST JOIN). None → the
        last stored right row (unsorted LAST JOIN).
    asof_left_ts: when set, adds the point-in-time residual condition
        ``right.order_by <= left.asof_left_ts`` (requires order_by) — the
        zero-temporal-leakage join of the north rule.
    right_cols: {right_col: output_name} projection of right-side payload.
    residual: optional vectorized predicate ``fn(joined_df) -> bool mask``
        over the equi-matched frame (left columns + renamed right columns)
        — the arbitrary ON condition of the reference's JIT'd joins
        (e.g. ``lambda m: m["l_v"] > m["r_v"]`` for non-equi clauses in
        test_lastjoin_complex.yaml). Forces the generic merge path.
    skew_salts: shuffle-path hot-key defusal (reference analog:
        utils/SkewDataFrameUtils.scala). When > 0, join keys holding more
        than ``hot_key_threshold`` of the sampled left rows are salted into
        ``skew_salts`` sub-groups; the matching right rows are replicated
        per salt, so one hot key no longer lands on one worker.
    """
    left_key, right_key = (on, on) if isinstance(on, str) else on
    if asof_left_ts is not None and order_by is None:
        raise ValueError("asof_left_ts requires order_by (the right ts column)")

    if isinstance(right, pd.DataFrame):
        strategy = "broadcast"  # an already-small driver-side table
    elif strategy in ("auto", "broadcast"):
        # materialize ONCE: count comes from block metadata and the
        # broadcast collect re-reads the same materialized blocks instead
        # of executing the upstream pipeline twice (VERDICT r1 fix #5).
        # preserve_order pins the block order during this materialization:
        # the unsorted LAST JOIN's "last stored row" is defined by arrival
        # order, which must not vary with Ray task scheduling. Set on the
        # DATASET's captured context — Ray deep-copies DataContext into
        # each dataset at creation, so mutating the global one is a no-op
        # for a dataset the caller built earlier.
        _ctx = getattr(right, "context", None)  # EmptyTypedDataset has none
        opts = _ctx.execution_options if _ctx is not None else None
        prev_preserve = opts.preserve_order if opts is not None else None
        if opts is not None:
            opts.preserve_order = True
        try:
            right = right.materialize()
        finally:
            if opts is not None:
                opts.preserve_order = prev_preserve
        if strategy == "auto":
            strategy = ("broadcast"
                        if right.count() <= _cfg_broadcast_limit(
                            broadcast_limit, 5_000_000)
                        else "shuffle")

    mapped_key = right_cols.get(right_key, right_key) if right_cols else right_key
    mapped_order = (right_cols.get(order_by, order_by) if (right_cols and order_by) else order_by)
    out_cols = list(right_cols.values()) if right_cols else None

    mapped_tb = (right_cols.get(tiebreak, tiebreak)
                 if (right_cols and tiebreak) else tiebreak)

    if strategy == "broadcast":
        rtab = _prep_right_arrow(_arrow_table_of(right), right_key,
                                 order_by, tiebreak, right_cols)
        if residual is not None:
            mode, narrow = "residual", None
        elif asof_left_ts is not None:
            mode = "asof"
            narrow = _narrow_asof_frame(rtab, mapped_key, mapped_order,
                                        mapped_tb)
        else:
            mode = "single"
            narrow = _narrow_singles(rtab, mapped_key, mapped_order,
                                     mapped_tb)
        out_types: dict = {}
        planned_out: list[str] = []
        if not isinstance(right, pd.DataFrame):
            # typed-empty seeding metadata. NOTE: deliberately NO
            # left.schema() probe when right is a driver DataFrame — on an
            # unexecuted left (e.g. flagship's window output) schema()
            # would execute the whole upstream sort once just to seed the
            # join output.
            lsch = left.schema()
            out_types = {n: t for n, t in zip(lsch.names, lsch.types)
                         if isinstance(t, pa.DataType)}
            for f in rtab.schema:
                out_types.setdefault(f.name, f.type)
            planned_out = list(dict.fromkeys(
                list(lsch.names)
                + [c for c in (out_cols if out_cols is not None
                               else [f.name for f in rtab.schema
                                     if f.name != RID_COL])
                   if c not in lsch.names]))
        kwargs = dict(
            right_ref=ray.put(rtab),
            narrow_ref=(ray.put(narrow) if narrow is not None else None),
            mode=mode, left_key=left_key, right_key=mapped_key,
            left_ts=asof_left_ts, right_order=mapped_order,
            tiebreak_col=mapped_tb, out_cols=out_cols, residual=residual,
            direction=direction, tolerance=tolerance,
        )
        if rtab.num_rows <= 50_000:
            # tiny right side: a stateless task (per-batch plasma get of a
            # small table is ~free, and Ray reuses task workers across
            # datasets — actor pools are torn down per dataset, which
            # dominates wall-time for short queries)
            join_fn = _BroadcastLastJoin(**kwargs, lazy=True)
            out_ds = left.map_batches(join_fn, batch_format="pyarrow",
                                      batch_size=None)
        else:
            out_ds = left.map_batches(
                _BroadcastLastJoin,
                batch_format="pyarrow",
                fn_constructor_kwargs=kwargs,
                concurrency=concurrency or (1, 16), batch_size=None)
        return _seed_typed_empty(out_ds, out_types, planned_out)

    # ---- shuffle strategy: Arrow coarse-bucket co-exchange (round 5) ----
    # Both sides ride the exchange as TYPED Arrow blocks in ONE unified
    # layout (missing counterpart columns are typed nulls); the shuffle key
    # is a COARSE bucket of the join key — one vectorized kernel call per
    # bucket, not one per key — and the per-bucket kernel is the same
    # narrow-match + Table.take assembly as the broadcast path.
    from ..core.empty_ds import union_any
    from ..core.grouping import arrow_col_type, map_groups_typed
    from ..core.hashing import (add_bucket_column, default_num_buckets,
                                quiet_ray_data_logs)

    def _type_or_none(sch, c):
        # pandas-block object columns have no static Arrow type; they ride
        # the exchange with per-batch Arrow inference (no cast, no typed
        # null padding) — the defensive casts downstream skip None
        try:
            return arrow_col_type(sch, c)
        except TypeError:
            return None

    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    ltypes = {c: _type_or_none(lsch, c) for c in lcols}
    if right_cols:
        rkeep = [right_key] + [c for c in (order_by, tiebreak)
                               if c and c not in right_cols]
        rkeep = [c for c in dict.fromkeys(rkeep + list(right_cols))
                 if c != RID_COL]
        rtypes = {right_cols.get(c, c): _type_or_none(rsch, c)
                  for c in rkeep}
        rnames = [right_cols.get(c, c) for c in rkeep] + [RID_COL]
    else:
        rkeep = [c for c in rsch.names if c != RID_COL]
        rtypes = {c: _type_or_none(rsch, c) for c in rkeep}
        rnames = rkeep + [RID_COL]
    rtypes[RID_COL] = pa.int64()

    key_type = (None if (ltypes[left_key] is None
                         or rtypes[mapped_key] is None)
                else _promote_pa(ltypes[left_key], rtypes[mapped_key]))
    utypes = dict(ltypes)
    for c in rnames:
        utypes.setdefault(c, rtypes[c])
    utypes[left_key] = utypes[mapped_key] = key_type
    unified = list(dict.fromkeys(lcols + rnames))
    rpay = ([c for c in out_cols if c not in lcols]
            if out_cols is not None
            else [c for c in rnames if c not in lcols and c != RID_COL])

    # hot-key defusal: salt the hot left keys, replicate the matching right
    # rows once per salt (reference analog: SkewDataFrameUtils.scala's
    # percentile-split + expansion). Detection = per-block heavy hitters
    # (top-k counts per block, summed on the driver — tiny result).
    hot_keys: frozenset = frozenset()
    if skew_salts > 1:
        hot_keys = _detect_hot_keys(left, left_key, hot_key_threshold)
    hot_ref = ray.put(hot_keys) if hot_keys else None
    nb = default_num_buckets()

    def tag(side_is_left: bool):
        key = left_key if side_is_left else mapped_key
        present = set(lcols) if side_is_left else set(rnames)
        addb = add_bucket_column([key], "__b", nb)

        def fn(t: pa.Table) -> pa.Table:
            quiet_ray_data_logs()
            if not side_is_left:
                t = _prep_right_arrow(t, right_key, order_by, tiebreak,
                                      right_cols)
            n = t.num_rows
            arrays = []
            for c in unified:
                if c in present:
                    a = t[c]
                    if utypes[c] is not None and a.type != utypes[c]:
                        a = pc.cast(a, utypes[c])
                    arrays.append(a.combine_chunks()
                                  if isinstance(a, pa.ChunkedArray) else a)
                else:
                    arrays.append(pa.nulls(n, utypes[c])
                                  if utypes[c] is not None else pa.nulls(n))
            out = addb(pa.Table.from_arrays(arrays, names=unified))
            out = out.append_column(
                SIDE_COL, pa.array(np.full(n, side_is_left), pa.bool_()))
            if hot_ref is not None:
                hot = ray.get(hot_ref)
                mask = out[key].to_pandas().isin(hot).to_numpy()
                if side_is_left:
                    salt = np.zeros(n, dtype=np.int64)
                    salt[mask] = (np.arange(int(mask.sum()), dtype=np.int64)
                                  % skew_salts)
                    out = out.append_column("__salt", pa.array(salt))
                else:
                    pmask = pa.array(mask)
                    cold = out.filter(pc.invert(pmask))
                    cold = cold.append_column(
                        "__salt",
                        pa.array(np.zeros(cold.num_rows, dtype=np.int64)))
                    hotr = out.filter(pmask)
                    reps = [hotr.append_column(
                        "__salt",
                        pa.array(np.full(hotr.num_rows, s, dtype=np.int64)))
                        for s in range(skew_salts)]
                    out = pa.concat_tables([cold, *reps])
            return out

        return fn

    lt = left.map_batches(tag(True), batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag(False), batch_format="pyarrow",
                           batch_size=None)
    both = union_any(lt, rt)

    def per_bucket(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        side = t[SIDE_COL].to_numpy(zero_copy_only=False).astype(bool)
        ltab = t.filter(pa.array(side)).select(lcols)
        rtab = t.filter(pa.array(~side)).select(rnames)
        if residual is not None:
            rp = _match_residual(
                ltab, rtab, left_key=left_key, right_key=mapped_key,
                left_ts=asof_left_ts, right_order=mapped_order,
                tiebreak_col=mapped_tb, residual=residual,
                direction=direction, tolerance=tolerance)
        elif asof_left_ts is not None:
            rp = _match_asof(
                ltab, left_key, asof_left_ts,
                _narrow_asof_frame(rtab, mapped_key, mapped_order,
                                   mapped_tb),
                direction=direction, tolerance=tolerance)
        else:
            rp = _match_single(
                ltab, left_key,
                _narrow_singles(rtab, mapped_key, mapped_order, mapped_tb))
        return _assemble_take(ltab, rtab, rp, rpay, types=utypes)

    group_keys = ["__b", "__salt"] if hot_ref is not None else "__b"
    return map_groups_typed(both, group_keys, per_bucket,
                            batch_format="pyarrow",
                            num_partitions=num_partitions)


def _detect_hot_keys(left: "ray.data.Dataset", key: str, threshold: float,
                     topk: int = 20) -> frozenset:
    """Per-block heavy hitters: each block reports its top-k key counts plus
    its row count; the driver sums the (tiny) result and flags keys holding
    more than ``threshold`` of all rows. A >threshold key necessarily is a
    within-block heavy hitter, so the count for any truly hot key is exact."""

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[key].value_counts().head(topk)
        n = np.zeros(len(vc), dtype=np.int64)
        if len(n):
            n[0] = len(df)
        return pd.DataFrame({"k": vc.index.to_numpy(object),
                             "c": vc.to_numpy(np.int64), "n": n})

    agg = (left.select_columns([key])
               .map_batches(block_top, batch_format="pandas", batch_size=None)
               .to_pandas())
    if not len(agg):
        return frozenset()
    total = int(agg["n"].sum())
    counts = agg.groupby("k")["c"].sum()
    return frozenset(counts[counts >= threshold * max(total, 1)].index)


class _BroadcastEquiJoin:
    """Broadcast LEFT/INNER equi-join stage (Arrow-native, round 5): narrow
    key merge → matched (left, right) positions → ``Table.take`` assembly.
    One left row may match many right rows (1-to-many), so the left side is
    gathered by position too; left batch order is preserved and matches
    within a key keep right storage order (pandas-merge parity)."""

    def __init__(self, right_ref, left_key, right_key, how, lazy=False):
        self._right_ref = right_ref
        self.rtab = None if lazy else ray.get(right_ref)
        self.left_key, self.right_key, self.how = left_key, right_key, how

    def __call__(self, ltab: pa.Table) -> pa.Table:
        if self.rtab is None:
            self.rtab = ray.get(self._right_ref)
        r = self.rtab
        n = ltab.num_rows
        lp_ok = np.flatnonzero(_notnull_np(ltab[self.left_key]))
        if len(lp_ok) and r.num_rows:
            lk, rk = _align_dtypes(_col_np(ltab, self.left_key, lp_ok),
                                   _col_np(r, self.right_key))
            m = pd.DataFrame({"__k": lk, "__lp": lp_ok.astype(np.int64)}) \
                .merge(pd.DataFrame({
                    "__k": rk,
                    "__rp": np.arange(r.num_rows, dtype=np.int64)}),
                    on="__k", how="inner")
            lp = m["__lp"].to_numpy(np.int64)
            rp = m["__rp"].to_numpy(np.int64)
        else:
            lp = rp = np.empty(0, dtype=np.int64)
        if self.how == "left":
            matched = np.zeros(n, dtype=bool)
            matched[lp] = True
            un = np.flatnonzero(~matched)  # incl. null-key left rows
            lp = np.concatenate([lp, un.astype(np.int64)])
            rp = np.concatenate([rp, np.full(len(un), -1, np.int64)])
            order = np.argsort(lp, kind="stable")
            lp, rp = lp[order], rp[order]
        lnames = ltab.column_names
        rpay = [c for c in r.column_names
                if c != self.right_key and c not in lnames]
        return _assemble_take(ltab.take(pa.array(lp, pa.int64())), r, rp,
                              rpay)


def _broadcast_equi_apply(left, rtab: pa.Table, left_key: str,
                          right_key: str, how: str):
    """Dispatch the broadcast probe as a stateless task (tiny right side —
    reused worker pool beats a per-dataset actor pool) or an actor pool."""
    kwargs = dict(right_ref=ray.put(rtab), left_key=left_key,
                  right_key=right_key, how=how)
    if rtab.num_rows <= 50_000:
        fn = _BroadcastEquiJoin(**kwargs, lazy=True)
        return left.map_batches(fn, batch_format="pyarrow", batch_size=None)
    return left.map_batches(_BroadcastEquiJoin, batch_format="pyarrow",
                            fn_constructor_kwargs=kwargs,
                            concurrency=(1, 16), batch_size=None)


def _broadcast_right_table(right, right_key: str,
                           right_cols: dict[str, str] | None) -> pa.Table:
    """Right side of a broadcast equi-join as ONE Arrow table: optional
    projection/rename, then ANSI null-key filter (NULL keys never match —
    so the broadcast path agrees with the shuffle path instead of
    inheriting pandas's NaN == NaN rule)."""
    rtab = _arrow_table_of(right)
    if right_cols:
        cols = list(dict.fromkeys([right_key, *right_cols]))
        rtab = rtab.select(cols).rename_columns(
            [right_cols.get(c, c) for c in cols])
    return rtab.filter(
        pc.invert(pc.is_null(rtab[right_key], nan_is_null=True)))


def left_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    *,
    right_cols: dict[str, str] | None = None,
    strategy: str = "auto",
    broadcast_limit: int | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Plain LEFT OUTER equi-join (JoinPlan.scala:39-151).

    auto (default): materialize the right side ONCE (count from block
    metadata), broadcast it when it holds at most ``broadcast_limit`` rows
    (dimension tables — the 100 TB common case), else fall back to the
    shuffle path — a caller can no longer driver-materialize a large right
    side silently. broadcast / shuffle force the respective path.
    """
    left_key, right_key = (on, on) if isinstance(on, str) else on
    if not isinstance(right, pd.DataFrame):
        if strategy == "auto":
            right = right.materialize()
            strategy = ("broadcast"
                        if right.count() <= _cfg_broadcast_limit(
                            broadcast_limit, 5_000_000)
                        else "shuffle")
        if strategy == "shuffle":
            # the coarse-bucket exchange, not Ray's native hash join — the
            # native operator hangs on sparse keys / small sessions (see
            # _bucket_equi_join) and silently diverged from the broadcast
            # path's column contract
            return _bucket_equi_join(left, right, (left_key, right_key),
                                     how="left", right_cols=right_cols,
                                     num_partitions=num_partitions)
    rtab = _broadcast_right_table(right, right_key, right_cols)
    return _broadcast_equi_apply(left, rtab, left_key, right_key, "left")


def inner_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    *,
    right_cols: dict[str, str] | None = None,
    strategy: str = "auto",
    broadcast_limit: int | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Plain INNER equi-join (completes the join family; the reference's
    JoinPlan supports LEFT/LAST only — SparkPlanner.scala:235-276 — so this
    is a north-rule extension with standard ANSI semantics).

    Same strategy ladder as :func:`left_join`: auto materializes the right
    side once and broadcasts it below ``broadcast_limit`` rows (per-batch
    ``merge(how="inner")`` is globally correct for inner joins — unmatched
    right rows simply never surface), else Ray Data's native hash join.
    """
    left_key, right_key = (on, on) if isinstance(on, str) else on
    if not isinstance(right, pd.DataFrame):
        if strategy == "auto":
            right = right.materialize()
            strategy = ("broadcast"
                        if right.count() <= _cfg_broadcast_limit(
                            broadcast_limit, 5_000_000)
                        else "shuffle")
        if strategy == "shuffle":
            return _bucket_equi_join(left, right, (left_key, right_key),
                                     how="inner", right_cols=right_cols,
                                     num_partitions=num_partitions)
    # ANSI semantics: NULL keys never match (pandas merge would join
    # NaN == NaN; the reference's LAST JOIN null-safe equality is a
    # different, documented contract kept in last_join)
    rtab = _broadcast_right_table(right, right_key, right_cols)
    return _broadcast_equi_apply(left, rtab, left_key, right_key, "inner")


def cross_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset | pd.DataFrame",
    *,
    right_limit: int = 100_000,
) -> "ray.data.Dataset":
    """Cartesian product with a SMALL right side (completes the relational
    algebra; the practical uses — attach a parameter grid, a date spine, a
    k-row template to every row — all have a tiny right side).

    The right side is materialized once and broadcast; each left batch
    emits ``len(batch) × len(right)`` rows via vectorized np.repeat/tile —
    never a per-row Python loop. Refuses a right side above
    ``right_limit`` rows: a large×large cartesian product is a bug at any
    scale, not a workload.
    """
    if not isinstance(right, pd.DataFrame):
        right = right.materialize()
        n = right.count()
        if n > right_limit:
            raise ValueError(
                f"cross_join: right side has {n} rows > right_limit="
                f"{right_limit}; a large cartesian product is almost "
                "certainly a bug — raise right_limit explicitly if not")
        rdf = _named_pandas(right)
    else:
        rdf = right
        if len(rdf) > right_limit:
            raise ValueError(
                f"cross_join: right side has {len(rdf)} rows > "
                f"right_limit={right_limit}")
    clash = set(rdf.columns)
    rref = ray.put(rdf)

    def _cross(ldf: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(rref)
        both = set(ldf.columns) & clash
        if both:
            raise ValueError(
                f"cross_join: columns {sorted(both)} exist on both sides — "
                "rename before crossing")
        li = np.repeat(np.arange(len(ldf)), len(r))
        ri = np.tile(np.arange(len(r)), len(ldf))
        out = ldf.iloc[li].reset_index(drop=True)
        rrep = r.iloc[ri].reset_index(drop=True)
        for c in r.columns:
            out[c] = rrep[c]
        return out

    return left.map_batches(_cross, batch_format="pandas", batch_size=None)


def full_outer_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    *,
    right_cols: dict[str, str] | None = None,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """FULL OUTER equi-join (north-rule extension; the snapshot-diff /
    reconciliation primitive as a plain relational operator).

    Always a shuffle: a right row that matches nothing must surface
    exactly ONCE globally, which a per-batch broadcast probe cannot
    decide. See :func:`_bucket_equi_join` for the execution shape and
    why Ray's native hash join is not used.
    """
    return _bucket_equi_join(left, right, on, how="outer",
                             right_cols=right_cols, num_buckets=num_buckets,
                             num_partitions=num_partitions)


def _bucket_equi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    *,
    how: str,
    right_cols: dict[str, str] | None = None,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Shuffle equi-join on the repo's coarse-bucket co-exchange (the
    last_join/semi_join shape — whole keys land in one bucket, one pandas
    merge per bucket). ``how`` ∈ inner / left / outer.

    NOT Ray's native hash join: that operator hangs its executor when the
    join's finalize raises (observed with num_partitions > distinct keys:
    all-empty partitions make pyarrow's key-field lookup fail inside
    ``HashShuffleAggregator.finalize``, and the driver then blocks in
    ``ray.get`` forever) and deadlocks outright when num_partitions
    exceeds session CPUs — both fatal on small/sparse inputs.

    ANSI semantics: NULL keys (including float NaN) never match; under
    left/outer they surface once each, padded. The join key coalesces
    into the LEFT key column (USING-style), so the output schema is left
    columns + non-key right columns.

    Arrow-native kernel (round 4; previously a per-bucket pandas
    pad+merge): both sides ride the exchange as TYPED Arrow blocks
    (missing counterpart columns are typed nulls, never pandas object
    padding), and the per-bucket kernel hash-merges only a narrow
    ``(key, row position)`` pandas frame — C-speed, no payload
    conversion — then assembles the output by ``Table.take`` on the
    matched positions. Payload columns keep their exact Arrow types
    (nullable ints stay int64-with-nulls, ints past 2^53 stay exact,
    list/binary payloads ride untouched) and the two Arrow→pandas→Arrow
    payload conversions per bucket are gone.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..core.grouping import map_groups_typed
    from ..core.hashing import (add_bucket_column, default_num_buckets,
                                quiet_ray_data_logs)

    if how not in ("inner", "left", "outer"):
        raise ValueError(f"how={how!r}")
    left_key, right_key = (on, on) if isinstance(on, str) else on
    if right_cols:
        cols = list(dict.fromkeys([right_key, *right_cols]))
        new_names = [right_cols.get(c, c) for c in cols]

        def _proj(t):
            return t.select(cols).rename_columns(new_names)

        right = right.map_batches(_proj, batch_format="pyarrow",
                                  batch_size=None)
        right_key = right_cols.get(right_key, right_key)

    from ..core.grouping import arrow_col_type

    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    # the right_cols projection above already selected + renamed, so the
    # schema here IS the final right column set
    rcols = list(rsch.names)
    # normalize to pa.DataType: a pandas-block input's schema() reports
    # numpy dtypes, which would silently degrade the typed-null padding
    ltypes = {c: arrow_col_type(lsch, c) for c in lcols}
    rtypes = {c: arrow_col_type(rsch, c) for c in rcols}
    clash = (set(lcols) & set(rcols)) - (
        {left_key} if left_key == right_key else set())
    if clash:
        raise ValueError(
            f"full_outer_join: right columns {sorted(clash)} collide with "
            "left names — rename them via right_cols=")
    out_cols = lcols + [c for c in rcols if c != right_key]

    # one promoted key type on BOTH sides: the unified exchange layout
    # (and the unmatched-right coalesce into the left key column) needs a
    # single physical type for the key pair
    def _promote(a: "pa.DataType", b: "pa.DataType") -> "pa.DataType":
        if a == b:
            return a
        return pa.unify_schemas(
            [pa.schema([("k", a)]), pa.schema([("k", b)])],
            promote_options="permissive").field("k").type

    key_type = _promote(ltypes[left_key], rtypes[right_key])
    utypes = dict(ltypes)
    for c in rcols:
        utypes.setdefault(c, rtypes[c])
    utypes[left_key] = utypes[right_key] = key_type
    unified = list(dict.fromkeys(lcols + rcols))

    SIDE = "__side"
    nb = num_buckets or default_num_buckets()

    def tag(side_is_left: bool, key: str, present: list[str]):
        addb = add_bucket_column([key], "__b", nb)
        pset = set(present)

        def fn(t: pa.Table) -> pa.Table:
            quiet_ray_data_logs()
            n = t.num_rows
            arrays, names = [], []
            for c in unified:
                names.append(c)
                if c in pset:
                    a = t[c]
                    if a.type != utypes[c]:
                        a = pc.cast(a, utypes[c])
                    arrays.append(a.combine_chunks()
                                  if isinstance(a, pa.ChunkedArray) else a)
                else:
                    arrays.append(pa.nulls(n, utypes[c]))
            out = pa.Table.from_arrays(arrays, names=names)
            out = addb(out)
            return out.append_column(
                SIDE, pa.array(np.full(n, side_is_left), pa.bool_()))

        return fn

    from ..core.empty_ds import union_any

    lt = left.map_batches(tag(True, left_key, lcols),
                          batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag(False, right_key, rcols),
                           batch_format="pyarrow", batch_size=None)
    both = union_any(lt, rt)

    def _null_mask(arr) -> np.ndarray:
        # SQL null semantics incl. float NaN (parity with the previous
        # pandas kernel, where pd.isna covered both)
        m = pc.is_null(arr, nan_is_null=True)
        return m.to_numpy(zero_copy_only=False)

    def per_bucket(t: "pa.Table") -> "pa.Table":
        quiet_ray_data_logs()
        side = t[SIDE].to_numpy(zero_copy_only=False).astype(bool)
        lg = t.filter(pa.array(side)).select(lcols)
        rg = t.filter(pa.array(~side)).select(rcols)
        lk_na = _null_mask(lg[left_key])
        rk_na = _null_mask(rg[right_key])
        # narrow key+position merge: the ONLY pandas work in the kernel.
        # Non-null keys are taken in ARROW first so an int key column
        # that carries nulls does not round-trip through float64 (where
        # values past 2^53 would collide)
        lnn = np.flatnonzero(~lk_na)
        rnn = np.flatnonzero(~rk_na)
        ldf = pd.DataFrame({
            "k": lg[left_key].take(pa.array(lnn)).to_pandas().to_numpy(),
            "lp": lnn})
        rdf = pd.DataFrame({
            "k": rg[right_key].take(pa.array(rnn)).to_pandas().to_numpy(),
            "rp": rnn})
        m = ldf.merge(rdf, on="k", how="inner")
        lp = m["lp"].to_numpy(np.int64)
        rp = m["rp"].to_numpy(np.int64)

        rpay = [c for c in rcols if c != right_key]
        pieces = []

        def assemble(ltab, rtab) -> "pa.Table":
            # defensive unified-type cast: an all-null slice can arrive
            # null-TYPED from the exchange (Ray's sort degrades some
            # empty/all-null column slices); null -> T casts are always
            # valid and keep every piece concat-compatible
            arrays = []
            for c, tab in [(c, ltab) for c in lcols] + \
                          [(c, rtab) for c in rpay]:
                a = tab[c]
                if a.type != utypes[c]:
                    a = pc.cast(a, utypes[c])
                arrays.append(a.combine_chunks()
                              if isinstance(a, pa.ChunkedArray) else a)
            return pa.Table.from_arrays(arrays, names=out_cols)

        pieces.append(assemble(lg.take(pa.array(lp)),
                               rg.take(pa.array(rp))))
        if how in ("left", "outer"):
            matched_l = np.zeros(len(lg), dtype=bool)
            matched_l[lp] = True
            un_l = np.flatnonzero(~matched_l)   # incl. null-key left rows
            if len(un_l):
                ltab = lg.take(pa.array(un_l))
                rtab = pa.Table.from_arrays(
                    [pa.nulls(len(un_l), utypes[c]) for c in rpay],
                    names=rpay)
                pieces.append(assemble(ltab, rtab))
        if how == "outer":
            matched_r = np.zeros(len(rg), dtype=bool)
            matched_r[rp] = True
            un_r = np.flatnonzero(~matched_r)   # incl. null-key right rows
            if len(un_r):
                rtab = rg.take(pa.array(un_r))
                arrays = []
                for c in lcols:   # key coalesces from the right side
                    arrays.append(rtab[right_key] if c == left_key
                                  else pa.nulls(len(un_r), utypes[c]))
                ltab = pa.Table.from_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in arrays], names=lcols)
                pieces.append(assemble(ltab, rtab))
        return pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]

    return map_groups_typed(both, "__b", per_bucket, batch_format="pyarrow",
                            num_partitions=num_partitions)


def next_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    *,
    order_by: str,
    asof_left_ts: str,
    horizon=None,
    strict: bool = False,
    tiebreak: str | None = None,
    right_cols: dict[str, str] | None = None,
    strategy: str = "auto",
    broadcast_limit: int | None = None,
    num_partitions: int | None = None,
    skew_salts: int = 0,
) -> "ray.data.Dataset":
    """Forward as-of join — the supervised LABEL-generation mirror of
    LAST JOIN: per left row (entity, ts), the FIRST right row with
    ``right.order_by >= left.asof_left_ts`` (ties broken by min
    ``tiebreak``), optionally bounded by ``horizon``
    (``right.order_by <= left.ts + horizon``): "did the user convert within
    30 days of this feature row?". Where LAST JOIN must never look forward
    (temporal-leakage rule), the label join must ONLY look forward — the
    two sides of the same point-in-time contract.

    strict=True excludes events at exactly left ts (labels must be strictly
    after the feature timestamp, so a same-millisecond outcome can't leak
    into its own feature row). Implemented as a +1ms shift of the left ts
    on an internal column — merge_asof itself has no strict mode.

    Same execution strategies / skew handling as :func:`last_join`
    (broadcast small right side; key co-shuffle otherwise).
    """
    if not strict:
        return last_join(
            left, right, on, order_by=order_by, asof_left_ts=asof_left_ts,
            tiebreak=tiebreak, right_cols=right_cols, strategy=strategy,
            broadcast_limit=broadcast_limit, num_partitions=num_partitions,
            skew_salts=skew_salts, direction="forward", tolerance=horizon)

    shifted = "__ts_excl"

    # the internal left ts moves forward one resolution unit, so the horizon
    # (measured from the ORIGINAL ts) shrinks by the same unit
    import pyarrow as pa

    ts_type = dict(zip(left.schema().names, left.schema().types))[asof_left_ts]
    if pa.types.is_timestamp(ts_type):
        unit_one = pd.Timedelta(1, unit=ts_type.unit)
    else:
        unit_one = 1
    adj_horizon = None if horizon is None else horizon - unit_one

    def add_shift(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        ts = t.column(asof_left_ts)
        if pa.types.is_timestamp(ts.type):
            one = pa.scalar(1, pa.duration(ts.type.unit))
        else:
            one = pa.scalar(1, ts.type)
        return t.append_column(shifted, pc.add(ts, one))

    out = last_join(
        left.map_batches(add_shift, batch_format="pyarrow", batch_size=None),
        right, on, order_by=order_by, asof_left_ts=shifted,
        tiebreak=tiebreak, right_cols=right_cols, strategy=strategy,
        broadcast_limit=broadcast_limit, num_partitions=num_partitions,
        skew_salts=skew_salts, direction="forward", tolerance=adj_horizon)

    def drop_shift(t):
        return t.drop_columns([shifted]) if shifted in t.column_names else t

    return out.map_batches(drop_shift, batch_format="pyarrow", batch_size=None)


def latest_snapshot(
    ds: "ray.data.Dataset",
    key: str,
    order_by: str,
    *,
    as_of=None,
    tiebreak: str | None = None,
    num_buckets: int = 1024,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Latest row per entity as of a cutoff — the feature-store "current
    value" read (reference analog: the online store's last-value-per-key
    semantics, storage/SchemaAdapter + LAST JOIN against a snapshot ts).

    Per ``key``, keep the single row with max ``order_by`` among rows with
    ``order_by <= as_of`` (no cutoff when ``as_of`` is None); ties broken by
    max ``tiebreak``. One coarse-bucket hash shuffle (the key itself is
    never the shuffle key, so mostly-unique keys don't pay a per-key group
    call) + a vectorized per-bucket groupby tail — the same scale shape as
    exact_dedup.
    """
    from ..core.grouping import map_groups_typed
    from ..core.hashing import add_bucket_column

    if as_of is not None:
        ds = ds.map_batches(
            lambda t: t.filter(pc.less_equal(t.column(order_by), as_of)),
            batch_format="pyarrow", batch_size=None)

    add_b = add_bucket_column([key], "__b", num_buckets)

    def _latest_take(t: pa.Table) -> pa.Table:
        """Keep the max-(order, tiebreak) row per key via the narrow-frame
        + Table.take idiom (round 5): payload columns never convert
        through pandas. A null order value cannot be "latest" (max-order
        skips nulls, the library-wide rule) and null keys never group
        (pandas-groupby-dropna parity)."""
        ok = _notnull_np(t[key]) & _notnull_np(t[order_by])
        pos = np.flatnonzero(ok)
        if not len(pos):
            return t.slice(0, 0)
        d = {"__k": _col_np(t, key, pos), "__o": _col_np(t, order_by, pos),
             "__rp": pos.astype(np.int64)}
        sort_cols = ["__k", "__o"]
        if tiebreak:
            d["__tb"] = t[tiebreak].combine_chunks().take(
                pa.array(pos, pa.int64())).to_pandas().to_numpy()
            sort_cols.append("__tb")
        ndf = pd.DataFrame(d).sort_values(sort_cols, kind="stable")
        keep = ndf.groupby("__k", sort=False).tail(1)["__rp"] \
            .to_numpy(np.int64)
        keep.sort()  # emit survivors in input order
        return t.take(pa.array(keep, pa.int64()))

    def bucket_latest(t: pa.Table) -> pa.Table:
        return _latest_take(t.drop_columns(["__b"]))

    # per-block combiner: at most one candidate per key leaves the block
    pre = (ds.map_batches(_latest_take, batch_format="pyarrow",
                          batch_size=None)
             .map_batches(add_b, batch_format="pyarrow", batch_size=None))
    return map_groups_typed(pre, "__b", bucket_latest,
                            batch_format="pyarrow",
                            num_partitions=num_partitions)
