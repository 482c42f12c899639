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
- **broadcast** (small right side): the right table is collected once,
  ``ray.put`` into the object store, and every map_batches task does a
  vectorized ``pd.merge_asof`` / merge against it — no shuffle. This is
  the 100 TB path whenever the right side is a dimension-ish table.
- **shuffle** (both sides large): tag each side, union, hash-shuffle by
  join key via ``groupby(key).map_groups`` and run the same merge per key
  group — one all-to-all exchange, co-partitioning both sides by the key
  (SURVEY §7.4). Hot join keys inherit Ray's groupby partitioning; salt
  upstream if a single key exceeds a worker's heap.

Ties on the order value are broken by ``tiebreak`` (max wins), because a
distributed read has no stable arrival order to fall back on.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import ray
from ..config import broadcast_limit as _cfg_broadcast_limit

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

SIDE_COL = "__side"
RID_COL = "__rid"


def _prep_right(rdf: pd.DataFrame, key: str, order_by: str | None,
                tiebreak: str | None, right_cols: dict[str, str] | None) -> pd.DataFrame:
    rdf = rdf.reset_index(drop=True)
    rdf[RID_COL] = np.arange(len(rdf), dtype=np.int64)
    if right_cols:
        keep = [key] + [c for c in (order_by, tiebreak) if c and c not in right_cols]
        keep = list(dict.fromkeys(keep + list(right_cols) + [RID_COL]))
        rdf = rdf[keep].rename(columns=right_cols)
    return rdf


def _asof_merge(ldf: pd.DataFrame, rdf: pd.DataFrame, left_key: str, right_key: str,
                left_ts: str, right_order: str, out_cols: list[str],
                direction: str = "backward", tolerance=None) -> pd.DataFrame:
    """Vectorized point-in-time merge: per left row, the right row with max
    right_order such that right_order <= left_ts and keys equal
    (direction="backward", LAST JOIN). direction="forward" flips it to the
    FIRST right row with right_order >= left_ts — the label-generation join
    (next_join). tolerance bounds |right_order - left_ts| (max staleness
    backward / label horizon forward) natively inside merge_asof."""
    # rows with a null order key or null join key can never match and would
    # break merge_asof's sortedness check — drop them from the right side
    # (matches the reference's max-order selection, which skips nulls)
    rvalid = rdf[right_order].notna() & rdf[right_key].notna()
    if not rvalid.all():
        rdf = rdf[rvalid].reset_index(drop=True)
    # a nullable order column arrives float64 (NaN upcast); after the nulls
    # are gone, realign with the left ts dtype so merge_asof accepts it
    lt_dtype = ldf[left_ts].dtype
    if (rdf[right_order].dtype != lt_dtype
            and pd.api.types.is_numeric_dtype(lt_dtype)
            and pd.api.types.is_numeric_dtype(rdf[right_order])):
        rdf = rdf.assign(**{right_order: rdf[right_order].astype(lt_dtype)})
    ldf = ldf.reset_index(drop=True)
    orig_order = np.arange(len(ldf))
    ldf = ldf.assign(__lorder=orig_order)
    ok = ldf[left_ts].notna() & ldf[left_key].notna()
    good, bad = ldf[ok], ldf[~ok]
    if len(good):
        gs = good.sort_values(left_ts, kind="stable")
        merged = pd.merge_asof(
            gs, rdf,
            left_on=left_ts, right_on=right_order,
            left_by=left_key, right_by=right_key,
            direction=direction, allow_exact_matches=True,
            tolerance=tolerance,
            suffixes=("", "__r"),
        )
    else:
        # no valid left rows in this batch: emit the SAME schema merge_asof
        # would have produced (left cols + right cols, suffixed on collision,
        # minus the coalesced same-name on/by columns) so block schemas stay
        # uniform across batches — and never iterate out_cols (it is None on
        # the broadcast path when right_cols is None)
        coalesced = set()
        if right_key == left_key:
            coalesced.add(right_key)
        if right_order == left_ts:
            coalesced.add(right_order)
        radd = []
        for c in rdf.columns:
            if c in coalesced:
                continue
            name = c + "__r" if c in good.columns else c
            if name not in good.columns and name not in radd:
                radd.append(name)
        merged = good.reindex(columns=list(good.columns) + radd)
    if len(bad):
        bad = bad.reindex(columns=list(merged.columns))
        merged = pd.concat([merged, bad], ignore_index=True)
    merged = merged.sort_values("__lorder", kind="stable").drop(columns=["__lorder"])
    return merged.reset_index(drop=True)


def _last_merge_generic(ldf: pd.DataFrame, rdf: pd.DataFrame, *, left_key: str,
                        right_key: str, left_ts: str | None, right_order: str | None,
                        tiebreak_col: str | None, residual,
                        direction: str = "backward", tolerance=None) -> pd.DataFrame:
    """LAST JOIN with an arbitrary residual ON condition (reference:
    JoinPlan.scala:39-151 accepts any JIT'd condition; covers the non-equi
    clauses of cases/function/join/test_lastjoin_complex.yaml).

    Full equi-match → vectorized residual mask over the joined frame (and
    the point-in-time bound when ``left_ts`` is set) → per left row keep the
    match with max (order, tiebreak) (sorted) or max storage rid (unsorted).
    O(matches) per call — use only when a residual prevents merge_asof."""
    ldf = ldf.reset_index(drop=True).assign(__lorder=np.arange(len(ldf)))
    m = ldf.merge(rdf, how="inner", left_on=left_key, right_on=right_key,
                  suffixes=("", "__r"))

    def _r(c):
        # the merge suffixes RIGHT columns that collide with a left name
        # (except the coalesced same-name join key) — the point-in-time
        # bound and the order sort must read the right side, or a shared
        # ts column name would compare left ts to itself (always true:
        # temporal leakage)
        return c + "__r" if (c in ldf.columns and c + "__r" in m.columns) else c

    ro = _r(right_order) if right_order is not None else None
    if right_order is not None and left_ts is not None:
        # PIT/asof: a null order can never satisfy the bound — drop early.
        # WITHOUT a PIT bound null-order candidates stay ELIGIBLE: the
        # reference's LAST JOIN matches a null-order row when it is the
        # key's only candidate (cases/function/join/test_lastjoin_complex
        # .yaml id 13-1 row 5: subquery row (ee, 24, c7=NULL) must join);
        # they sort FIRST below so any real order beats them.
        m = m[m[ro].notna()]
    if left_ts is not None:
        if direction == "forward":
            m = m[m[ro] >= m[left_ts]]
            if tolerance is not None:
                m = m[m[ro] <= m[left_ts] + tolerance]
        else:
            m = m[m[ro] <= m[left_ts]]
            if tolerance is not None:
                m = m[m[ro] >= m[left_ts] - tolerance]
    if residual is not None and len(m):
        m = m[np.asarray(residual(m), dtype=bool)]
    if len(m):
        if right_order is not None:
            sort_cols = [ro, _r(tiebreak_col or RID_COL)]
            # nulls first: a null order loses to every real order but still
            # matches when alone (reference semantics, see filter above)
            m = m.sort_values(sort_cols, kind="stable",
                              na_position="first").groupby("__lorder",
                                                           sort=False)
            m = m.head(1) if direction == "forward" else m.tail(1)
        else:
            m = m.sort_values(_r(RID_COL), kind="stable").groupby("__lorder", sort=False).tail(1)
    right_out = [c for c in rdf.columns if c not in ldf.columns]
    merged = ldf.merge(m[["__lorder", *[c for c in right_out if c in m.columns]]],
                       on="__lorder", how="left", suffixes=("", "__r"))
    return merged.sort_values("__lorder", kind="stable").drop(columns="__lorder") \
                 .reset_index(drop=True)


class _BroadcastLastJoin:
    """Actor-pool map_batches stage: right side fetched ONCE per actor."""

    def __init__(self, right_ref, left_key, right_key, left_ts, right_order,
                 out_cols, single_ref, tiebreak_col=None, residual=None,
                 lazy=False, out_types=None, direction="backward",
                 tolerance=None):
        self.out_types = out_types or {}
        self.direction, self.tolerance = direction, tolerance
        # lazy=True: used as a plain (pickled) task fn — resolve the refs in
        # the worker on first call instead of actor __init__
        self._right_ref, self._single_ref = right_ref, single_ref
        self.rdf = None if lazy else ray.get(right_ref)
        self.single = (None if (lazy or single_ref is None)
                       else ray.get(single_ref))
        self.left_key, self.right_key = left_key, right_key
        self.left_ts, self.right_order = left_ts, right_order
        self.out_cols = out_cols
        self.tiebreak_col = tiebreak_col
        self.residual = residual

    def __call__(self, ldf: pd.DataFrame) -> pd.DataFrame:
        if self.rdf is None:
            self.rdf = ray.get(self._right_ref)
            if self._single_ref is not None:
                self.single = ray.get(self._single_ref)
        if self.residual is not None:
            out = _last_merge_generic(
                ldf, self.rdf, left_key=self.left_key, right_key=self.right_key,
                left_ts=self.left_ts, right_order=self.right_order,
                tiebreak_col=self.tiebreak_col, residual=self.residual,
                direction=self.direction, tolerance=self.tolerance)
        elif self.left_ts is not None:
            out = _asof_merge(ldf, self.rdf, self.left_key, self.right_key,
                              self.left_ts, self.right_order, self.out_cols,
                              direction=self.direction, tolerance=self.tolerance)
        else:
            out = ldf.merge(self.single, how="left", left_on=self.left_key,
                            right_on=self.right_key, suffixes=("", "__r"))
        out = _project_out(out, list(ldf.columns), self.out_cols)
        if self.out_types:
            return _df_to_typed_arrow(out, self.out_types)
        return out




def _df_to_typed_arrow(df: pd.DataFrame, types: dict) -> "pa.Table":
    """Convert a join-output pandas frame back to the planned Arrow schema.

    pandas cannot hold NULL in integer/bool columns (they upcast to
    float64/object through the merge), which would leak wrong types into
    downstream Arrow stages (SQL projection type rules, cate formatting).
    NaN becomes a proper NULL; dtypes come from the pre-join schemas."""
    import pyarrow as pa

    arrays, names = [], []
    for c in df.columns:
        s = df[c]
        t = types.get(c)
        if t is None:
            arrays.append(pa.Array.from_pandas(s))
        else:
            try:
                arrays.append(pa.Array.from_pandas(s, type=t))
            except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError, ValueError):
                arrays.append(pa.Array.from_pandas(s))
        names.append(c)
    return pa.Table.from_arrays(arrays, names=names)


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


def _project_out(out: pd.DataFrame, left_cols: list[str],
                 out_cols: list[str] | None) -> pd.DataFrame:
    """Keep left columns + the requested right payload, drop join internals."""
    if out_cols is not None:
        keep = left_cols + [c for c in out_cols if c not in left_cols]
        return out[keep]
    drop = [c for c in out.columns
            if c.endswith("__r") or c in (RID_COL, SIDE_COL, "__jk", "__lorder")]
    return out.drop(columns=[c for c in drop if c in out.columns])


def _reduce_single_match(rdf: pd.DataFrame, key: str, order_by: str | None,
                         tiebreak: str | None) -> pd.DataFrame:
    """One surviving right row per key: max (order, tiebreak) for sorted
    LAST JOIN, max storage rid (last stored row) for unsorted
    (test_lastjoin_simple.yaml id 4-5)."""
    if order_by is not None:
        # null orders sort FIRST: they lose max-order selection to any
        # real order (NaN previously sorted LAST and silently won) but
        # remain eligible when a key has ONLY null-order candidates — the
        # reference's LAST JOIN matches such a row
        # (test_lastjoin_complex.yaml id 13-1 row 5)
        sort_cols = [key, order_by] + ([tiebreak] if tiebreak else [RID_COL])
        rs = rdf.sort_values(sort_cols, kind="stable", na_position="first")
        return rs.groupby(key, sort=False).tail(1)
    rs = rdf.sort_values([key, RID_COL], kind="stable")
    return rs.groupby(key, sort=False).tail(1)


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
        if isinstance(right, pd.DataFrame):
            # NOTE: deliberately no left.schema() probe here — on an
            # unexecuted left (e.g. flagship's window output) schema()
            # would execute the whole upstream sort once just to type the
            # join output. Zero-row pandas outputs instead ride untyped;
            # the benign size-estimator noise they cause is filtered at
            # the package logger (see openmldb_ray/__init__.py).
            rpdf = right
            out_types = {}
            planned_out: list[str] = []
        else:
            import pyarrow as pa
            lsch = left.schema()
            rsch = right.schema()
            rmap = right_cols or {}
            # pandas-block datasets report numpy/python types; only Arrow
            # DataTypes are usable for the typed restore
            out_types = {n: t for n, t in zip(lsch.names, lsch.types)
                         if isinstance(t, pa.DataType)}
            for n, t in zip(rsch.names, rsch.types):
                if isinstance(t, pa.DataType):
                    out_types.setdefault(rmap.get(n, n), t)
            rpdf = _named_pandas(right)
            # output layout of _project_out: left columns, then new right
            # payload — used to seed a typed 0-row block (see
            # _seed_typed_empty)
            planned_out = list(dict.fromkeys(
                list(lsch.names)
                + [c for c in (out_cols if out_cols is not None
                               else [rmap.get(n, n) for n in rsch.names])
                   if c not in lsch.names]))
        rdf = _prep_right(rpdf, right_key, order_by, tiebreak, right_cols)
        if residual is not None:
            right_ref, single_ref = ray.put(rdf), None
        elif asof_left_ts is not None:
            sort_cols = [mapped_order] + ([mapped_tb] if mapped_tb else [RID_COL])
            rdf = rdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
            right_ref, single_ref = ray.put(rdf), None
        else:
            single = _reduce_single_match(rdf, mapped_key, mapped_order, mapped_tb)
            right_ref, single_ref = ray.put(rdf), ray.put(single)
        kwargs = dict(
            right_ref=right_ref, left_key=left_key, right_key=mapped_key,
            left_ts=asof_left_ts, right_order=mapped_order,
            out_cols=out_cols, single_ref=single_ref,
            tiebreak_col=mapped_tb, residual=residual,
            out_types=out_types, direction=direction, tolerance=tolerance,
        )
        if len(rdf) <= 50_000:
            # tiny right side: a stateless task (per-batch plasma get of a
            # small table is ~free, and Ray reuses task workers across
            # datasets — actor pools are torn down per dataset, which
            # dominates wall-time for short queries)
            join_fn = _BroadcastLastJoin(**kwargs, lazy=True)
            out_ds = left.map_batches(join_fn, batch_format="pandas",
                                      batch_size=None)
        else:
            out_ds = left.map_batches(
                _BroadcastLastJoin,
                batch_format="pandas",
                fn_constructor_kwargs=kwargs,
                concurrency=concurrency or (1, 16), batch_size=None)
        return _seed_typed_empty(out_ds, out_types, planned_out)

    # ---- shuffle strategy: co-partition both sides by the join key ----
    lcols = list(left.schema().names)
    ltypes = {n: t for n, t in zip(left.schema().names, left.schema().types)}
    rtypes_raw = {n: t for n, t in zip(right.schema().names, right.schema().types)}
    rtypes = ({right_cols.get(n, n): t for n, t in rtypes_raw.items()}
              if right_cols else rtypes_raw)

    def _restore(df: pd.DataFrame, types: dict) -> pd.DataFrame:
        """Undo the object-upcast caused by union null-padding."""
        for c in df.columns:
            t = types.get(c)
            if t is None or df[c].dtype != object:
                continue
            # schema types are pyarrow DataTypes for Arrow-block datasets,
            # numpy dtypes / Python types for pandas-block ones
            dt = t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") else t
            if dt is object:
                continue
            try:
                df[c] = df[c].astype(dt)
            except (TypeError, ValueError):
                pass
        return df

    # hot-key defusal: salt the hot left keys, replicate the matching right
    # rows once per salt (reference analog: SkewDataFrameUtils.scala's
    # percentile-split + expansion). Detection = per-block heavy hitters
    # (top-k counts per block, summed on the driver — tiny result).
    hot_keys: frozenset = frozenset()
    if skew_salts > 1:
        hot_keys = _detect_hot_keys(left, left_key, hot_key_threshold)
    hot_ref = ray.put(hot_keys) if hot_keys else None

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[SIDE_COL] = True
        df["__jk"] = df[left_key]
        if hot_ref is not None:
            hot = ray.get(hot_ref)
            salt = np.zeros(len(df), dtype=np.int64)
            mask = df[left_key].isin(hot).to_numpy()
            salt[mask] = np.arange(int(mask.sum()), dtype=np.int64) % skew_salts
            df["__salt"] = salt
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        df = _prep_right(df, right_key, order_by, tiebreak, right_cols)
        df[SIDE_COL] = False
        df["__jk"] = df[mapped_key]
        if hot_ref is not None:
            hot = ray.get(hot_ref)
            mask = df[mapped_key].isin(hot).to_numpy()
            cold = df[~mask].assign(__salt=np.int64(0))
            hot_rows = df[mask]
            reps = [hot_rows.assign(__salt=np.int64(s)) for s in range(skew_salts)]
            df = pd.concat([cold, *reps], ignore_index=True)
        return df

    lt = left.map_batches(tag_left, batch_format="pandas", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pandas", batch_size=None)
    # harmonize schemas for union: fill each side's missing columns with nulls
    # (derived statically so no eager execution is triggered)
    salt_cols = {"__salt"} if hot_ref is not None else set()
    lsch = set(lcols) | {SIDE_COL, "__jk"} | salt_cols
    rnames = list(right.schema().names)
    if right_cols:
        rnames = [right_cols.get(c, c) for c in rnames
                  if c in right_cols or c in (right_key, order_by, tiebreak)]
    rsch = set(rnames) | {RID_COL, SIDE_COL, "__jk"} | salt_cols
    all_cols = list(dict.fromkeys(list(lsch) + [c for c in rsch if c not in lsch]))

    def pad(cols_present):
        missing = [c for c in all_cols if c not in cols_present]

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in missing:
                df[c] = None
            return df[all_cols]

        return fn

    from ..core.empty_ds import union_any

    both = union_any(
        lt.map_batches(pad(lsch), batch_format="pandas", batch_size=None),
        rt.map_batches(pad(rsch), batch_format="pandas", batch_size=None),
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        drop_internal = [SIDE_COL, "__jk"] + (["__salt"] if "__salt" in g.columns else [])
        lg = g[g[SIDE_COL] == True]  # noqa: E712
        rg = g[g[SIDE_COL] == False]  # noqa: E712
        if len(lg) == 0:
            return lg.drop(columns=drop_internal)
        rg = rg[[c for c in rsch if c not in (SIDE_COL, "__jk", "__salt")]].copy()
        # union-padding can upcast to object; restore joinable dtypes
        rg = _restore(rg, rtypes)
        lg = _restore(lg.copy(), ltypes)
        lg2 = lg[[c for c in lcols]].copy()
        if residual is not None:
            out = _last_merge_generic(
                lg2, rg.reset_index(drop=True), left_key=left_key,
                right_key=mapped_key, left_ts=asof_left_ts,
                right_order=mapped_order, tiebreak_col=mapped_tb,
                residual=residual, direction=direction, tolerance=tolerance)
        elif asof_left_ts is not None:
            sort_cols = [mapped_order] + ([mapped_tb] if mapped_tb else [RID_COL])
            rs = rg.sort_values(sort_cols, kind="stable").reset_index(drop=True)
            out = _asof_merge(lg2, rs, left_key, mapped_key, asof_left_ts,
                              mapped_order, out_cols or [],
                              direction=direction, tolerance=tolerance)
        else:
            single = _reduce_single_match(rg.reset_index(drop=True), mapped_key, mapped_order, mapped_tb)
            out = lg2.merge(single, how="left", left_on=left_key, right_on=mapped_key, suffixes=("", "__r"))
        return _project_out(out, lcols, out_cols)

    from ..core.grouping import map_groups_typed

    group_keys = ["__jk", "__salt"] if hot_ref is not None else "__jk"
    return map_groups_typed(both, group_keys, per_key,
                            batch_format="pandas",
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
        rdf = _named_pandas(right)
    else:
        rdf = right
    if right_cols:
        rdf = rdf[[right_key, *right_cols]].rename(columns=right_cols)
    # ANSI/Spark semantics (JoinPlan is a plain Spark left outer join):
    # NULL keys never match — filtered here so the broadcast path agrees
    # with the shuffle path instead of inheriting pandas's NaN == NaN rule
    rdf = rdf[rdf[right_key].notna()]
    rref = ray.put(rdf)

    def _merge(ldf: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        out = ldf.merge(r, how="left", left_on=left_key,
                        right_on=right_key, suffixes=("", "__r"))
        drop = [c for c in out.columns
                if c.endswith("__r") or (c == right_key and c not in ldf.columns)]
        return out.drop(columns=drop)

    if len(rdf) <= 50_000:
        # tiny dimension: stateless task (reused worker pool) beats a
        # per-dataset actor pool; per-batch plasma get of a small df is ~free
        def bj_fn(ldf: pd.DataFrame) -> pd.DataFrame:
            return _merge(ldf, ray.get(rref))

        return left.map_batches(bj_fn, batch_format="pandas", batch_size=None)

    class _BJ:
        def __init__(self):
            self.rdf = ray.get(rref)

        def __call__(self, ldf: pd.DataFrame) -> pd.DataFrame:
            return _merge(ldf, self.rdf)

    return left.map_batches(_BJ, batch_format="pandas", concurrency=(1, 16), batch_size=None)


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
        rdf = _named_pandas(right)
    else:
        rdf = right
    if right_cols:
        rdf = rdf[[right_key, *right_cols]].rename(columns=right_cols)
    # ANSI semantics: NULL keys never match (pandas merge would join
    # NaN == NaN; the reference's LAST JOIN null-safe equality is a
    # different, documented contract kept in last_join)
    rdf = rdf[rdf[right_key].notna()]
    rref = ray.put(rdf)

    def _merge(ldf: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf[ldf[left_key].notna()]
        out = ldf.merge(r, how="inner", left_on=left_key,
                        right_on=right_key, suffixes=("", "__r"))
        drop = [c for c in out.columns
                if c.endswith("__r") or (c == right_key and c not in ldf.columns)]
        return out.drop(columns=drop)

    if len(rdf) <= 50_000:
        def bj_fn(ldf: pd.DataFrame) -> pd.DataFrame:
            return _merge(ldf, ray.get(rref))

        return left.map_batches(bj_fn, batch_format="pandas", batch_size=None)

    class _BJ:
        def __init__(self):
            self.rdf = ray.get(rref)

        def __call__(self, ldf: pd.DataFrame) -> pd.DataFrame:
            return _merge(ldf, self.rdf)

    return left.map_batches(_BJ, batch_format="pandas", concurrency=(1, 16),
                            batch_size=None)


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
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(pc.less_equal(t.column(order_by), as_of)),
            batch_format="pyarrow", batch_size=None)

    add_b = add_bucket_column([key], "__b", num_buckets)
    sort_cols = [key, order_by] + ([tiebreak] if tiebreak else [])

    def local_latest(df: pd.DataFrame) -> pd.DataFrame:
        # per-block combiner: at most one candidate per key leaves the block.
        # A null order value cannot be "latest" (max-order skips nulls, the
        # library-wide rule) — without the filter NaN sorts last and tail(1)
        # would return the null-ts row whenever a key carries one. The
        # as_of path already drops nulls via the pc.less_equal filter.
        df = df[df[order_by].notna()]
        return (df.sort_values(sort_cols, kind="stable")
                  .groupby(key, sort=False).tail(1))

    def bucket_latest(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(sort_cols, kind="stable")
                 .groupby(key, sort=False).tail(1).drop(columns="__b"))

    pre = (ds.map_batches(local_latest, batch_format="pandas", batch_size=None)
             .map_batches(add_b, batch_format="pyarrow", batch_size=None))
    return map_groups_typed(pre, "__b", bucket_latest,
                            batch_format="pandas",
                            num_partitions=num_partitions)
