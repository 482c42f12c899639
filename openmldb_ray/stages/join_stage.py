"""LAST JOIN — OpenMLDB's point-in-time / as-of join — plus plain joins.

Reference semantics (java/openmldb-batch/.../nodes/JoinPlan.scala):
- sorted LAST JOIN (:153-189): for each left row, among right rows matching
  the equi-key (and any residual condition, here the point-in-time bound
  ``right.order <= left.ts``), keep the one with the MAX order value —
  exactly one output row per left row; no match → right columns NULL.
- unsorted LAST JOIN (:190-196): an arbitrary surviving match
  (Spark ``dropDuplicates``); we define it deterministically as the FIRST
  matching right row in right-table storage order.
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
        keep = list(dict.fromkeys(keep + list(right_cols))) + [RID_COL]
        rdf = rdf[keep].rename(columns=right_cols)
    return rdf


def _asof_merge(ldf: pd.DataFrame, rdf: pd.DataFrame, left_key: str, right_key: str,
                left_ts: str, right_order: str, out_cols: list[str]) -> pd.DataFrame:
    """Vectorized point-in-time merge: per left row, the right row with max
    right_order such that right_order <= left_ts and keys equal."""
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
            direction="backward", allow_exact_matches=True,
            suffixes=("", "__r"),
        )
    else:
        merged = good.reindex(columns=list(good.columns) + [c for c in out_cols if c not in good.columns])
    if len(bad):
        bad = bad.reindex(columns=list(merged.columns))
        merged = pd.concat([merged, bad], ignore_index=True)
    merged = merged.sort_values("__lorder", kind="stable").drop(columns=["__lorder"])
    return merged.reset_index(drop=True)


class _BroadcastLastJoin:
    """Actor-pool map_batches stage: right side fetched ONCE per actor."""

    def __init__(self, right_ref, left_key, right_key, left_ts, right_order, out_cols, single_ref):
        self.rdf = ray.get(right_ref)
        self.single = ray.get(single_ref) if single_ref is not None else None
        self.left_key, self.right_key = left_key, right_key
        self.left_ts, self.right_order = left_ts, right_order
        self.out_cols = out_cols

    def __call__(self, ldf: pd.DataFrame) -> pd.DataFrame:
        if self.left_ts is not None:
            out = _asof_merge(ldf, self.rdf, self.left_key, self.right_key,
                              self.left_ts, self.right_order, self.out_cols)
        else:
            out = ldf.merge(self.single, how="left", left_on=self.left_key,
                            right_on=self.right_key, suffixes=("", "__r"))
        return _project_out(out, list(ldf.columns), self.out_cols)


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
    LAST JOIN, min storage rid for unsorted."""
    if order_by is not None:
        sort_cols = [key, order_by] + ([tiebreak] if tiebreak else [RID_COL])
        rs = rdf.sort_values(sort_cols, kind="stable")
        return rs.groupby(key, sort=False).tail(1)
    rs = rdf.sort_values([key, RID_COL], kind="stable")
    return rs.groupby(key, sort=False).head(1)


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
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
    concurrency=None,
) -> "ray.data.Dataset":
    """OpenMLDB ``LAST JOIN`` (JoinPlan.scala:153-196).

    on: join key — a str (same name both sides) or (left_key, right_key).
    order_by: right order column; max wins (sorted LAST JOIN). None → the
        first right row in storage order (unsorted LAST JOIN).
    asof_left_ts: when set, adds the point-in-time residual condition
        ``right.order_by <= left.asof_left_ts`` (requires order_by) — the
        zero-temporal-leakage join of the north rule.
    right_cols: {right_col: output_name} projection of right-side payload.
    """
    left_key, right_key = (on, on) if isinstance(on, str) else on
    if asof_left_ts is not None and order_by is None:
        raise ValueError("asof_left_ts requires order_by (the right ts column)")

    if isinstance(right, pd.DataFrame):
        strategy = "broadcast"  # an already-small driver-side table
    elif strategy == "auto":
        strategy = "broadcast" if right.count() <= broadcast_limit else "shuffle"

    mapped_key = right_cols.get(right_key, right_key) if right_cols else right_key
    mapped_order = (right_cols.get(order_by, order_by) if (right_cols and order_by) else order_by)
    out_cols = list(right_cols.values()) if right_cols else None

    if strategy == "broadcast":
        rpdf = right if isinstance(right, pd.DataFrame) else right.to_pandas()
        rdf = _prep_right(rpdf, right_key, order_by, tiebreak, right_cols)
        if asof_left_ts is not None:
            sort_cols = [mapped_order] + ([right_cols.get(tiebreak, tiebreak)] if (right_cols and tiebreak) else ([tiebreak] if tiebreak else [RID_COL]))
            rdf = rdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
            right_ref, single_ref = ray.put(rdf), None
        else:
            single = _reduce_single_match(rdf, mapped_key,
                                          mapped_order,
                                          right_cols.get(tiebreak, tiebreak) if (right_cols and tiebreak) else tiebreak)
            right_ref, single_ref = ray.put(rdf), ray.put(single)
        return left.map_batches(
            _BroadcastLastJoin,
            batch_format="pandas",
            fn_constructor_kwargs=dict(
                right_ref=right_ref, left_key=left_key, right_key=mapped_key,
                left_ts=asof_left_ts, right_order=mapped_order,
                out_cols=out_cols, single_ref=single_ref,
            ),
            concurrency=concurrency or (1, 16), batch_size=None)

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
            try:
                df[c] = df[c].astype(t.to_pandas_dtype())
            except (TypeError, ValueError):
                pass
        return df

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[SIDE_COL] = True
        df["__jk"] = df[left_key]
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        df = _prep_right(df, right_key, order_by, tiebreak, right_cols)
        df[SIDE_COL] = False
        df["__jk"] = df[mapped_key]
        return df

    lt = left.map_batches(tag_left, batch_format="pandas", batch_size=None)
    rt = right.map_batches(tag_right, batch_format="pandas", batch_size=None)
    # harmonize schemas for union: fill each side's missing columns with nulls
    # (derived statically so no eager execution is triggered)
    lsch = set(lcols) | {SIDE_COL, "__jk"}
    rnames = list(right.schema().names)
    if right_cols:
        rnames = [right_cols.get(c, c) for c in rnames
                  if c in right_cols or c in (right_key, order_by, tiebreak)]
    rsch = set(rnames) | {RID_COL, SIDE_COL, "__jk"}
    all_cols = list(dict.fromkeys(list(lsch) + [c for c in rsch if c not in lsch]))

    def pad(cols_present):
        missing = [c for c in all_cols if c not in cols_present]

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in missing:
                df[c] = None
            return df[all_cols]

        return fn

    both = lt.map_batches(pad(lsch), batch_format="pandas", batch_size=None).union(
        rt.map_batches(pad(rsch), batch_format="pandas", batch_size=None)
    )

    rt_tb = (right_cols.get(tiebreak, tiebreak) if (right_cols and tiebreak) else tiebreak)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g[SIDE_COL] == True]  # noqa: E712
        rg = g[g[SIDE_COL] == False]  # noqa: E712
        if len(lg) == 0:
            return lg.drop(columns=[SIDE_COL, "__jk"])
        rg = rg[[c for c in rsch if c != SIDE_COL and c != "__jk"]].copy()
        # union-padding can upcast to object; restore joinable dtypes
        rg = _restore(rg, rtypes)
        lg = _restore(lg.copy(), ltypes)
        if asof_left_ts is not None:
            sort_cols = [mapped_order] + ([rt_tb] if rt_tb else [RID_COL])
            rs = rg.sort_values(sort_cols, kind="stable").reset_index(drop=True)
            lg2 = lg[[c for c in lcols]].copy()
            out = _asof_merge(lg2, rs, left_key, mapped_key, asof_left_ts, mapped_order, out_cols or [])
        else:
            single = _reduce_single_match(rg.reset_index(drop=True), mapped_key, mapped_order, rt_tb)
            lg2 = lg[[c for c in lcols]].copy()
            out = lg2.merge(single, how="left", left_on=left_key, right_on=mapped_key, suffixes=("", "__r"))
        return _project_out(out, lcols, out_cols)

    return both.groupby("__jk", num_partitions=num_partitions).map_groups(
        per_key, batch_format="pandas"
    )


def left_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    *,
    right_cols: dict[str, str] | None = None,
    strategy: str = "broadcast",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Plain LEFT OUTER equi-join (JoinPlan.scala:39-151).

    broadcast: right side collected once + merged per batch (dimension
    tables — the 100 TB default). shuffle: Ray Data's native hash join.
    """
    left_key, right_key = (on, on) if isinstance(on, str) else on
    if strategy == "shuffle":
        return left.join(right, join_type="left_outer", num_partitions=num_partitions,
                         on=(left_key,), right_on=(right_key,))
    rdf = right.to_pandas()
    if right_cols:
        rdf = rdf[[right_key, *right_cols]].rename(columns=right_cols)
    rref = ray.put(rdf)

    class _BJ:
        def __init__(self):
            self.rdf = ray.get(rref)

        def __call__(self, ldf: pd.DataFrame) -> pd.DataFrame:
            out = ldf.merge(self.rdf, how="left", left_on=left_key,
                            right_on=right_key, suffixes=("", "__r"))
            drop = [c for c in out.columns
                    if c.endswith("__r") or (c == right_key and c not in ldf.columns)]
            return out.drop(columns=drop)

    return left.map_batches(_BJ, batch_format="pandas", concurrency=(1, 16), batch_size=None)
