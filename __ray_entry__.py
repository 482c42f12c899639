"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship tokenized-sequence suite at sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one. Column names and
types match between engine and oracle; floats that aggregate across
nondeterministic block orders are rounded to 6 decimals on BOTH sides so
sub-ulp summation-order differences cannot flip the value hash.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

SF_DEFAULT = "/root/testdata/sf0.001"

_R6 = 6  # float rounding applied identically in engine + oracle


def _events_ms(sf_dir, cols=("event_id", "user_id", "ts_ms", "value")):
    from openmldb_ray.sources.io import read_table, with_ts_ms

    ds = with_ts_ms(read_table(sf_dir, "events"), "ts")
    return ds.select_columns(list(cols))


def _to_pandas_typed(ds) -> pd.DataFrame:
    """``ds.to_pandas()`` with columns restored from the Dataset schema:
    Ray drops column names when every block is empty, and a legitimately
    empty result (e.g. EXCEPT at a scale where no pair is exclusive) must
    still present its schema to the driver compare."""
    df = ds.to_pandas()
    if df.shape[1] == 0:
        sch = ds.schema()
        if sch is not None and sch.names:
            import pyarrow as pa

            if all(isinstance(t, pa.DataType) for t in sch.types):
                df = pa.table({n: pa.nulls(0, t) for n, t
                               in zip(sch.names, sch.types)}).to_pandas()
            else:
                df = pd.DataFrame(columns=list(sch.names))
    return df


def _round_cols(df: pd.DataFrame, cols) -> pd.DataFrame:
    # always a fresh copy: callers routinely pass column-slices, and
    # assigning into a slice raises pandas' SettingWithCopyWarning
    df = df.copy()
    for c in cols:
        df[c] = pd.to_numeric(df[c], errors="coerce").astype(float).round(_R6)
    return df


# ---------------------------------------------------------------------------
# query implementations (each: sf_dir -> Dataset | DataFrame)


def q_window_rows(sf_dir: str):
    """WindowAggPlan: ROWS frame, the 5 core UDAFs (SURVEY §2.2/§2.3)."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows
    from openmldb_ray.stages.window_stage import window_agg

    out = window_agg(
        _events_ms(sf_dir), "user_id", "ts_ms",
        [Agg.sum("value", "sum_v"), Agg.count_star("cnt"), Agg.avg("value", "avg_v"),
         Agg.min("value", "min_v"), Agg.max("value", "max_v")],
        rows(2), tiebreak="event_id",
    ).to_pandas()
    return _round_cols(out, ["sum_v", "avg_v", "min_v", "max_v"])


def q_window_range(sf_dir: str):
    """WindowAggPlan: ROWS_RANGE 1h PRECEDING frame."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows_range
    from openmldb_ray.stages.window_stage import window_agg

    out = window_agg(
        _events_ms(sf_dir), "user_id", "ts_ms",
        [Agg.sum("value", "sum_v"), Agg.count_star("cnt"), Agg.max("value", "max_v")],
        rows_range("1h"), tiebreak="event_id",
    ).to_pandas()
    return _round_cols(out, ["sum_v", "max_v"])


def q_window_range_open(sf_dir: str):
    """ROWS_RANGE 1h OPEN PRECEDING (strict start bound, exact kernel)."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows_range
    from openmldb_ray.stages.window_stage import window_agg

    out = window_agg(
        _events_ms(sf_dir), "user_id", "ts_ms",
        [Agg.sum("value", "sum_v"), Agg.count_star("cnt")],
        rows_range("1h", open_range=True), tiebreak="event_id",
    ).to_pandas()
    return _round_cols(out, ["sum_v"])


def q_window_exclude_current_row(sf_dir: str):
    """ROWS 3..1 PRECEDING via EXCLUDE CURRENT_ROW-style end bound."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.stages.window_stage import window_agg

    out = window_agg(
        _events_ms(sf_dir), "user_id", "ts_ms",
        [Agg.sum("value", "sum_v"), Agg.count_star("cnt")],
        FrameSpec(rows_preceding=3, exclude_current_row=True), tiebreak="event_id",
    ).to_pandas()
    return _round_cols(out, ["sum_v"])


def q_window_range_end(sf_dir: str):
    """ROWS_RANGE BETWEEN 2h PRECEDING AND 30m PRECEDING (end offset)."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.stages.window_stage import window_agg

    out = window_agg(
        _events_ms(sf_dir), "user_id", "ts_ms",
        [Agg.sum("value", "sum_v"), Agg.count_star("cnt")],
        FrameSpec(range_preceding=7_200_000, range_end=-1_800_000),
        tiebreak="event_id",
    ).to_pandas()
    return _round_cols(out, ["value", "sum_v"])


def q_lag_lead(sf_dir: str):
    """lag (window_functions_def.cc:95-175) + lead (north-rule extension)."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import unbounded
    from openmldb_ray.stages.window_stage import window_agg

    out = window_agg(
        _events_ms(sf_dir), "user_id", "ts_ms",
        [Agg.lag("value", 1, "lag1_v"), Agg.lag("value", 3, "lag3_v"),
         Agg.lead("value", 2, "lead2_v")],
        unbounded(), tiebreak="event_id",
    ).to_pandas()
    return _round_cols(out, ["lag1_v", "lag3_v", "lead2_v"])


def q_window_where(sf_dir: str):
    """count_where/sum_where/avg_where over a window (exact kernel path)."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows_range
    from openmldb_ray.stages.window_stage import window_agg

    ev = _events_ms(sf_dir)

    def add_flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["big"] = df["value"] > 50
        return df

    out = window_agg(
        ev.map_batches(add_flag, batch_format="pandas", batch_size=None),
        "user_id", "ts_ms",
        [Agg.sum_where("value", "big", "sum_big"),
         Agg.count_where("value", "big", "cnt_big"),
         Agg.avg_where("value", "big", "avg_big")],
        rows_range("3h"), tiebreak="event_id",
    ).to_pandas().drop(columns=["big"])
    out["cnt_big"] = pd.to_numeric(out["cnt_big"]).fillna(0).astype("int64")
    return _round_cols(out, ["value", "sum_big", "avg_big"])


def q_last_join_asof(sf_dir: str):
    """Sorted LAST JOIN with point-in-time bound (JoinPlan.scala:153-189)."""
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.join_stage import last_join

    orders = with_ts_ms(read_table(sf_dir, "orders"), "o_orderdate", "o_ts_ms") \
        .select_columns(["o_orderkey", "o_custkey", "o_totalprice", "o_ts_ms"])
    out = last_join(
        _events_ms(sf_dir), orders, ("user_id", "o_custkey"),
        order_by="o_ts_ms", asof_left_ts="ts_ms", tiebreak="o_orderkey",
        right_cols={"o_orderkey": "o_orderkey", "o_totalprice": "o_totalprice"},
        strategy="broadcast",
    ).to_pandas()
    out["o_orderkey"] = pd.to_numeric(out["o_orderkey"], errors="coerce").astype(float)
    out["o_totalprice"] = pd.to_numeric(out["o_totalprice"], errors="coerce").astype(float)
    return _round_cols(out, ["value", "o_totalprice"])


def q_last_join_unsorted(sf_dir: str):
    """Unsorted LAST JOIN: LAST right row in storage order (JoinPlan:190-196
    + test_lastjoin_simple.yaml id 4-5 pins last-stored-match)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.join_stage import last_join

    cust = read_table(sf_dir, "customer").select_columns(
        ["c_custkey", "c_name", "c_nationkey"])
    orders = read_table(sf_dir, "orders").select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice"])
    out = last_join(
        cust, orders, ("c_custkey", "o_custkey"),
        right_cols={"o_orderkey": "o_orderkey", "o_totalprice": "o_totalprice"},
        strategy="broadcast",
    ).to_pandas()
    out["o_orderkey"] = pd.to_numeric(out["o_orderkey"], errors="coerce").astype(float)
    out["o_totalprice"] = pd.to_numeric(out["o_totalprice"], errors="coerce").astype(float)
    return out


def q_lastjoin_window(sf_dir: str):
    """LAST JOIN feeding a WINDOW over the joined column — the combined
    case of cases/query/last_join_window_query.yaml:20-52."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.join_stage import last_join
    from openmldb_ray.stages.window_stage import window_agg

    orders = with_ts_ms(read_table(sf_dir, "orders"), "o_orderdate", "o_ts_ms") \
        .select_columns(["o_orderkey", "o_custkey", "o_totalprice", "o_ts_ms"])
    joined = last_join(
        _events_ms(sf_dir), orders, ("user_id", "o_custkey"),
        order_by="o_ts_ms", asof_left_ts="ts_ms", tiebreak="o_orderkey",
        right_cols={"o_totalprice": "last_price"},
        strategy="broadcast",
    )
    out = window_agg(
        joined, "user_id", "ts_ms",
        [Agg.sum("last_price", "w_price_sum"), Agg.count("last_price", "w_price_cnt")],
        rows(2), tiebreak="event_id",
    ).to_pandas()
    out["w_price_cnt"] = pd.to_numeric(out["w_price_cnt"]).astype("int64")
    return _round_cols(out, ["value", "last_price", "w_price_sum"])


def q_window_union(sf_dir: str):
    """WINDOW UNION backfill (WindowAggPlanUtil.scala:50-117): non-click
    events feed window state, only click rows emit."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows_range
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.window_stage import window_agg

    ev = with_ts_ms(read_table(sf_dir, "events"), "ts").select_columns(
        ["event_id", "user_id", "ts_ms", "value", "event_type"])
    primary = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts_ms", "value"])
    union = ev.filter(expr="event_type != 'click'").select_columns(
        ["event_id", "user_id", "ts_ms", "value"])
    out = window_agg(
        primary, "user_id", "ts_ms",
        [Agg.count_star("cnt_all"), Agg.sum("value", "sum_all")],
        rows_range("2h"), union=union, tiebreak="event_id",
    ).to_pandas()
    return _round_cols(out, ["value", "sum_all"])


def q_sessionize(sf_dir: str):
    """Session gap windows (north-rule extension, SURVEY §7.6)."""
    from openmldb_ray.stages.session_stage import sessionize

    return sessionize(_events_ms(sf_dir, ("event_id", "user_id", "ts_ms")),
                      "user_id", "ts_ms", gap=30 * 60 * 1000,
                      tiebreak="event_id").to_pandas()


def q_session_agg(sf_dir: str):
    """One row per session: bounds + count + value sum."""
    from openmldb_ray.stages.session_stage import session_aggregate

    out = session_aggregate(_events_ms(sf_dir), "user_id", "ts_ms",
                            gap=30 * 60 * 1000, value_col="value",
                            tiebreak="event_id").to_pandas()
    return _round_cols(out, ["sum_value"])


def q_request_window(sf_dir: str):
    """Long-window request aggregates (reference pre-agg analog:
    hybridse/src/vm/aggregator.h) — 30-day per-customer spend stats at
    every order, via one key co-shuffle + per-key prefix/sliding states."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.request_window import request_window_agg

    def add_ts(t: pa.Table) -> pa.Table:
        ms = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("ms")), pa.int64())
        return t.append_column("o_ts", ms)

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice",
                                 "o_orderdate"]) \
        .map_batches(add_ts, batch_format="pyarrow", batch_size=None)
    reqs = orders.select_columns(["o_orderkey", "o_custkey", "o_ts"])
    hist = orders.select_columns(["o_custkey", "o_ts", "o_totalprice"])
    out = request_window_agg(
        reqs, hist, "o_custkey", "o_ts",
        [AggSpec(name="spend_30d", kind="sum", col="o_totalprice"),
         AggSpec(name="avg_30d", kind="avg", col="o_totalprice"),
         AggSpec(name="min_30d", kind="min", col="o_totalprice"),
         AggSpec(name="max_30d", kind="max", col="o_totalprice"),
         AggSpec(name="n_30d", kind="count_star")],
        preceding_ms=30 * 24 * 3600 * 1000,
    ).to_pandas()
    out["spend_30d"] = pd.to_numeric(out["spend_30d"]).astype(float).round(2)
    return _round_cols(out, ["avg_30d", "min_30d", "max_30d"])


def q_group_agg(sf_dir: str):
    """GroupByAggregationPlan: TPC-H Q1-ish grouped aggregate."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice"])
    out = group_aggregate(
        li, ["l_returnflag", "l_linestatus"],
        [Agg.sum("l_quantity", "sum_qty"), Agg.sum("l_extendedprice", "sum_price"),
         Agg.avg("l_quantity", "avg_qty"), Agg.count_star("n")],
    ).to_pandas()
    # big-magnitude money sum: 2dp rounding (6dp would sit below the ulp)
    out["sum_price"] = pd.to_numeric(out["sum_price"]).astype(float).round(2)
    return _round_cols(out, ["sum_qty", "avg_qty"])


def q_group_agg_where(sf_dir: str):
    """count_where / sum_where / avg_where (default_udf_library.cc InitUdaf)."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])

    def add_flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["big"] = df["value"] > 50
        return df

    out = group_aggregate(
        ev.map_batches(add_flag, batch_format="pandas", batch_size=None), "event_type",
        [Agg.sum_where("value", "big", "sum_big"),
         Agg.count_where("value", "big", "cnt_big"),
         Agg.avg_where("value", "big", "avg_big")],
    ).to_pandas()
    out["cnt_big"] = pd.to_numeric(out["cnt_big"]).astype("int64")
    return _round_cols(out, ["sum_big", "avg_big"])


def q_group_stats(sf_dir: str):
    """distinct_count / median / top1_ratio / topn_frequency in GROUP BY."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])
    out = group_aggregate(
        ev, "user_id",
        [Agg.distinct_count("event_type", "dc_types"),
         Agg.median("value", "med_v"),
         Agg.top1_ratio("event_type", "top1r"),
         Agg.topn_frequency("event_type", 2, "top2_types")],
    ).to_pandas()
    out["dc_types"] = pd.to_numeric(out["dc_types"]).astype("int64")
    return _round_cols(out, ["med_v", "top1r"])


def q_top_agg(sf_dir: str):
    """top(col, k): k largest values comma-joined desc (default_udf_library
    InitUdaf 'top')."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate

    li = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def intify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["qty"] = df["l_quantity"].astype("int64")
        return df

    return group_aggregate(
        li.map_batches(intify, batch_format="pandas", batch_size=None)
          .select_columns(["l_returnflag", "qty"]),
        "l_returnflag",
        [Agg.top("qty", 3, "top3_qty")],
    ).to_pandas()


def q_scalar_project(sf_dir: str):
    """RowProjectPlan: scalar fn library over pyarrow.compute."""
    import pyarrow.compute as pc

    from openmldb_ray.functions.scalar import get, project
    from openmldb_ray.sources.io import read_table

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_returnflag",
                             "l_shipdate", "l_extendedprice", "l_discount"])
    out = project(
        li,
        {
            "ship_year": lambda t: get("year")(t["l_shipdate"]),
            "ship_month": lambda t: get("month")(t["l_shipdate"]),
            "flag_lower": lambda t: get("lower")(t["l_returnflag"]),
            "rev": lambda t: pc.multiply(t["l_extendedprice"],
                                         pc.subtract(1.0, t["l_discount"])),
            "qty_null": lambda t: get("is_null")(t["l_discount"]),
        },
        keep=["l_orderkey", "l_linenumber"],
    ).to_pandas()
    return _round_cols(out, ["rev"])


def q_filter(sf_dir: str):
    """FilterPlan: vectorized predicate."""
    import pyarrow.compute as pc

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import filter_expr

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"])
    return filter_expr(
        li, lambda t: pc.and_(pc.greater(t["l_quantity"], 45),
                              pc.equal(t["l_returnflag"], "A"))).to_pandas()


def q_simple_project(sf_dir: str):
    """SimpleProjectPlan: select / rename / cast."""
    import pyarrow as pa

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import simple_project

    return simple_project(
        read_table(sf_dir, "nation"),
        {"n_nationkey": "nation_id", "n_name": "nation_name", "n_regionkey": "region_id"},
        casts={"n_nationkey": pa.int64()},
    ).to_pandas()


def q_const_project(sf_dir: str):
    """ConstProjectPlan: SELECT of constants."""
    from openmldb_ray.stages.relational import const_project

    return const_project([{"a": 1, "b": "x", "c": 2.5}]).to_pandas()


def q_sort_limit(sf_dir: str):
    """SortByPlan + LimitPlan: global top-10."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import limit_n, sort_by

    o = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return limit_n(sort_by(o, ["o_totalprice", "o_orderkey"],
                           descending=[True, False]), 10).to_pandas()


def q_distinct(sf_dir: str):
    """DISTINCT (extension; reference throws on offline Distinct)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import distinct

    return distinct(read_table(sf_dir, "events", columns=["event_type"]),
                    "event_type").to_pandas()


def q_intersect(sf_dir: str):
    """ANSI INTERSECT (distinct): (status, priority) pairs that appear on
    BOTH sides of a price threshold — one coarse row-hash co-shuffle,
    per-bucket vectorized membership, rows taken from Arrow blocks."""
    import pyarrow.compute as pc

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import filter_expr
    from openmldb_ray.stages.setops import intersect_distinct

    o = read_table(sf_dir, "orders",
                   columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])
    hi = filter_expr(o, lambda t: pc.greater_equal(t["o_totalprice"], 150000.0)) \
        .select_columns(["o_orderstatus", "o_orderpriority"])
    lo = filter_expr(o, lambda t: pc.less(t["o_totalprice"], 150000.0)) \
        .select_columns(["o_orderstatus", "o_orderpriority"])
    return _to_pandas_typed(intersect_distinct(hi, lo))


def q_except(sf_dir: str):
    """ANSI EXCEPT (distinct): (lang, source) pairs seen only among short
    documents — same bucketed shape as INTERSECT with the membership
    inverted."""
    import pyarrow.compute as pc

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import filter_expr
    from openmldb_ray.stages.setops import except_distinct

    d = read_table(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    short = filter_expr(d, lambda t: pc.less(t["n_chars"], 300)) \
        .select_columns(["lang", "source"])
    long = filter_expr(d, lambda t: pc.greater_equal(t["n_chars"], 300)) \
        .select_columns(["lang", "source"])
    return _to_pandas_typed(except_distinct(short, long))


def q_union_distinct(sf_dir: str):
    """ANSI UNION (distinct): (event_type, props) pairs from either half
    of the events table — Dataset.union + the distinct stage's coarse-
    bucket fold (one exchange; completes the INTERSECT/EXCEPT/UNION set)."""
    import pyarrow.compute as pc

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import distinct, filter_expr
    from openmldb_ray.core.empty_ds import union_any

    e = read_table(sf_dir, "events", columns=["event_type", "props", "value"])
    lo = filter_expr(e, lambda t: pc.less(t["value"], 50.0)) \
        .select_columns(["event_type", "props"])
    hi = filter_expr(e, lambda t: pc.greater_equal(t["value"], 50.0)) \
        .select_columns(["event_type", "props"])
    return distinct(union_any(lo, hi)).to_pandas()


def q_multi_window(sf_dir: str):
    """Multi-window parallelism (ConcatJoin pattern, SparkPlanner:100-108):
    two windows with different PARTITION BY over the same rows, fused."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.window_stage import window_agg

    ev = with_ts_ms(read_table(sf_dir, "events"), "ts").select_columns(
        ["event_id", "user_id", "event_type", "ts_ms", "value"])
    w1 = window_agg(ev, "user_id", "ts_ms",
                    [Agg.sum("value", "w1_sum")], rows(3), tiebreak="event_id")
    out = window_agg(w1, "event_type", "ts_ms",
                     [Agg.count_star("w2_cnt")], rows(5), tiebreak="event_id").to_pandas()
    return _round_cols(out, ["value", "w1_sum"])


def q_left_join(sf_dir: str):
    """Plain LEFT JOIN (JoinPlan.scala:39-151), broadcast strategy."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.join_stage import left_join

    cust = read_table(sf_dir, "customer").select_columns(
        ["c_custkey", "c_name", "c_nationkey"])
    nation = read_table(sf_dir, "nation").select_columns(["n_nationkey", "n_name"])
    return left_join(cust, nation, ("c_nationkey", "n_nationkey"),
                     right_cols={"n_name": "nation_name"}).to_pandas()


def q_inner_join(sf_dir: str):
    """Plain INNER equi-join (north-rule extension — the reference's
    JoinPlan only implements LEFT/LAST; SparkPlanner.scala:235-276).
    High-balance customers joined to their orders: the filter leaves most
    orders unmatched, exercising the inner drop path. Broadcast strategy
    (the filtered dimension side is small)."""
    import pyarrow.compute as pc

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.join_stage import inner_join
    from openmldb_ray.stages.relational import filter_expr

    cust = filter_expr(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]),
        lambda t: pc.greater(t["c_acctbal"], 8000.0))
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = inner_join(orders, cust, ("o_custkey", "c_custkey")).to_pandas()
    return _round_cols(out[["o_orderkey", "o_custkey", "o_totalprice",
                            "c_acctbal"]], ["o_totalprice", "c_acctbal"])


def q_full_outer_join(sf_dir: str):
    """FULL OUTER equi-join (north-rule extension): per-user click value
    vs per-user view value, reconciled — users present on only one side
    surface exactly once with the other side null. Ray's native hash join
    coalesces the key USING-style; the oracle mirrors with COALESCE."""
    import pyarrow.compute as pc

    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.join_stage import full_outer_join
    from openmldb_ray.stages.relational import filter_expr, group_aggregate

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "value"])
    clicks = group_aggregate(
        filter_expr(ev, lambda t: pc.equal(t["event_type"], "click")),
        "user_id", [Agg.sum("value", "click_value")])
    views = group_aggregate(
        filter_expr(ev, lambda t: pc.equal(t["event_type"], "view")),
        "user_id", [Agg.sum("value", "view_value")])
    out = full_outer_join(clicks, views, ("user_id", "user_id")).to_pandas()
    return _round_cols(out[["user_id", "click_value", "view_value"]],
                       ["click_value", "view_value"])


def q_resample_ffill(sf_dir: str):
    """Regular 6-hour per-user snapshots forward-filled from the latest
    event at-or-before each grid point (stages/resample.resample_asof:
    distributed epoch-aligned grid expansion over the per-key (min, max)
    range table, then the point-in-time last_join — a snapshot can never
    see a later event). Exact DuckDB generate_series + ROW_NUMBER
    oracle."""
    from openmldb_ray.stages.resample import resample_asof

    step = 21_600_000  # 6h in ms
    ev = _events_ms(sf_dir)
    out = resample_asof(ev, "user_id", "ts_ms", step, ["value"],
                        tiebreak="event_id").to_pandas()
    return _round_cols(out[["user_id", "grid_ts", "value"]], ["value"])


def q_rollup_agg(sf_dir: str):
    """GROUP BY ROLLUP (north-rule extension — multi-granularity feature
    rollups): raw rows shuffle ONCE as per-batch partials at the finest
    (returnflag, linestatus) granularity; each coarser grouping set then
    re-aggregates the tiny distinct-key partials table. grouping_id is the
    standard GROUPING() bitmask; avg rides as exact (sum, count) pairs.
    Exact DuckDB ROLLUP oracle."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate_sets

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"])
    out = group_aggregate_sets(
        li, ["l_returnflag", "l_linestatus"],
        [Agg.sum("l_quantity", "sum_qty"), Agg.count("l_quantity", "cnt"),
         Agg.avg("l_quantity", "avg_qty")], sets="rollup").to_pandas()
    return _round_cols(out, ["sum_qty", "avg_qty"])


def q_pivot_agg(sf_dir: str):
    """Pivot event_type categories into per-user aggregate columns
    (stages/reshape.pivot_agg): per-batch combiner emits ONE wide partial
    row per (user, batch) so the shuffle carries |users|×|categories|
    partials, then a coarse key-hash merge. The typed-columns analog of
    the reference's *_cate packed-string UDAFs
    (default_defs/*_by_category_def.cc). Exact CASE-arm DuckDB oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.reshape import pivot_agg

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "value"])
    out = pivot_agg(ev, "user_id", "event_type", "value",
                    agg="sum").to_pandas()
    return _round_cols(out, [c for c in out.columns if c != "user_id"])


def q_unpivot(sf_dir: str):
    """Melt lineitem's four numeric measures into long (variable, value)
    rows — row-local k-fold replication inside each batch, shuffle-free
    (stages/reshape.unpivot). Exact DuckDB UNION ALL oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.reshape import unpivot

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity",
                             "l_extendedprice", "l_discount", "l_tax"])
    out = unpivot(li, ["l_orderkey", "l_linenumber"],
                  ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
                  var_name="measure", value_name="val").to_pandas()
    return _round_cols(out, ["val"])


def q_explode_vec(sf_dir: str):
    """UNNEST WITH ORDINALITY over the embedding list column
    (stages/reshape.explode): Arrow-native and zero-copy — the flattened
    child array is referenced, parent rows gathered by one take() on
    list_parent_indices; no shuffle. Exact DuckDB unnest +
    generate_subscripts oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.reshape import explode

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = explode(emb, "embedding", out_col="x", pos_col="pos").to_pandas()
    out["x"] = out["x"].astype("float64")
    return _round_cols(out[["vec_id", "pos", "x"]], ["x"])


def q_collect_list_trace(sf_dir: str):
    """array_agg / collect_list (the inverse of explode): gather each
    user's event-type sequence in (ts, event_id) order into one Arrow
    list per key — one coarse key-hash exchange, then a zero-copy
    ListArray.from_arrays over per-bucket sort offsets; no per-group
    Python lists (stages/reshape.collect_list). The list is joined to a
    comma string for the hash compare, which also pins element ORDER.
    Exact DuckDB string_agg(... ORDER BY) oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.reshape import collect_list

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts", "event_id"])
    lists = collect_list(ev, "user_id", "event_type",
                         sort_by=["ts", "event_id"], out_col="types")

    def join_fn(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "trace": pc.binary_join(t["types"], ",")})

    return lists.map_batches(join_fn, batch_format="pyarrow",
                             batch_size=None).to_pandas()


def q_cate_agg(sf_dir: str):
    """sum_cate / count_cate (default_defs/*_by_category_def.cc):
    'cat1:agg,cat2:agg' strings, categories ascending."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def intify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["qty"] = df["l_quantity"].astype("int64")
        return df

    out = group_aggregate(
        li.map_batches(intify, batch_format="pandas", batch_size=None),
        "l_returnflag",
        [Agg.cate("sum", "qty", "l_linestatus", "sum_cate_qty"),
         Agg.cate("count", "qty", "l_linestatus", "cnt_cate_qty")],
    ).to_pandas()
    return out


def q_scalar_string_date(sf_dir: str):
    """Scalar library breadth: string + date + math + conditional kernels."""
    import pyarrow.compute as pc

    from openmldb_ray.functions.scalar import get, project
    from openmldb_ray.sources.io import read_table

    o = read_table(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority", "o_orderdate",
                            "o_totalprice", "o_orderstatus"])
    out = project(
        o,
        {
            "prio_upper": lambda t: get("upper")(t["o_orderpriority"]),
            "prio_sub": lambda t: get("substr")(t["o_orderpriority"], 1, 3),
            "prio_rev": lambda t: get("reverse")(t["o_orderpriority"]),
            "od_day": lambda t: get("day")(t["o_orderdate"]),
            "od_dow": lambda t: get("dayofweek")(t["o_orderdate"]),
            "od_doy": lambda t: get("dayofyear")(t["o_orderdate"]),
            "price_abs_floor": lambda t: get("floor")(t["o_totalprice"]),
            "price_sqrt": lambda t: get("sqrt")(t["o_totalprice"]),
            "is_open": lambda t: get("int64")(
                get("if")(pc.equal(t["o_orderstatus"], "O"), 1, 0)),
            "status_or_x": lambda t: get("if_null")(t["o_orderstatus"], "x"),
        },
        keep=["o_orderkey"],
    ).to_pandas()
    return _round_cols(out, ["price_sqrt"])


def q_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition + per-group first (SURVEY §7.4)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.dedup import exact_dedup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    out = exact_dedup(docs, "text", keep_by="doc_id").to_pandas()
    return out[["doc_id", "n_chars"]]


def q_text_stats(sf_dir: str):
    """Token counting + quality stats over documents."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.textstats import text_stats

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = text_stats(docs).to_pandas()
    out = out[["doc_id", "q_n_chars", "n_ws_tokens", "q_digit_ratio"]]
    return _round_cols(out, ["q_digit_ratio"])


def q_knn(sf_dir: str):
    """Brute-force cosine top-5 for the first 10 vectors."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.simsearch import knn_brute_force

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 10").to_pandas()
    out = knn_brute_force(
        emb, np.stack([np.asarray(v, float) for v in qdf["embedding"]]),
        qdf["vec_id"].to_numpy(), k=5).to_pandas()
    return out[["query_id", "neighbor_id", "rank"]]


def _ann_recall(sf_dir: str, method) -> pd.DataFrame:
    """Recall property oracle (approximate ANN vs the exact brute force,
    both computed HERE): the driver's hash compare then checks the recall
    floor as a constant-SQL property. All seeds fixed → deterministic."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.simsearch import knn_brute_force

    # the method under test + the exact baseline together scan this
    # narrow 2-column projection several times (pq_fit alone scans once
    # per Lloyd iteration); pin it in the object store once
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"]).materialize()
    qdf = emb.filter(expr="vec_id < 10").to_pandas()
    qm = np.stack([np.asarray(v, float) for v in qdf["embedding"]])
    qids = qdf["vec_id"].to_numpy()
    approx = method(emb, qm, qids).to_pandas()
    exact = knn_brute_force(emb, qm, qids, k=5).to_pandas()
    hits = 0
    for qid in qids:
        a = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
        e = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
        hits += len(a & e) / max(len(e), 1)
    recall = hits / max(len(qids), 1)
    return recall


def q_knn_lsh(sf_dir: str):
    """LSH-bucketed ANN: recall@5 vs exact brute force must clear 0.5
    (recall grows with num_tables; oracle = constant-SQL property row)."""
    from openmldb_ray.stages.simsearch import knn_lsh

    recall = _ann_recall(sf_dir, lambda emb, qm, qids: knn_lsh(emb, qm, qids, k=5))
    return pd.DataFrame({"metric": ["lsh_recall_at_5"],
                         "recall_floor_ok": [np.int64(recall >= 0.5)]})


def q_knn_ivf(sf_dir: str):
    """IVF ANN: recall@5 vs exact brute force must clear 0.7."""
    from openmldb_ray.stages.simsearch import knn_ivf

    recall = _ann_recall(sf_dir, lambda emb, qm, qids: knn_ivf(emb, qm, qids, k=5))
    return pd.DataFrame({"metric": ["ivf_recall_at_5"],
                         "recall_floor_ok": [np.int64(recall >= 0.7)]})


_N_PLANT = 25


def _max_doc_id(sf_dir: str, docs) -> int:
    """Max doc_id from the parquet footer statistics (one metadata read,
    not a second full-scan aggregate); falls back to the aggregate."""
    import os as _os

    import pyarrow.parquet as pq

    md = pq.read_metadata(_os.path.join(sf_dir, "documents.parquet"))
    idx = md.schema.to_arrow_schema().get_field_index("doc_id")
    stats = [md.row_group(i).column(idx).statistics
             for i in range(md.num_row_groups)]
    if stats and all(s is not None and s.has_min_max for s in stats):
        return max(s.max for s in stats)
    return docs.max("doc_id")


def _planted_docs(sf_dir: str):
    """documents + _N_PLANT exact copies planted with ids above the max id.
    An exact copy shares every LSH band / simhash segment with its original,
    so the dedup MUST drop it (the original or whatever transitively killed
    the original always precedes it in the greedy id-ordered scan)."""
    import ray.data as rd

    from openmldb_ray.sources.io import read_table

    import pyarrow as pa

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    src = docs.filter(expr=f"doc_id < {_N_PLANT}").to_pandas().sort_values("doc_id")
    max_id = _max_doc_id(sf_dir, docs)
    copies = pd.DataFrame({"doc_id": max_id + 1 + np.arange(len(src)),
                           "text": src["text"].to_numpy()})
    # from_arrow (not from_pandas) keeps every block Arrow-typed — a
    # mixed arrow/pandas-block dataset breaks downstream re-batching
    planted_ds = rd.from_arrow(pa.Table.from_pandas(copies, preserve_index=False)
                               .replace_schema_metadata(None))
    return docs.union(planted_ds), set(copies["doc_id"])


def _dedup_property(survivors: pd.DataFrame, id_col: str, planted: set) -> pd.DataFrame:
    ids = survivors[id_col]
    return pd.DataFrame({
        "planted": [np.int64(len(planted))],
        "planted_surviving": [np.int64(ids.isin(planted).sum())],
        "survivors_unique": [np.int64(ids.is_unique)],
    })


def q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dup: planted exact copies must all be removed
    (property oracle — the pairwise semantics aren't SQL-expressible)."""
    from openmldb_ray.stages.dedup import minhash_lsh_dedup

    docs, planted = _planted_docs(sf_dir)
    out = minhash_lsh_dedup(docs, "text", "doc_id").to_pandas()
    return _dedup_property(out, "doc_id", planted)


def q_minhash_dense(sf_dir: str):
    """Dense-duplicate corpus: 30% of documents (doc_id % 10 < 3) share ONE
    boilerplate text — the degenerate web-corpus shape that creates a
    mega (band, band_hash) bucket and load-tests the verify path's
    exact-signature collapse + capped chunked greedy (dedup.py). Property
    oracle: exactly one boilerplate row survives, it is the smallest
    boilerplate doc_id, and survivors are unique."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.dedup import minhash_lsh_dedup

    boiler = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
              "eiusmod tempor incididunt ut labore et dolore magna aliqua "
              "enim ad minim veniam quis nostrud exercitation ullamco")

    def densify(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = pa.array((ids % 10) < 3)
        text = pc.if_else(mask, pa.scalar(boiler), t["text"])
        return t.set_column(t.column_names.index("text"), "text", text)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(densify, batch_format="pyarrow", batch_size=None)
    out = minhash_lsh_dedup(docs, "text", "doc_id")
    ids = out.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy()
    all_ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id"])["doc_id"].to_numpy()
    bmin = int(all_ids[(all_ids % 10) < 3].min())
    bmask = (ids % 10) < 3
    return pd.DataFrame({
        "boiler_surviving": [np.int64(bmask.sum())],
        "boiler_min_kept": [np.int64(int(bmask.sum()) == 1
                                     and int(ids[bmask].min()) == bmin)],
        "survivors_unique": [np.int64(pd.Index(ids).is_unique)],
    })


def q_simhash_dedup(sf_dir: str):
    """SimHash near-dup: planted exact copies must all be removed."""
    from openmldb_ray.stages.dedup import simhash_dedup

    docs, planted = _planted_docs(sf_dir)
    out = simhash_dedup(docs, "text", "doc_id").to_pandas()
    return _dedup_property(out, "doc_id", planted)


def q_embedding_dedup(sf_dir: str):
    """Embedding-cosine near-dup: planted identical vectors must be removed
    (cosine 1.0 >= threshold; identical LSH buckets by construction)."""
    import ray.data as rd

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.simsearch import embedding_dedup

    import pyarrow as pa

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    src = emb.filter(expr=f"vec_id < {_N_PLANT}").to_pandas().sort_values("vec_id")
    max_id = emb.max("vec_id")
    copy_ids = max_id + 1 + np.arange(len(src))
    # match the parquet block schema exactly (list<float32>) — a pandas
    # object column would round-trip through Ray's tensor extension type
    # and no longer union with the Arrow-block source
    emb_type = dict(zip(emb.schema().names, emb.schema().types))["embedding"]
    copies = pa.table({
        "vec_id": pa.array(copy_ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in src["embedding"]],
                              type=emb_type),
    })
    out = embedding_dedup(emb.union(rd.from_arrow(copies))).to_pandas()
    return _dedup_property(out, "vec_id", set(copy_ids))


def q_langid(sf_dir: str):
    """Heuristic language ID. Property oracle: deterministic sentences
    built from each language's own stopword profile (score 1.0 for the
    right language, strictly less for every other) must classify to that
    language; the real documents stream through the same stage and only
    the ground-truth-free total is reported."""
    import ray.data as rd

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.textstats import _LANG_PROFILES, LangId

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    planted = pd.DataFrame({
        "doc_id": -1 - np.arange(len(_LANG_PROFILES)),
        "text": [" ".join(sorted(words) * 3) for words in _LANG_PROFILES.values()],
        "true_lang": list(_LANG_PROFILES),
    })
    pred = (docs.union(rd.from_pandas(planted[["doc_id", "text"]]))
                .map_batches(LangId, batch_format="pandas",
                             concurrency=(1, 4), batch_size=None)
                .to_pandas())
    m = planted.merge(pred[["doc_id", "lang_pred"]], on="doc_id")
    return pd.DataFrame({
        "planted_correct": [np.int64((m["lang_pred"] == m["true_lang"]).sum())],
        "planted_total": [np.int64(len(planted))],
        "docs_classified": [np.int64(pred["doc_id"].ge(0).sum())],
    })


def q_fingerprint(sf_dir: str):
    """Winnowed fingerprints. Property oracle: an exact copy has identical
    content and winnow hashes; distinct documents collide on neither (the
    hash values themselves are implementation-defined, so equality — not
    the values — is the contract)."""
    import ray.data as rd

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.textstats import Fingerprinter

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    src = docs.filter(expr=f"doc_id < {_N_PLANT}").to_pandas().sort_values("doc_id")
    max_id = _max_doc_id(sf_dir, docs)
    copies = pd.DataFrame({"doc_id": max_id + 1 + np.arange(len(src)),
                           "text": src["text"].to_numpy()})
    fp = (docs.union(rd.from_pandas(copies))
              .map_batches(Fingerprinter, batch_format="pandas",
                           concurrency=(1, 4), batch_size=None)
              .to_pandas())
    orig = fp.merge(src[["doc_id"]], on="doc_id")
    cop = fp[fp["doc_id"] > max_id].sort_values("doc_id").reset_index(drop=True)
    orig = orig.sort_values("doc_id").reset_index(drop=True)
    return pd.DataFrame({
        "pairs": [np.int64(len(cop))],
        "equal_content": [np.int64((orig["content_hash"].to_numpy()
                                    == cop["content_hash"].to_numpy()).sum())],
        "equal_winnow": [np.int64((orig["winnow_hash"].to_numpy()
                                   == cop["winnow_hash"].to_numpy()).sum())],
    })


def q_quality_filter(sf_dir: str):
    """Gopher/C4-style quality rules (curation.QualityRules). Exact DuckDB
    oracle: every metric and the keep decision are replayed in SQL."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import quality_filter

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = quality_filter(docs, keep_only=False).to_pandas()
    out = out[["doc_id", "n_words", "mean_word_len", "stopword_hits",
               "alpha_frac", "keep"]]
    out["keep"] = out["keep"].astype(np.int64)
    return _round_cols(out, ["mean_word_len", "alpha_frac"])


def q_pii_redact(sf_dir: str):
    """PII redaction with deterministic planted PII (the corpus is synthetic
    word salad, so emails/IPs/phones are injected identically on both
    sides); exact DuckDB regexp_replace oracle on counts AND redacted text."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import pii_redact

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        ids = df["doc_id"].to_numpy(np.int64)
        add = np.char.add
        em = np.where(ids % 3 == 0,
                      add(add(" contact user", ids.astype(str)), "@example.com"), "")
        ip = np.where(ids % 5 == 0,
                      add(" from 192.168.1.", (ids % 256).astype(str)), "")
        ph = np.where(ids % 7 == 0, " call 555-123-4567", "")
        df["text"] = df["text"].astype(str) + em + ip + ph
        return df

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(inject, batch_format="pandas", batch_size=None)
    out = pii_redact(docs).to_pandas()
    return out[["doc_id", "n_emails", "n_ips", "n_phones", "text_redacted"]]


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: needles = first 8 words of docs 0..4
    (standing in for an eval set), broadcast once per actor; drop any doc
    containing a needle. Exact DuckDB contains() anti-join oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import decontaminate

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    bench = docs.filter(expr="doc_id < 5").to_pandas()
    needles = [" ".join(t.strip().split()[:8]) for t in bench["text"]]
    out = decontaminate(docs, needles).to_pandas()
    return out[["doc_id", "n_chars"]]


def q_stratified_sample(sf_dir: str):
    """Deterministic per-source hash sampling (domain mixing): sources
    src0..src9 keep 60%, the rest 25%. mod_bits=20 so the DuckDB oracle's
    BIGINT arithmetic cannot overflow (engine default is the full 64-bit
    multiplicative hash)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import stratified_sample

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    rates = {f"src{i}": 0.6 for i in range(10)}
    out = stratified_sample(docs, rates, default_rate=0.25, mod_bits=20)
    return out.to_pandas()[["doc_id", "source"]]


def q_curation_pipeline(sf_dir: str):
    """End-to-end curation chain in ONE streaming pass (no materialization
    between stages): quality rules -> decontamination -> stratified
    sampling. Exact DuckDB oracle replays all three predicates nested."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import (decontaminate, quality_filter,
                                              stratified_sample)

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "source"])
    bench = docs.filter(expr="doc_id < 5").to_pandas()
    needles = [" ".join(t.strip().split()[:8]) for t in bench["text"]]
    out = quality_filter(docs)
    out = decontaminate(out, needles)
    out = stratified_sample(out, {f"src{i}": 0.6 for i in range(10)},
                            default_rate=0.25, mod_bits=20)
    return out.to_pandas()[["doc_id", "source"]]


def q_ngram_counts(sf_dir: str):
    """Global top-100 word bigrams (combiner -> ngram-hash shuffle ->
    bucket top-k -> tiny global sort). Exact DuckDB unnest/join oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import ngram_counts

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_counts(docs, top_k=100).to_pandas()


def q_repetition_stats(sf_dir: str):
    """Gopher repetition metrics per doc (duplicate-word fraction, top
    bigram share). Exact DuckDB oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import repetition_stats

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = repetition_stats(docs).to_pandas()
    out = out[["doc_id", "dup_word_frac", "top_bigram_frac"]]
    return _round_cols(out, ["dup_word_frac", "top_bigram_frac"])


def q_decontaminate_bloom(sf_dir: str):
    """At-scale n-gram decontamination: every 8-gram of docs 0..4 goes into
    a Bloom bitmap broadcast once per actor; a doc is contaminated iff any
    of its 8-grams hits. Cross-engine check: the EXACT contaminated count
    (recomputed in-query by set intersection) must equal DuckDB's lateral
    n-gram join; bloom adds no false negatives and bounded false
    positives."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import decontaminate_bloom

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.filter(expr="doc_id < 5").to_pandas().sort_values("doc_id")
    flagged = decontaminate_bloom(docs, list(bench["text"]), n=8,
                                  keep_only=False).to_pandas()

    def grams(t: str) -> set:
        ws = t.strip().split()
        return {" ".join(ws[i:i + 8]) for i in range(len(ws) - 7)}

    needle = set().union(*(grams(t) for t in bench["text"])) \
        if len(bench) else set()
    exact = flagged["text"].map(lambda t: bool(grams(t) & needle)).to_numpy()
    bloom = flagged["contaminated"].to_numpy(bool)
    extra = int((bloom & ~exact).sum())
    return pd.DataFrame({
        "exact_contaminated": [np.int64(exact.sum())],
        "no_false_negatives": [np.int64(bool((~bloom & exact).sum() == 0))],
        "fp_within_bound": [np.int64(extra <= max(1, len(flagged) // 1000))],
    })


def q_sample_quantiles(sf_dir: str):
    """Approximate quantiles from a deterministic bottom-k uniform sample.
    Property oracle: each estimated quantile's TRUE rank (computed exactly
    in-query) must sit within 5 binomial standard errors of its target."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import sample_quantiles

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    qs = [0.1, 0.5, 0.9]
    k = 2048
    est = sample_quantiles(docs, "n_chars", qs, k=k, id_col="doc_id")
    vals = docs.to_pandas()["n_chars"].to_numpy(np.float64)
    n = len(vals)
    ok = 1
    for q, e in zip(qs, est):
        rank = float((vals <= e).sum()) / max(n, 1)
        sigma = np.sqrt(q * (1 - q) / min(k, n))
        # +1/n covers the discrete mass sitting exactly at the estimate
        if abs(rank - q) > 5 * sigma + 1.0 / max(n, 1):
            ok = 0
    return pd.DataFrame({"n_rows": [np.int64(n)],
                         "ranks_within_bound": [np.int64(ok)]})


def q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct count of document texts. Exact distinct comes
    from the same Ray pipeline (exact_dedup count); the sketch estimate
    must land within 5 standard errors (sigma = 1.04/sqrt(2^12) ~ 1.6%)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import hll_distinct
    from openmldb_ray.stages.dedup import exact_dedup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    est = hll_distinct(docs, "text", p=12)
    exact = exact_dedup(docs, "text", keep_by="doc_id").count()
    sigma = 1.04 / (1 << 6)  # 1.04/sqrt(4096)
    return pd.DataFrame({
        "exact_distinct": [np.int64(exact)],
        "est_within_5sigma": [np.int64(abs(est / max(exact, 1) - 1) <= 5 * sigma)],
    })


def q_text_embed_dedup(sf_dir: str):
    """Chained text -> embedding pipeline: feature-hash embeddings
    (vocabulary-free hashing trick) feed embedding-cosine near-dup removal.
    Planted exact copies embed to identical unit vectors (cosine 1), so
    every copy must be dropped. Property oracle."""
    from openmldb_ray.stages.simsearch import embedding_dedup
    from openmldb_ray.stages.textstats import hash_embed

    docs, planted = _planted_docs(sf_dir)
    emb = hash_embed(docs, dim=64)
    out = embedding_dedup(emb, vec_col="embedding", id_col="doc_id") \
        .to_pandas()
    return _dedup_property(out, "doc_id", planted)


def q_bottomk_sample(sf_dir: str):
    """Exactly-k-per-stratum distributed bottom-k sample (combiner keeps k
    smallest hashes per stratum per batch; min-k merges exactly). Exact
    DuckDB window-rank oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import bottomk_sample

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    # mod_bits=20 so the oracle can replay the multiply in signed BIGINT;
    # the library default is the full 64-bit hash (see bottomk_sample)
    return bottomk_sample(docs, k=7,
                          mod_bits=20).to_pandas()[["doc_id", "source"]]


def q_heavy_hitters(sf_dir: str):
    """Misra-Gries heavy-hitter sketch over bigrams. Property oracle from
    the sketch's published guarantees: estimates never exceed the true
    count, underestimate by at most ceil(N/m), and the exact top-1 bigram
    is always in the sketch's top-k (its share clears every cut)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import _doc_bigrams, heavy_hitters

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    m = 512
    sk = heavy_hitters(docs, top_k=20, m=m).to_pandas()
    # exact counts, computed in-query (the sf-scale corpus fits a driver
    # pandas pass; the sketch path never needs this at real scale)
    texts = docs.to_pandas()["text"]
    exact = _doc_bigrams(texts).value_counts()
    n_total = int(exact.sum())
    bound = -(-n_total // m)  # ceil(N/m)
    est = dict(zip(sk["ngram"], sk["cnt"]))
    bounds_ok = all(0 <= exact.get(g, 0) - c <= bound for g, c in est.items())
    top1 = exact.index[0]
    return pd.DataFrame({
        "k_returned": [np.int64(len(sk))],
        "bounds_ok": [np.int64(bounds_ok)],
        "top1_present": [np.int64(top1 in est)],
    })


def q_chunk_tokens(sf_dir: str):
    """Sliding-window chunking of the tokenized docs into 64-token
    sequences with stride 48. Exact DuckDB oracle: chunk indices and
    lengths are pure arithmetic over per-doc word counts."""
    from openmldb_ray.stages.tokenops import chunk_tokens

    ds = _tokenized_docs(sf_dir)
    out = chunk_tokens(ds, seq_len=64, stride=48).to_pandas()
    return out[["doc_id", "chunk_idx", "n_tok"]]


def q_dup_clusters(sf_dir: str):
    """Near-dup clustering (MinHash pairs -> distributed connected
    components). Property oracle: every planted exact copy lands in the
    same cluster as its source doc, and every cluster id is <= the source
    id (labels are component minima)."""
    from openmldb_ray.stages.graph import dup_clusters

    docs, planted = _planted_docs(sf_dir)
    out = dup_clusters(docs, "text", "doc_id").to_pandas()
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    copy_ids = sorted(planted)
    together = le_src = 0
    for j, cid in enumerate(copy_ids):  # copy j duplicates original doc j
        if cid in lab and j in lab and lab[cid] == lab[j]:
            together += 1
        if cid in lab and lab[cid] <= j:
            le_src += 1
    return pd.DataFrame({
        "planted": [np.int64(len(planted))],
        "clustered_with_src": [np.int64(together)],
        "cluster_le_src": [np.int64(le_src)],
    })


def _tokenized_docs(sf_dir: str):
    """documents -> (doc_id, tokens:list<int32>, n_tok) via the library
    text->tokens bridge (stages/tokenops.tokenize_text — the north-rule
    input shape, derived so the same table exists at every sf without
    external data)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.tokenops import tokenize_text

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return tokenize_text(docs, batch_size=None) \
        .map_batches(lambda t: t.replace_schema_metadata(None),
                     batch_format="pyarrow", batch_size=None)


def q_substr_dedup(sf_dir: str):
    """ExactSubstr token-span dedup (Lee et al. 2021 semantics): doc 7's
    first 30 tokens are planted into every doc with doc_id % 13 == 0 and
    >= 13; after dedup with span_len=25 exactly ONE doc still contains the
    25-token needle (doc 7, the globally-first occurrence), every planted
    doc is restored to its original tokens (the appended span is removed
    whole), and every other doc is untouched. Property oracle."""
    from openmldb_ray.stages.tokenops import exact_substring_dedup

    base = _tokenized_docs(sf_dir).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    src = np.asarray(base.loc[base.doc_id == 7, "tokens"].iloc[0])[:30]
    needle = [int(x) for x in src[:25]]
    planted_ids = set(base.doc_id[(base.doc_id % 13 == 0)
                                  & (base.doc_id >= 13)].tolist())

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        hit = df["doc_id"].isin(planted_ids).to_numpy()
        toks = df["tokens"].to_numpy()
        for i in np.nonzero(hit)[0]:
            toks[i] = np.concatenate([np.asarray(toks[i], np.int32),
                                      src.astype(np.int32)])
        df["n_tok"] = [len(x) for x in toks]
        return df

    import ray.data as rd
    planted_df = plant(base.copy())
    planted_ds = rd.from_arrow(
        __import__("pyarrow").Table.from_pandas(planted_df,
                                                preserve_index=False)
        .replace_schema_metadata(None))
    out = exact_substring_dedup(planted_ds, span_len=25).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # naive reference ExactSubstr (the corpus itself contains planted
    # near-dup docs, so expected removals are NOT just our planted span;
    # same in-query O(n^2)-oracle pattern as the flagship PIT check)
    L = 25
    occ: dict = {}
    for d, t in zip(planted_df.doc_id, planted_df.tokens):
        t = [int(x) for x in t]
        for p in range(len(t) - L + 1):
            occ.setdefault(tuple(t[p:p + L]), []).append((int(d), p))
    expected = {}
    removals: dict = {}
    for win, hits in occ.items():
        hits.sort()
        for d, p in hits[1:]:
            removals.setdefault(d, []).append(p)
    for d, t in zip(planted_df.doc_id, planted_df.tokens):
        t = np.asarray(t, np.int64)
        mask = np.ones(len(t), bool)
        for p in removals.get(int(d), ()):
            mask[p:p + L] = False
        expected[int(d)] = t[mask].tolist()

    def contains(toks, m):
        t = list(toks)
        return any(t[i:i + len(m)] == m for i in range(len(t) - len(m) + 1))

    holders = [int(d) for d, t in zip(out.doc_id, out.tokens)
               if contains(t, needle)]
    matches = sum(int([int(x) for x in t] == expected[int(d)])
                  for d, t in zip(out.doc_id, out.tokens))
    return pd.DataFrame({
        "holders_after": [np.int64(len(holders))],
        "holder_is_first": [np.int64(holders == [7])],
        "planted": [np.int64(len(planted_ids))],
        "rows_match_naive": [np.int64(matches == len(out))],
        "all_rows_kept": [np.int64(len(out) == len(planted_df))],
    })


def q_pack_sequences(sf_dir: str):
    """Greedy sequence packing into 512-token examples over the tokenized
    documents. Invariants oracled in SQL: total token count conserved
    (SUM of per-doc word counts), every example within the cap, and the
    example count at least ceil(total/512)."""
    from openmldb_ray.stages.tokenops import pack_sequences

    ds = _tokenized_docs(sf_dir).drop_columns(["tokens"])
    out = pack_sequences(ds, max_len=512).to_pandas()
    total = int(out["total_tok"].sum())
    return pd.DataFrame({
        "total_tok": [np.int64(total)],
        "within_cap": [np.int64((out["total_tok"] <= 512).all())],
        "lb_ok": [np.int64(len(out) >= -(-total // 512))],
    })


def q_multimodal(sf_dir: str):
    """Multimodal columns with REAL pure-stdlib decode (stages/codecs):
    even ids are solid-color PNGs whose decoded channel means replay
    exactly in SQL ((7i + 13i + 29i) mod-256 sums); odd ids are PCM WAVs
    whose decoded sample count is 800+i. One actor-pool decode stage per
    modality; no fake_decode anywhere."""
    from openmldb_ray.stages.multimodal import (
        extract_image_features,
        make_multimodal_dataset,
        sample_audio_frames,
    )

    mm = make_multimodal_dataset(64)
    imgs = mm.filter(lambda r: r["mm_type"] == "image")
    aud = mm.filter(lambda r: r["mm_type"] == "audio")
    fi = extract_image_features(imgs).to_pandas()   # REAL PNG decode
    # solid color -> the mean of each channel is the exact color byte;
    # feat = r+g+b as an exact BIGINT
    fi["feat"] = fi["img_mean_rgb"].map(
        lambda v: int(round(float(np.sum(v))))).astype(np.int64)
    fa = sample_audio_frames(aud).to_pandas()       # REAL WAV decode
    fa["feat"] = fa["n_samples"].astype(np.int64)
    out = pd.concat([fi[["mm_id", "mm_type", "feat"]],
                     fa[["mm_id", "mm_type", "feat"]]], ignore_index=True)
    return out.sort_values("mm_id").reset_index(drop=True)


def q_multimodal_stats(sf_dir: str):
    """Typed multimodal metadata with REAL decode (stages/multimodal
    ImageStats / AudioStats): image dims + exact mean intensity for the
    solid-color PNGs, exact duration for the PCM WAVs. Exact SQL oracle
    (the payloads are arithmetic functions of mm_id)."""
    from openmldb_ray.stages.multimodal import (
        audio_stats,
        image_stats,
        make_multimodal_dataset,
    )

    mm = make_multimodal_dataset(64)
    fi = image_stats(mm.filter(lambda r: r["mm_type"] == "image")).to_pandas()
    fi = fi[["mm_id", "mm_type", "img_w", "img_h", "img_mean"]].copy()
    fi["duration_ms"] = np.nan
    fa = audio_stats(mm.filter(lambda r: r["mm_type"] == "audio")).to_pandas()
    fa = fa[["mm_id", "mm_type", "duration_ms"]].copy()
    fa["img_w"] = np.nan
    fa["img_h"] = np.nan
    fa["img_mean"] = np.nan
    out = pd.concat([fi, fa], ignore_index=True).sort_values("mm_id") \
        .reset_index(drop=True)
    return _round_cols(out[["mm_id", "mm_type", "img_w", "img_h",
                            "img_mean", "duration_ms"]],
                       ["img_w", "img_h", "img_mean", "duration_ms"])


def q_taxi(sf_dir: str):
    """The reference's taxi-trip demo feature vector (taxi.sql:9-23) over a
    deterministic synthetic trips table. The trips table is generated, not
    one of the driver's parquet views, so the DuckDB parity oracle runs
    HERE (same SQL as tests/test_taxi.py) and the driver checks the
    summary as a constant-SQL property."""
    import duckdb

    from openmldb_ray.pipelines.taxi import gen_taxi_batch, taxi_features

    n = 2000
    out = taxi_features(n).to_pandas()
    raw = gen_taxi_batch(np.arange(n, dtype=np.uint64), 42).to_pandas()
    con = duckdb.connect()
    con.register("t1", raw)
    oracle = con.sql("""
        SELECT id,
               SUM(pickup_latitude) OVER w  AS vendor_sum_pl,
               MAX(pickup_latitude) OVER w  AS vendor_max_pl,
               MIN(pickup_latitude) OVER w  AS vendor_min_pl,
               AVG(pickup_latitude) OVER w  AS vendor_avg_pl,
               COUNT(vendor_id) OVER w      AS vendor_cnt,
               SUM(pickup_latitude) OVER w2 AS pc_sum_pl,
               MAX(pickup_latitude) OVER w2 AS pc_max_pl,
               MIN(pickup_latitude) OVER w2 AS pc_min_pl,
               AVG(pickup_latitude) OVER w2 AS pc_avg_pl,
               COUNT(vendor_id) OVER w2     AS pc_cnt
        FROM t1
        WINDOW w AS (PARTITION BY vendor_id ORDER BY pickup_datetime
                     RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY passenger_count ORDER BY pickup_datetime
                      RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
    """).df()
    m = out.merge(oracle, on="id", suffixes=("", "_o"))
    feat_cols = ["vendor_sum_pl", "vendor_max_pl", "vendor_min_pl",
                 "vendor_avg_pl", "vendor_cnt", "pc_sum_pl", "pc_max_pl",
                 "pc_min_pl", "pc_avg_pl", "pc_cnt"]
    bad = sum(
        not np.allclose(pd.to_numeric(m[c], errors="coerce").astype(float),
                        pd.to_numeric(m[f"{c}_o"], errors="coerce").astype(float),
                        equal_nan=True)
        for c in feat_cols)
    return pd.DataFrame({"rows": [np.int64(len(m))],
                         "cols_checked": [np.int64(len(feat_cols))],
                         "mismatched_cols": [np.int64(bad)]})


def q_topn_cate(sf_dir: str):
    """top_n_key_sum_cate_where / top_n_value_count_cate_where
    (reference default_defs/*_by_category_def.cc + containers.h) — exact
    DuckDB string oracle."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["v"] = df["value"].astype("int64")
        df["big"] = df["v"] > 50
        return df[["user_id", "event_type", "v", "big"]]

    out = group_aggregate(
        ev.map_batches(prep, batch_format="pandas", batch_size=None), "user_id",
        [Agg.top_n_cate("sum", "v", "big", "event_type", 2, by="key", name="tk_sum"),
         Agg.top_n_cate("count", "v", "big", "event_type", 2, by="value", name="tv_cnt")],
    ).to_pandas()
    return out


def q_flagship(sf_dir: str):
    """The full tokenized-sequence suite, checked HERE against the
    independent O(n²) point-in-time oracle (pipelines/flagship.py
    pit_oracle_features) plus the PIT-join-leakage and token-roundtrip
    invariants; the driver validates the summary as a constant-SQL
    property."""
    from openmldb_ray.pipelines import flagship as FS

    n = 2000
    out = FS.flagship(num_docs=n).to_pandas()
    raw = FS.gen_sequences_batch(np.arange(n, dtype=np.uint64), 42, n).to_pandas()
    split_ts = FS.BASE_TS + (n // 2) * FS.STEP_MS // 5
    exp = FS.pit_oracle_features(raw, split_ts)
    m = out.merge(exp, on="doc_id", suffixes=("", "_exp"))
    feat_cols = ["sum_tok_6h", "cnt_6h", "avg_tok_6h", "min_tok_6h",
                 "max_tok_6h", "lag1_tok", "dc_lang_6h"]
    bad = sum(
        not np.allclose(pd.to_numeric(m[c], errors="coerce").astype(float),
                        pd.to_numeric(m[f"{c}_exp"], errors="coerce").astype(float),
                        equal_nan=True)
        for c in feat_cols)
    bad += int(not (m["top_lang_6h"].astype(str)
                    == m["top_lang_6h_exp"].astype(str)).all())
    j = out[out["prev_day_avail_ts"].notna()]
    pit_violations = int((j["prev_day_avail_ts"] > j["event_ts"]).sum())
    tok_in = dict(zip(raw["doc_id"], raw["tokens"]))
    tok_bad = sum(
        not np.array_equal(np.asarray(t, dtype=np.int32),
                           np.asarray(tok_in[d], dtype=np.int32))
        for d, t in zip(out["doc_id"], out["tokens"]))
    return pd.DataFrame({
        "rows": [np.int64(len(out))],
        "oracle_rows": [np.int64(len(exp))],
        "mismatched_cols": [np.int64(bad)],
        "pit_violations": [np.int64(pit_violations)],
        "token_mismatches": [np.int64(tok_bad)],
    })


# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# SQL front-end surface (openmldb_ray.sql): the same pipelines expressed as
# OpenMLDB SQL text, parsed + lowered by the engine (parser.py/engine.py) —
# machine-checked against DuckDB like every other query. The reference YAML
# conformance corpus runs through the same path (tests/test_sql_conformance).


def _sql_tables(sf_dir: str, names):
    """Tables for sql_query with an explicit arrival-order tiebreak: the
    SQL window kernel breaks ts ties by __rid, so derive it from a unique
    key column to keep results reproducible across block orders."""
    import pyarrow as pa

    from openmldb_ray.sources.io import read_table

    rid_src = {"events": "event_id", "orders": "o_orderkey",
               "customer": "c_custkey", "lineitem": None}
    out = {}
    for n in names:
        if n == "events":
            ds = _events_ms(sf_dir)
        else:
            ds = read_table(sf_dir, n)
        src_col = rid_src.get(n)
        if src_col:
            def add_rid(t: "pa.Table", c=src_col) -> "pa.Table":
                import pyarrow.compute as pc
                return t.append_column("__rid", pc.cast(t[c], pa.int64()))
            ds = ds.map_batches(add_rid, batch_format="pyarrow", batch_size=None)
        out[n] = ds
    return out


def q_sql_window(sf_dir: str):
    """SQL text -> window_agg lowering (sql/engine.py): ROWS window with
    sum/count over events, tie-broken by event_id."""
    from openmldb_ray.sql import sql_query

    out = sql_query(
        "SELECT event_id, user_id, ts_ms, "
        "sum(value) OVER w AS sum_v, count(*) OVER w AS cnt "
        "FROM events WINDOW w AS (PARTITION BY events.user_id "
        "ORDER BY events.ts_ms ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
        _sql_tables(sf_dir, ["events"]),
    ).to_pandas()
    return _round_cols(out, ["sum_v"])


def q_sql_lastjoin(sf_dir: str):
    """SQL text -> last_join lowering: sorted LAST JOIN (max order key)."""
    from openmldb_ray.sql import sql_query

    out = sql_query(
        "SELECT c.c_custkey, c.c_name, o.o_totalprice AS last_price "
        "FROM customer c LAST JOIN orders o ORDER BY o.o_orderkey "
        "ON c.c_custkey = o.o_custkey",
        _sql_tables(sf_dir, ["customer", "orders"]),
    ).to_pandas()
    return _round_cols(out, ["last_price"])


def q_sql_groupby(sf_dir: str):
    """SQL text -> group_aggregate lowering with WHERE + HAVING."""
    from openmldb_ray.sql import sql_query

    out = sql_query(
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
        "count(*) AS n FROM lineitem WHERE l_quantity > 10 "
        "GROUP BY l_returnflag, l_linestatus HAVING count(*) > 5",
        _sql_tables(sf_dir, ["lineitem"]),
    ).to_pandas()
    return _round_cols(out, ["sum_qty"])


def q_asof_tolerance(sf_dir: str):
    """LAST JOIN with a max-staleness tolerance: the point-in-time bound
    PLUS ``right_ts >= left_ts - tol`` — a right row older than the
    tolerance no longer matches (feature freshness contract). Expressed
    through the join's native ``tolerance=`` (merge_asof tolerance on the
    vectorized asof path — round 5; previously a residual lambda, which
    forces the O(candidate-pairs) generic kernel for what is a bounded
    asof; the residual path itself stays driver-covered by the
    lastjoin_complex corpus + fuzzers). tol = 8400 days sits inside the
    events-vs-orders gap distribution (p25 8264 / p50 8371 / p90 8817
    days), so the output is a genuine mix of matched and
    tolerance-nulled rows. Exact DuckDB oracle."""
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.join_stage import last_join

    tol_ms = 8400 * 86400000
    orders = with_ts_ms(read_table(sf_dir, "orders"), "o_orderdate", "o_ts_ms") \
        .select_columns(["o_orderkey", "o_custkey", "o_totalprice", "o_ts_ms"])
    out = last_join(
        _events_ms(sf_dir), orders, ("user_id", "o_custkey"),
        order_by="o_ts_ms", asof_left_ts="ts_ms", tiebreak="o_orderkey",
        right_cols={"o_orderkey": "o_orderkey", "o_totalprice": "o_totalprice"},
        strategy="broadcast",
        tolerance=tol_ms,
    ).to_pandas()
    out["o_orderkey"] = pd.to_numeric(out["o_orderkey"], errors="coerce").astype(float)
    out["o_totalprice"] = pd.to_numeric(out["o_totalprice"], errors="coerce").astype(float)
    return _round_cols(out, ["value", "o_totalprice"])


def q_label_join(sf_dir: str):
    """Forward as-of LABEL join (next_join): per order, the FIRST event of
    the same customer STRICTLY after the order timestamp and within an
    8400-day horizon — the supervised label-generation mirror of the PIT
    LAST JOIN ("did the user act within H of this feature row?"). The
    horizon sits inside the orders→events gap distribution (p25 8264 / p50
    8371 / p90 8817 days), so the output genuinely mixes labeled and
    unlabeled rows. Ties on the event ts break by MIN event_id (first
    future match). Exact DuckDB oracle."""
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.join_stage import next_join

    horizon_ms = 8400 * 86400000
    orders = with_ts_ms(read_table(sf_dir, "orders"), "o_orderdate", "o_ts_ms") \
        .select_columns(["o_orderkey", "o_custkey", "o_ts_ms"])
    out = next_join(
        orders, _events_ms(sf_dir), ("o_custkey", "user_id"),
        order_by="ts_ms", asof_left_ts="o_ts_ms",
        horizon=horizon_ms, strict=True, tiebreak="event_id",
        right_cols={"event_id": "label_event_id", "ts_ms": "label_ts_ms",
                    "value": "label_value"},
        strategy="broadcast",
    ).to_pandas()
    for c in ("label_event_id", "label_ts_ms"):
        out[c] = pd.to_numeric(out[c], errors="coerce").astype(float)
    return _round_cols(out, ["label_value"])


def q_latest_snapshot(sf_dir: str):
    """Feature-store "current value" read (latest_snapshot): the single
    latest order per customer as of 1995-06-01 (ties by max o_orderkey) —
    one coarse-bucket key-hash shuffle with a per-block combiner so at most
    one candidate row per key leaves each block. Exact DuckDB ROW_NUMBER
    oracle."""
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.join_stage import latest_snapshot

    cutoff_ms = int(pd.Timestamp("1995-06-01").value // 10**6)
    orders = with_ts_ms(read_table(sf_dir, "orders"), "o_orderdate", "o_ts_ms") \
        .select_columns(["o_orderkey", "o_custkey", "o_totalprice", "o_ts_ms"])
    out = latest_snapshot(orders, "o_custkey", "o_ts_ms",
                          as_of=cutoff_ms, tiebreak="o_orderkey").to_pandas()
    return _round_cols(out, ["o_totalprice"])


def q_range_join(sf_dir: str):
    """Interval (range) containment join — every (point, interval) pair
    with point inside [start, end] and an equal segment key: orders as
    points, every 37th order spawning a (1..45)-day validity interval.
    Runs the SHUFFLE strategy: both sides range-partitioned on coarse time
    buckets, intervals replicated only to buckets they overlap, degenerate
    long intervals broadcast; per-bucket matching is a vectorized
    searchsorted sweep (no pair loop). Exact DuckDB BETWEEN-join oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.interval_join import interval_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def mk_pts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["grp"] = (df["o_custkey"] % 7).astype("int64")
        return df[["o_orderkey", "grp", "o_orderdate"]]

    def mk_iv(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderkey"] % 37 == 0].copy()
        df["grp"] = (df["o_orderkey"] % 7).astype("int64")
        df["iv_start"] = df["o_orderdate"]
        df["iv_end"] = (df["o_orderdate"] + pd.to_timedelta(
            df["o_orderkey"] % 45 + 1, unit="D")).astype("datetime64[us]")
        df = df.rename(columns={"o_orderkey": "iv_key"})
        return df[["iv_key", "grp", "iv_start", "iv_end"]]

    pts = orders.map_batches(mk_pts, batch_format="pandas")
    iv = orders.map_batches(mk_iv, batch_format="pandas")
    out = interval_join(pts, iv, ts_col="o_orderdate",
                        start_col="iv_start", end_col="iv_end", on="grp",
                        how="inner",
                        right_cols=["iv_key", "iv_start", "iv_end"],
                        strategy="shuffle").to_pandas()
    return out[["o_orderkey", "grp", "o_orderdate",
                "iv_key", "iv_start", "iv_end"]]


def q_hopping_agg(sf_dir: str):
    """Hopping-window (sliding-by-step) aggregate over the event stream:
    4h windows every 1h, per event_type — each event replicated to its 4
    windows VECTORIZED and immediately collapsed by a per-batch combiner,
    so the shuffle carries (key × window) partials, never replicated
    events. SQL null semantics (sum/avg null for all-null windows). Exact
    DuckDB generate-offsets GROUP BY oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.stream_window import hopping_window_agg

    HOUR = 3_600_000_000  # us
    ev = read_table(sf_dir, "events",
                    columns=["ts", "event_type", "value"])
    out = hopping_window_agg(
        ev, ts_col="ts", window=4 * HOUR, hop=HOUR,
        key_cols=["event_type"],
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value"),
              "min_value": ("min", "value"), "max_value": ("max", "value"),
              "avg_value": ("mean", "value")}).to_pandas()
    eng_avg = pd.to_numeric(out["avg_value"], errors="coerce").to_numpy(float)
    out = _round_cols(out, ["sum_value", "min_value", "max_value"])
    # avg = rounded_sum / cnt on BOTH sides: sf0.1 exposed exact half-ties
    # at the 6th decimal (2-decimal values / power-of-two values land on
    # multiples of 1e-2/2^k), where numpy half-even and DuckDB ROUND
    # disagree; dividing the identical rounded doubles is bit-exact.
    # The ENGINE mean stays under test: assert it equals sum/cnt within
    # 1e-9 before the overwrite, so a mean-kernel regression still fails
    # this query rather than vanishing behind the replay.
    exact_avg = (pd.to_numeric(out["sum_value"], errors="coerce")
                 / out["cnt"]).to_numpy(float)
    both = np.isfinite(eng_avg) & np.isfinite(exact_avg)
    if np.isfinite(eng_avg).sum() != np.isfinite(exact_avg).sum() or (
            both.any() and np.abs(eng_avg[both] - exact_avg[both]).max()
            > 1e-6):
        raise AssertionError(
            "hopping_agg: engine avg_value diverges from sum/cnt")
    out["avg_value"] = out["sum_value"] / out["cnt"]
    return out


def q_shard_shuffle(sf_dir: str):
    """Seeded global shuffle into ~50k-char training shards: every doc gets
    a deterministic multiplicative-hash shuffle position, and its EXACT
    global running char count at that position — a global prefix sum with
    NO global sort (analytic range partition of the uniform hash, one
    shuffle-free bincount pass for bucket offsets, one bucketed exchange
    with local cumsum). Exact DuckDB running-SUM window oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.shard import seeded_shard_shuffle

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])
    out = seeded_shard_shuffle(docs, "doc_id", shard_budget=50_000,
                               weight_col="n_chars").to_pandas()
    return _round_cols(out[["doc_id", "source", "n_chars", "h",
                            "cum_weight", "shard"]], ["cum_weight"])


def q_score_norm(sf_dir: str):
    """Per-source percentile-rank normalization (exact CUME_DIST of
    n_chars within each source): a per-batch combiner collapses rows to
    the distinct-score HISTOGRAM, the driver cumsums it per key, one
    object-store broadcast, and a shuffle-free searchsorted row pass.
    Exact DuckDB CUME_DIST window oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.rank import cume_dist

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])
    out = cume_dist(docs, "n_chars", key_col="source",
                    strategy="broadcast").to_pandas()
    return _round_cols(out[["doc_id", "source", "n_chars", "cume_dist"]],
                       ["cume_dist"])


def q_rank_ops(sf_dir: str):
    """Per-key SQL rank-function family (row_number / rank / dense_rank /
    percent_rank / ntile) in ONE coarse key-hash exchange + a vectorized
    per-bucket kernel (stages/rank.rank_window). Ordered by event_type
    (few distinct values → heavy tie runs, the interesting rank case),
    deterministic row order via the unique event_id tiebreak. Exact DuckDB
    window-function oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.rank import rank_window

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type"])
    out = rank_window(
        ev, "event_type", key_col="user_id", tiebreak="event_id",
        outs={"rn": "row_number", "rk": "rank", "dr": "dense_rank",
              "pr": "percent_rank", "nt": ("ntile", 4)}).to_pandas()
    return _round_cols(
        out[["event_id", "user_id", "event_type", "rn", "rk", "dr",
             "pr", "nt"]], ["pr"])


def q_kmeans_embed(sf_dir: str):
    """Distributed full-dataset Lloyd k-means over the embedding column
    (per-iteration: one streaming assignment pass emitting k mergeable
    (count, sum, SSE) partials per block, tiny driver fold; seeded
    k-means++ init from a driver sample). Property oracle (iterative
    clustering is not SQL-expressible): the distributed fit must equal a
    single-process numpy Lloyd from the SAME init (atol 1e-8), inertia
    must be non-increasing, and the assignment column must be the argmin
    distance to the fitted centroids."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.cluster import kmeans_assign, kmeans_fit

    k, iters = 8, 5
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    model = kmeans_fit(emb, "embedding", k, iters=iters, seed=13)
    out = kmeans_assign(emb, model, dist_col="d2").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    X = np.stack(out["embedding"].to_numpy()).astype(np.float64)
    c = model["init"].copy()
    ref_inertia = []
    for _ in range(iters):
        sc = X @ c.T - 0.5 * (c * c).sum(axis=1)
        a = sc.argmax(axis=1)
        ref_inertia.append(float(((X * X).sum(axis=1)
                                  - 2.0 * sc.max(axis=1)).sum()))
        sums = np.zeros_like(c)
        np.add.at(sums, a, X)
        cnt = np.bincount(a, minlength=len(c)).astype(np.float64)
        nz = cnt > 0
        c = c.copy()
        c[nz] = sums[nz] / cnt[nz, None]

    parity = int(np.allclose(model["centroids"], c, atol=1e-8))
    inertia_ok = int((np.diff(np.asarray(model["inertia"])) <= 1e-6).all())
    cf = model["centroids"]
    am = (X @ cf.T - 0.5 * (cf * cf).sum(axis=1)).argmax(axis=1)
    assign_ok = int((out["cluster"].to_numpy() == am).all())
    return pd.DataFrame({
        "n_rows": [np.int64(len(out))],
        "k_clusters": [np.int64(len(model["centroids"]))],
        "parity": [np.int64(parity)],
        "inertia_monotone": [np.int64(inertia_ok)],
        "assign_is_argmin": [np.int64(assign_ok)],
    })


def q_mixture_sample(sf_dir: str):
    """Mixture resampling to TARGET proportions (the DoReMi data-mixing
    shape): keep rates DERIVED from distributed per-source counts and
    integer target weights (src0..src9 weighted (k%4)+1, the rest
    dropped), with exact arbitrary-precision integer thresholds so a SQL
    engine replays the keep rule bit-for-bit. One shuffle-free counting
    pass + one broadcast hash filter. Exact DuckDB integer-ceil oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import mixture_sample

    weights = {f"src{k}": (k % 4) + 1 for k in range(10)}
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])
    return mixture_sample(docs, weights).to_pandas()


def q_dsir_select(sf_dir: str):
    """DSIR importance resampling (Xie et al. 2023): fit hashed-ngram
    (uni+bi) bucket distributions for a TARGET domain (src0/src1 docs)
    and the raw rest-of-corpus with shuffle-free sparse count partials,
    broadcast the smoothed log-ratio table once, score raw docs in one
    streaming pass (explode grams vectorized, per-doc bincount sum), and
    keep the top-k by deterministic Gumbel-perturbed weight via sort-free
    order statistics. Property oracle (hashing not SQL-expressible): the
    selected set must equal the exact top-k of a driver-side vectorized
    recompute (the domain-preference property is pinned by
    tests/test_dsir.py on a corpus with real domain signal)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.dsir import (_bucketize, _explode_grams,
                                          dsir_select)

    # the narrow 3-column projection is consumed 5+ times downstream
    # (count, two fit passes, scoring base, final filter, verification);
    # pin it once — same materialize-below-threshold trade as the
    # flagship (at 100 TB you'd re-stream the raw side instead and pay
    # the re-read, or cap with pipelines/flagship.py's size guard)
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text"]).materialize()
    target = docs.filter(expr="source == 'src0' or source == 'src1'")
    raw = docs.filter(expr="source != 'src0' and source != 'src1'")
    raw_n = raw.count()
    k = max(raw_n // 10, 1)
    sel, model = dsir_select(raw, target, k, num_buckets=2048)
    out = sel.to_pandas()

    # exact verdict: vectorized driver recompute of every raw doc's key
    rdf = raw.to_pandas().sort_values("doc_id").reset_index(drop=True)
    gdoc, grams = _explode_grams(rdf["text"])
    b = _bucketize(grams, model["num_buckets"])
    logw = np.bincount(gdoc, weights=model["table"][b], minlength=len(rdf))
    from openmldb_ray.stages.curation import knuth_hash_u32
    u = (knuth_hash_u32(rdf["doc_id"].to_numpy()).astype(np.float64)
         + 0.5) / float(1 << 32)
    key = logw - np.log(-np.log(u))
    order = np.lexsort((rdf["doc_id"].to_numpy(), -key))
    ref_ids = set(rdf["doc_id"].to_numpy()[order[:k]])
    return pd.DataFrame({
        "n_selected": [np.int64(len(out))],
        "k_requested": [np.int64(k)],
        "topk_exact": [np.int64(set(out["doc_id"]) == ref_ids)],
    })


def q_incremental_docs(sf_dir: str):
    """Incremental corpus refresh: new-crawl docs whose TEXT content is
    not already in yesterday's corpus — a distributed ANTI-join on the
    content column (NOT EXISTS semantics). Shuffle strategy: ONE coarse
    co-exchange on the content-hash bucket, the right side reduced to
    per-block DISTINCT keys before it moves, value-exact probe within the
    bucket. Exact DuckDB NOT EXISTS oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.semijoin import anti_join

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text", "n_chars"])

    def _mod_ne(m):
        def fn(t):
            return t.filter(t.column("doc_id").to_numpy() % m != 0)
        return fn

    old = docs.map_batches(_mod_ne(3), batch_format="pyarrow",
                           batch_size=None)
    new = docs.map_batches(_mod_ne(5), batch_format="pyarrow",
                           batch_size=None)
    out = anti_join(new, old, "text", strategy="shuffle").to_pandas()
    return out[["doc_id", "source", "n_chars"]]


def q_weighted_sample(sf_dir: str):
    """Exactly-k weighted sampling without replacement (probability
    proportional to n_chars): deterministic Efraimidis-Spirakis keys
    ln(u)/w with u a multiplicative hash of the id, selected by sort-free
    order statistics — stable under reruns/repartition/resume. The key is
    SQL-expressible, so the oracle is an exact DuckDB window top-k."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import weighted_sample

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])
    out = weighted_sample(docs, 300, "n_chars").to_pandas()
    return out[["doc_id", "source", "n_chars"]]


def q_winsorize(sf_dir: str):
    """Outlier clipping at exact corpus percentiles (the feature-eng
    winsorize): P01/P99 come from the sort-free exact-quantile
    refinement (quantile_disc semantics, so the clip bounds are ACTUAL
    data values — the clipped output is bit-exact, no float arithmetic
    beyond comparisons), then one shuffle-free streaming clip pass.
    Exact DuckDB LEAST/GREATEST-over-quantile_disc oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.quantile import exact_quantiles

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber",
                             "l_extendedprice"])
    qv = exact_quantiles(li, "l_extendedprice", [0.01, 0.99],
                         interpolation="disc", collect_cap=50_000,
                         materialize_narrow=True)
    lo, hi = float(qv["value"].iloc[0]), float(qv["value"].iloc[1])

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["price_w"] = df["l_extendedprice"].clip(lo, hi)
        return df

    out = li.map_batches(clip, batch_format="pandas",
                         batch_size=None).to_pandas()
    return out[["l_orderkey", "l_linenumber", "price_w"]]


def q_per_key_sample(sf_dir: str):
    """Exactly-k uniform sample PER KEY (balanced eval subsets: 10 docs
    per source), deterministic under rerun/repartition/resume: order by
    the integer-exact knuth hash of the id and keep the per-key top-10
    via the high-cardinality-safe per-key cap (per-block combiner keeps
    <= n rows per key per block, one coarse-bucket shuffle). The hash is
    SQL-expressible, so the oracle is an exact per-key ROW_NUMBER."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import knuth_hash_u32
    from openmldb_ray.stages.select import top_n_per_key

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = knuth_hash_u32(df["doc_id"].to_numpy(),
                                   mod_bits=20).astype(np.int64)
        return df

    out = top_n_per_key(
        docs.map_batches(add_h, batch_format="pandas", batch_size=None),
        "source", "__h", 10, tiebreak="doc_id", ascending=True,
        num_partitions=8).to_pandas()
    return out[["doc_id", "source", "n_chars"]]


def q_hll_by_key(sf_dir: str):
    """Per-key HyperLogLog ("distinct texts per source"): each batch
    emits one 4KB register row per key it contains, one key groupby
    max-merges them — the shuffle carries kilobytes per (key, batch)
    regardless of input size. Exact per-key distinct comes from the Ray
    exact-dedup pipeline; each estimate must land within 5 standard
    errors (sigma = 1.04/sqrt(2^12))."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import hll_by_key
    from openmldb_ray.stages.dedup import exact_dedup

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text"])
    est = hll_by_key(docs, "text", "source",
                     num_partitions=8).to_pandas()

    def add_st(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__st"] = df["source"].astype(str) + "\x01" + \
            df["text"].astype(str)
        return df

    exact = exact_dedup(
        docs.map_batches(add_st, batch_format="pandas", batch_size=None),
        "__st", keep_by="doc_id").groupby("source").count().to_pandas()
    merged = exact.rename(columns={"count()": "exact_distinct"}).merge(
        est, on="source")
    sigma = 1.04 / (1 << 6)
    ok = (merged["distinct_est"] / merged["exact_distinct"] - 1).abs() \
        <= 5 * sigma
    return pd.DataFrame({
        "source": merged["source"],
        "exact_distinct": merged["exact_distinct"].astype(np.int64),
        "est_within_5sigma": ok.astype(np.int64)})


def q_quantile_by_key(sf_dir: str):
    """GROUP BY exact quantiles (per-source p25/p50/p95 of n_chars,
    disc + cont in one refinement): every round is ONE streaming scan of
    the (key, value) projection — each active (key, q) bins its own
    interval inside the scan, the driver folds a (#active x bins)
    histogram. Exact DuckDB per-group quantile_disc/quantile_cont
    oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.quantile import exact_quantiles_by_key

    docs = read_table(sf_dir, "documents", columns=["source", "n_chars"])
    out = exact_quantiles_by_key(docs, "n_chars", [0.25, 0.5, 0.95],
                                 "source", interpolation="both",
                                 collect_cap=50_000,
                                 materialize_narrow=True)
    return out[["source", "q", "disc", "cont"]]


def q_collocations(sf_dir: str):
    """Corpus-wide collocation extraction (Church & Hanks association
    ratio): top-30 word bigrams by lift = count(ab)*N/(count(a)*count(b))
    with min_count 5. One combiner pass (distinct grams per batch ride
    the shuffle, not occurrences), one gram-hash fold where the
    min_count prune also bounds the broadcast unigram table, one
    streaming scoring pass with per-block top-k. Ranking uses lift, not
    ln(lift): IEEE multiply/divide are exactly specified, so the float
    is bit-identical to the DuckDB oracle's expression."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.colloc import collocations

    docs = read_table(sf_dir, "documents", columns=["text"])
    return collocations(docs, top_k=30, min_count=5, num_partitions=16)


def q_knn_join(sf_dir: str):
    """Dataset-to-dataset cosine top-3 join (every even vec against the
    odd-vec corpus) on the exact broadcast path: right side stacked into
    one normalized matrix in the object store, each left batch answers
    its own top-k with a single matmul — no shuffle, no reduce. Exact
    DuckDB CROSS JOIN + list_cosine_similarity ROW_NUMBER oracle (the
    IVF scale path is recall-tested in tests/test_knn_join.py)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.simsearch import knn_join

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def parity(p):
        return lambda df: df[df["vec_id"].to_numpy() % 2 == p]

    left = emb.map_batches(parity(0), batch_format="pandas",
                           batch_size=None)
    right = emb.map_batches(parity(1), batch_format="pandas",
                            batch_size=None)
    out = knn_join(left, right, k=3, strategy="broadcast").to_pandas()
    return out[["query_id", "neighbor_id", "rank"]]


def q_drift_psi(sf_dir: str):
    """Snapshot drift monitoring: Population Stability Index of n_chars
    between two corpus halves (sources src0-9 as the reference snapshot,
    src10-19 as current) over FIXED bin edges. Each snapshot is ONE
    streaming pass emitting <= #bins mergeable count partials per block;
    the driver folds two #bins-row histograms — no shuffle. Exact DuckDB
    oracle replaying the clamped searchsorted binning, the GREATEST
    epsilon floor and the (q-p)*ln(q/p) terms."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.drift import drift_psi

    docs = read_table(sf_dir, "documents", columns=["source", "n_chars"])
    refs = [f"src{k}" for k in range(10)]

    def split(which):
        def fn(df):
            m = df["source"].isin(refs)
            return df[m if which == "ref" else ~m]
        return fn

    ref = docs.map_batches(split("ref"), batch_format="pandas",
                           batch_size=None)
    cur = docs.map_batches(split("cur"), batch_format="pandas",
                           batch_size=None)
    edges = [0, 250, 280, 300, 320, 350, 100000]
    out = drift_psi(ref, cur, "n_chars", edges)
    # fractions are bit-exact (integer count / integer n divisions);
    # PSI itself goes through ln(), whose last bits differ between numpy
    # and DuckDB's libm — compare it at interpretive precision (the
    # standard <0.1 / <0.25 stability bands) instead of bit-for-bit
    psi = out["psi"].to_numpy()
    band = np.where(psi < 0.1, "stable",
                    np.where(psi < 0.25, "moderate", "shifted"))
    return pd.DataFrame({"bin": out["bin"], "ref_frac": out["ref_frac"],
                         "cur_frac": out["cur_frac"], "psi_band": band})


def q_normalize_text(sf_dir: str):
    """Canonical text normalization (the pass every dedup pipeline runs
    first): lowercase -> punctuation strip -> whitespace collapse, all
    vectorized pandas str kernels in one shuffle-free pass. The fixture
    first derives a deliberately messy column (upper-cased copy glued
    with punctuation — replayed identically in SQL) so the op has real
    work; the oracle replays lower + two regexp_replace passes."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.textstats import normalize_text

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def messy(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = (df["text"].astype(str).str.upper()
                      + "  ,, !! " + df["text"].astype(str))
        return df

    out = normalize_text(
        docs.map_batches(messy, batch_format="pandas", batch_size=None),
        strip_punct=True).to_pandas()
    return out[["doc_id", "text"]]


_HTML_WRAP_PRE = ('<html><head><style>p {color:red}</style>'
                  '<!-- note --></head><body><h1>')
_HTML_WRAP_MID = '</h1><p class="x">'
_HTML_WRAP_POST = (' &amp; 1 &lt; 2</p><script type="text/js">var x=1;'
                   '</script></body></html>')


def q_html_extract(sf_dir: str):
    """HTML → text extraction (textstats.html_to_text), the first pass of
    every web-scrape pipeline: script/style/comment removal, tag strip,
    entity decode (amp last), whitespace collapse. The fixture wraps each
    doc in a fixed HTML shell (replayed identically in SQL) and the
    oracle replays the op's own HTML_STRIP_STEPS table verbatim as a
    regexp_replace/replace chain — exact string equality."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.textstats import html_to_text

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def wrap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        t = df["text"].astype(str)
        df["text"] = _HTML_WRAP_PRE + t + _HTML_WRAP_MID + t + _HTML_WRAP_POST
        return df

    out = html_to_text(
        docs.map_batches(wrap, batch_format="pandas", batch_size=None),
    ).to_pandas()
    return out[["doc_id", "text"]]


def _html_extract_oracle_sql() -> str:
    from openmldb_ray.stages.textstats import HTML_STRIP_STEPS

    def q(s: str) -> str:
        return s.replace("'", "''")

    expr = "m.text"
    for pat, rep, is_re in HTML_STRIP_STEPS:
        if is_re:
            expr = f"regexp_replace({expr}, '{q(pat)}', '{q(rep)}', 'g')"
        else:
            expr = f"replace({expr}, '{q(pat)}', '{q(rep)}')"
    return f"""
        WITH m AS (
          SELECT doc_id,
                 '{q(_HTML_WRAP_PRE)}' || text || '{q(_HTML_WRAP_MID)}'
                 || text || '{q(_HTML_WRAP_POST)}' AS text
          FROM documents)
        SELECT doc_id, trim({expr}) AS text FROM m
    """


def q_domain_filter(sf_dir: str):
    """Group-level curation (RefinedWeb/C4 "drop bad DOMAINS"): keep
    every doc whose source's mean n_chars clears the bar. Pass 1 is a
    per-block combiner (<= #distinct-keys narrow partial rows per block)
    folded by one coarse key-hash shuffle — integer sums stay int64 so
    the mean is bit-identical to SQL AVG; pass 2 is the distributed
    semi-join. Exact DuckDB IN-subquery oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import keyed_threshold_filter

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])
    out = keyed_threshold_filter(docs, "source", "n_chars", agg="mean",
                                 threshold=300.0,
                                 num_partitions=8).to_pandas()
    return out[["doc_id", "source", "n_chars"]]


def q_hash_split(sf_dir: str):
    """Deterministic train/val/test assignment: integer-exact knuth-hash
    intervals (floor(cum_frac * 2^32) edges), one shuffle-free streaming
    pass, stable under rerun/repartition/resume. The rule is
    SQL-expressible, so the oracle replays it bit-for-bit."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import hash_split

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    return out[["doc_id", "split"]]


def q_paragraph_dedup(sf_dir: str):
    """CCNet-style paragraph dedup (Wenzek et al. 2020): split docs into
    8-word sentences (the synthetic docs carry no newlines, so the
    sentence derivation is part of the fixture and replayed exactly in
    SQL), keep only the globally FIRST occurrence of each sentence in
    (doc_id, position) order, reassemble docs, drop docs that end up
    empty. Exact DuckDB oracle: parallel-unnest words -> GROUP BY word
    chunk -> ROW_NUMBER() dedup -> ordered string_agg reassembly."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.paradedup import paragraph_dedup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_sentences(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["text"].astype(str).str.strip() != ""].copy()
        out = []
        for t in df["text"]:
            w = str(t).split()
            out.append("\n".join(" ".join(w[i:i + 8])
                                 for i in range(0, len(w), 8)))
        df["text"] = out
        return df

    prepped = docs.map_batches(to_sentences, batch_format="pandas",
                               batch_size=None)
    out = paragraph_dedup(prepped, "text", "doc_id", min_chars=1,
                          num_partitions=16).to_pandas()
    return out[["doc_id", "text"]]


def q_exact_quantile(sf_dir: str):
    """Exact corpus-wide quantiles with no global sort (iterative
    histogram refinement over the single-column projection; each round is
    one streaming scan emitting tiny mergeable histogram partials).
    Values match DuckDB's quantile_disc / quantile_cont bit-for-bit —
    ties, heavy tails and all."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.quantile import exact_quantiles

    li = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    qs = [0.25, 0.5, 0.9, 0.99]
    out = exact_quantiles(li, "l_extendedprice", qs, interpolation="both",
                          collect_cap=50_000, materialize_narrow=True)
    return out[["q", "disc", "cont"]]


def q_quantile_sketch(sf_dir: str):
    """ONE-PASS approximate quantiles (stages/qsketch, MRL/KLL compactor
    stack): the 100 TB scale path next to exact_quantile's multi-scan
    refinement — per-batch mergeable stacks, 64-bucket parallel merge,
    <=64-row driver fold; state is O(k log(n/k)) bytes. Property oracle:
    every estimate's EXACT rank interval (counted distributed with one
    more narrow scan) must be within 2% of its target quantile; the
    constant ok-row hash-compares against SQL."""
    import pyarrow.compute as pc

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.qsketch import quantile_sketch

    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    li = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    est = quantile_sketch(li, "l_extendedprice", qs, k=512)

    def rank_counts(t):
        col = t["l_extendedprice"]
        row = {"n": [t.num_rows]}
        for i, q in enumerate(qs):
            row[f"lt{i}"] = [pc.sum(pc.less(col, est[q])).as_py() or 0]
            row[f"le{i}"] = [pc.sum(
                pc.less_equal(col, est[q])).as_py() or 0]
        import pyarrow as pa
        return pa.table(row)

    tot = li.map_batches(rank_counts, batch_format="pyarrow",
                         batch_size=None).to_pandas().sum()
    n = float(tot["n"])
    ok = True
    for i, q in enumerate(qs):
        rl, rr = tot[f"lt{i}"] / n, tot[f"le{i}"] / n
        ok &= max(0.0, rl - q, q - rr) < 0.02
    return pd.DataFrame({"metric": ["sketch_rank_err_lt_2pct"],
                         "within_bounds": [np.int64(ok)]})


def q_quantile_sketch_by_key(sf_dir: str):
    """Per-key one-pass quantile sketch ("P50/P99 per event type" in one
    sketch-row shuffle, stages/qsketch.quantile_sketch_by_key). Property
    oracle: each key's q50/q90 estimate must sit within 5% rank of its
    target, with exact per-key ranks recounted distributed; the per-key
    ok rows hash-compare against a constant-per-key SQL row set."""
    from openmldb_ray.core.grouping import map_groups_typed
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.qsketch import quantile_sketch_by_key

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    out = quantile_sketch_by_key(ev, "event_type", "value", (0.5, 0.9),
                                 k=256).to_pandas()
    est = {r.event_type: (r.q_0_5, r.q_0_9) for r in out.itertuples()}

    def per_key_rank(g: pd.DataFrame) -> pd.DataFrame:
        key = g["event_type"].iloc[0]
        v = np.sort(g["value"].to_numpy())
        gn = len(v)
        ok = True
        for q, e in zip((0.5, 0.9), est[key]):
            rl = np.searchsorted(v, e, "left") / gn
            rr = np.searchsorted(v, e, "right") / gn
            ok &= max(0.0, rl - q, q - rr) < 0.05
        return pd.DataFrame({"event_type": [key],
                             "within_bounds": [np.int64(ok)]})

    return map_groups_typed(ev, "event_type", per_key_rank,
                            batch_format="pandas").to_pandas() \
        .sort_values("event_type").reset_index(drop=True)


def q_tokens_to_shards(sf_dir: str):
    """The full pretraining-data tail in ONE streaming composition:
    quality rules -> text->tokens bridge -> greedy packing into <=256-token
    examples -> seeded shard shuffle cutting the example stream into
    ~20k-token shards via the sort-free global prefix sum. Invariants
    oracled in SQL: the total token count equals SUM(n_words) over the
    quality-kept docs (exact nested-predicate replay), every example is
    within the cap, every shard's token sum is within budget+max_example
    (the floor((cum-w)/budget) bound), and the final running count equals
    the total (prefix-sum conservation)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import quality_filter
    from openmldb_ray.stages.shard import seeded_shard_shuffle
    from openmldb_ray.stages.tokenops import pack_sequences, tokenize_text

    budget = 20_000
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    kept = quality_filter(docs)
    toks = tokenize_text(kept, batch_size=None).drop_columns(["tokens"])
    packed = pack_sequences(toks, max_len=256)
    out = seeded_shard_shuffle(packed, "example_id", shard_budget=budget,
                               weight_col="total_tok",
                               materialize_input=True).to_pandas()
    total = int(out["total_tok"].sum())
    shard_sums = out.groupby("shard")["total_tok"].sum()
    max_row = int(out["total_tok"].max()) if len(out) else 0
    return pd.DataFrame({
        "total_tok": [np.int64(total)],
        "within_cap": [np.int64(int((out["total_tok"] <= 256).all()))],
        "shards_bounded": [np.int64(int(
            (shard_sums <= budget + max_row).all()))],
        "prefix_conserved": [np.int64(int(
            abs(float(out["cum_weight"].max()) - total) < 1e-6))],
    })


def q_knn_pq(sf_dir: str):
    """Product-quantized ANN: m=8 per-subspace codebooks trained in
    iters streaming passes (ALL subspaces per pass, mergeable
    (count,sum,SSE) partials), vectors compressed 32x to 8-byte codes,
    and top-5 answered by asymmetric distance computation (per-query
    lookup tables broadcast once, one np.take gather-sum per subspace —
    no decode). Property oracle: recall@5 vs the exact brute force
    (itself DuckDB-oracled in `knn`) must clear 0.6."""
    from openmldb_ray.stages.pq import pq_adc_topk, pq_encode, pq_fit

    def method(emb, qm, qids):
        model = pq_fit(emb, m=8, nbits=8, iters=4, seed=7)
        # ADC shortlist of 50 + exact re-rank of the gathered originals
        # (IVFADC+R): compressed-domain scan cost unchanged, recall at the
        # bench corpus 0.44 -> 0.94 (sf0.1 oracle sweep found the
        # ADC-only floor breach)
        return pq_adc_topk(pq_encode(emb, model), model, qm, qids, k=5,
                           rerank=50)

    recall = _ann_recall(sf_dir, method)
    return pd.DataFrame({"metric": ["pq_adc_recall_at_5"],
                         "recall_floor_ok": [np.int64(recall >= 0.6)]})


def q_token_budget(sf_dir: str):
    """Token-budget curation (fill a per-source word budget with the best
    docs first): per source, docs in (n_chars DESC, doc_id) order while the
    running word count stays within 600 — computed SORT-FREE by
    budget_select's histogram-refinement order statistics (log-rounds of
    narrow scans + one filter pass; no all-to-all). n_chars ties across
    docs exercise the id-axis tie resolution. Exact DuckDB running-SUM
    window oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.select import budget_select

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text", "n_chars"])

    def add_words(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df["text"].astype(str).str.strip()
        df["n_words"] = s.str.split().map(len).astype("int64")
        return df

    ds = docs.map_batches(add_words, batch_format="pandas")
    out = budget_select(ds, "n_chars", budget=600, weight_col="n_words",
                        key_col="source", id_col="doc_id").to_pandas()
    return out[["doc_id", "source", "n_chars", "n_words"]]


def q_top_per_user(sf_dir: str):
    """Per-entity history cap (the domain-frequency-cap shape): at most 3
    events per user, highest value first, event_id tiebreak — per-block
    combiner + ONE coarse-bucket shuffle, high-cardinality-key safe. Exact
    DuckDB ROW_NUMBER oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.select import top_n_per_key

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type", "value"])
    out = top_n_per_key(ev, "user_id", "value", 3,
                        tiebreak="event_id").to_pandas()
    return _round_cols(out[["event_id", "user_id", "event_type", "value"]],
                       ["value"])


def q_pca_embed(sf_dir: str):
    """Distributed PCA whitening over the embedding column (one moment
    pass -> driver eigh -> broadcast matmul projection). Property oracle
    (eigendecomposition is not SQL-expressible): projected axes have unit
    variance and are uncorrelated (whitening contract), and the
    distributed fit matches a single-process numpy PCA on the same
    vectors (subspace dot > 1-1e-8 per component)."""
    import ray.data as rd  # noqa: F401

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.pca import fit_pca, pca_project

    k = 8
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    model = fit_pca(emb, "embedding", k=k, whiten=True)
    out = pca_project(emb, model, col="embedding", out_col="z").to_pandas()
    Z = np.stack(out["z"].to_numpy()).astype(np.float64)

    C = np.cov(Z, rowvar=False)
    unit_axes = int((np.abs(np.diag(C) - 1.0) < 1e-6).sum())
    off = C - np.diag(np.diag(C))
    uncorrelated = int(np.abs(off).max() < 1e-6)

    X = np.stack(emb.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    dots = [abs(model["components"][i] @ evecs[:, j])
            for i, j in enumerate(order)]
    subspace_match = int(all(d > 1 - 1e-8 for d in dots))

    return pd.DataFrame({
        "n_rows": [np.int64(len(Z))],
        "k_dim": [np.int64(Z.shape[1])],
        "unit_axes": [np.int64(unit_axes)],
        "uncorrelated": [np.int64(uncorrelated)],
        "subspace_match": [np.int64(subspace_match)],
    })


def q_snapshot_diff(sf_dir: str):
    """Incremental-curation snapshot diff: two deterministic variants of
    orders (old: keys %7!=0 with totalprice bumped on %5==0; new: keys
    %3!=0 unmodified) diffed in ONE key-hash co-shuffle — added / removed /
    changed with old/new values, unchanged dropped. Exact DuckDB FULL
    OUTER JOIN oracle."""
    import pyarrow as pa

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.diff import snapshot_diff

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def mk_old(t):
        keys = t.column("o_orderkey").to_numpy()
        t = t.filter(keys % 7 != 0)
        keys = t.column("o_orderkey").to_numpy()
        tp = t.column("o_totalprice").to_numpy() + (keys % 5 == 0)
        return t.set_column(1, "o_totalprice", pa.array(tp))

    def mk_new(t):
        return t.filter(t.column("o_orderkey").to_numpy() % 3 != 0)

    old = orders.map_batches(mk_old, batch_format="pyarrow", batch_size=None)
    new = orders.map_batches(mk_new, batch_format="pyarrow", batch_size=None)
    out = snapshot_diff(old, new, "o_orderkey").to_pandas()
    return _round_cols(out, ["old_o_totalprice", "new_o_totalprice"])


def q_nb_classify(sf_dir: str):
    """Fasttext-style quality classifier: multinomial NB trained
    DISTRIBUTEDLY (word-count combiner + word-hash shuffle + per-bucket
    top-V vocab cap) on source-derived labels (src0-4 positive, src5-9
    negative, the rest unlabeled), then ONE broadcast + shuffle-free
    scoring pass over every doc. max_vocab=150 forces real OOV traffic
    through the smoothed-unseen branch. Exact branchy DuckDB oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.classify import nb_score, train_nb

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "source"])

    def add_label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        n = pd.to_numeric(df["source"].str[3:], errors="coerce")
        df["label"] = np.where(n < 5, 1.0, np.where(n < 10, 0.0, np.nan))
        return df

    ds = docs.map_batches(add_label, batch_format="pandas")
    model = train_nb(ds, "text", "label", max_vocab=150)
    out = nb_score(ds, model).to_pandas()
    return _round_cols(out[["doc_id", "nb_logit"]], ["nb_logit"])


def q_lm_score(sf_dir: str):
    """CCNet-style LM quality scoring: a stupid-backoff bigram LM trained
    DISTRIBUTEDLY on a small doc subset (combiner + hash shuffle, broadcast
    once) scores EVERY doc's mean word negative-log-prob. The tiny training
    subset (doc_id < 3) makes all three branches fire on this corpus —
    seen-bigram / stupid-backoff / OOV floor (verified: 4099/22566/26 word
    positions at sf0.01). Exact DuckDB oracle recomputes the counts and the
    branchy log-prob per word."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.lm import lm_score, train_bigram_lm

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    model = train_bigram_lm(docs.filter(expr="doc_id < 3"))
    out = lm_score(docs, model).to_pandas()
    out = out[out["n_words"] > 0].reset_index(drop=True)
    return _round_cols(out, ["nll"])


def q_token_freq(sf_dir: str):
    """Corpus token-frequency top-100 over list<int32> token arrays
    (tokenops.token_freq: zero-copy list_flatten + np.unique combiner ->
    token-hash shuffle -> bucket top-k). Token ids here come from a
    deterministic SQL-mirrorable word map (len*1000 + count of 'e') so
    DuckDB recomputes the exact histogram; the production HashTokenizer
    path runs the identical stage under tests with conservation
    properties."""
    from openmldb_ray.stages.tokenops import token_freq

    return token_freq(_arith_tokenized(sf_dir), top_k=100).to_pandas()


def _arith_tokenized(sf_dir: str):
    """documents -> (doc_id, tokens:list<int32>) with an SQL-mirrorable
    token map: token = len(word)*1000 + count of 'e' (both sides pure
    vectorized)."""
    import pyarrow as pa

    from openmldb_ray.sources.io import read_table

    def tokenize(df: pd.DataFrame) -> "pa.Table":
        words = df["text"].astype(str).str.strip().str.split()
        ex = words.reset_index(drop=True).explode()
        ex = ex[ex.notna()].astype(str)
        tok = (ex.str.len() * 1000 + ex.str.count("e")).to_numpy(np.int64)
        cnts = np.bincount(ex.index.to_numpy(), minlength=len(df)) \
            if len(ex) else np.zeros(len(df), np.int64)
        offsets = np.zeros(len(df) + 1, np.int64)
        np.cumsum(cnts, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(tok.astype(np.int32), pa.int32()))
        return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                         "tokens": tokens})

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(tokenize, batch_format="pandas", batch_size=4096)


def q_compact_vocab(sf_dir: str):
    """Dense vocabulary compaction (tokenops.compact_vocab): global distinct
    token counts (unbounded token_freq shape) ranked (cnt DESC, token ASC)
    into new ids [0, V); the remap pass is shuffle-free via a broadcast
    sorted key table. Returns the vocab table — exact DuckDB ROW_NUMBER
    oracle over the same arithmetic token map as token_freq."""
    from openmldb_ray.stages.tokenops import compact_vocab

    _, vocab = compact_vocab(_arith_tokenized(sf_dir))
    return vocab.reset_index(drop=True)


def q_semdedup(sf_dir: str):
    """SemDeDup k-means-clustered embedding dedup: planted identical
    vectors land in the planted original's cluster (same vector -> same
    nearest centroid) and must all be removed at cosine >= 0.98."""
    import pyarrow as pa
    import ray.data as rd

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.simsearch import semantic_dedup

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    src = emb.filter(expr=f"vec_id < {_N_PLANT}").to_pandas().sort_values("vec_id")
    max_id = emb.max("vec_id")
    copy_ids = max_id + 1 + np.arange(len(src))
    emb_type = dict(zip(emb.schema().names, emb.schema().types))["embedding"]
    copies = pa.table({
        "vec_id": pa.array(copy_ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in src["embedding"]],
                              type=emb_type),
    })
    out = semantic_dedup(emb.union(rd.from_arrow(copies))).to_pandas()
    return _dedup_property(out, "vec_id", set(copy_ids))


def q_decayed_sum(sf_dir: str):
    """Exponentially time-decayed sum/count per user (stages/decay:
    coarse key shuffle + chunked overflow-safe vectorized prefix — no
    per-row recurrence). half_life = 1 h. Exact DuckDB oracle: the O(n²)
    lateral self-join per user. Decayed columns rounded to 4 decimals:
    the chunked factorization and DuckDB's arbitrary summation order both
    carry ~1e-12 noise, which 1e-6 rounding boundaries would amplify."""
    from openmldb_ray.stages.decay import decayed_agg

    out = decayed_agg(_events_ms(sf_dir), "user_id", "ts_ms", "value",
                      half_life=3_600_000.0).to_pandas()
    out = out[["event_id", "user_id", "ts_ms", "value",
               "decayed_sum", "decayed_cnt"]]
    out = _round_cols(out, ["value"])
    out["decayed_sum"] = out["decayed_sum"].round(4)
    out["decayed_cnt"] = out["decayed_cnt"].round(4)
    return out


def q_tfidf(sf_dir: str):
    """Per-doc top-3 TF-IDF terms (textstats.tfidf_top_terms: distributed
    distinct-(doc,word) DF combiner + word-hash shuffle, df table
    broadcast once, shuffle-free scoring). Exact DuckDB oracle."""
    from openmldb_ray.stages.textstats import tfidf_top_terms

    from openmldb_ray.sources.io import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = tfidf_top_terms(docs, top_k=3).to_pandas()
    return _round_cols(out.reset_index(drop=True), ["tfidf"])


def q_fuzzy_decontaminate(sf_dir: str):
    """Near-dup benchmark decontamination (curation.fuzzy_decontaminate):
    needles are docs 0..4's texts, broadcast as a MinHash band index; the
    corpus streams through one shuffle-free flagging pass. Property oracle:
    all 5 seed docs flag themselves (exact copies share every band), and
    every flagged doc re-verifies on the driver with exact signature
    agreement >= ceil(0.8*64) against some needle (zero false positives)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.curation import fuzzy_decontaminate
    from openmldb_ray.stages.dedup import minhash_signatures

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.filter(expr="doc_id < 5").to_pandas().sort_values("doc_id")
    needles = list(bench["text"])
    flagged = fuzzy_decontaminate(docs, needles, keep_only=False).to_pandas()
    f = flagged[flagged["contaminated"]]
    need = int(np.ceil(0.8 * 64))
    if len(f):
        nsigs = minhash_signatures(needles)
        fsigs = minhash_signatures(list(f["text"]))
        agree = (fsigs[:, None, :] == nsigs[None, :, :]).sum(axis=2).max(axis=1)
        false_pos = int((agree < need).sum())
    else:
        false_pos = 0
    return pd.DataFrame({
        "needles": [np.int64(5)],
        "seeds_flagged": [np.int64(f["doc_id"].isin(range(5)).sum())],
        "false_pos": [np.int64(false_pos)],
    })


def _naive_bpe(docs, num_merges):
    """Single-process reference BPE (same conventions as tokenops.learn_bpe:
    within-doc adjacent pairs with overlaps, (max count, min pair)
    tie-break, left-to-right greedy merge)."""
    docs = [list(d) for d in docs]
    next_id = max((max(d) for d in docs if d), default=-1) + 1
    merges = []
    for _ in range(num_merges):
        cnt: dict = {}
        for d in docs:
            for x, y in zip(d, d[1:]):
                cnt[(x, y)] = cnt.get((x, y), 0) + 1
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b, next_id))
        nxt = []
        for d in docs:
            nd, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    nd.append(next_id)
                    i += 2
                else:
                    nd.append(d[i])
                    i += 1
            nxt.append(nd)
        docs = nxt
        next_id += 1
    return merges, docs


def q_bpe_learn(sf_dir: str):
    """Distributed BPE vocabulary induction (tokenops.learn_bpe, 8 merge
    rounds: distinct-pair combiner -> pair-hash shuffle -> bucket champion
    -> <=nb-row driver fold, merge applied in one vectorized map pass per
    round) on a bounded training subset (doc_id < 400 — BPE trains on a
    sample by design). In-query oracle: a naive single-process BPE on the
    SAME docs must produce the identical merge list, and apply_bpe must
    reproduce the naive retokenization token-for-token."""
    import pyarrow.compute as pc

    from openmldb_ray.stages.tokenops import apply_bpe, learn_bpe

    sub = _tokenized_docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 400)),
        batch_format="pyarrow", batch_size=None).materialize()
    merges = learn_bpe(sub, num_merges=8)
    out = apply_bpe(sub, merges).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    base = sub.to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp_merges, exp_docs = _naive_bpe(
        [list(map(int, t)) for t in base["tokens"]], 8)
    got_docs = [list(map(int, t)) for t in out["tokens"]]
    return pd.DataFrame({
        "n_merges": [np.int64(len(merges))],
        "merges_match": [np.int64(merges == exp_merges)],
        "retok_match": [np.int64(got_docs == exp_docs)],
    })


def q_target_encode(sf_dir: str):
    """Smoothed mean target encoding + leave-one-out (encoders.
    target_encode): n_chars encoded by source with smoothing 20 and the
    global mean as prior. ONE streaming stats pass (distinct-category
    partials through a coarse-bucket fold), then a shuffle-free broadcast
    apply. Exact DuckDB oracle: integer target → exact int64 sums, and
    both engines evaluate the identical float64 expression tree."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.encoders import target_encode

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source",
                                                    "n_chars"])
    out = target_encode(docs, "source", "n_chars", smoothing=20.0,
                        loo=True, out_col="src_te").to_pandas()
    return out[["doc_id", "source", "src_te", "src_te_loo"]]


def q_count_encode(sf_dir: str):
    """Frequency encoding (encoders.count_encode, normalize=True): each
    event row gains its event_type's share of all rows. Same two-pass
    broadcast shape as target_encode; exact DuckDB window oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.encoders import count_encode

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type"])
    out = count_encode(ev, "event_type", normalize=True,
                       out_col="et_freq").to_pandas()
    return out[["event_id", "event_type", "et_freq"]]


def q_one_hot(sf_dir: str):
    """One-hot encoding (encoders.one_hot) of o_orderpriority: a tiny
    distinct scan fixes the vocab, then one row-local pass emits a 0/1
    int64 indicator column per category. Exact DuckDB CASE oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.encoders import one_hot

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])
    out = one_hot(orders, "o_orderpriority", prefix="prio").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_feature_cross(sf_dir: str):
    """Hashed feature cross (encoders.feature_cross) of c_mktsegment ×
    c_nationkey into 64 buckets — purely row-local, the engine-wide
    stable_hash64 combiner. The hash is not SQL-expressible, so the
    oracle is the in-query property set hash-compared against constant
    SQL: every bucket in range, every distinct (segment, nation) pair
    maps to exactly ONE bucket (determinism across blocks/partitions),
    and the pair count matches DuckDB's COUNT(DISTINCT)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.encoders import feature_cross

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment", "c_nationkey"])
    out = feature_cross(cust, ["c_mktsegment", "c_nationkey"],
                        num_buckets=64, out_col="seg_nat").to_pandas()
    per_pair = out.groupby(["c_mktsegment", "c_nationkey"])["seg_nat"]
    return pd.DataFrame({
        "pairs": [np.int64(per_pair.ngroups)],
        "in_range": [bool(out["seg_nat"].between(0, 63).all())],
        "one_bucket_per_pair": [bool((per_pair.nunique() == 1).all())],
    })


def q_standard_scale(sf_dir: str):
    """Per-key z-score (scale.standard_scale): n_chars standardized
    within each source. One streaming (cnt, sum, sumsq) fold + one
    broadcast apply. Exact DuckDB oracle — both sides evaluate
    (x - s/c) / sqrt((sq - s*s/c)/c) over exact integer sums cast to
    DOUBLE before any float arithmetic."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.scale import standard_scale

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])
    out = standard_scale(docs, "n_chars", by="source",
                         out_col="chars_z").to_pandas()
    return out[["doc_id", "source", "chars_z"]]


def q_minmax_scale(sf_dir: str):
    """Per-key min-max scaling (scale.minmax_scale): l_extendedprice
    into [0,1] within each l_returnflag. No sums anywhere — min/max are
    order-independent — so the float column replays bit-exactly in
    DuckDB (NULLIF(max-min, 0) for constant groups)."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.scale import minmax_scale

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_returnflag",
                             "l_extendedprice"])
    out = minmax_scale(li, "l_extendedprice", by="l_returnflag",
                       out_col="price_mm").to_pandas()
    return out[["l_orderkey", "l_linenumber", "l_returnflag", "price_mm"]]


def q_bucketize(sf_dir: str):
    """Fixed-edge discretization (scale.bucketize): n_chars into 5
    clamped bins — purely row-local, zero shuffle. Exact DuckDB oracle
    replaying the clamped searchsorted semantics."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.scale import bucketize

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = bucketize(docs, "n_chars", [0, 260, 290, 310, 340, 100000],
                    out_col="chars_bin").to_pandas()
    out["chars_bin"] = out["chars_bin"].astype(np.int64)  # no nulls here
    return out[["doc_id", "chars_bin"]]


def q_json_extract(sf_dir: str):
    """JSON field extraction (functions.scalar get_json_object — engine
    extension past the reference's UDF set; Spark/Hive + DuckDB
    json_extract_string semantics): pull ``$.k`` out of the events JSON
    payload column, cast, and aggregate per event type. Runs through the
    full SQL front-end (function registry -> projection -> group agg);
    exact DuckDB oracle."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.sql import sql_query

    out = sql_query(
        "SELECT event_type, count(*) AS n, "
        "sum(int64(get_json_object(props, '$.k'))) AS sum_k, "
        "min(get_json_object(props, '$.k')) AS min_k_str "
        "FROM events GROUP BY event_type",
        {"events": read_table(sf_dir, "events",
                              columns=["event_type", "props"])},
    ).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out["sum_k"] = out["sum_k"].astype(np.int64)
    return out


def q_compress_ratio(sf_dir: str):
    """zlib compression-ratio quality signal (textstats.compression_ratio).
    Property oracle: a planted 2000-char single-word repetition must score
    far below prose (< 0.1) and a planted 2048-char sha256-hex chain far
    above it (> 0.45); every corpus doc with >= 100 utf-8 bytes must stay
    under the zlib worst-case bound raw+5*ceil(raw/16383)+6 (ratio <= 1.2
    at that length). Shuffle-free actor-pool pass."""
    import hashlib

    import ray.data as rd

    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.textstats import compression_ratio

    rep = "spam " * 400
    h, parts = b"seed", []
    for _ in range(32):
        h = hashlib.sha256(h).digest()
        parts.append(h.hex())
    ent = "".join(parts)  # 2048 deterministic high-entropy hex chars
    import pyarrow as pa

    planted = pa.table({"doc_id": pa.array([-1, -2], pa.int64()),
                        "text": pa.array([rep, ent], pa.string())})

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # from_arrow, not from_pandas: a batched (coalescing) map over a union
    # of ARROW corpus blocks and a PANDAS block trips Ray's block builder
    scored = compression_ratio(
        docs.union(rd.from_arrow(planted))).to_pandas()

    p = scored.set_index("doc_id")["q_compress_ratio"]
    corpus = scored[scored["doc_id"] >= 0]
    blen = corpus["text"].str.encode("utf-8").str.len()
    long_docs = corpus[blen >= 100]
    return pd.DataFrame({
        "planted_low_ok": [np.int64(p.loc[-1] < 0.1)],
        "planted_high_ok": [np.int64(p.loc[-2] > 0.45)],
        "docs_scored": [np.int64(len(corpus))],
        "long_docs_bounded": [np.int64(
            (long_docs["q_compress_ratio"] <= 1.2).sum())],
        "long_docs_total": [np.int64(len(long_docs))],
    })


def q_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation screen (featsel.corr_matrix): three
    integer features of lineitem — quantity, a quantity-derived column
    with real signal, and an unrelated partkey residue — in ONE streaming
    moment pass (one partial row per block, driver fold in exact Python
    ints). Exact DuckDB oracle: both engines fold integer sums exactly
    (HUGEINT vs Python int), convert once to float64 and evaluate the
    identical num / (sqrt·sqrt) tree — bit-identical, no rounding."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.featsel import corr_matrix

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_quantity", "l_partkey"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        return pd.DataFrame({
            "qty": qty,
            "qty_plus_noise": qty * 3 + (df["l_orderkey"].to_numpy(np.int64)
                                         % 7),
            "pk_res": df["l_partkey"].to_numpy(np.int64) % 97,
        })

    feats = li.map_batches(derive, batch_format="pandas", batch_size=None)
    return corr_matrix(feats, ["qty", "qty_plus_noise", "pk_res"])


def q_anova_f(sf_dir: str):
    """One-way ANOVA F screen (featsel.anova_f): does mean n_chars
    differ across document languages? Per-key (cnt, sum, sumsq) partials
    through one coarse-bucket fold; the F statistic derives on the driver
    from #langs tiny rows. Per-group float terms sum in engine-specific
    order, so F compares at the engine-wide round-6 band (drift_psi
    precedent); the exact integer dfs compare bit-for-bit."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.featsel import anova_f

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    out = anova_f(docs, "n_chars", "lang")
    out["df_between"] = out["df_between"].astype(np.int64)
    out["df_within"] = out["df_within"].astype(np.int64)
    return _round_cols(out, ["f_stat"])


def q_mi_assoc(sf_dir: str):
    """Categorical association screen (featsel.categorical_assoc):
    chi-squared / Cramér's V / mutual information of lang × a derived
    length band over documents, from ONE distinct-cell contingency pass
    (per-cell partials through a coarse-bucket fold — the corpus never
    leaves the workers). Cell terms sum in engine-specific order and MI
    goes through ln(), so the three statistics compare at the round-6
    band; n and the level counts are exact."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.featsel import categorical_assoc

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])

    def band(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_chars"].to_numpy(np.int64)
        return pd.DataFrame({
            "lang": df["lang"],
            "len_band": np.where(n < 280, "short",
                                 np.where(n < 320, "mid", "long")),
        })

    out = categorical_assoc(
        docs.map_batches(band, batch_format="pandas", batch_size=None),
        "lang", "len_band")
    out["n"] = out["n"].astype(np.int64)
    out["n_rows_a"] = out["n_rows_a"].astype(np.int64)
    out["n_cols_b"] = out["n_cols_b"].astype(np.int64)
    return _round_cols(out, ["chi2", "cramers_v", "mi"])


def q_woe_encode(sf_dir: str):
    """Weight-of-Evidence encoding (encoders.woe_encode): order priority
    encoded against the binary is-finished order status — the
    credit-scoring standard. One category-stats fold + one broadcast
    apply. The count ratios are exact integer divisions replayed
    identically in SQL; WoE itself passes through ln(), compared at the
    round-6 band."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.encoders import woe_encode

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_orderstatus"])

    def label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["y"] = (df["o_orderstatus"] == "F").astype(np.int64)
        return df.drop(columns="o_orderstatus")

    out = woe_encode(
        orders.map_batches(label, batch_format="pandas", batch_size=None),
        "o_orderpriority", "y", smoothing=0.5,
        out_col="prio_woe").to_pandas()
    return _round_cols(out[["o_orderkey", "o_orderpriority", "prio_woe"]],
                       ["prio_woe"])


def q_robust_scale(sf_dir: str):
    """Outlier-robust scaling (scale.robust_scale): n_chars centered on
    its exact median and scaled by the exact IQR — both quantile_disc
    DATA VALUES from the sort-free histogram refinement, so the whole op
    is bit-identical to a (x - median) / NULLIF(q3 - q1, 0) DuckDB
    replay with no rounding anywhere."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.scale import robust_scale

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = robust_scale(docs, "n_chars", out_col="chars_rs").to_pandas()
    return out[["doc_id", "chars_rs"]]


def q_impute_mean(sf_dir: str):
    """Per-key missing-value imputation (scale.impute): the fixture
    first nulls n_chars on every fifth doc_id (replayed identically in
    SQL), then fills each hole with its source's mean of the surviving
    values. Exact integer sums → the mean is bit-identical to
    CAST(SUM AS DOUBLE)/COUNT, and the COALESCE replay matches with no
    rounding."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.scale import impute

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])

    def punch(df: pd.DataFrame) -> pd.DataFrame:
        # nullable Int64, NOT float: the per-key means must come from the
        # exact integer sum fold to replay bit-for-bit in SQL
        df = df.copy()
        df["x"] = df["n_chars"].astype("Int64")
        df.loc[df["doc_id"] % 5 == 0, "x"] = pd.NA
        return df.drop(columns="n_chars")

    holey = docs.map_batches(punch, batch_format="pandas", batch_size=None)
    out = impute(holey, "x", strategy="mean", by="source",
                 out_col="x_filled").to_pandas()
    return out[["doc_id", "source", "x_filled"]]


def q_quantile_bin(sf_dir: str):
    """Equal-frequency binning (scale.quantile_bin): n_chars into
    quartile bins whose edges are exact quantile_disc DATA VALUES
    (deduped under ties), applied by one row-local clamped-searchsorted
    pass. Exact DuckDB oracle replaying the same edge list and the same
    clamped bin arithmetic — integer end to end, no rounding."""
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.scale import quantile_bin

    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = quantile_bin(docs, "n_chars", 4, out_col="chars_qbin").to_pandas()
    out["chars_qbin"] = out["chars_qbin"].astype(np.int64)  # no nulls here
    return out[["doc_id", "chars_qbin"]]


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from openmldb_ray.pipelines.flagship import flagship

    return flagship(SF_DEFAULT)


def queries() -> dict[str, Callable[[str], Any]]:
    """Registry order is a CONTRACT: the external driver hashes the FIRST
    50 entries against oracle_sql() (CORRECTNESS_r{N}.json). Round-5
    rotation (VERDICT r4 task #3): 10 §2-core sentinels, then the entries
    that never had a driver hash — the relational 3b family, the round-4
    additions (html_extract / multimodal_stats) and
    quantile_sketch_by_key — then returning r1-r3 alumni. Everything
    after entry 50 (including the full round-4 window, all r4-green)
    stays covered by tools/check_oracles.py (134/134 in-repo sweep)."""
    return {
        # ---- §2 core sentinels (driver window 1-10) -------------------
        "window_rows": q_window_rows,
        "window_range": q_window_range,
        "window_union": q_window_union,
        "last_join_asof": q_last_join_asof,
        "lastjoin_window": q_lastjoin_window,
        "multi_window": q_multi_window,
        "group_agg": q_group_agg,
        "request_window": q_request_window,
        "sessionize": q_sessionize,
        "scalar_string_date": q_scalar_string_date,
        # ---- never driver-hashed before round 5 (11-22) ---------------
        "inner_join": q_inner_join,
        "full_outer_join": q_full_outer_join,
        "pivot_agg": q_pivot_agg,
        "unpivot": q_unpivot,
        "rollup_agg": q_rollup_agg,
        "explode_vec": q_explode_vec,
        "collect_list_trace": q_collect_list_trace,
        "resample_ffill": q_resample_ffill,
        "html_extract": q_html_extract,
        "multimodal_stats": q_multimodal_stats,
        "quantile_sketch_by_key": q_quantile_sketch_by_key,
        "left_join": q_left_join,
        # ---- returning r1-r3 alumni (23-50) ---------------------------
        "window_range_open": q_window_range_open,
        "window_range_end": q_window_range_end,
        "window_where": q_window_where,
        "last_join_unsorted": q_last_join_unsorted,
        "session_agg": q_session_agg,
        "group_agg_where": q_group_agg_where,
        "group_stats": q_group_stats,
        "top_agg": q_top_agg,
        "cate_agg": q_cate_agg,
        "topn_cate": q_topn_cate,
        "scalar_project": q_scalar_project,
        "filter": q_filter,
        "simple_project": q_simple_project,
        "const_project": q_const_project,
        "sort_limit": q_sort_limit,
        "distinct": q_distinct,
        "intersect": q_intersect,
        "except": q_except,
        "union_distinct": q_union_distinct,
        "kmeans_embed": q_kmeans_embed,
        "semdedup": q_semdedup,
        "dedup_exact": q_dedup_exact,
        "minhash_dedup": q_minhash_dedup,
        "simhash_dedup": q_simhash_dedup,
        "embedding_dedup": q_embedding_dedup,
        "langid": q_langid,
        "fingerprint": q_fingerprint,
        "text_stats": q_text_stats,
        # ---- entry 51+: the full round-4 driver window (all r4-green)
        # and the rest of the inventory, all in the in-repo sweep -------
        "window_exclude_current_row": q_window_exclude_current_row,
        "lag_lead": q_lag_lead,
        "quality_filter": q_quality_filter,
        "pii_redact": q_pii_redact,
        "decontaminate": q_decontaminate,
        "decontaminate_bloom": q_decontaminate_bloom,
        "fuzzy_decontaminate": q_fuzzy_decontaminate,
        "normalize_text": q_normalize_text,
        "paragraph_dedup": q_paragraph_dedup,
        "substr_dedup": q_substr_dedup,
        "dup_clusters": q_dup_clusters,
        "pack_sequences": q_pack_sequences,
        "chunk_tokens": q_chunk_tokens,
        "tokens_to_shards": q_tokens_to_shards,
        "shard_shuffle": q_shard_shuffle,
        "mixture_sample": q_mixture_sample,
        "dsir_select": q_dsir_select,
        "weighted_sample": q_weighted_sample,
        "stratified_sample": q_stratified_sample,
        "hash_split": q_hash_split,
        "domain_filter": q_domain_filter,
        "token_budget": q_token_budget,
        "top_per_user": q_top_per_user,
        "per_key_sample": q_per_key_sample,
        "exact_quantile": q_exact_quantile,
        "quantile_by_key": q_quantile_by_key,
        "quantile_sketch": q_quantile_sketch,
        "rank_ops": q_rank_ops,
        "score_norm": q_score_norm,
        "ngram_counts": q_ngram_counts,
        "repetition_stats": q_repetition_stats,
        "collocations": q_collocations,
        "token_freq": q_token_freq,
        "compact_vocab": q_compact_vocab,
        "bpe_learn": q_bpe_learn,
        "lm_score": q_lm_score,
        "nb_classify": q_nb_classify,
        "knn_pq": q_knn_pq,
        "knn_join": q_knn_join,
        "multimodal": q_multimodal,
        "knn": q_knn,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
        "minhash_dense": q_minhash_dense,
        "curation_pipeline": q_curation_pipeline,
        "bottomk_sample": q_bottomk_sample,
        "heavy_hitters": q_heavy_hitters,
        "text_embed_dedup": q_text_embed_dedup,
        "hll_distinct": q_hll_distinct,
        "sample_quantiles": q_sample_quantiles,
        "asof_tolerance": q_asof_tolerance,
        "label_join": q_label_join,
        "latest_snapshot": q_latest_snapshot,
        "range_join": q_range_join,
        "hopping_agg": q_hopping_agg,
        "incremental_docs": q_incremental_docs,
        "winsorize": q_winsorize,
        "hll_by_key": q_hll_by_key,
        "drift_psi": q_drift_psi,
        "snapshot_diff": q_snapshot_diff,
        "pca_embed": q_pca_embed,
        "target_encode": q_target_encode,
        "count_encode": q_count_encode,
        "one_hot": q_one_hot,
        "feature_cross": q_feature_cross,
        "standard_scale": q_standard_scale,
        "minmax_scale": q_minmax_scale,
        "bucketize": q_bucketize,
        "corr_matrix": q_corr_matrix,
        "anova_f": q_anova_f,
        "mi_assoc": q_mi_assoc,
        "woe_encode": q_woe_encode,
        "robust_scale": q_robust_scale,
        "impute_mean": q_impute_mean,
        "quantile_bin": q_quantile_bin,
        "compress_ratio": q_compress_ratio,
        "json_extract": q_json_extract,
        "decayed_sum": q_decayed_sum,
        "tfidf": q_tfidf,
        "taxi_demo": q_taxi,
        "flagship": q_flagship,
        "sql_window": q_sql_window,
        "sql_lastjoin": q_sql_lastjoin,
        "sql_groupby": q_sql_groupby,
    }


def oracle_sql() -> dict[str, str]:
    TS = "CAST(epoch_ms(ts) AS BIGINT)"
    return {
        "window_rows": f"""
            SELECT event_id, user_id, {TS} AS ts_ms,
                   ROUND(value, 6) AS value,
                   ROUND(SUM(value) OVER w, 6) AS sum_v,
                   COUNT(*) OVER w AS cnt,
                   ROUND(AVG(value) OVER w, 6) AS avg_v,
                   ROUND(MIN(value) OVER w, 6) AS min_v,
                   ROUND(MAX(value) OVER w, 6) AS max_v
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "window_range": f"""
            SELECT event_id, user_id, ts_ms, ROUND(value, 6) AS value,
                   ROUND(SUM(value) OVER w, 6) AS sum_v,
                   COUNT(*) OVER w AS cnt,
                   ROUND(MAX(value) OVER w, 6) AS max_v
            FROM (SELECT event_id, user_id, value, {TS} AS ts_ms FROM events) t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                         RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
        """,
        "window_range_open": f"""
            SELECT event_id, user_id, ts_ms, ROUND(value, 6) AS value,
                   ROUND(SUM(value) OVER w, 6) AS sum_v,
                   COUNT(*) OVER w AS cnt
            FROM (SELECT event_id, user_id, value, {TS} AS ts_ms FROM events) t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                         RANGE BETWEEN 3599999 PRECEDING AND CURRENT ROW)
        """,
        "window_exclude_current_row": f"""
            SELECT event_id, user_id, ts_ms, ROUND(value, 6) AS value,
                   ROUND(SUM(value) OVER w, 6) AS sum_v,
                   COUNT(*) OVER w AS cnt
            FROM (SELECT event_id, user_id, value, {TS} AS ts_ms FROM events) t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
        """,
        "window_range_end": f"""
            SELECT event_id, user_id, ts_ms, ROUND(value, 6) AS value,
                   ROUND(SUM(value) OVER w, 6) AS sum_v,
                   COUNT(*) OVER w AS cnt
            FROM (SELECT event_id, user_id, value, {TS} AS ts_ms FROM events) t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                         RANGE BETWEEN 7200000 PRECEDING AND 1800000 PRECEDING)
        """,
        "lag_lead": f"""
            SELECT event_id, user_id, {TS} AS ts_ms, ROUND(value, 6) AS value,
                   ROUND(LAG(value, 1) OVER w, 6) AS lag1_v,
                   ROUND(LAG(value, 3) OVER w, 6) AS lag3_v,
                   ROUND(LEAD(value, 2) OVER w, 6) AS lead2_v
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "window_where": f"""
            SELECT event_id, user_id, ts_ms, ROUND(value, 6) AS value,
                   ROUND(SUM(CASE WHEN value > 50 THEN value END) OVER w, 6) AS sum_big,
                   COUNT(CASE WHEN value > 50 THEN value END) OVER w AS cnt_big,
                   ROUND(AVG(CASE WHEN value > 50 THEN value END) OVER w, 6) AS avg_big
            FROM (SELECT event_id, user_id, value, {TS} AS ts_ms FROM events) t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                         RANGE BETWEEN 10800000 PRECEDING AND CURRENT ROW)
        """,
        "last_join_asof": f"""
            SELECT e.event_id, e.user_id, {TS.replace('ts', 'e.ts')} AS ts_ms,
                   ROUND(e.value, 6) AS value,
                   CAST(o.o_orderkey AS DOUBLE) AS o_orderkey,
                   ROUND(CAST(o.o_totalprice AS DOUBLE), 6) AS o_totalprice
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND epoch_ms(o.o_orderdate) <= epoch_ms(e.ts)
            QUALIFY o.o_orderkey IS NULL OR ROW_NUMBER() OVER (
                PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
        """,
        "last_join_unsorted": """
            SELECT c.c_custkey, c.c_name, c.c_nationkey,
                   CAST(o.o_orderkey AS DOUBLE) AS o_orderkey,
                   CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            QUALIFY o.o_orderkey IS NULL OR ROW_NUMBER() OVER (
                PARTITION BY c.c_custkey ORDER BY o.o_orderkey DESC) = 1
        """,
        "lastjoin_window": f"""
            WITH j AS (
              SELECT e.event_id, e.user_id, {TS.replace('ts', 'e.ts')} AS ts_ms,
                     e.value, CAST(o.o_totalprice AS DOUBLE) AS last_price
              FROM events e
              LEFT JOIN orders o
                ON o.o_custkey = e.user_id AND epoch_ms(o.o_orderdate) <= epoch_ms(e.ts)
              QUALIFY o.o_orderkey IS NULL OR ROW_NUMBER() OVER (
                  PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
            )
            SELECT event_id, user_id, ts_ms, ROUND(value, 6) AS value,
                   ROUND(last_price, 6) AS last_price,
                   ROUND(SUM(last_price) OVER w, 6) AS w_price_sum,
                   COUNT(last_price) OVER w AS w_price_cnt
            FROM j
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "window_union": f"""
            SELECT event_id, user_id, ts_ms, ROUND(value, 6) AS value,
                   cnt_all, ROUND(sum_all, 6) AS sum_all FROM (
              SELECT event_id, user_id, event_type, value, {TS} AS ts_ms,
                     COUNT(*) OVER w AS cnt_all,
                     SUM(value) OVER w AS sum_all
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY {TS}
                           RANGE BETWEEN 7200000 PRECEDING AND CURRENT ROW)
            ) WHERE event_type = 'click'
        """,
        "sessionize": f"""
            SELECT event_id, user_id, ts_ms,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
            FROM (
              SELECT event_id, user_id, {TS} AS ts_ms,
                     CASE WHEN {TS} - LAG({TS}) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
                          OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          THEN 1 ELSE 0 END AS is_new
              FROM events) t
        """,
        "session_agg": f"""
            SELECT user_id, session_id, MIN(ts_ms) AS session_start,
                   MAX(ts_ms) AS session_end, COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM (
              SELECT user_id, value, ts_ms,
                     CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
              FROM (
                SELECT event_id, user_id, value, {TS} AS ts_ms,
                       CASE WHEN {TS} - LAG({TS}) OVER
                              (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
                            OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                            THEN 1 ELSE 0 END AS is_new
                FROM events) a) b
            GROUP BY user_id, session_id
        """,
        "request_window": """
            SELECT o_orderkey, o_custkey,
                   CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_ts,
                   ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d,
                   ROUND(AVG(o_totalprice) OVER w, 6) AS avg_30d,
                   ROUND(MIN(o_totalprice) OVER w, 6) AS min_30d,
                   ROUND(MAX(o_totalprice) OVER w, 6) AS max_30d,
                   COUNT(*) OVER w AS n_30d
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
                         RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW)
        """,
        "group_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 6) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "group_agg_where": """
            SELECT event_type,
                   ROUND(SUM(CASE WHEN value > 50 THEN value END), 6) AS sum_big,
                   COUNT(CASE WHEN value > 50 THEN value END) AS cnt_big,
                   ROUND(AVG(CASE WHEN value > 50 THEN value END), 6) AS avg_big
            FROM events GROUP BY event_type
        """,
        "group_stats": """
            WITH tc AS (
              SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
            ), agg AS (
              SELECT user_id, COUNT(DISTINCT event_type) AS dc_types,
                     MEDIAN(value) AS med_v, COUNT(*) AS n
              FROM events GROUP BY 1
            ), mx AS (
              SELECT user_id, MAX(c) AS mx FROM tc GROUP BY 1
            ), t2 AS (
              SELECT user_id,
                     string_agg(event_type, ',' ORDER BY c DESC, event_type) AS top2_types
              FROM (SELECT user_id, event_type, c, ROW_NUMBER() OVER (
                        PARTITION BY user_id ORDER BY c DESC, event_type) AS rn
                    FROM tc) x
              WHERE rn <= 2 GROUP BY user_id
            )
            SELECT a.user_id, a.dc_types, ROUND(a.med_v, 6) AS med_v,
                   ROUND(CAST(m.mx AS DOUBLE) / a.n, 6) AS top1r, t.top2_types
            FROM agg a JOIN mx m USING (user_id) JOIN t2 t USING (user_id)
        """,
        "top_agg": """
            SELECT l_returnflag,
                   string_agg(CAST(q AS VARCHAR), ',' ORDER BY q DESC, rn) AS top3_qty
            FROM (
              SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                        ORDER BY CAST(l_quantity AS BIGINT) DESC) AS rn
              FROM lineitem) x
            WHERE rn <= 3 GROUP BY l_returnflag
        """,
        "scalar_project": """
            SELECT l_orderkey, l_linenumber,
                   CAST(year(l_shipdate) AS INT) AS ship_year,
                   CAST(month(l_shipdate) AS INT) AS ship_month,
                   lower(l_returnflag) AS flag_lower,
                   ROUND(l_extendedprice * (1 - l_discount), 6) AS rev,
                   l_discount IS NULL AS qty_null
            FROM lineitem
        """,
        "filter": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'A'
        """,
        "simple_project": """
            SELECT CAST(n_nationkey AS BIGINT) AS nation_id,
                   n_name AS nation_name, n_regionkey AS region_id
            FROM nation
        """,
        "const_project": "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b, CAST(2.5 AS DOUBLE) AS c",
        "sort_limit": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "distinct": "SELECT DISTINCT event_type FROM events",
        "intersect": """
            SELECT o_orderstatus, o_orderpriority FROM orders
            WHERE o_totalprice >= 150000
            INTERSECT
            SELECT o_orderstatus, o_orderpriority FROM orders
            WHERE o_totalprice < 150000
        """,
        "except": """
            SELECT lang, source FROM documents WHERE n_chars < 300
            EXCEPT
            SELECT lang, source FROM documents WHERE n_chars >= 300
        """,
        "union_distinct": """
            SELECT event_type, props FROM events WHERE value < 50
            UNION
            SELECT event_type, props FROM events WHERE value >= 50
        """,
        "multi_window": f"""
            SELECT event_id, user_id, event_type, {TS} AS ts_ms,
                   ROUND(value, 6) AS value,
                   ROUND(SUM(value) OVER w1, 6) AS w1_sum,
                   COUNT(*) OVER w2 AS w2_cnt
            FROM events
            WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
                   w2 AS (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        """,
        "left_join": """
            SELECT c.c_custkey, c.c_name, c.c_nationkey, n.n_name AS nation_name
            FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
        """,
        "inner_join": """
            SELECT o.o_orderkey, o.o_custkey,
                   ROUND(o.o_totalprice, 6) AS o_totalprice,
                   ROUND(c.c_acctbal, 6) AS c_acctbal
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_acctbal > 8000.0
        """,
        "full_outer_join": """
            WITH clicks AS (
              SELECT user_id, SUM(value) AS click_value
              FROM events WHERE event_type = 'click' GROUP BY user_id
            ), views AS (
              SELECT user_id, SUM(value) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY user_id
            )
            SELECT COALESCE(c.user_id, v.user_id) AS user_id,
                   ROUND(c.click_value, 6) AS click_value,
                   ROUND(v.view_value, 6) AS view_value
            FROM clicks c FULL OUTER JOIN views v ON c.user_id = v.user_id
        """,
        "resample_ffill": """
            WITH ev AS (
              SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
                     event_id, value FROM events
            ), rng AS (
              SELECT user_id,
                     CAST(ceil(min(ts_ms)/21600000.0)*21600000 AS BIGINT) s,
                     max(ts_ms) e
              FROM ev GROUP BY user_id
            ), grid AS (
              SELECT user_id, unnest(generate_series(s, e, 21600000))
                     AS grid_ts FROM rng
            ), pick AS (
              SELECT g.user_id, g.grid_ts, ev.value,
                     ROW_NUMBER() OVER (PARTITION BY g.user_id, g.grid_ts
                         ORDER BY ev.ts_ms DESC, ev.event_id DESC) rn
              FROM grid g
              JOIN ev ON ev.user_id = g.user_id AND ev.ts_ms <= g.grid_ts)
            SELECT user_id, grid_ts, ROUND(value, 6) AS value
            FROM pick WHERE rn = 1
        """,
        "rollup_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 6) AS sum_qty,
                   COUNT(l_quantity) AS cnt,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   GROUPING(l_returnflag, l_linestatus) AS grouping_id
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "pivot_agg": """
            SELECT user_id,
              ROUND(SUM(CASE WHEN event_type='click' THEN value END), 6)
                  AS value_sum_click,
              ROUND(SUM(CASE WHEN event_type='error' THEN value END), 6)
                  AS value_sum_error,
              ROUND(SUM(CASE WHEN event_type='purchase' THEN value END), 6)
                  AS value_sum_purchase,
              ROUND(SUM(CASE WHEN event_type='signup' THEN value END), 6)
                  AS value_sum_signup,
              ROUND(SUM(CASE WHEN event_type='view' THEN value END), 6)
                  AS value_sum_view
            FROM events GROUP BY user_id
        """,
        "unpivot": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                   ROUND(l_quantity, 6) AS val FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   ROUND(l_extendedprice, 6) FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
                   ROUND(l_discount, 6) FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
                   ROUND(l_tax, 6) FROM lineitem
        """,
        "explode_vec": """
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                       AS pos,
                   ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS x
            FROM embeddings
        """,
        "collect_list_trace": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id)
                       AS trace
            FROM events GROUP BY user_id
        """,
        "cate_agg": """
            WITH per AS (
              SELECT l_returnflag, l_linestatus,
                     SUM(CAST(l_quantity AS BIGINT)) AS s,
                     COUNT(CAST(l_quantity AS BIGINT)) AS c
              FROM lineitem GROUP BY 1, 2
            )
            SELECT l_returnflag,
                   string_agg(l_linestatus || ':' || CAST(s AS VARCHAR), ','
                              ORDER BY l_linestatus) AS sum_cate_qty,
                   string_agg(l_linestatus || ':' || CAST(c AS VARCHAR), ','
                              ORDER BY l_linestatus) AS cnt_cate_qty
            FROM per GROUP BY l_returnflag
        """,
        "scalar_string_date": """
            SELECT o_orderkey,
                   upper(o_orderpriority) AS prio_upper,
                   substr(o_orderpriority, 1, 3) AS prio_sub,
                   reverse(o_orderpriority) AS prio_rev,
                   CAST(day(o_orderdate) AS INT) AS od_day,
                   CAST(dayofweek(o_orderdate) + 1 AS INT) AS od_dow,
                   CAST(dayofyear(o_orderdate) AS INT) AS od_doy,
                   floor(o_totalprice) AS price_abs_floor,
                   ROUND(sqrt(o_totalprice), 6) AS price_sqrt,
                   CAST(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS BIGINT) AS is_open,
                   COALESCE(o_orderstatus, 'x') AS status_or_x
            FROM orders
        """,
        "dedup_exact": """
            SELECT doc_id, n_chars FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
        """,
        "text_stats": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS q_n_chars,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
                       AS n_ws_tokens,
                   ROUND(len(regexp_extract_all(text, '\d'))::DOUBLE /
                         GREATEST(length(text), 1), 6) AS q_digit_ratio
            FROM documents
        """,
        "quality_filter": r"""
            SELECT doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   ROUND(mean_word_len, 6) AS mean_word_len,
                   CAST(stopword_hits AS BIGINT) AS stopword_hits,
                   ROUND(alpha_frac, 6) AS alpha_frac,
                   CAST(n_words BETWEEN 30 AND 100000
                        AND mean_word_len BETWEEN 3 AND 10
                        AND stopword_hits >= 2
                        AND alpha_frac >= 0.8 AS BIGINT) AS keep
            FROM (
              SELECT doc_id, n_words,
                     length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                         / GREATEST(n_words, 1) AS mean_word_len,
                     len(list_filter(words,
                         w -> w IN ('the','a','of','to','and','in'))) AS stopword_hits,
                     len(list_filter(words,
                         w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                         / GREATEST(n_words, 1) AS alpha_frac
              FROM (
                SELECT doc_id, text, words,
                       CASE WHEN trim(text) = '' THEN 0 ELSE len(words) END AS n_words
                FROM (SELECT doc_id, text,
                             regexp_split_to_array(trim(text), '\s+') AS words
                      FROM documents) t0) t1) t2
        """,
        "pii_redact": r"""
            WITH aug AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 3 = 0
                             THEN ' contact user' || doc_id || '@example.com'
                             ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                             THEN ' from 192.168.1.' || (doc_id % 256)
                             ELSE '' END
                     || CASE WHEN doc_id % 7 = 0
                             THEN ' call 555-123-4567' ELSE '' END AS t0
              FROM documents),
            s1 AS (
              SELECT doc_id, t0,
                     CAST(len(regexp_extract_all(t0,
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                         AS n_emails,
                     regexp_replace(t0,
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                          '[EMAIL]', 'g') AS t1
              FROM aug),
            s2 AS (
              SELECT doc_id, n_emails,
                     CAST(len(regexp_extract_all(t1,
                          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
                         AS n_ips,
                     regexp_replace(t1,
                          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                          '[IP]', 'g') AS t2
              FROM s1)
            SELECT doc_id, n_emails, n_ips,
                   CAST(len(regexp_extract_all(t2,
                        '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
                   regexp_replace(t2, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b',
                                  '[PHONE]', 'g') AS text_redacted
            FROM s2
        """,
        "decontaminate": r"""
            WITH needles AS (
              SELECT array_to_string(
                       (regexp_split_to_array(trim(text), '\s+'))[1:8], ' ') AS nd
              FROM documents WHERE doc_id < 5)
            SELECT d.doc_id, d.n_chars FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM needles n WHERE contains(d.text, n.nd))
        """,
        "substr_dedup": """
            SELECT CAST(1 AS BIGINT) AS holders_after,
                   CAST(1 AS BIGINT) AS holder_is_first,
                   (SELECT COUNT(*) FROM documents
                    WHERE doc_id % 13 = 0 AND doc_id >= 13) AS planted,
                   CAST(1 AS BIGINT) AS rows_match_naive,
                   CAST(1 AS BIGINT) AS all_rows_kept
        """,
        "bottomk_sample": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY ((doc_id % 1048576) * 2654435761) % 4294967296,
                                doc_id) AS rn
              FROM documents) t
            WHERE rn <= 7
        """,
        "heavy_hitters": """
            SELECT CAST(20 AS BIGINT) AS k_returned,
                   CAST(1 AS BIGINT) AS bounds_ok,
                   CAST(1 AS BIGINT) AS top1_present
        """,
        "curation_pipeline": r"""
            WITH scored AS (
              SELECT doc_id, text, source,
                     CASE WHEN trim(text) = '' THEN 0 ELSE len(words) END AS n_words,
                     length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                         / GREATEST(len(words), 1) AS mwl,
                     len(list_filter(words,
                         w -> w IN ('the','a','of','to','and','in'))) AS sh,
                     len(list_filter(words,
                         w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                         / GREATEST(len(words), 1) AS af
              FROM (SELECT doc_id, text, source,
                           regexp_split_to_array(trim(text), '\s+') AS words
                    FROM documents) t0),
            needles AS (
              SELECT array_to_string(
                       (regexp_split_to_array(trim(text), '\s+'))[1:8], ' ') AS nd
              FROM documents WHERE doc_id < 5)
            SELECT doc_id, source FROM scored d
            WHERE d.n_words BETWEEN 30 AND 100000
              AND d.mwl BETWEEN 3 AND 10 AND d.sh >= 2 AND d.af >= 0.8
              AND NOT EXISTS (SELECT 1 FROM needles n WHERE contains(d.text, n.nd))
              AND ((doc_id % 1048576) * 2654435761) % 4294967296
                  < CAST(FLOOR(CASE WHEN TRY_CAST(substr(source, 4) AS INT) < 10
                                    THEN 0.6 ELSE 0.25 END * 4294967296) AS BIGINT)
        """,
        "ngram_counts": r"""
            WITH words AS (
              SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                    FROM documents WHERE trim(text) <> '')
            ), grams AS (
              SELECT a.doc_id, a.w || ' ' || b.w AS g
              FROM words a JOIN words b
                ON a.doc_id = b.doc_id AND b.i = a.i + 1
            )
            SELECT g AS ngram, COUNT(*) AS cnt FROM grams
            GROUP BY g ORDER BY cnt DESC, g LIMIT 100
        """,
        "repetition_stats": r"""
            WITH ws AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS i
              FROM ws
            ), grams AS (
              SELECT a.doc_id, a.tok || ' ' || b.tok AS g
              FROM words a JOIN words b
                ON a.doc_id = b.doc_id AND b.i = a.i + 1
            ), gcnt AS (
              SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
            ), gtot AS (
              SELECT doc_id, MAX(c) AS m, SUM(c) AS t FROM gcnt GROUP BY doc_id
            )
            SELECT ws.doc_id,
                   ROUND(CASE WHEN len(w) > 0
                         THEN 1 - len(list_distinct(w))::DOUBLE / len(w)
                         ELSE 0 END, 6) AS dup_word_frac,
                   ROUND(COALESCE(gtot.m::DOUBLE / gtot.t, 0), 6)
                       AS top_bigram_frac
            FROM ws LEFT JOIN gtot ON ws.doc_id = gtot.doc_id
        """,
        "chunk_tokens": r"""
            WITH n AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END AS n_tok FROM documents)
            SELECT n.doc_id, g.i AS chunk_idx,
                   LEAST(64, n.n_tok - g.i * 48) AS n_tok
            FROM n, LATERAL (SELECT unnest(generate_series(
                     0, CAST(CEIL(n.n_tok::DOUBLE / 48) AS BIGINT) - 1)) AS i) g(i)
            WHERE n.n_tok > 0
        """,
        "dup_clusters": """
            SELECT (SELECT COUNT(*) FROM documents WHERE doc_id < 25) AS planted,
                   (SELECT COUNT(*) FROM documents WHERE doc_id < 25)
                       AS clustered_with_src,
                   (SELECT COUNT(*) FROM documents WHERE doc_id < 25)
                       AS cluster_le_src
        """,
        "pack_sequences": r"""
            SELECT (SELECT CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+'))
                       END) AS BIGINT) FROM documents) AS total_tok,
                   CAST(1 AS BIGINT) AS within_cap,
                   CAST(1 AS BIGINT) AS lb_ok
        """,
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE ((doc_id % 1048576) * 2654435761) % 4294967296
                  < CAST(FLOOR(CASE WHEN TRY_CAST(substr(source, 4) AS INT) < 10
                                    THEN 0.6 ELSE 0.25 END * 4294967296) AS BIGINT)
        """,
        "knn": """
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
                        ORDER BY list_cosine_similarity(q.embedding, v.embedding) DESC,
                                 v.vec_id) AS BIGINT) AS rank
            FROM embeddings q CROSS JOIN embeddings v
            WHERE q.vec_id < 10
            QUALIFY rank <= 5
        """,
        "topn_cate": """
            WITH e AS (
              SELECT user_id, event_type, CAST(FLOOR(value) AS BIGINT) AS v
              FROM events
            ), per AS (
              SELECT user_id, event_type,
                     SUM(CASE WHEN v > 50 THEN v END) AS s,
                     COUNT(CASE WHEN v > 50 THEN v END) AS c
              FROM e GROUP BY 1, 2
              HAVING COUNT(CASE WHEN v > 50 THEN v END) > 0
            ), tk AS (
              SELECT user_id,
                     string_agg(event_type || ':' || CAST(s AS VARCHAR), ','
                                ORDER BY event_type DESC) AS tk_sum
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY event_type DESC) AS rn FROM per) x
              WHERE rn <= 2 GROUP BY user_id
            ), tv AS (
              SELECT user_id,
                     string_agg(event_type || ':' || CAST(c AS VARCHAR), ','
                                ORDER BY c DESC, event_type DESC) AS tv_cnt
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY c DESC, event_type DESC) AS rn FROM per) x
              WHERE rn <= 2 GROUP BY user_id
            )
            SELECT u.user_id, COALESCE(tk.tk_sum, '') AS tk_sum,
                   COALESCE(tv.tv_cnt, '') AS tv_cnt
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN tk USING (user_id) LEFT JOIN tv USING (user_id)
        """,
        # --- property oracles: the Ray query computes the check itself; the
        # --- SQL states the invariant the result must equal
        "knn_lsh": "SELECT 'lsh_recall_at_5' AS metric, CAST(1 AS BIGINT) AS recall_floor_ok",
        "knn_pq": "SELECT 'pq_adc_recall_at_5' AS metric, CAST(1 AS BIGINT) AS recall_floor_ok",
        "knn_ivf": "SELECT 'ivf_recall_at_5' AS metric, CAST(1 AS BIGINT) AS recall_floor_ok",
        "minhash_dedup": f"""
            SELECT CAST({_N_PLANT} AS BIGINT) AS planted,
                   CAST(0 AS BIGINT) AS planted_surviving,
                   CAST(1 AS BIGINT) AS survivors_unique
        """,
        "decontaminate_bloom": r"""
            WITH ws AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                        FROM documents),
            grams AS (
              SELECT ws.doc_id, array_to_string(ws.w[g.i:g.i+7], ' ') AS g8
              FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws.w) - 7))
                                AS i) g(i)
            ),
            needle AS (SELECT DISTINCT g8 FROM grams WHERE doc_id < 5)
            SELECT (SELECT COUNT(DISTINCT g.doc_id)
                    FROM grams g JOIN needle n ON g.g8 = n.g8)
                       AS exact_contaminated,
                   CAST(1 AS BIGINT) AS no_false_negatives,
                   CAST(1 AS BIGINT) AS fp_within_bound
        """,
        "sample_quantiles": """
            SELECT COUNT(*) AS n_rows,
                   CAST(1 AS BIGINT) AS ranks_within_bound
            FROM documents
        """,
        "hll_distinct": """
            SELECT COUNT(DISTINCT text) AS exact_distinct,
                   CAST(1 AS BIGINT) AS est_within_5sigma
            FROM documents
        """,
        "text_embed_dedup": f"""
            SELECT CAST({_N_PLANT} AS BIGINT) AS planted,
                   CAST(0 AS BIGINT) AS planted_surviving,
                   CAST(1 AS BIGINT) AS survivors_unique
        """,
        "minhash_dense": """
            SELECT CAST(1 AS BIGINT) AS boiler_surviving,
                   CAST(1 AS BIGINT) AS boiler_min_kept,
                   CAST(1 AS BIGINT) AS survivors_unique
        """,
        "simhash_dedup": f"""
            SELECT CAST({_N_PLANT} AS BIGINT) AS planted,
                   CAST(0 AS BIGINT) AS planted_surviving,
                   CAST(1 AS BIGINT) AS survivors_unique
        """,
        "embedding_dedup": f"""
            SELECT CAST({_N_PLANT} AS BIGINT) AS planted,
                   CAST(0 AS BIGINT) AS planted_surviving,
                   CAST(1 AS BIGINT) AS survivors_unique
        """,
        "semdedup": f"""
            SELECT CAST({_N_PLANT} AS BIGINT) AS planted,
                   CAST(0 AS BIGINT) AS planted_surviving,
                   CAST(1 AS BIGINT) AS survivors_unique
        """,
        "asof_tolerance": f"""
            SELECT e.event_id, e.user_id, CAST(epoch_ms(e.ts) AS BIGINT) AS ts_ms,
                   ROUND(e.value, 6) AS value,
                   CAST(o.o_orderkey AS DOUBLE) AS o_orderkey,
                   ROUND(CAST(o.o_totalprice AS DOUBLE), 6) AS o_totalprice
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id
             AND epoch_ms(o.o_orderdate) <= epoch_ms(e.ts)
             AND epoch_ms(o.o_orderdate) >= epoch_ms(e.ts) - {8400 * 86400000}
            QUALIFY o.o_orderkey IS NULL OR ROW_NUMBER() OVER (
                PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
        """,
        "label_join": f"""
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(epoch_ms(o.o_orderdate) AS BIGINT) AS o_ts_ms,
                   CAST(e.event_id AS DOUBLE) AS label_event_id,
                   CAST(epoch_ms(e.ts) AS DOUBLE) AS label_ts_ms,
                   ROUND(e.value, 6) AS label_value
            FROM orders o
            LEFT JOIN events e
              ON e.user_id = o.o_custkey
             AND epoch_ms(e.ts) > epoch_ms(o.o_orderdate)
             AND epoch_ms(e.ts) <= epoch_ms(o.o_orderdate) + {8400 * 86400000}
            QUALIFY e.event_id IS NULL OR ROW_NUMBER() OVER (
                PARTITION BY o.o_orderkey ORDER BY e.ts ASC, e.event_id ASC) = 1
        """,
        "latest_snapshot": """
            SELECT o_orderkey, o_custkey,
                   ROUND(o_totalprice, 6) AS o_totalprice,
                   CAST(epoch_ms(o_orderdate) AS BIGINT) AS o_ts_ms
            FROM orders
            WHERE o_orderdate <= TIMESTAMP '1995-06-01'
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        """,
        "range_join": """
            WITH p AS (
              SELECT o_orderkey, o_custkey % 7 AS grp, o_orderdate
              FROM orders
            ), i AS (
              SELECT o_orderkey AS iv_key, o_orderkey % 7 AS grp,
                     o_orderdate AS iv_start,
                     o_orderdate + (o_orderkey % 45 + 1)
                         * INTERVAL '1 day' AS iv_end
              FROM orders WHERE o_orderkey % 37 = 0
            )
            SELECT p.o_orderkey, p.grp, p.o_orderdate,
                   i.iv_key, i.iv_start, i.iv_end
            FROM p JOIN i ON p.grp = i.grp
                AND p.o_orderdate BETWEEN i.iv_start AND i.iv_end
        """,
        "hopping_agg": """
            SELECT event_type,
                   (CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) - off)
                       * 3600000000 AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   ROUND(SUM(value), 6) AS sum_value,
                   ROUND(MIN(value), 6) AS min_value,
                   ROUND(MAX(value), 6) AS max_value,
                   ROUND(SUM(value), 6) / COUNT(*) AS avg_value
            FROM events
            CROSS JOIN (SELECT unnest(range(0, 4)) AS off)
            GROUP BY event_type, window_start
        """,
        "winsorize": """
            SELECT l_orderkey, l_linenumber,
                   LEAST(GREATEST(l_extendedprice,
                         (SELECT quantile_disc(l_extendedprice, 0.01)
                          FROM lineitem)),
                         (SELECT quantile_disc(l_extendedprice, 0.99)
                          FROM lineitem)) AS price_w
            FROM lineitem
        """,
        "per_key_sample": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY ((doc_id % 1048576) * 2654435761)
                                  % 4294967296, doc_id) AS rn
              FROM documents) t
            WHERE rn <= 10
        """,
        "hll_by_key": """
            SELECT source, COUNT(DISTINCT text) AS exact_distinct,
                   CAST(1 AS BIGINT) AS est_within_5sigma
            FROM documents GROUP BY source
        """,
        "quantile_by_key": """
            SELECT source, 0.25 AS q,
                   CAST(quantile_disc(n_chars, 0.25) AS DOUBLE) AS disc,
                   quantile_cont(n_chars, 0.25) AS cont
            FROM documents GROUP BY source
            UNION ALL
            SELECT source, 0.5, CAST(quantile_disc(n_chars, 0.5) AS DOUBLE),
                   quantile_cont(n_chars, 0.5)
            FROM documents GROUP BY source
            UNION ALL
            SELECT source, 0.95,
                   CAST(quantile_disc(n_chars, 0.95) AS DOUBLE),
                   quantile_cont(n_chars, 0.95)
            FROM documents GROUP BY source
        """,
        "collocations": r"""
            WITH w AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
                       FROM documents WHERE trim(text) <> ''),
            uni AS (SELECT u AS g, count(*) AS c
                    FROM (SELECT unnest(ws) AS u FROM w) GROUP BY u),
            tot AS (SELECT sum(c) AS n FROM uni),
            bi AS (SELECT a, b, count(*) AS cab FROM (
                     SELECT unnest(ws[1:len(ws)-1]) AS a,
                            unnest(ws[2:len(ws)]) AS b
                     FROM w WHERE len(ws) >= 2) GROUP BY a, b
                   HAVING count(*) >= 5)
            SELECT bi.a AS w1, bi.b AS w2, cab AS pair_cnt,
                   ua.c AS w1_cnt, ub.c AS w2_cnt,
                   (cab * 1.0 * n) / (ua.c * 1.0 * ub.c) AS lift
            FROM bi JOIN uni ua ON ua.g = bi.a
                    JOIN uni ub ON ub.g = bi.b CROSS JOIN tot
            ORDER BY lift DESC, w1, w2 LIMIT 30
        """,
        "knn_join": """
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
                        ORDER BY list_cosine_similarity(q.embedding,
                                                        v.embedding) DESC,
                                 v.vec_id) AS BIGINT) AS rank
            FROM embeddings q CROSS JOIN embeddings v
            WHERE q.vec_id % 2 = 0 AND v.vec_id % 2 = 1
            QUALIFY rank <= 3
        """,
        "drift_psi": """
            WITH e(v) AS (VALUES (0), (250), (280), (300), (320), (350),
                                 (100000)),
            rb AS (SELECT LEAST(GREATEST(
                       (SELECT count(*) FROM e WHERE e.v <= d.n_chars) - 1,
                       0), 5) AS bin
                   FROM documents d
                   WHERE CAST(substr(source, 4) AS INT) < 10
                     AND n_chars IS NOT NULL),
            cb AS (SELECT LEAST(GREATEST(
                       (SELECT count(*) FROM e WHERE e.v <= d.n_chars) - 1,
                       0), 5) AS bin
                   FROM documents d
                   WHERE CAST(substr(source, 4) AS INT) >= 10
                     AND n_chars IS NOT NULL),
            bins AS (SELECT unnest(range(0, 6)) AS bin),
            rc AS (SELECT b.bin, count(rb.bin) AS c FROM bins b
                   LEFT JOIN rb ON rb.bin = b.bin GROUP BY b.bin),
            cc AS (SELECT b.bin, count(cb.bin) AS c FROM bins b
                   LEFT JOIN cb ON cb.bin = b.bin GROUP BY b.bin),
            f AS (SELECT rc.bin,
                         GREATEST(rc.c * 1.0 / (SELECT sum(c) FROM rc),
                                  1e-6) AS p,
                         GREATEST(cc.c * 1.0 / (SELECT sum(c) FROM cc),
                                  1e-6) AS q
                  FROM rc JOIN cc USING (bin))
            SELECT bin, p AS ref_frac, q AS cur_frac,
                   CASE WHEN SUM((q - p) * ln(q / p)) OVER () < 0.1
                        THEN 'stable'
                        WHEN SUM((q - p) * ln(q / p)) OVER () < 0.25
                        THEN 'moderate' ELSE 'shifted' END AS psi_band
            FROM f
        """,
        "html_extract": _html_extract_oracle_sql(),
        "normalize_text": r"""
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                        lower(upper(text) || '  ,, !! ' || text),
                        '[^\w\s]', ' ', 'g'), '\s+', ' ', 'g')) AS text
            FROM documents
        """,
        "domain_filter": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE source IN (SELECT source FROM documents
                             GROUP BY source HAVING avg(n_chars) >= 300)
        """,
        "hash_split": f"""
            SELECT doc_id,
                   CASE WHEN h < {int(0.8 * (1 << 32))} THEN 'train'
                        WHEN h < {int(np.floor(0.9 * (1 << 32)))} THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ((doc_id % 1048576) * 2654435761) % 4294967296 AS h
                  FROM documents) t
        """,
        "paragraph_dedup": r"""
            WITH words AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
                     unnest(range(0, len(regexp_split_to_array(trim(text),
                                                               '\s+'))))
                         AS wi
              FROM documents WHERE trim(text) <> ''
            ), sents AS (
              SELECT doc_id, wi // 8 AS si,
                     string_agg(w, ' ' ORDER BY wi) AS p
              FROM words GROUP BY doc_id, wi // 8
            ), flagged AS (
              SELECT doc_id, si, p,
                     ROW_NUMBER() OVER (PARTITION BY p
                                        ORDER BY doc_id, si) = 1 AS keep
              FROM sents
            ), kept AS (
              SELECT doc_id, string_agg(p, chr(10) ORDER BY si) AS text
              FROM flagged WHERE keep GROUP BY doc_id
            )
            SELECT doc_id, text FROM kept WHERE trim(text) <> ''
        """,
        "exact_quantile": """
            SELECT 0.25 AS q, quantile_disc(l_extendedprice, 0.25) AS disc,
                   quantile_cont(l_extendedprice, 0.25) AS cont
            FROM lineitem
            UNION ALL
            SELECT 0.5, quantile_disc(l_extendedprice, 0.5),
                   quantile_cont(l_extendedprice, 0.5) FROM lineitem
            UNION ALL
            SELECT 0.9, quantile_disc(l_extendedprice, 0.9),
                   quantile_cont(l_extendedprice, 0.9) FROM lineitem
            UNION ALL
            SELECT 0.99, quantile_disc(l_extendedprice, 0.99),
                   quantile_cont(l_extendedprice, 0.99) FROM lineitem
        """,
        "quantile_sketch": """
            SELECT 'sketch_rank_err_lt_2pct' AS metric,
                   CAST(1 AS BIGINT) AS within_bounds
        """,
        "quantile_sketch_by_key": """
            SELECT DISTINCT event_type, CAST(1 AS BIGINT) AS within_bounds
            FROM events ORDER BY event_type
        """,
        "tokens_to_shards": r"""
            SELECT CAST(SUM(n_words) AS BIGINT) AS total_tok,
                   CAST(1 AS BIGINT) AS within_cap,
                   CAST(1 AS BIGINT) AS shards_bounded,
                   CAST(1 AS BIGINT) AS prefix_conserved
            FROM (
              SELECT doc_id, n_words,
                     length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                         / GREATEST(n_words, 1) AS mean_word_len,
                     len(list_filter(words,
                         w -> w IN ('the','a','of','to','and','in')))
                         AS stopword_hits,
                     len(list_filter(words,
                         w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                         / GREATEST(n_words, 1) AS alpha_frac
              FROM (
                SELECT doc_id, text, words,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(words) END AS n_words
                FROM (SELECT doc_id, text,
                             regexp_split_to_array(trim(text), '\s+')
                                 AS words
                      FROM documents) t0) t1) t2
            WHERE n_words BETWEEN 30 AND 100000
              AND mean_word_len BETWEEN 3 AND 10
              AND stopword_hits >= 2
              AND alpha_frac >= 0.8
        """,
        "incremental_docs": """
            WITH old AS (SELECT text FROM documents WHERE doc_id % 3 <> 0),
                 new AS (SELECT * FROM documents WHERE doc_id % 5 <> 0)
            SELECT n.doc_id, n.source, n.n_chars
            FROM new n
            WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.text = n.text)
        """,
        "weighted_sample": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     ln((((doc_id % 1048576) * 2654435761) % 4294967296
                         + 0.5) / 4294967296.0)
                         / n_chars AS k
              FROM documents WHERE n_chars > 0)
            QUALIFY ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) <= 300
        """,
        "dsir_select": """
            SELECT CAST(COUNT(*) // 10 AS BIGINT) AS n_selected,
                   CAST(COUNT(*) // 10 AS BIGINT) AS k_requested,
                   CAST(1 AS BIGINT) AS topk_exact
            FROM documents WHERE source NOT IN ('src0', 'src1')
        """,
        "mixture_sample": """
            WITH w(source, wt) AS (
              VALUES ('src0', 1), ('src1', 2), ('src2', 3), ('src3', 4),
                     ('src4', 1), ('src5', 2), ('src6', 3), ('src7', 4),
                     ('src8', 1), ('src9', 2)
            ), j AS (
              SELECT d.source, COUNT(*) AS n, ANY_VALUE(w.wt) AS wt
              FROM documents d JOIN w USING (source) GROUP BY d.source
            ), tot AS (SELECT SUM(wt) AS W FROM j),
            nn AS (SELECT MIN(n * W // wt) AS nsel FROM j, tot),
            thr AS (
              SELECT source,
                     LEAST((nsel * wt * 4294967296 + (W * n) - 1)
                               // (W * n),
                           4294967296) AS t
              FROM j, tot, nn
            )
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN thr USING (source)
            WHERE ((d.doc_id % 1048576) * 2654435761) % 4294967296 < thr.t
        """,
        "kmeans_embed": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(8 AS BIGINT) AS k_clusters,
                   CAST(1 AS BIGINT) AS parity,
                   CAST(1 AS BIGINT) AS inertia_monotone,
                   CAST(1 AS BIGINT) AS assign_is_argmin
            FROM embeddings
        """,
        "shard_shuffle": """
            SELECT doc_id, source, n_chars, h,
                   CAST(cw AS DOUBLE) AS cum_weight,
                   CAST(floor((cw - n_chars) / 50000.0) AS BIGINT) AS shard
            FROM (
              SELECT doc_id, source, n_chars,
                     (doc_id * 2654435761) % 2147483648 AS h,
                     SUM(n_chars) OVER (
                         ORDER BY (doc_id * 2654435761) % 2147483648,
                                  doc_id
                         ROWS UNBOUNDED PRECEDING) AS cw
              FROM documents)
        """,
        "score_norm": """
            SELECT doc_id, source, n_chars,
                   ROUND(CUME_DIST() OVER (
                       PARTITION BY source ORDER BY n_chars), 6)
                       AS cume_dist
            FROM documents
        """,
        "rank_ops": """
            SELECT event_id, user_id, event_type,
                   ROW_NUMBER() OVER wt AS rn,
                   RANK() OVER w AS rk,
                   DENSE_RANK() OVER w AS dr,
                   ROUND(PERCENT_RANK() OVER w, 6) AS pr,
                   NTILE(4) OVER wt AS nt
            FROM events
            WINDOW w  AS (PARTITION BY user_id
                          ORDER BY event_type ASC NULLS LAST),
                   wt AS (PARTITION BY user_id
                          ORDER BY event_type ASC NULLS LAST, event_id)
        """,
        "token_budget": r"""
            WITH w AS (
              SELECT doc_id, source, n_chars,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                          END AS BIGINT) AS n_words
              FROM documents
            )
            SELECT doc_id, source, n_chars, n_words FROM (
              SELECT *, SUM(n_words) OVER (
                  PARTITION BY source ORDER BY n_chars DESC, doc_id
                  ROWS UNBOUNDED PRECEDING) AS cw
              FROM w) WHERE cw <= 600
        """,
        "top_per_user": """
            SELECT event_id, user_id, event_type, ROUND(value, 6) AS value
            FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY value DESC, event_id) <= 3
        """,
        "pca_embed": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(8 AS BIGINT) AS k_dim,
                   CAST(8 AS BIGINT) AS unit_axes,
                   CAST(1 AS BIGINT) AS uncorrelated,
                   CAST(1 AS BIGINT) AS subspace_match
            FROM embeddings
        """,
        "snapshot_diff": """
            WITH old AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                          ELSE o_totalprice END AS tp
              FROM orders WHERE o_orderkey % 7 <> 0
            ), new AS (
              SELECT o_orderkey, o_totalprice AS tp
              FROM orders WHERE o_orderkey % 3 <> 0
            )
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                   CASE WHEN o.o_orderkey IS NULL THEN 'added'
                        WHEN n.o_orderkey IS NULL THEN 'removed'
                        ELSE 'changed' END AS status,
                   ROUND(o.tp, 6) AS old_o_totalprice,
                   ROUND(n.tp, 6) AS new_o_totalprice
            FROM old o FULL OUTER JOIN new n USING (o_orderkey)
            WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
               OR o.tp <> n.tp
        """,
        "nb_classify": r"""
            WITH lab AS (
              SELECT doc_id, text,
                     CASE WHEN TRY_CAST(substr(source, 4) AS INT) < 5 THEN 1
                          WHEN TRY_CAST(substr(source, 4) AS INT) < 10 THEN 0
                     END AS label
              FROM documents
            ), words AS (
              SELECT doc_id, label,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM lab WHERE trim(text) <> ''
            ), cnts AS (
              SELECT w,
                     SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1,
                     SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0
              FROM words WHERE label IS NOT NULL GROUP BY w
            ), vocab AS (
              SELECT w, c1, c0 FROM (
                SELECT *, ROW_NUMBER() OVER (ORDER BY (c1 + c0) DESC, w) AS rn
                FROM cnts) WHERE rn <= 150
            ), tot AS (
              SELECT SUM(c1) AS t1, SUM(c0) AS t0, COUNT(*) AS V FROM vocab
            ), pri AS (
              SELECT ln(CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                        / SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END)) AS p
              FROM lab WHERE label IS NOT NULL
            ), scores AS (
              SELECT dw.doc_id,
                     SUM(CASE WHEN v.w IS NOT NULL
                          THEN ln((v.c1 + 1.0) / (t.t1 + t.V + 1))
                             - ln((v.c0 + 1.0) / (t.t0 + t.V + 1))
                          ELSE ln(1.0 / (t.t1 + t.V + 1))
                             - ln(1.0 / (t.t0 + t.V + 1)) END) AS s
              FROM words dw LEFT JOIN vocab v ON dw.w = v.w CROSS JOIN tot t
              GROUP BY dw.doc_id
            )
            SELECT d.doc_id, ROUND(p.p + COALESCE(s.s, 0), 6) AS nb_logit
            FROM lab d CROSS JOIN pri p LEFT JOIN scores s USING (doc_id)
        """,
        "lm_score": r"""
            WITH tdocs AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> '' AND doc_id < 3
            ), twords AS (
              SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
              FROM tdocs
            ), uni AS (
              SELECT w, COUNT(*) AS c FROM twords GROUP BY w
            ), tot AS (
              SELECT COUNT(*) AS t FROM twords
            ), tseq AS (
              SELECT doc_id, i, w,
                     LAG(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw
              FROM twords
            ), big AS (
              SELECT pw, w, COUNT(*) AS c FROM tseq
              WHERE pw IS NOT NULL GROUP BY pw, w
            ), sdocs AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), swords AS (
              SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
              FROM sdocs
            ), sseq AS (
              SELECT doc_id, i, w,
                     LAG(w) OVER (PARTITION BY doc_id ORDER BY i) AS pw
              FROM swords
            ), lp AS (
              SELECT s.doc_id,
                     CASE WHEN s.pw IS NOT NULL AND b.c IS NOT NULL
                               AND up.c IS NOT NULL
                          THEN ln(b.c * 1.0 / up.c)
                          ELSE ln((CASE WHEN s.pw IS NULL THEN 1.0 ELSE 0.4 END)
                                  * (COALESCE(u.c, 0) + 1.0) / (t.t + 1.0))
                     END AS l
              FROM sseq s
              LEFT JOIN uni u ON u.w = s.w
              LEFT JOIN uni up ON up.w = s.pw
              LEFT JOIN big b ON b.pw = s.pw AND b.w = s.w
              CROSS JOIN tot t
            )
            SELECT doc_id, COUNT(*) AS n_words, ROUND(AVG(-l), 6) AS nll
            FROM lp GROUP BY doc_id
        """,
        "decayed_sum": """
            SELECT e.event_id, e.user_id,
                   CAST(epoch_ms(e.ts) AS BIGINT) AS ts_ms,
                   ROUND(e.value, 6) AS value,
                   ROUND(SUM(o.value * exp(-(ln(2)/3600000.0)
                             * (epoch_ms(e.ts) - epoch_ms(o.ts)))), 4)
                       AS decayed_sum,
                   ROUND(SUM(exp(-(ln(2)/3600000.0)
                             * (epoch_ms(e.ts) - epoch_ms(o.ts)))), 4)
                       AS decayed_cnt
            FROM events e
            JOIN events o ON o.user_id = e.user_id AND o.ts <= e.ts
            GROUP BY 1, 2, 3, 4
        """,
        "tfidf": r"""
            WITH words AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM documents WHERE trim(text) <> ''
            ), tf AS (
              SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
            ), df AS (
              SELECT w, COUNT(DISTINCT doc_id) AS d FROM words GROUP BY w
            ), n AS (
              SELECT COUNT(DISTINCT doc_id) AS t FROM words
            )
            SELECT tf.doc_id, tf.w AS term,
                   ROUND(tf.c * ln(CAST(n.t AS DOUBLE) / df.d), 6) AS tfidf
            FROM tf JOIN df ON df.w = tf.w CROSS JOIN n
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY tf.doc_id
                ORDER BY tf.c * ln(CAST(n.t AS DOUBLE) / df.d) DESC, tf.w) <= 3
        """,
        "compact_vocab": r"""
            WITH words AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM documents WHERE trim(text) <> ''
            ), cnts AS (
              SELECT CAST(length(w) * 1000
                          + (length(w) - length(replace(w, 'e', ''))) AS BIGINT)
                         AS token,
                     COUNT(*) AS cnt
              FROM words GROUP BY 1
            )
            SELECT token,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, token) - 1 AS new_id,
                   cnt
            FROM cnts
        """,
        "fuzzy_decontaminate": """
            SELECT CAST(5 AS BIGINT) AS needles,
                   CAST(5 AS BIGINT) AS seeds_flagged,
                   CAST(0 AS BIGINT) AS false_pos
        """,
        "bpe_learn": """
            SELECT CAST(8 AS BIGINT) AS n_merges,
                   CAST(1 AS BIGINT) AS merges_match,
                   CAST(1 AS BIGINT) AS retok_match
        """,
        "token_freq": r"""
            WITH words AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM documents WHERE trim(text) <> ''
            )
            SELECT CAST(length(w) * 1000
                        + (length(w) - length(replace(w, 'e', ''))) AS BIGINT) AS token,
                   COUNT(*) AS cnt
            FROM words GROUP BY 1 ORDER BY cnt DESC, token LIMIT 100
        """,
        "langid": """
            SELECT CAST(5 AS BIGINT) AS planted_correct,
                   CAST(5 AS BIGINT) AS planted_total,
                   (SELECT COUNT(*) FROM documents) AS docs_classified
        """,
        "json_extract": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   min(json_extract_string(props, '$.k')) AS min_k_str
            FROM events GROUP BY event_type
        """,
        "compress_ratio": """
            SELECT CAST(1 AS BIGINT) AS planted_low_ok,
                   CAST(1 AS BIGINT) AS planted_high_ok,
                   (SELECT COUNT(*) FROM documents) AS docs_scored,
                   (SELECT COUNT(*) FROM documents
                    WHERE octet_length(encode(text)) >= 100)
                       AS long_docs_bounded,
                   (SELECT COUNT(*) FROM documents
                    WHERE octet_length(encode(text)) >= 100)
                       AS long_docs_total
        """,
        "fingerprint": f"""
            SELECT CAST({_N_PLANT} AS BIGINT) AS pairs,
                   CAST({_N_PLANT} AS BIGINT) AS equal_content,
                   CAST({_N_PLANT} AS BIGINT) AS equal_winnow
        """,
        "multimodal": """
            SELECT CAST(x AS BIGINT) AS mm_id,
                   CASE WHEN x % 2 = 0 THEN 'image' ELSE 'audio' END AS mm_type,
                   CAST(CASE WHEN x % 2 = 0
                        THEN (7 * x) % 256 + (13 * x) % 256 + (29 * x) % 256
                        ELSE 800 + x END AS BIGINT) AS feat
            FROM range(64) t(x)
        """,
        "multimodal_stats": """
            SELECT CAST(x AS BIGINT) AS mm_id,
                   CASE WHEN x % 2 = 0 THEN 'image' ELSE 'audio' END AS mm_type,
                   CASE WHEN x % 2 = 0 THEN CAST(8 AS DOUBLE) END AS img_w,
                   CASE WHEN x % 2 = 0 THEN CAST(8 AS DOUBLE) END AS img_h,
                   ROUND(CASE WHEN x % 2 = 0 THEN
                       ((7 * x) % 256 + (13 * x) % 256 + (29 * x) % 256) / 3.0
                   END, 6) AS img_mean,
                   ROUND(CASE WHEN x % 2 = 1 THEN (800 + x) / 16.0 END, 6)
                       AS duration_ms
            FROM range(64) t(x)
        """,
        "taxi_demo": """
            SELECT CAST(2000 AS BIGINT) AS rows,
                   CAST(10 AS BIGINT) AS cols_checked,
                   CAST(0 AS BIGINT) AS mismatched_cols
        """,
        "flagship": """
            SELECT CAST(1596 AS BIGINT) AS rows,
                   CAST(1596 AS BIGINT) AS oracle_rows,
                   CAST(0 AS BIGINT) AS mismatched_cols,
                   CAST(0 AS BIGINT) AS pit_violations,
                   CAST(0 AS BIGINT) AS token_mismatches
        """,
        "sql_window": f"""
            SELECT event_id, user_id, {TS} AS ts_ms,
                   ROUND(SUM(value) OVER w, 6) AS sum_v,
                   COUNT(*) OVER w AS cnt
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_ms(ts), event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "sql_lastjoin": """
            SELECT c.c_custkey, c.c_name,
                   ROUND(CAST(o.o_totalprice AS DOUBLE), 6) AS last_price
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            QUALIFY o.o_orderkey IS NULL OR ROW_NUMBER() OVER (
                PARTITION BY c.c_custkey ORDER BY o.o_orderkey DESC) = 1
        """,
        "sql_groupby": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(CAST(SUM(l_quantity) AS DOUBLE), 6) AS sum_qty,
                   COUNT(*) AS n
            FROM lineitem WHERE l_quantity > 10
            GROUP BY l_returnflag, l_linestatus HAVING COUNT(*) > 5
        """,
        "target_encode": """
            WITH p AS (SELECT CAST(sum(n_chars) AS DOUBLE)
                              / count(n_chars) AS prior FROM documents),
            g AS (SELECT source,
                         CAST(sum(n_chars) AS DOUBLE) AS ts,
                         CAST(count(n_chars) AS DOUBLE) AS tc
                  FROM documents GROUP BY source)
            SELECT d.doc_id, d.source,
                   (g.ts + 20.0 * p.prior) / (g.tc + 20.0) AS src_te,
                   CASE WHEN d.n_chars IS NULL
                        THEN (g.ts + 20.0 * p.prior) / (g.tc + 20.0)
                        WHEN g.tc - 1.0 + 20.0 > 0
                        THEN (g.ts - d.n_chars + 20.0 * p.prior)
                             / (g.tc - 1.0 + 20.0)
                        ELSE p.prior END AS src_te_loo
            FROM documents d CROSS JOIN p JOIN g ON d.source = g.source
        """,
        "count_encode": """
            SELECT event_id, event_type,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE)
                   / CAST((SELECT count(*) FROM events) AS DOUBLE) AS et_freq
            FROM events
        """,
        "one_hot": """
            SELECT o_orderkey, o_orderpriority,
                   CAST(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END AS BIGINT) AS prio_1_URGENT,
                   CAST(CASE WHEN o_orderpriority = '2-HIGH'
                        THEN 1 ELSE 0 END AS BIGINT) AS prio_2_HIGH,
                   CAST(CASE WHEN o_orderpriority = '3-MEDIUM'
                        THEN 1 ELSE 0 END AS BIGINT) AS prio_3_MEDIUM,
                   CAST(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                        THEN 1 ELSE 0 END AS BIGINT) AS prio_4_NOT_SPECIFIED,
                   CAST(CASE WHEN o_orderpriority = '5-LOW'
                        THEN 1 ELSE 0 END AS BIGINT) AS prio_5_LOW
            FROM orders ORDER BY o_orderkey
        """,
        "feature_cross": """
            SELECT (SELECT count(*) FROM
                      (SELECT DISTINCT c_mktsegment, c_nationkey
                       FROM customer)) AS pairs,
                   true AS in_range,
                   true AS one_bucket_per_pair
        """,
        "standard_scale": """
            WITH g AS (SELECT source,
                              CAST(count(n_chars) AS DOUBLE) AS c,
                              CAST(sum(n_chars) AS DOUBLE) AS s,
                              CAST(sum(n_chars * n_chars) AS DOUBLE) AS sq
                       FROM documents GROUP BY source)
            SELECT d.doc_id, d.source,
                   CASE WHEN sqrt((g.sq - g.s * g.s / g.c) / g.c) = 0
                        THEN NULL
                        ELSE (d.n_chars - g.s / g.c)
                             / sqrt((g.sq - g.s * g.s / g.c) / g.c)
                   END AS chars_z
            FROM documents d JOIN g ON d.source = g.source
        """,
        "minmax_scale": """
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   (l_extendedprice
                    - MIN(l_extendedprice)
                        OVER (PARTITION BY l_returnflag))
                   / NULLIF(MAX(l_extendedprice)
                              OVER (PARTITION BY l_returnflag)
                          - MIN(l_extendedprice)
                              OVER (PARTITION BY l_returnflag), 0)
                   AS price_mm
            FROM lineitem
        """,
        "bucketize": """
            WITH e(v) AS (VALUES (0), (260), (290), (310), (340), (100000))
            SELECT doc_id,
                   CAST(LEAST(GREATEST(
                       (SELECT count(*) FROM e WHERE e.v <= d.n_chars) - 1,
                       0), 4) AS BIGINT) AS chars_bin
            FROM documents d
        """,
        "corr_matrix": """
            WITH t AS (SELECT CAST(l_quantity AS BIGINT) AS a,
                              CAST(l_quantity AS BIGINT) * 3
                              + (l_orderkey % 7) AS b,
                              l_partkey % 97 AS c
                       FROM lineitem),
            m AS (SELECT count(*) AS n,
                         sum(a) AS sa, sum(b) AS sb, sum(c) AS sc,
                         sum(a*a) AS paa, sum(a*b) AS pab,
                         sum(a*c) AS pac, sum(b*b) AS pbb,
                         sum(b*c) AS pbc, sum(c*c) AS pcc
                  FROM t)
            SELECT 'qty' AS col_a, 'qty_plus_noise' AS col_b,
                   CAST(n*pab - sa*sb AS DOUBLE)
                   / (sqrt(CAST(n*paa - sa*sa AS DOUBLE))
                      * sqrt(CAST(n*pbb - sb*sb AS DOUBLE))) AS corr
            FROM m
            UNION ALL
            SELECT 'qty', 'pk_res',
                   CAST(n*pac - sa*sc AS DOUBLE)
                   / (sqrt(CAST(n*paa - sa*sa AS DOUBLE))
                      * sqrt(CAST(n*pcc - sc*sc AS DOUBLE)))
            FROM m
            UNION ALL
            SELECT 'qty_plus_noise', 'pk_res',
                   CAST(n*pbc - sb*sc AS DOUBLE)
                   / (sqrt(CAST(n*pbb - sb*sb AS DOUBLE))
                      * sqrt(CAST(n*pcc - sc*sc AS DOUBLE)))
            FROM m
        """,
        "anova_f": """
            WITH g AS (SELECT lang, count(n_chars) AS c,
                              sum(n_chars) AS s,
                              sum(n_chars * n_chars) AS ss
                       FROM documents GROUP BY lang
                       HAVING count(n_chars) > 0),
            t AS (SELECT count(*) AS k, sum(c) AS n,
                         sum(CAST(s AS DOUBLE) * s / c) AS sbp,
                         sum(CAST(ss AS DOUBLE)
                             - CAST(s AS DOUBLE) * s / c) AS ssw,
                         CAST(sum(s) AS DOUBLE) AS grand
                  FROM g)
            SELECT ROUND(CASE WHEN ssw <= 0 THEN NULL
                         ELSE ((sbp - grand * grand / n) / (k - 1))
                              / (ssw / (n - k)) END, 6) AS f_stat,
                   CAST(k - 1 AS BIGINT) AS df_between,
                   CAST(n - k AS BIGINT) AS df_within
            FROM t
        """,
        "mi_assoc": """
            WITH d AS (SELECT lang AS a,
                              CASE WHEN n_chars < 280 THEN 'short'
                                   WHEN n_chars < 320 THEN 'mid'
                                   ELSE 'long' END AS b
                       FROM documents
                       WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            ct AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS o
                   FROM d GROUP BY a, b),
            r AS (SELECT a, sum(o) AS ra FROM ct GROUP BY a),
            c AS (SELECT b, sum(o) AS cb FROM ct GROUP BY b),
            s AS (SELECT (SELECT sum(o) FROM ct) AS n,
                         (SELECT count(*) FROM r) AS nr,
                         (SELECT count(*) FROM c) AS nc),
            x AS (SELECT sum(pow(ct.o - r.ra * c.cb / s.n, 2)
                             / (r.ra * c.cb / s.n)) AS chi2,
                         sum((ct.o / s.n)
                             * ln(ct.o * s.n / (r.ra * c.cb))) AS mi
                  FROM ct JOIN r USING (a) JOIN c USING (b) CROSS JOIN s)
            SELECT ROUND(x.chi2, 6) AS chi2,
                   ROUND(sqrt(x.chi2
                              / (s.n * (LEAST(s.nr, s.nc) - 1))), 6)
                       AS cramers_v,
                   ROUND(x.mi, 6) AS mi,
                   CAST(s.n AS BIGINT) AS n,
                   CAST(s.nr AS BIGINT) AS n_rows_a,
                   CAST(s.nc AS BIGINT) AS n_cols_b
            FROM x CROSS JOIN s
        """,
        "woe_encode": """
            WITH lab AS (SELECT o_orderkey, o_orderpriority,
                                CASE WHEN o_orderstatus = 'F'
                                     THEN 1 ELSE 0 END AS y
                         FROM orders),
            g AS (SELECT o_orderpriority AS k, sum(y) AS pos,
                         count(y) - sum(y) AS neg
                  FROM lab GROUP BY o_orderpriority),
            s AS (SELECT sum(pos) AS pt, sum(neg) AS nt,
                         count(*) AS kk FROM g)
            SELECT lab.o_orderkey, lab.o_orderpriority,
                   ROUND(ln(((g.pos + 0.5) / (s.pt + 0.5 * s.kk))
                            / ((g.neg + 0.5) / (s.nt + 0.5 * s.kk))), 6)
                       AS prio_woe
            FROM lab JOIN g ON lab.o_orderpriority = g.k CROSS JOIN s
        """,
        "robust_scale": """
            WITH q AS (SELECT quantile_disc(n_chars, 0.25) AS q1,
                              quantile_disc(n_chars, 0.5)  AS med,
                              quantile_disc(n_chars, 0.75) AS q3
                       FROM documents)
            SELECT d.doc_id,
                   (d.n_chars - q.med)
                   / CAST(NULLIF(q.q3 - q.q1, 0) AS DOUBLE) AS chars_rs
            FROM documents d CROSS JOIN q
        """,
        "impute_mean": """
            WITH d AS (SELECT doc_id, source,
                              CASE WHEN doc_id % 5 = 0 THEN NULL
                                   ELSE n_chars END AS x
                       FROM documents),
            m AS (SELECT source,
                         CAST(sum(x) AS DOUBLE) / count(x) AS mean
                  FROM d GROUP BY source)
            SELECT d.doc_id, d.source,
                   CAST(COALESCE(d.x, m.mean) AS DOUBLE) AS x_filled
            FROM d JOIN m USING (source)
        """,
        "quantile_bin": """
            WITH e AS (SELECT DISTINCT v FROM (
                 SELECT quantile_disc(n_chars, 0.00) AS v FROM documents
                 UNION ALL
                 SELECT quantile_disc(n_chars, 0.25) FROM documents
                 UNION ALL
                 SELECT quantile_disc(n_chars, 0.50) FROM documents
                 UNION ALL
                 SELECT quantile_disc(n_chars, 0.75) FROM documents
                 UNION ALL
                 SELECT quantile_disc(n_chars, 1.00) FROM documents))
            SELECT d.doc_id,
                   CAST(LEAST(GREATEST(
                       (SELECT count(*) FROM e WHERE e.v <= d.n_chars) - 1,
                       0), (SELECT count(*) - 2 FROM e)) AS BIGINT)
                       AS chars_qbin
            FROM documents d
        """,
    }
