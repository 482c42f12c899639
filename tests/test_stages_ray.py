"""Ray-level stage tests against DuckDB oracles on the sf0.001 tables.

This mirrors the reference's cross-engine consistency harness
(hybridse/src/testing/engine_test_base.h:96-170): the same logical query
runs through the Ray engine and through DuckDB SQL; outputs must match.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def sql(q: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem", "documents", "customer"):
        con.sql(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")
    return con.sql(q).df()


def norm(df: pd.DataFrame, keys) -> pd.DataFrame:
    return df.sort_values(keys, kind="stable").reset_index(drop=True)[sorted(df.columns)]


def assert_frames_match(ray_df: pd.DataFrame, oracle: pd.DataFrame, keys):
    a, b = norm(ray_df, keys), norm(oracle, keys)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_numeric_dtype(bv) or pd.api.types.is_numeric_dtype(av):
            assert np.allclose(
                pd.to_numeric(av, errors="coerce").astype(float),
                pd.to_numeric(bv, errors="coerce").astype(float),
                equal_nan=True, rtol=1e-9, atol=1e-9,
            ), f"column {c} mismatch"
        else:
            assert (av.fillna("<null>").astype(str) == bv.fillna("<null>").astype(str)).all(), f"column {c} mismatch"


@pytest.fixture(scope="module")
def events(ray_session):
    from openmldb_ray.sources.io import read_table, with_ts_ms

    return with_ts_ms(read_table(SF, "events"), "ts")


def test_window_rows_frame(events):
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows
    from openmldb_ray.stages.window_stage import window_agg

    out = window_agg(
        events.select_columns(["event_id", "user_id", "ts_ms", "value"]),
        "user_id", "ts_ms",
        [Agg.sum("value", "sum_v"), Agg.count_star("cnt"), Agg.avg("value", "avg_v"),
         Agg.min("value", "min_v"), Agg.max("value", "max_v")],
        rows(2), tiebreak="event_id",
    ).to_pandas()
    oracle = sql("""
        SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, value,
               SUM(value)  OVER w AS sum_v,
               CAST(COUNT(*) OVER w AS DOUBLE) AS cnt,
               AVG(value)  OVER w AS avg_v,
               MIN(value)  OVER w AS min_v,
               MAX(value)  OVER w AS max_v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """)
    out["cnt"] = out["cnt"].astype(float)
    assert_frames_match(out, oracle, ["event_id"])


def test_window_range_frame(events):
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows_range
    from openmldb_ray.stages.window_stage import window_agg

    out = window_agg(
        events.select_columns(["event_id", "user_id", "ts_ms", "value"]),
        "user_id", "ts_ms",
        [Agg.sum("value", "sum_v"), Agg.count_star("cnt")],
        rows_range("1h"), tiebreak="event_id",
    ).to_pandas()
    oracle = sql("""
        SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, value,
               SUM(value) OVER w AS sum_v,
               CAST(COUNT(*) OVER w AS DOUBLE) AS cnt
        FROM (SELECT event_id, user_id, value,
                     to_timestamp(epoch_ms(ts) / 1000.0) AS ts FROM events) t
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """)
    out["cnt"] = out["cnt"].astype(float)
    assert_frames_match(out, oracle, ["event_id"])


def test_last_join_asof_broadcast_and_shuffle(ray_session):
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.join_stage import last_join

    events = with_ts_ms(read_table(SF, "events"), "ts").select_columns(
        ["event_id", "user_id", "ts_ms", "value"])
    orders = with_ts_ms(read_table(SF, "orders"), "o_orderdate", "o_ts_ms").select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice", "o_ts_ms"])

    oracle = sql("""
        SELECT e.event_id, e.user_id, CAST(epoch_ms(e.ts) AS BIGINT) AS ts_ms, e.value,
               o.o_orderkey, o.o_totalprice
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND epoch_ms(o.o_orderdate) <= epoch_ms(e.ts)
        QUALIFY o.o_orderkey IS NULL OR ROW_NUMBER() OVER (
            PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
    """)
    for strategy in ("broadcast", "shuffle"):
        out = last_join(
            events, orders, ("user_id", "o_custkey"),
            order_by="o_ts_ms", asof_left_ts="ts_ms", tiebreak="o_orderkey",
            right_cols={"o_orderkey": "o_orderkey", "o_totalprice": "o_totalprice"},
            strategy=strategy,
        ).to_pandas()
        assert_frames_match(out, oracle, ["event_id"])


def test_last_join_unsorted(ray_session):
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.join_stage import last_join

    cust = read_table(SF, "customer").select_columns(["c_custkey", "c_name", "c_nationkey"])
    orders = read_table(SF, "orders").select_columns(["o_orderkey", "o_custkey", "o_totalprice"])
    # deterministic "unsorted": LAST stored right row == max o_orderkey
    # (orders.parquet is written in o_orderkey order; reference LAST JOIN
    # without ORDER BY keeps the last matched row in storage order)
    out = last_join(
        cust, orders, ("c_custkey", "o_custkey"),
        right_cols={"o_orderkey": "o_orderkey", "o_totalprice": "o_totalprice"},
        strategy="broadcast",
    ).to_pandas()
    oracle = sql("""
        SELECT c.c_custkey, c.c_name, c.c_nationkey, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        QUALIFY o.o_orderkey IS NULL OR ROW_NUMBER() OVER (
            PARTITION BY c.c_custkey ORDER BY o.o_orderkey DESC) = 1
    """)
    assert_frames_match(out, oracle, ["c_custkey"])


def test_window_union(ray_session):
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows_range
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.window_stage import window_agg

    ev = with_ts_ms(read_table(SF, "events"), "ts").select_columns(
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
    oracle = sql("""
        SELECT event_id, user_id, ts_ms, value, cnt_all, sum_all FROM (
          SELECT event_id, user_id, event_type, value,
                 CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
                 CAST(COUNT(*) OVER w AS DOUBLE) AS cnt_all,
                 SUM(value) OVER w AS sum_all
          FROM (SELECT *, to_timestamp(epoch_ms(ts)/1000.0) AS ts2 FROM events) t
          WINDOW w AS (PARTITION BY user_id ORDER BY ts2
                       RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)
        ) WHERE event_type = 'click'
    """)
    out["cnt_all"] = out["cnt_all"].astype(float)
    assert_frames_match(out, oracle, ["event_id"])


def test_sessionize(ray_session):
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.session_stage import sessionize

    ev = with_ts_ms(read_table(SF, "events"), "ts").select_columns(
        ["event_id", "user_id", "ts_ms"])
    out = sessionize(ev, "user_id", "ts_ms", gap=30 * 60 * 1000,
                     tiebreak="event_id").to_pandas()
    oracle = sql("""
        SELECT event_id, user_id, ts_ms,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                    ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
        FROM (
          SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
                 CASE WHEN CAST(epoch_ms(ts) AS BIGINT)
                      - LAG(CAST(epoch_ms(ts) AS BIGINT)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                      > 1800000 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS is_new
          FROM events) t
    """)
    assert_frames_match(out, oracle, ["event_id"])


def test_salted_window_matches_plain(ray_session):
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows_range
    from openmldb_ray.sources.io import read_table, with_ts_ms
    from openmldb_ray.stages.window_stage import window_agg, window_agg_salted

    ev = with_ts_ms(read_table(SF, "events"), "ts").select_columns(
        ["event_id", "user_id", "ts_ms", "value"])
    aggs = [Agg.sum("value", "s"), Agg.count_star("c"), Agg.avg("value", "a")]
    frame = rows_range("1h")
    plain = window_agg(ev, "user_id", "ts_ms", aggs, frame, tiebreak="event_id").to_pandas()
    salted = window_agg_salted(ev, "user_id", "ts_ms", aggs, frame,
                               bucket_ms=6 * 3600 * 1000, tiebreak="event_id").to_pandas()
    assert_frames_match(salted, plain, ["event_id"])


def test_group_aggregate(ray_session):
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate

    li = read_table(SF, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = group_aggregate(
        li, "l_returnflag",
        [Agg.sum("l_quantity", "sum_qty"), Agg.avg("l_extendedprice", "avg_price"),
         Agg.count_star("n")],
    ).to_pandas()
    oracle = sql("""
        SELECT l_returnflag, SUM(l_quantity) AS sum_qty,
               AVG(l_extendedprice) AS avg_price, CAST(COUNT(*) AS DOUBLE) AS n
        FROM lineitem GROUP BY l_returnflag
    """)
    out["n"] = out["n"].astype(float)
    assert_frames_match(out, oracle, ["l_returnflag"])


def test_group_aggregate_exotic(ray_session):
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.relational import group_aggregate

    li = read_table(SF, "lineitem", columns=["l_returnflag", "l_quantity", "l_suppkey"])
    out = group_aggregate(
        li, "l_returnflag",
        [Agg.distinct_count("l_suppkey", "dc"), Agg.median("l_quantity", "med")],
    ).to_pandas()
    oracle = sql("""
        SELECT l_returnflag, CAST(COUNT(DISTINCT l_suppkey) AS DOUBLE) AS dc,
               MEDIAN(l_quantity) AS med
        FROM lineitem GROUP BY l_returnflag
    """)
    out["dc"] = out["dc"].astype(float)
    assert_frames_match(out, oracle, ["l_returnflag"])


def test_instance_not_in_window_through_stage(ray_session):
    import ray.data as rd

    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows_range

    from openmldb_ray.stages.window_stage import window_agg

    primary = rd.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3], "k": ["a"] * 3, "ts": [2000, 3000, 4000], "v": [2.0, 3.0, 4.0]}))
    union = rd.from_pandas(pd.DataFrame(
        {"id": [0], "k": ["a"], "ts": [1000], "v": [1.0]}))
    out = window_agg(
        primary, "k", "ts", [Agg.sum("v", "s")],
        rows_range("10s", instance_not_in_window=True),
        union=union, tiebreak="id",
    ).to_pandas().sort_values("id")
    # each primary row sees only itself + the union row (other primaries invisible)
    assert out["s"].tolist() == [3.0, 4.0, 5.0]


def test_window_hook(ray_session):
    import ray.data as rd

    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import rows
    from openmldb_ray.stages.window_stage import window_agg

    import tempfile, os, glob
    d = tempfile.mkdtemp()

    def hook(phase, df):
        with open(os.path.join(d, f"{phase}_{len(df)}.marker"), "w") as f:
            f.write(str(len(df)))

    df = pd.DataFrame({"id": range(6), "k": ["a"] * 3 + ["b"] * 3,
                       "ts": [1, 2, 3, 1, 2, 3], "v": [1.0] * 6})
    out = window_agg(rd.from_pandas(df), "k", "ts", [Agg.count_star("c")],
                     rows(2), tiebreak="id", hook=hook).to_pandas()
    assert len(out) == 6
    markers = glob.glob(os.path.join(d, "*.marker"))
    assert any("pre_" in m for m in markers) and any("post_" in m for m in markers)
