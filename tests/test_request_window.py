"""request_window_agg: long-window aggregates for sparse request rows
(batch analog of the reference's pre-aggregated long windows,
hybridse/src/vm/aggregator.h / RequestAggUnionRunner). DuckDB is the
cross-engine oracle (correlated time-range subqueries)."""

from __future__ import annotations

import numpy as np
import numpy.testing as npt
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    n = 5000
    hist = pd.DataFrame({
        "k": rng.integers(0, 20, n),
        "ts": rng.integers(0, 1_000_000, n).astype("int64"),
        "v": np.where(rng.random(n) < 0.1, np.nan, rng.random(n) * 100),
    })
    reqs = pd.DataFrame({
        "k": rng.integers(0, 22, 400),   # keys 20/21 have no history
        "ts": rng.integers(0, 1_000_000, 400).astype("int64"),
        "rid": np.arange(400),
    })
    return hist, reqs


def test_request_window_agg_duckdb_parity(ray_session, frames):
    import duckdb
    import ray.data as rd

    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.stages.request_window import request_window_agg

    hist, reqs = frames
    P = 50_000
    out = request_window_agg(
        rd.from_arrow(pa.Table.from_pandas(reqs)),
        rd.from_arrow(pa.Table.from_pandas(hist)),
        "k", "ts",
        [AggSpec(name="s", kind="sum", col="v"),
         AggSpec(name="c", kind="count", col="v"),
         AggSpec(name="a", kind="avg", col="v"),
         AggSpec(name="mn", kind="min", col="v"),
         AggSpec(name="mx", kind="max", col="v"),
         AggSpec(name="n", kind="count_star")],
        preceding_ms=P).to_pandas().sort_values("rid").reset_index(drop=True)

    con = duckdb.connect()
    con.register("h", hist)
    con.register("r", reqs)
    exp = con.sql(f"""
      select r.rid,
        (select sum(v)   from h where h.k=r.k and h.ts between r.ts-{P} and r.ts) s,
        (select count(v) from h where h.k=r.k and h.ts between r.ts-{P} and r.ts) c,
        (select avg(v)   from h where h.k=r.k and h.ts between r.ts-{P} and r.ts) a,
        (select min(v)   from h where h.k=r.k and h.ts between r.ts-{P} and r.ts) mn,
        (select max(v)   from h where h.k=r.k and h.ts between r.ts-{P} and r.ts) mx,
        (select count(*) from h where h.k=r.k and h.ts between r.ts-{P} and r.ts) n
      from r order by rid""").df()
    for c in ("s", "a", "mn", "mx"):
        npt.assert_allclose(out[c].to_numpy(np.float64),
                            exp[c].to_numpy(np.float64),
                            rtol=1e-9, equal_nan=True)
    assert (out["c"].to_numpy(np.int64) == exp["c"].to_numpy(np.int64)).all()
    assert (out["n"].to_numpy(np.int64) == exp["n"].to_numpy(np.int64)).all()


def test_request_window_agg_rejects_unsupported_kind(ray_session, frames):
    import ray.data as rd

    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.stages.request_window import request_window_agg

    hist, reqs = frames
    with pytest.raises(ValueError, match="supports"):
        request_window_agg(
            rd.from_arrow(pa.Table.from_pandas(reqs)),
            rd.from_arrow(pa.Table.from_pandas(hist)),
            "k", "ts", [AggSpec(name="m", kind="median", col="v")],
            preceding_ms=1000)


def test_request_payload_nullable_int_and_huge_ints_exact(ray_session):
    """Round-4 regression: payload columns ride the exchange as Arrow —
    nullable-int payloads survive (previously a loud restore-cast
    failure) and int64 payloads past 2^53 stay bit-exact (previously
    rounded through the pandas float64 union)."""
    import ray.data as rd

    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.stages.request_window import request_window_agg

    big = 2 ** 60
    reqs = pa.table({
        "k": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([100, 200, 150, 250], pa.int64()),
        "payload_big": pa.array([big + 1, big + 2, big + 3, big + 4],
                                pa.int64()),
        "payload_null": pa.array([7, None, None, 9], pa.int64()),
    })
    hist = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([90, 180, 140], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0], pa.float64()),
    })
    out = request_window_agg(
        rd.from_arrow(reqs), rd.from_arrow(hist), "k", "ts",
        [AggSpec(name="s", kind="sum", col="v"),
         AggSpec(name="n", kind="count_star")],
        preceding_ms=50)
    sch = dict(zip(out.schema().names, out.schema().types))
    assert sch["payload_big"] == pa.int64()
    assert sch["payload_null"] == pa.int64()
    df = out.to_pandas().sort_values("ts").reset_index(drop=True)
    got = {int(t): v for t, v in zip(df["ts"], df["payload_big"])}
    assert got == {100: big + 1, 200: big + 2, 150: big + 3, 250: big + 4}
    nulls = {int(t): v for t, v in zip(df["ts"], df["payload_null"])}
    assert nulls[100] == 7 and nulls[250] == 9
    assert pd.isna(nulls[200]) and pd.isna(nulls[150])
    sums = {int(t): v for t, v in zip(df["ts"], df["s"])}
    assert sums[100] == 10.0 and sums[200] == 20.0 and sums[150] == 30.0
    assert pd.isna(sums[250])
