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
