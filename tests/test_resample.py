"""time_grid / resample_asof: regular snapshots + as-of forward fill."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.resample import resample_asof, time_grid

STEP = 7_000


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(4)
    n = 5_000
    ev = pd.DataFrame({
        "k": rng.integers(0, 25, n),
        "ts": rng.integers(0, 100_000, n).astype(np.int64),
        "val": rng.random(n) * 100,
        "eid": np.arange(n, dtype=np.int64),
    })
    # same-(key, ts) ties: tiebreak must pick the max eid deterministically
    dup = ev.head(50).copy()
    dup["eid"] = np.arange(n, n + 50)
    dup["val"] = -1.0
    return pd.concat([ev, dup], ignore_index=True)


ORACLE = f"""
  WITH rng AS (SELECT k, CAST(ceil(min(ts)/{STEP}.0)*{STEP} AS BIGINT) s,
                      max(ts) e FROM ev GROUP BY k),
  grid AS (SELECT k, unnest(generate_series(s, e, {STEP})) AS grid_ts
           FROM rng),
  pick AS (SELECT g.k, g.grid_ts, ev.val,
           ROW_NUMBER() OVER (PARTITION BY g.k, g.grid_ts
                              ORDER BY ev.ts DESC, ev.eid DESC) rn
           FROM grid g JOIN ev ON ev.k = g.k AND ev.ts <= g.grid_ts)
  SELECT k, grid_ts, val FROM pick WHERE rn = 1"""


def _run(events, parts, **kw):
    ds = ray.data.from_pandas(events).repartition(parts)
    out = resample_asof(ds, "k", "ts", STEP, ["val"], tiebreak="eid",
                        **kw).to_pandas()
    return out[["k", "grid_ts", "val"]].sort_values(
        ["k", "grid_ts"]).reset_index(drop=True)


def test_duckdb_parity(ray_session, events):
    ev = events  # noqa: F841
    out = _run(events, 5)
    o = duckdb.sql(ORACLE).df().sort_values(
        ["k", "grid_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, o, check_dtype=False)


def test_split_invariance_and_strategies(ray_session, events):
    a = _run(events, 3)
    b = _run(events, 11, strategy="shuffle")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_grid_alignment(ray_session):
    ev = pd.DataFrame({"k": [1, 1], "ts": np.array([10, 35], np.int64),
                       "val": [1.0, 2.0], "eid": [0, 1]})
    g = time_grid(ray.data.from_pandas(ev), "k", "ts", 10).to_pandas()
    assert g["grid_ts"].tolist() == [10, 20, 30]  # epoch-aligned, <= max
    with pytest.raises(ValueError, match="step"):
        time_grid(ray.data.from_pandas(ev), "k", "ts", 0)


def test_empty_grid_keeps_typed_schema(ray_session):
    # span < step => every key's grid is empty; the result must still be a
    # TYPED empty dataset (fuzzer seed 25 found schema=None here before the
    # Arrow-native expand)
    ev = pd.DataFrame({"k": [1, 2], "ts": np.array([3, 7], np.int64),
                       "val": [1.0, 2.0], "eid": [0, 1]})
    out = resample_asof(ray.data.from_pandas(ev), "k", "ts", 1000,
                        ["val"], tiebreak="eid")
    sch = out.schema()
    assert sch is not None and sch.names[:2] == ["k", "grid_ts"]
    assert out.count() == 0
