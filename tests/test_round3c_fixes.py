"""Round-3 review pass 7 regressions (join/session/relational core).

Covers: residual LAST JOIN temporal leakage when the right order column
name collides with a left column (the merge suffixes the right side, so
the PIT bound must read the suffixed column); null-order rows must never
win max-order selection (sorted LAST JOIN single-match reduce,
latest_snapshot); the broadcast as-of path on a batch with zero valid
left rows when right_cols is None; sessionize null/datetime order
handling; the group_aggregate fallback keeping int64 exactness (and a
stable output schema) when a bucket carries nulls.
"""

import numpy as np
import pandas as pd
import pytest


def _rd(df: pd.DataFrame, parts: int | None = None):
    import ray.data

    ds = ray.data.from_pandas(df)
    return ds.repartition(parts) if parts else ds


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_residual_lastjoin_shared_ts_name_no_leakage(ray_session, strategy):
    """Right order column named like a left column: the PIT bound must
    compare against the RIGHT ts (suffixed by the merge), not left-vs-left
    (which is always true and joins rows from the future)."""
    from openmldb_ray.stages.join_stage import last_join

    left = pd.DataFrame({"k": ["a"], "ts": [100], "lv": [1]})
    right = pd.DataFrame({"k": ["a", "a"], "ts": [50, 999],
                          "v": [10.0, 99.0]})
    out = last_join(
        _rd(left), _rd(right), "k", order_by="ts", asof_left_ts="ts",
        right_cols={"v": "v"},
        residual=lambda m: np.ones(len(m), dtype=bool),
        strategy=strategy,
    ).to_pandas()
    assert out["v"].tolist() == [10.0]  # ts=999 is in the future


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_sorted_lastjoin_null_order_loses_but_stays_eligible(ray_session,
                                                             strategy):
    """Sorted LAST JOIN without asof: a null-order candidate loses
    max-order selection to ANY real order (NaN previously sorted last and
    silently won), but still matches when it is the key's ONLY candidate —
    the reference joins such a row (cases/function/join/
    test_lastjoin_complex.yaml id 13-1 row 5: subquery row with c7=NULL
    must produce c3=24, not NULL)."""
    from openmldb_ray.stages.join_stage import last_join

    left = pd.DataFrame({"k": ["a", "b"]})
    right = pd.DataFrame({"k": ["a", "a", "a", "b"],
                          "o": [5.0, 10.0, None, None],
                          "v": [1.0, 2.0, 666.0, 777.0]})
    out = last_join(_rd(left), _rd(right), "k", order_by="o",
                    right_cols={"v": "v"}, strategy=strategy) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["v"].iloc[0] == 2.0    # null order loses to max non-null
    assert out["v"].iloc[1] == 777.0  # only-null-order key still matches


def test_broadcast_asof_all_null_batch_no_right_cols(ray_session):
    """out_cols=None + a batch with no valid left rows: used to raise
    TypeError iterating None; must emit the right payload as nulls with a
    schema consistent with matched batches."""
    from openmldb_ray.stages.join_stage import last_join

    left = pd.DataFrame({"k": ["a", "a"], "ts": [None, None]})
    right = pd.DataFrame({"k": ["a"], "ots": [50], "v": [1.5]})
    out = last_join(_rd(left), _rd(right), "k", order_by="ots",
                    asof_left_ts="ts", strategy="broadcast").to_pandas()
    assert len(out) == 2
    assert "v" in out.columns and out["v"].isna().all()


def test_latest_snapshot_null_order_skipped(ray_session):
    from openmldb_ray.stages.join_stage import latest_snapshot

    df = pd.DataFrame({"k": ["a", "a", "a", "b"],
                       "ts": [5.0, 10.0, None, None],
                       "v": [1, 2, 666, 777]})
    out = latest_snapshot(_rd(df), "k", "ts").to_pandas()
    # key b has only a null ts -> no defined latest row
    assert out["k"].tolist() == ["a"]
    assert out["v"].tolist() == [2]


def test_sessionize_datetime_epoch_us_and_null_drop(ray_session):
    """Datetime order_by converts to epoch MICROSECONDS (gap in us, the
    library convention) and null-order rows drop instead of casting to
    INT64_MIN garbage."""
    from openmldb_ray.stages.session_stage import sessionize

    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:00:01",
        "2024-01-01 01:00:00", None,
    ])
    df = pd.DataFrame({"u": ["x"] * 4, "t": ts, "eid": [0, 1, 2, 3]})
    # gap = 10 seconds in MICROSECONDS
    out = sessionize(_rd(df), "u", "t", gap=10_000_000,
                     tiebreak="eid").to_pandas().sort_values("eid")
    assert out["eid"].tolist() == [0, 1, 2]          # null-ts row dropped
    assert out["session_id"].tolist() == [0, 0, 1]   # 1h >> 10s gap


def test_session_aggregate_single_shuffle_parity(ray_session):
    """Fused one-shuffle session_aggregate matches a driver-side replay."""
    from openmldb_ray.stages.session_stage import session_aggregate

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "u": rng.integers(0, 20, n),
        "t": np.sort(rng.integers(0, 100_000, n)),
        "v": rng.random(n),
        "eid": np.arange(n),
    })
    out = session_aggregate(_rd(df, parts=7), "u", "t", gap=1000,
                            value_col="v", tiebreak="eid").to_pandas() \
        .sort_values(["u", "session_id"]).reset_index(drop=True)
    # replay
    d = df.sort_values(["u", "t", "eid"], kind="stable")
    sid = []
    for _, g in d.groupby("u", sort=True):
        gaps = np.diff(g["t"].to_numpy())
        s = np.concatenate([[0], np.cumsum((gaps > 1000).astype(int))])
        sid.append(pd.DataFrame({
            "u": g["u"].to_numpy(), "t": g["t"].to_numpy(),
            "v": g["v"].to_numpy(), "sid": s}))
    rep = (pd.concat(sid).groupby(["u", "sid"], as_index=False)
           .agg(session_start=("t", "min"), session_end=("t", "max"),
                n_events=("t", "size"), sum_value=("v", "sum"))
           .sort_values(["u", "sid"]).reset_index(drop=True))
    assert out["session_start"].tolist() == rep["session_start"].tolist()
    assert out["session_end"].tolist() == rep["session_end"].tolist()
    assert out["n_events"].tolist() == rep["n_events"].tolist()
    assert np.allclose(out["sum_value"], rep["sum_value"])


def test_group_aggregate_fallback_int_exact_with_nulls(ray_session):
    """A null in an int64 column must not push the bucket onto the float64
    path: ids >= 2^53 stay distinct and the output schema is identical to
    a null-free bucket's."""
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.stages.relational import group_aggregate

    big = 2**53
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b"],
        "id": pd.array([big, big + 1, None, 7, 7], dtype="Int64"),
    })
    out = group_aggregate(_rd(df), "k",
                          [Agg.distinct_count("id", "dc")]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # 2 real distinct values (2^53 and 2^53+1 must NOT collapse) + NULL,
    # which the reference counts as its own distinct value
    # (test_udaf_function.yaml id 5). The old float64 path returned 2.
    assert out["dc"].tolist() == [3, 1]
