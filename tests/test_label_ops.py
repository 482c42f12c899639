"""Label-generation joins (stages/join_stage.next_join — the forward as-of
mirror of LAST JOIN) and the feature-store latest-snapshot read
(join_stage.latest_snapshot)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _naive_next(left, right, key, lts, rts, horizon=None, strict=False,
                tiebreak=None):
    """Per left row: first right row with rts >= (>) lts within horizon,
    ties by min tiebreak."""
    rows = []
    for _, l in left.iterrows():
        cand = right[right[key] == l[key]]
        if strict:
            cand = cand[cand[rts] > l[lts]]
        else:
            cand = cand[cand[rts] >= l[lts]]
        if horizon is not None:
            cand = cand[cand[rts] <= l[lts] + horizon]
        if len(cand):
            sort_cols = [rts] + ([tiebreak] if tiebreak else [])
            rows.append(cand.sort_values(sort_cols, kind="stable").iloc[0])
        else:
            rows.append(None)
    return rows


def _mk_rand(n_left=400, n_right=600, n_keys=20, seed=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "lts": rng.integers(0, 1000, n_left).astype("int64"),
        "lid": np.arange(n_left),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "rts": rng.integers(0, 1000, n_right).astype("int64"),
        "rid": np.arange(n_right),
        "val": rng.normal(size=n_right).round(4),
    })
    return left, right


def _run_next(left, right, **kw):
    from openmldb_ray.stages.join_stage import next_join

    out = next_join(
        rd.from_pandas(left), rd.from_pandas(right), "k",
        order_by="rts", asof_left_ts="lts",
        right_cols={"rid": "label_rid", "val": "label_val"}, **kw,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    return out


@pytest.mark.parametrize("strict", [False, True])
def test_next_join_matches_naive(ray_session, strict):
    left, right = _mk_rand()
    out = _run_next(left, right, horizon=150, strict=strict,
                    tiebreak="rid", strategy="broadcast")
    naive = _naive_next(left.sort_values("lid"), right, "k", "lts", "rts",
                        horizon=150, strict=strict, tiebreak="rid")
    assert len(out) == len(left)
    for i, ref in enumerate(naive):
        got = out["label_rid"].iloc[i]
        if ref is None:
            assert pd.isna(got), f"row {i}: expected no label, got rid={got}"
        else:
            assert got == ref["rid"], f"row {i}: rid {got} != {ref['rid']}"
            assert out["label_val"].iloc[i] == ref["val"]


def test_next_join_strict_excludes_exact_ts(ray_session):
    """An outcome at exactly the feature timestamp must not label its own
    row under strict=True (same-instant leakage), but does under
    strict=False."""
    left = pd.DataFrame({"k": [1], "lts": [100], "lid": [0]})
    right = pd.DataFrame({"k": [1, 1], "rts": [100, 120],
                          "rid": [10, 11], "val": [1.0, 2.0]})
    loose = _run_next(left, right, strategy="broadcast")
    strict = _run_next(left, right, strict=True, strategy="broadcast")
    assert loose["label_rid"].iloc[0] == 10
    assert strict["label_rid"].iloc[0] == 11


def test_next_join_horizon_bounds_label(ray_session):
    """Events past lts + horizon leave the row unlabeled; the horizon is
    inclusive and measured from the ORIGINAL ts even under strict's internal
    +1 shift."""
    left = pd.DataFrame({"k": [1, 2, 3], "lts": [0, 0, 0], "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": [1, 2, 3], "rts": [50, 51, 50],
                          "rid": [1, 2, 3], "val": [1.0, 2.0, 3.0]})
    out = _run_next(left, right, horizon=50, strict=True, strategy="broadcast")
    assert out["label_rid"].iloc[0] == 1      # rts=50 == 0+50: inside
    assert pd.isna(out["label_rid"].iloc[1])  # rts=51: outside
    assert out["label_rid"].iloc[2] == 3


def test_next_join_broadcast_equals_shuffle(ray_session):
    left, right = _mk_rand(seed=11)
    a = _run_next(left, right, horizon=200, strict=True, tiebreak="rid",
                  strategy="broadcast")
    b = _run_next(left, right, horizon=200, strict=True, tiebreak="rid",
                  strategy="shuffle")
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)


def test_next_join_timestamp_dtype(ray_session):
    """Timestamp (not epoch-int) columns go through strict's +1-unit shift
    and a Timedelta horizon."""
    left = pd.DataFrame({
        "k": [1, 1], "lid": [0, 1],
        "lts": pd.to_datetime(["2024-01-01", "2024-06-01"]),
    })
    right = pd.DataFrame({
        "k": [1, 1, 1], "rid": [0, 1, 2], "val": [1.0, 2.0, 3.0],
        "rts": pd.to_datetime(["2024-01-01", "2024-01-10", "2024-09-01"]),
    })
    out = _run_next(left, right, horizon=pd.Timedelta(days=30), strict=True,
                    strategy="broadcast")
    assert out["label_rid"].iloc[0] == 1   # exact match excluded, next within 30d
    assert pd.isna(out["label_rid"].iloc[1])  # 2024-09-01 > 2024-07-01


def test_latest_snapshot_matches_pandas(ray_session):
    from openmldb_ray.stages.join_stage import latest_snapshot

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 50, 2000),
        "ts": rng.integers(0, 500, 2000).astype("int64"),
        "rid": np.arange(2000),
        "v": rng.normal(size=2000).round(4),
    })
    cutoff = 300
    out = latest_snapshot(rd.from_pandas(df).repartition(7), "k", "ts",
                          as_of=cutoff, tiebreak="rid").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    ref = (df[df["ts"] <= cutoff]
           .sort_values(["k", "ts", "rid"], kind="stable")
           .groupby("k", sort=True).tail(1)
           .sort_values("k").reset_index(drop=True))
    assert len(out) == len(ref)
    for c in ("k", "ts", "rid", "v"):
        np.testing.assert_array_equal(out[c].to_numpy(), ref[c].to_numpy())


def test_latest_snapshot_split_invariant(ray_session):
    """One row per key regardless of how blocks split the key's rows — the
    per-block combiner must not eliminate the true latest."""
    from openmldb_ray.stages.join_stage import latest_snapshot

    df = pd.DataFrame({"k": [1] * 10, "ts": np.arange(10, dtype="int64"),
                       "v": np.arange(10.0)})
    for parts in (1, 3, 10):
        out = latest_snapshot(rd.from_pandas(df).repartition(parts),
                              "k", "ts").to_pandas()
        assert len(out) == 1 and out["ts"].iloc[0] == 9 and out["v"].iloc[0] == 9.0
