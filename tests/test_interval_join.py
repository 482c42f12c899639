"""interval_join: containment join vs a naive pandas reference."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.interval_join import interval_join


def _naive(pts, iv, on, how, rcols):
    rows = []
    for _, p in pts.iterrows():
        hit = iv[(iv["s"] <= p["ts"]) & (p["ts"] <= iv["e"])]
        if on:
            hit = hit[hit[on] == p[on]]
        if len(hit):
            for _, r in hit.iterrows():
                rows.append({**p.to_dict(), **{c: r[c] for c in rcols}})
        elif how == "left":
            rows.append({**p.to_dict(), **{c: np.nan for c in rcols}})
    return pd.DataFrame(rows)


def _canon(df):
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind in "iuf":
            df[c] = df[c].astype(np.float64).fillna(-1.0)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    n, m = 3000, 120
    pts = pd.DataFrame({"pid": np.arange(n),
                        "k": rng.integers(0, 5, n),
                        "ts": rng.integers(0, 100_000, n)})
    iv = pd.DataFrame({"iid": np.arange(m),
                       "k": rng.integers(0, 5, m),
                       "s": rng.integers(0, 95_000, m)})
    iv["e"] = iv["s"] + rng.integers(0, 8_000, m)
    iv.loc[:2, ["s", "e"]] = [[0, 99_999]] * 3   # long intervals
    return pts, iv


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
@pytest.mark.parametrize("how,on", [("inner", None), ("inner", "k"),
                                    ("left", "k")])
def test_parity_vs_naive(data, strategy, how, on):
    pts, iv = data
    out = interval_join(
        ray.data.from_pandas(pts).repartition(6),
        ray.data.from_pandas(iv).repartition(3),
        ts_col="ts", start_col="s", end_col="e", on=on, how=how,
        right_cols=["iid", "s", "e"], strategy=strategy,
        bucket_width=2_000).to_pandas()
    ref = _naive(pts, iv, on, how, ["iid", "s", "e"])
    assert len(out) == len(ref)
    pd.testing.assert_frame_equal(_canon(out), _canon(ref[out.columns]))


def test_long_interval_side_channel(data):
    # with bucket_width=500 and span 100k, the 3 full-axis intervals span
    # 200 buckets > long_bucket_span=64 -> must ride the broadcast channel
    pts, iv = data
    out = interval_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(iv),
        ts_col="ts", start_col="s", end_col="e", on=None, how="inner",
        right_cols=["iid"], strategy="shuffle", bucket_width=500,
        long_bucket_span=64).to_pandas()
    # every point matches each of the 3 long intervals
    long_hits = out[out["iid"] <= 2]
    assert len(long_hits) == 3 * len(pts)


def test_null_keys_never_match():
    pts = pd.DataFrame({"pid": [0, 1], "k": [1.0, np.nan],
                        "ts": [10, 10]})
    iv = pd.DataFrame({"iid": [0, 1], "k": [1.0, np.nan],
                       "s": [0, 0], "e": [20, 20]})
    out = interval_join(ray.data.from_pandas(pts), ray.data.from_pandas(iv),
                        ts_col="ts", start_col="s", end_col="e", on="k",
                        how="left", right_cols=["iid"],
                        strategy="broadcast").to_pandas()
    assert len(out) == 2
    got = out.sort_values("pid")["iid"].tolist()
    # unmatched int columns are nullable Int64 now (pd.NA, not float nan)
    assert got[0] == 0 and pd.isna(got[1])


def test_split_invariance(data):
    pts, iv = data
    outs = []
    for nparts in (1, 13):
        out = interval_join(
            ray.data.from_pandas(pts).repartition(nparts),
            ray.data.from_pandas(iv).repartition(min(nparts, 3)),
            ts_col="ts", start_col="s", end_col="e", on="k", how="inner",
            right_cols=["iid"], strategy="shuffle",
            bucket_width=3_000).to_pandas()
        outs.append(_canon(out))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_empty_right():
    pts = pd.DataFrame({"pid": [0, 1], "ts": [5, 6]})
    iv = pd.DataFrame({"iid": pd.Series([], dtype="int64"),
                       "s": pd.Series([], dtype="int64"),
                       "e": pd.Series([], dtype="int64")})
    inner = interval_join(ray.data.from_pandas(pts),
                          ray.data.from_pandas(iv), ts_col="ts",
                          start_col="s", end_col="e", how="inner",
                          right_cols=["iid"],
                          strategy="broadcast").to_pandas()
    assert len(inner) == 0
    left = interval_join(ray.data.from_pandas(pts),
                         ray.data.from_pandas(iv), ts_col="ts",
                         start_col="s", end_col="e", how="left",
                         right_cols=["iid"],
                         strategy="broadcast").to_pandas()
    assert len(left) == 2 and left["iid"].isna().all()


def test_datetime_ts_dtype():
    pts = pd.DataFrame({"pid": [0, 1, 2],
                        "ts": pd.to_datetime(["2024-01-05", "2024-02-01",
                                              "2024-03-01"])})
    iv = pd.DataFrame({"iid": [7],
                       "s": pd.to_datetime(["2024-01-01"]),
                       "e": pd.to_datetime(["2024-02-10"])})
    for strategy in ("broadcast", "shuffle"):
        out = interval_join(ray.data.from_pandas(pts),
                            ray.data.from_pandas(iv), ts_col="ts",
                            start_col="s", end_col="e", how="inner",
                            right_cols=["iid"],
                            strategy=strategy).to_pandas()
        assert sorted(out["pid"].tolist()) == [0, 1]
