"""hopping_window_agg: overlapping-window aggregates vs naive reference."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.stream_window import hopping_window_agg

AGGS = {"cnt": ("count", None), "nnz": ("count_col", "v"),
        "sv": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v"),
        "avg": ("mean", "v")}


def _naive(df, W, H, keys):
    k = W // H
    rows = []
    for off in range(k):
        d = df.copy()
        d["window_start"] = (np.floor_divide(
            d["ts"].to_numpy(), H) - off) * H
        rows.append(d)
    rep = pd.concat(rows)
    gb = rep.groupby(keys + ["window_start"], dropna=False)
    out = pd.DataFrame({
        "cnt": gb.size(), "nnz": gb["v"].count(),
        "sv": gb["v"].sum(min_count=1), "mn": gb["v"].min(),
        "mx": gb["v"].max(), "avg": gb["v"].mean()}).reset_index()
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    n = 8000
    df = pd.DataFrame({"k": rng.integers(0, 4, n),
                       "ts": rng.integers(-50_000, 50_000, n),
                       "v": rng.normal(size=n)})
    df.loc[rng.random(n) < 0.1, "v"] = np.nan
    return df


def _cmp(out, ref, keys):
    a = out.sort_values(keys + ["window_start"]).reset_index(drop=True)
    b = ref[a.columns].sort_values(
        keys + ["window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.round(9), b.round(9), check_dtype=False)


def test_hopping_parity(data):
    out = hopping_window_agg(
        ray.data.from_pandas(data).repartition(7), ts_col="ts",
        window=4000, hop=1000, key_cols=["k"], aggs=AGGS).to_pandas()
    _cmp(out, _naive(data, 4000, 1000, ["k"]), ["k"])


def test_tumbling_and_keyless(data):
    out = hopping_window_agg(
        ray.data.from_pandas(data).repartition(3), ts_col="ts",
        window=5000, hop=5000, aggs=AGGS).to_pandas()
    _cmp(out, _naive(data, 5000, 5000, []), [])


def test_negative_ts_floor(data):
    # floor division must bucket negative timestamps downward, not toward 0
    df = pd.DataFrame({"ts": [-1, 0, 1], "v": [1.0, 2.0, 3.0]})
    out = hopping_window_agg(
        ray.data.from_pandas(df), ts_col="ts", window=10, hop=10,
        aggs={"cnt": ("count", None)}).to_pandas()
    got = dict(zip(out["window_start"], out["cnt"]))
    assert got == {-10: 1, 0: 2}


def test_all_null_group_is_null():
    df = pd.DataFrame({"ts": [5, 6], "v": [np.nan, np.nan]})
    out = hopping_window_agg(
        ray.data.from_pandas(df), ts_col="ts", window=10, hop=10,
        aggs=AGGS).to_pandas()
    assert out["cnt"].iloc[0] == 2 and out["nnz"].iloc[0] == 0
    assert out[["sv", "mn", "mx", "avg"]].isna().all().all()


def test_split_invariance(data):
    outs = []
    for nparts in (1, 11):
        out = hopping_window_agg(
            ray.data.from_pandas(data).repartition(nparts), ts_col="ts",
            window=3000, hop=1500, key_cols=["k"], aggs=AGGS).to_pandas()
        outs.append(out.sort_values(["k", "window_start"])
                    .reset_index(drop=True).round(9))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_datetime_ts(data):
    df = data.copy()
    df["ts"] = pd.Timestamp("2024-01-01").value // 1000 + df["ts"]
    df["ts_dt"] = pd.to_datetime(df["ts"], unit="us")
    a = hopping_window_agg(
        ray.data.from_pandas(df.drop(columns="ts_dt")), ts_col="ts",
        window=4000, hop=2000, key_cols=["k"], aggs=AGGS).to_pandas()
    b = hopping_window_agg(
        ray.data.from_pandas(df.drop(columns="ts")), ts_col="ts_dt",
        window=4000, hop=2000, key_cols=["k"], aggs=AGGS).to_pandas()
    _cmp(a, b, ["k"])


def test_bad_args():
    ds = ray.data.from_pandas(pd.DataFrame({"ts": [1], "v": [1.0]}))
    with pytest.raises(ValueError):
        hopping_window_agg(ds, ts_col="ts", window=5, hop=2,
                           aggs={"c": ("count", None)})
    with pytest.raises(ValueError):
        hopping_window_agg(ds, ts_col="ts", window=4, hop=2,
                           aggs={"c": ("median", "v")})
