"""Kernel-level window semantics tests (no Ray).

Cases transcribed from the reference's YAML conformance corpus
(cases/function/window/test_window_row_range.yaml,
test_window_row.yaml, test_maxsize.yaml, test_current_row.yaml,
test_window_exclude_current_time.yaml) plus fast-vs-exact property
sweeps.
"""

import numpy as np
import pandas as pd
import pytest

from openmldb_ray.core.aggregates import Agg
from openmldb_ray.core.frames import FrameSpec, interval_ms, rows, rows_range, unbounded
from openmldb_ray.core.window_fast import compute_window_features


def mk(ts, v, **extra):
    df = pd.DataFrame({"ts": ts, "v": v, **extra})
    return df


def feats(df, aggs, frame, **kw):
    return compute_window_features(df, "ts", aggs, frame, **kw)


def test_interval_parse():
    assert interval_ms("10s") == 10_000
    assert interval_ms("2m") == 120_000
    assert interval_ms("1h") == 3_600_000
    assert interval_ms("1d") == 86_400_000
    assert interval_ms(77) == 77


def test_rows_frame_sum_count():
    # mirrors cases/function/window/test_window_row.yaml first case:
    # ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    df = mk([1000, 2000, 3000, 4000, 5000], [1.0, 2.0, 3.0, 4.0, 5.0])
    r = feats(df, [Agg.sum("v", "s"), Agg.count_star("c")], rows(2))
    assert r["s"].tolist() == [1.0, 3.0, 6.0, 9.0, 12.0]
    assert r["c"].tolist() == [1, 2, 3, 3, 3]


def test_rows_range_frame():
    # ROWS_RANGE BETWEEN 2s PRECEDING AND CURRENT ROW over ts 1s apart
    df = mk([1000, 2000, 3000, 6000, 7000], [1.0, 2.0, 3.0, 4.0, 5.0])
    r = feats(df, [Agg.sum("v", "s"), Agg.min("v", "mn"), Agg.max("v", "mx")], rows_range("2s"))
    assert r["s"].tolist() == [1.0, 3.0, 6.0, 4.0, 9.0]
    assert r["mn"].tolist() == [1.0, 1.0, 1.0, 4.0, 4.0]
    assert r["mx"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_open_preceding():
    # 2s OPEN PRECEDING: strict bound → ts == cur-2000 excluded
    df = mk([1000, 2000, 3000], [1.0, 2.0, 3.0])
    r = feats(df, [Agg.sum("v", "s")], rows_range("2s", open_range=True))
    assert r["s"].tolist() == [1.0, 3.0, 5.0]


def test_maxsize():
    # test_maxsize.yaml: range frame capped at 2 rows
    df = mk([1000, 2000, 3000, 4000], [1.0, 2.0, 3.0, 4.0])
    r = feats(df, [Agg.sum("v", "s")], rows_range("10s", max_size=2))
    assert r["s"].tolist() == [1.0, 3.0, 5.0, 7.0]


def test_exclude_current_row():
    df = mk([1000, 2000, 3000], [1.0, 2.0, 3.0])
    r = feats(df, [Agg.sum("v", "s"), Agg.count_star("c")], rows_range("10s", exclude_current_row=True))
    assert r["c"].tolist() == [0, 1, 2]
    assert r["s"].tolist()[1:] == [1.0, 3.0]
    assert r["s"].isna().tolist() == [True, False, False]


def test_exclude_current_time():
    # two rows at ts=2000: the second must not see the first when
    # EXCLUDE CURRENT_TIME, but still sees ts<2000 rows and itself
    df = mk([1000, 2000, 2000, 3000], [1.0, 2.0, 3.0, 4.0])
    r = feats(df, [Agg.sum("v", "s")], rows_range("10s", exclude_current_time=True))
    assert r["s"].tolist() == [1.0, 3.0, 4.0, 10.0]
    # without the exclusion, same-ts earlier arrivals ARE visible
    r2 = feats(df, [Agg.sum("v", "s")], rows_range("10s"))
    assert r2["s"].tolist() == [1.0, 3.0, 6.0, 10.0]


def test_null_and_negative_order_key_dropped():
    # WindowAggPlan.scala:784-791 — no output, not buffered
    df = mk([1000.0, None, -5.0, 2000.0], [1.0, 2.0, 3.0, 4.0])
    r = feats(df, [Agg.sum("v", "s"), Agg.count_star("c")], rows(10))
    assert len(r) == 2
    assert r["s"].tolist() == [1.0, 5.0]


def test_lag_first_value():
    df = mk([1000, 2000, 3000], [10.0, 20.0, 30.0])
    r = feats(df, [Agg.lag("v", 1, "l1"), Agg.lag("v", 2, "l2"), Agg.first_value("v", "fv")], unbounded())
    assert r["fv"].tolist() == [10.0, 20.0, 30.0]  # index 0 = CURRENT row (reference quirk)
    assert r["l1"].isna().tolist() == [True, False, False]
    assert r["l1"].tolist()[1:] == [10.0, 20.0]
    assert r["l2"].isna().tolist() == [True, True, False]


def test_lag_ignores_frame_extent():
    # lag/at are partition-positional, independent of the frame: the
    # reference compiles lag(v, k) to its own appended ROWS (k PRECEDING,
    # CURRENT) sub-window (reference cases/function/window/
    # window_attributes.yaml batch_plan blocks, cases 0/2/3: l1 is the
    # previous partition row even when outside the ROWS_RANGE frame)
    df = mk([1000, 5000, 6000], [1.0, 2.0, 3.0])
    r = feats(df, [Agg.lag("v", 1, "l1")], rows_range("1s"))
    assert r["l1"].isna().tolist() == [True, False, False]
    assert r["l1"].tolist()[1:] == [1.0, 2.0]


def test_lead_extension():
    df = mk([1000, 2000, 3000], [1.0, 2.0, 3.0])
    r = feats(df, [Agg.lead("v", 1, "ld")], unbounded())
    assert r["ld"].tolist()[:2] == [2.0, 3.0]
    assert r["ld"].isna().tolist() == [False, False, True]


def test_union_rows_feed_but_dont_emit():
    # WINDOW UNION: union rows sorted before primary on ties, never emitted
    df = pd.DataFrame(
        {
            "ts": [1000, 2000, 2000, 3000],
            "v": [1.0, 2.0, 3.0, 4.0],
            "__is_primary": [False, True, False, True],
        }
    ).sort_values(["ts", "__is_primary"], kind="stable")
    r = feats(df, [Agg.sum("v", "s"), Agg.count_star("c")], rows_range("10s"), is_primary_col="__is_primary")
    assert len(r) == 2
    # primary@2000 sees union@1000 + union@2000 (ties: union first) + itself
    assert r["s"].tolist() == [6.0, 10.0]
    assert r["c"].tolist() == [3, 4]


def test_instance_not_in_window():
    df = pd.DataFrame(
        {
            "ts": [1000, 2000, 3000, 4000],
            "v": [1.0, 2.0, 3.0, 4.0],
            "__is_primary": [False, True, True, True],
        }
    )
    r = feats(
        df,
        [Agg.sum("v", "s")],
        rows_range("10s", instance_not_in_window=True),
        is_primary_col="__is_primary",
    )
    # each primary row = itself + union rows only (other primaries invisible)
    assert r["s"].tolist() == [3.0, 4.0, 5.0]


def test_where_and_cate_and_stats():
    df = mk(
        [1000, 2000, 3000, 4000],
        [1.0, 2.0, 3.0, 4.0],
        flag=[True, False, True, True],
        cat=["a", "b", "a", "b"],
    )
    r = feats(
        df,
        [
            Agg.sum_where("v", "flag", "sw"),
            Agg.count_where("v", "flag", "cw"),
            Agg.distinct_count("cat", "dc"),
            Agg.median("v", "md"),
            Agg.top("v", 2, "tp"),
            Agg.topn_frequency("cat", 1, "tf"),
            Agg.top1_ratio("cat", "t1"),
            Agg.cate("sum", "v", "cat", "sc"),
        ],
        unbounded(),
    )
    assert r["sw"].tolist() == [1.0, 1.0, 4.0, 8.0]
    assert r["cw"].tolist() == [1, 1, 2, 3]
    assert r["dc"].tolist() == [1, 2, 2, 2]
    assert r["md"].tolist() == [1.0, 1.5, 2.0, 2.5]
    assert r["tp"].tolist() == ["1", "2,1", "3,2", "4,3"]
    assert r["tf"].tolist() == ["a", "a", "a", "a"]
    assert r["t1"].tolist() == [1.0, 0.5, 2 / 3, 0.5]
    assert r["sc"].tolist() == ["a:1", "a:1,b:2", "a:4,b:2", "a:4,b:6"]


def test_merged_frame_union_extent():
    # ROWS 2 PRECEDING merged with ROWS_RANGE 1s PRECEDING: row kept if
    # within EITHER bound (mem_catalog.h:462-491)
    df = mk([1000, 5000, 6000, 7000, 8000], [1.0, 2.0, 3.0, 4.0, 5.0])
    frame = FrameSpec(rows_preceding=2, range_preceding=1000)
    r = feats(df, [Agg.sum("v", "s"), Agg.count_star("c")], frame)
    # row@6000: rows-bound keeps 3 newest {6000,5000,1000}; range keeps {5000,6000}
    assert r["c"].tolist() == [1, 2, 3, 3, 3]
    assert r["s"].tolist() == [1.0, 3.0, 6.0, 9.0, 12.0]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize(
    "frame",
    [rows(0), rows(3), rows_range(2500), rows_range(1), unbounded()],
    ids=["rows0", "rows3", "range2500", "range1", "unbounded"],
)
def test_fast_matches_exact(seed, frame):
    """Property sweep: vectorized kernel == exact kernel on its subset."""
    rng = np.random.default_rng(seed)
    n = 200
    ts = np.sort(rng.integers(0, 5000, n)) * 1  # duplicates likely
    v = rng.normal(size=n)
    v[rng.random(n) < 0.15] = np.nan
    df = pd.DataFrame({"ts": ts, "v": v})
    aggs = [
        Agg.sum("v", "s"),
        Agg.count("v", "cnt"),
        Agg.count_star("cs"),
        Agg.avg("v", "a"),
        Agg.min("v", "mn"),
        Agg.max("v", "mx"),
        Agg.lag("v", 2, "l2"),
        Agg.first_value("v", "fv"),
    ]
    aggs = aggs + [Agg.median("v", "md")]
    fast = compute_window_features(df, "ts", aggs, frame)
    # force the exact path by adding an agg outside FAST_KINDS, then drop it
    exact = compute_window_features(df, "ts", aggs + [Agg.top("v", 2, "_force")], frame)
    for a in aggs:
        f = pd.to_numeric(fast[a.name], errors="coerce").to_numpy(np.float64)
        e = pd.to_numeric(exact[a.name], errors="coerce").to_numpy(np.float64)
        assert np.allclose(f, e, equal_nan=True), f"{a.name} mismatch (frame={frame})"


@pytest.mark.parametrize("card", [8, 200], ids=["matrix-path", "counter-path"])
def test_sliding_kernel_matches_exact(card):
    """distinct_count/topn_frequency/top1_ratio: vectorized & two-pointer
    sliding paths vs the exact kernel, incl. nulls and ties."""
    rng = np.random.default_rng(card)
    n = 300
    ts = np.sort(rng.integers(0, 3000, n))
    vals = rng.integers(0, card, n).astype(object)
    vals[rng.random(n) < 0.1] = None
    df = pd.DataFrame({"ts": ts, "c": vals, "v": rng.normal(size=n)})
    aggs = [Agg.distinct_count("c", "dc"), Agg.topn_frequency("c", 3, "tf"),
            Agg.top1_ratio("c", "t1")]
    fast = compute_window_features(df, "ts", aggs, rows_range(500))
    exact = compute_window_features(df, "ts", aggs + [Agg.top("v", 2, "_f")], rows_range(500))
    assert fast["dc"].tolist() == exact["dc"].tolist()
    assert [str(x) for x in fast["tf"]] == [str(x) for x in exact["tf"]]
    a = pd.to_numeric(fast["t1"], errors="coerce").astype(float)
    b = pd.to_numeric(exact["t1"], errors="coerce").astype(float)
    assert np.allclose(a, b, equal_nan=True)


def test_range_end_bound():
    # ROWS_RANGE BETWEEN 3s PRECEDING AND 1s PRECEDING: rows with
    # ts in [cur-3000, cur-1000]; current row excluded by the end bound
    df = mk([1000, 2000, 3000, 4000, 5000], [1.0, 2.0, 3.0, 4.0, 5.0])
    r = feats(df, [Agg.sum("v", "s"), Agg.count_star("c")],
              FrameSpec(range_preceding=3000, range_end=-1000))
    assert r["c"].tolist() == [0, 1, 2, 3, 3]
    assert r["s"].tolist()[1:] == [1.0, 3.0, 6.0, 9.0]


def test_rows_end_bound():
    # ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING (positional end bound)
    df = mk([1000, 2000, 3000, 4000, 5000], [1.0, 2.0, 3.0, 4.0, 5.0])
    r = feats(df, [Agg.sum("v", "s"), Agg.count_star("c")],
              FrameSpec(rows_preceding=3, rows_end=1))
    assert r["c"].tolist() == [0, 1, 2, 3, 3]
    assert r["s"].tolist()[1:] == [1.0, 3.0, 6.0, 9.0]


def test_window_split_family():
    # feature_zero_def.cc window_split*: concatenated splits in window
    # order (newest first, index 0 = current row)
    df = mk([1000, 2000, 3000], ["k1:1,k2:2", "k3:3", "k4:4,k5:5"])
    r = feats(df, [
        Agg.window_split("v", ",", "ws"),
        Agg.window_split_by_key("v", ",", ":", "wk"),
        Agg.window_split_by_value("v", ",", ":", "wv"),
    ], rows(1))
    assert r["ws"].tolist() == [
        ["k1:1", "k2:2"], ["k3:3", "k1:1", "k2:2"], ["k4:4", "k5:5", "k3:3"]]
    assert r["wk"].tolist() == [["k1", "k2"], ["k3", "k1", "k2"], ["k4", "k5", "k3"]]
    assert r["wv"].tolist() == [["1", "2"], ["3", "1", "2"], ["4", "5", "3"]]


def test_rejects_non_integer_order_key():
    # test_window_row_range.yaml cases 9-11: date/string ORDER BY → error
    df = pd.DataFrame({"ts": pd.to_datetime(["2020-05-01", "2020-05-02"]),
                       "v": [1.0, 2.0]})
    with pytest.raises(TypeError, match="integer epoch"):
        feats(df, [Agg.sum("v", "s")], rows(2))
    df2 = pd.DataFrame({"ts": ["a", "b"], "v": [1.0, 2.0]})
    with pytest.raises(TypeError):
        feats(df2, [Agg.sum("v", "s")], rows(2))
