"""Golden cases transcribed from the reference's YAML conformance corpus
(/root/reference/cases/...). Expected outputs are the reference's own
numbers; file:line cited per case. Kernel-level (fast) plus a Ray-stage
spot check."""

import numpy as np
import pandas as pd
import pytest

from openmldb_ray.core.aggregates import Agg
from openmldb_ray.core.frames import FrameSpec
from openmldb_ray.core.window_fast import compute_window_features


def run_case(rows, frame, aggs=None):
    df = pd.DataFrame(rows, columns=["id", "ts", "v"])
    out = compute_window_features(df, "ts", aggs or [Agg.sum("v", "s")], frame)
    return out.sort_values("id")["s"].tolist()


# --- cases/function/window/test_maxsize.yaml:19-66 -------------------------
MAXSIZE_ROWS = [[i + 1, 1590738990000 + i, 30 + i] for i in range(5)]


def test_maxsize_case0_smaller_than_window():
    # ROWS_RANGE 6 PRECEDING MAXSIZE 3 → [30,61,93,96,99]
    got = run_case(MAXSIZE_ROWS, FrameSpec(range_preceding=6, max_size=3))
    assert got == [30, 61, 93, 96, 99]


def test_maxsize_case1_larger_than_window():
    # ROWS_RANGE 2 PRECEDING MAXSIZE 5 → [30,61,93,96,99]
    got = run_case(MAXSIZE_ROWS, FrameSpec(range_preceding=2, max_size=5))
    assert got == [30, 61, 93, 96, 99]


# --- cases/function/window/test_window_exclude_current_time.yaml:15-56 -----
ECT_ROWS0 = [
    [-2, 0, 1.0], [-1, 0, 1.0], [0, 0, 1.0],
    [1, 1590738990000, 1.0], [2, 1590738990000, 1.0],
    [3, 1590738992000, 1.0], [4, 1590738993000, 1.0],
    [5, 1590738994000, 1.0], [6, 1590738994000, 1.0],
    [7, 1590738999000, 1.0], [8, 1590739001000, 1.0], [9, 1590739002000, 1.0],
]


def test_exclude_current_time_open_preceding_case0():
    # ROWS_RANGE 4s OPEN PRECEDING EXCLUDE CURRENT_TIME; ts=0 rows are VALID
    frame = FrameSpec(range_preceding=4000, open_range=True, exclude_current_time=True)
    got = run_case(ECT_ROWS0, frame)
    assert got == [1.0, 1.0, 1.0, 1.0, 1.0, 3.0, 4.0, 3.0, 3.0, 1.0, 2.0, 3.0]


def test_exclude_current_time_maxsize2_case1():
    # yaml :59-90: MAXSIZE 2 OPEN PRECEDING EXCLUDE CURRENT_TIME
    rows = ECT_ROWS0[3:]
    frame = FrameSpec(range_preceding=4000, open_range=True, max_size=2,
                      exclude_current_time=True)
    got = run_case(rows, frame)
    assert got == [1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 1.0, 2.0, 2.0]


# --- same-timestamp ROWS cases (yaml :648-715) ------------------------------
SAME_TS = (
    [[i, 1590738990000, 1.0] for i in range(1, 7)]
    + [[7, 1590738991000, 1.0], [8, 1590738992000, 1.0], [9, 1590738993000, 1.0]]
)


def test_rows_window_same_timestamp_case17():
    got = run_case(SAME_TS, FrameSpec(rows_preceding=3))
    assert got == [1.0, 2.0, 3.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0]


def test_rows_window_same_timestamp_exclude_ct_case18():
    got = run_case(SAME_TS, FrameSpec(rows_preceding=3, exclude_current_time=True))
    assert got == [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 4.0, 4.0, 4.0]


def test_mixed_windows_case19():
    # yaml :716-760 — six windows incl. ROWS n OPEN PRECEDING (caps at n rows)
    expects = {
        "w1": ([1, 2, 3, 4, 4, 4, 4, 4, 4], FrameSpec(rows_preceding=3)),
        "w2": ([1, 2, 3, 3, 3, 3, 3, 3, 3], FrameSpec(rows_preceding=3, open_range=True)),
        "w3": ([1, 1, 1, 1, 1, 1, 3, 3, 3],
               FrameSpec(rows_preceding=3, open_range=True, exclude_current_time=True)),
        "w4": ([1, 2, 3, 4, 5, 6, 7, 8, 9], FrameSpec(range_preceding=3000)),
        "w5": ([1, 2, 3, 4, 5, 6, 7, 8, 3],
               FrameSpec(range_preceding=3000, open_range=True)),
        "w6": ([1, 1, 1, 1, 1, 1, 7, 8, 3],
               FrameSpec(range_preceding=3000, open_range=True, exclude_current_time=True)),
    }
    for name, (exp, frame) in expects.items():
        got = run_case(SAME_TS, frame)
        assert got == [float(x) for x in exp], name


# --- cases/function/join/test_lastjoin_simple.yaml:19-87 --------------------


def test_lastjoin_simple_cases_1_2_3(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.join_stage import last_join

    left = pd.DataFrame({
        "c1": ["aa", "bb", "cc"], "c2": [2, 21, 41],
        "c3": [3, 31, 51], "c4": [1590738989000, 1590738990000, 1590738991000],
    })
    # case 3 variant: bb has two matches, max c3 wins (131)
    right = pd.DataFrame({
        "c1": ["aa", "bb", "bb", "dd"], "rc2": [2, 21, 41, 99],
        "rc3": [13, 131, 121, 151],
        "rc4": [1590738989000, 1590738990000, 1590738991000, 1590738991000],
    })
    out = last_join(
        rd.from_pandas(left), rd.from_pandas(right), ("c1", "c1"),
        order_by="rc3",
        right_cols={"rc3": "rc3", "rc4": "rc4"},
        strategy="broadcast",
    ).to_pandas().sort_values("c1").reset_index(drop=True)
    assert out["rc3"].tolist()[:2] == [13, 131]
    assert pd.isna(out["rc3"].iloc[2])  # cc: no match → NULLs (case 2)
    assert pd.isna(out["rc4"].iloc[2])


def test_window_stage_golden_through_ray(ray_session):
    """End-to-end spot check: maxsize case 0 through the Ray window stage."""
    import ray.data as rd

    from openmldb_ray.stages.window_stage import window_agg

    df = pd.DataFrame(MAXSIZE_ROWS, columns=["id", "c7", "c4"])
    df["c1"] = "aa"
    out = window_agg(
        rd.from_pandas(df), "c1", "c7",
        [Agg.sum("c4", "w1_c4_sum")],
        FrameSpec(range_preceding=6, max_size=3), tiebreak="id",
    ).to_pandas().sort_values("id")
    assert out["w1_c4_sum"].tolist() == [30, 61, 93, 96, 99]


# --- cases/function/window/test_window_union.yaml ---------------------------

UNION_COLS = ["id", "c1", "c3", "c4", "c7"]


def _mk_union_df(rows):
    return pd.DataFrame(rows, columns=UNION_COLS)


def test_window_union_yaml_case0(ray_session):
    # yaml :19-42 正常union: ROWS 2 PRECEDING over c3 partitions
    import ray.data as rd

    from openmldb_ray.stages.window_stage import window_agg

    primary = _mk_union_df([
        [1, "aa", 20, 30, 1590738990000],
        [4, "dd", 20, 33, 1590738993000],
        [5, "ee", 21, 34, 1590738994000],
    ])
    union = _mk_union_df([
        [2, "bb", 20, 31, 1590738991000],
        [3, "cc", 20, 32, 1590738992000],
    ])
    out = window_agg(
        rd.from_pandas(primary), "c3", "c7",
        [Agg.sum("c4", "w1_c4_sum")], FrameSpec(rows_preceding=2),
        union=rd.from_pandas(union), tiebreak="id",
    ).to_pandas().sort_values("id")
    assert out["id"].tolist() == [1, 4, 5]
    assert out["w1_c4_sum"].tolist() == [30, 96, 34]


def test_window_union_yaml_case8_multi_table(ray_session):
    # yaml :193-219 union多表: UNION {1},{2} ROWS 3 PRECEDING
    import ray.data as rd

    from openmldb_ray.stages.window_stage import window_agg

    primary = _mk_union_df([
        [1, "aa", 20, 30, 1590738990000],
        [4, "dd", 20, 33, 1590738993000],
        [5, "dd", 20, 33, 1590738994000],
        [6, "ee", 21, 34, 1590738995000],
    ])
    u1 = _mk_union_df([[3, "cc", 20, 32, 1590738992000]])
    u2 = _mk_union_df([[2, "bb", 20, 31, 1590738991000]])
    out = window_agg(
        rd.from_pandas(primary), "c3", "c7",
        [Agg.sum("c4", "w1_c4_sum")], FrameSpec(rows_preceding=3),
        union=rd.from_pandas(u1).union(rd.from_pandas(u2)), tiebreak="id",
    ).to_pandas().sort_values("id")
    assert out["w1_c4_sum"].tolist() == [30, 126, 129, 34]


def test_window_union_yaml_case10_two_pks(ray_session):
    # yaml :245-269 两个pk: PARTITION BY c1, c3
    import ray.data as rd

    from openmldb_ray.stages.window_stage import window_agg

    primary = _mk_union_df([
        [1, "aa", 20, 30, 1590738990000],
        [4, "aa", 20, 33, 1590738993000],
        [5, "ee", 21, 34, 1590738994000],
        [6, "ee", 21, 33, 1590738995000],
    ])
    union = _mk_union_df([
        [2, "aa", 20, 31, 1590738991000],
        [3, "aa", 20, 32, 1590738992000],
    ])
    out = window_agg(
        rd.from_pandas(primary), ["c1", "c3"], "c7",
        [Agg.sum("c4", "w1_c4_sum")], FrameSpec(rows_preceding=2),
        union=rd.from_pandas(union), tiebreak="id",
    ).to_pandas().sort_values("id")
    assert out["w1_c4_sum"].tolist() == [30, 96, 34, 67]


def test_lastjoin_then_window_yaml_complex_case0(ray_session):
    # cases/function/join/test_lastjoin_complex.yaml:19-59 — LAST JOIN
    # feeding a window over the joined column (ROWS 1 PRECEDING)
    import ray.data as rd

    from openmldb_ray.stages.join_stage import last_join
    from openmldb_ray.stages.window_stage import window_agg

    left = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "c1": ["aa", "aa", "aa", "bb", "bb"],
        "c3": [20, 21, 22, 23, 24],
        "c7": [1590738990000, 1590738990001, 1590738990002,
               1590738990003, 1590738990004],
    })
    right = pd.DataFrame({
        "c1": ["aa", "aa", "aa", "bb", "bb"],
        "rc4": [30, 31, 32, 33, 34],
        "rc7": [1590738990000, 1590738990001, 1590738990002,
                1590738990003, 1590738990004],
    })
    joined = last_join(
        rd.from_pandas(left), rd.from_pandas(right), ("c1", "c1"),
        order_by="rc7", right_cols={"rc4": "c4"}, strategy="broadcast",
    )
    out = window_agg(
        joined, "c1", "c7", [Agg.sum("c4", "w1_c4_sum")],
        FrameSpec(rows_preceding=1), tiebreak="id",
    ).to_pandas().sort_values("id")
    assert out["c4"].tolist() == [32, 32, 32, 34, 34]
    assert out["w1_c4_sum"].tolist() == [32, 64, 64, 34, 68]


# --- cases/function/window/test_current_row.yaml:19-109 ---------------------

CR_ROWS = [
    [20, 1590738990000, 30], [21, 1590738991000, 31],
    [22, 1590738992000, 32], [23, 1590738993000, 33],
]
CR_ROWS_TIE = [
    [20, 1590738990000, 30], [21, 1590738990000, 31],
    [22, 1590738992000, 32], [23, 1590738993000, 33],
]


def _sums(rows, frame):
    df = pd.DataFrame(rows, columns=["id", "ts", "v"])
    out = compute_window_features(df, "ts", [Agg.sum("v", "s")], frame)
    return [None if pd.isna(x) else int(x) for x in out.sort_values("id")["s"]]


def test_current_row_case0_rows():
    got = _sums(CR_ROWS, FrameSpec(rows_preceding=2, exclude_current_row=True))
    assert got == [None, 30, 61, 63]


def test_current_row_case1_rows_range():
    got = _sums(CR_ROWS, FrameSpec(range_preceding=2000, exclude_current_row=True))
    assert got == [None, 30, 61, 63]


def test_current_row_case2_rows_with_tie():
    # same-ts earlier arrivals ARE visible with EXCLUDE CURRENT_ROW alone
    got = _sums(CR_ROWS_TIE, FrameSpec(rows_preceding=2, exclude_current_row=True))
    assert got == [None, 30, 61, 63]


def test_current_row_case3_rows_range_with_tie():
    got = _sums(CR_ROWS_TIE, FrameSpec(range_preceding=2000, exclude_current_row=True))
    assert got == [None, 30, 61, 32]


# --- cases/function/window/test_window_row.yaml:19-120 ----------------------


@pytest.mark.parametrize("pk_vals,ids,expect", [
    # case 0: string partition key
    (["aa", "aa", "aa", "aa", "bb"], [20, 21, 22, 23, 24], [30, 61, 93, 96, 34]),
    # case 1: int partition key
    ([20, 20, 20, 20, 21], [1, 2, 3, 4, 5], [30, 61, 93, 96, 34]),
    # case 2/3: float/double partition key (offline supports it)
    ([1.1, 1.1, 1.1, 1.1, 1.2], [1, 2, 3, 4, 5], [30, 61, 93, 96, 34]),
], ids=["string-pk", "int-pk", "float-pk"])
def test_window_row_yaml_partition_key_types(ray_session, pk_vals, ids, expect):
    import ray.data as rd

    from openmldb_ray.stages.window_stage import window_agg

    df = pd.DataFrame({
        "id": ids, "pk": pk_vals,
        "c7": [1590738990000 + i * 1000 for i in range(5)],
        "c4": [30, 31, 32, 33, 34],
    })
    out = window_agg(rd.from_pandas(df), "pk", "c7",
                     [Agg.sum("c4", "w1_c4_sum")], FrameSpec(rows_preceding=2),
                     tiebreak="id").to_pandas().sort_values("id")
    assert out["w1_c4_sum"].tolist() == expect
