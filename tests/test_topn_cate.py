"""Golden tests for the top_n_{key,value}_{agg}_cate_where UDAF family,
transcribed from the reference's udaf_test.cc (TopNKey*Test at :656-890,
TopNValue*Test at :892-990). The reference's streaming bounded dict is
order-independent (an evicted key can never re-enter), so the batch
evaluator must reproduce these strings exactly."""

import numpy as np
import pytest

from openmldb_ray.core.aggregates import Agg, make_evaluator


def _cols(**named):
    """Build the evaluator column dict from python lists (None = NULL)."""
    out = {}
    for name, values in named.items():
        valid = np.array([v is not None for v in values], dtype=bool)
        if values and all(isinstance(v, str) for v in values if v is not None):
            vals = np.array([("" if v is None else v) for v in values], dtype=object)
        elif any(isinstance(v, bool) for v in values if v is not None):
            vals = np.array([bool(v) if v is not None else False for v in values])
        else:
            vals = np.array([0 if v is None else v for v in values], dtype=np.int64)
        out[name] = (vals, valid)
    return out


def _run(kind_by, base, n, values, conds, cats):
    spec = Agg.top_n_cate(base, "v", "c", "k", n, by=kind_by, name="o")
    ev = make_evaluator(spec)
    cols = _cols(v=values, c=conds, k=cats)
    return ev(cols, np.arange(len(values), dtype=np.int64))


V9 = [1, 2, 3, 4, 5, 6, 7, 8, 9]
C6 = [True] * 6 + [False] * 3
K012 = [0, 1, 2, 0, 1, 2, 0, 1, 2]
KXYZ = ["x", "y", "z", "x", "y", "z", "x", "y", "z"]


@pytest.mark.parametrize("base,expected", [
    ("count", "2:2,1:2"), ("sum", "2:9,1:7"),
    ("min", "2:3,1:2"), ("max", "2:6,1:5"),
])
def test_top_n_key_int_cats(base, expected):
    assert _run("key", base, 2, V9, C6, K012) == expected


@pytest.mark.parametrize("base,expected", [
    ("count", "z:2,y:2"), ("sum", "z:9,y:7"),
])
def test_top_n_key_str_cats(base, expected):
    assert _run("key", base, 2, V9, C6, KXYZ) == expected


def test_top_n_key_nulls():
    # udaf_test.cc:730-744 (sum) / :683-695 (count): null value, cond, cat rows
    vals = [1, 2, 3, 4, 5, 6, None]
    conds = [False, None, True, True, True, True, True]
    cats = ["x", "y", "z", "x", "y", None, "x"]
    assert _run("key", "sum", 2, vals, conds, cats) == "z:3,y:5"
    assert _run("key", "count", 2, vals, conds, cats) == "z:1,y:1"


def test_top_n_key_empty():
    assert _run("key", "count", 2, [], [], []) == ""


def test_top_n_value_count():
    # udaf_test.cc:893-920
    assert _run("value", "count", 2, V9, C6, K012) == "2:2,1:2"
    conds = [True, True, False, True, False, False, True, False, False]
    assert _run("value", "count", 2, V9, conds, KXYZ) == "x:3,y:1"
    vals = [1, 2, 3, 4, 5, 6, None, 7]
    conds = [False, None, True, True, True, True, True, True]
    cats = ["x", "y", "z", "x", "y", None, "x", "y"]
    assert _run("value", "count", 2, vals, conds, cats) == "y:2,z:1"
    assert _run("value", "count", 2, [], [], []) == ""


def test_top_n_value_max_min_sum():
    c7 = [True] * 7 + [False] * 2
    assert _run("value", "max", 2, V9, c7, K012) == "0:7,2:6"
    assert _run("value", "max", 1, V9, C6, KXYZ) == "z:6"
    assert _run("value", "min", 2, V9, c7, K012) == "2:3,1:2"
    assert _run("value", "sum", 2, V9, c7, K012) == "0:12,2:9"
    vals = [1, 2, 3, 4, 5, 6, None]
    conds = [False, None, True, True, True, True, True]
    cats = ["x", "y", "z", "x", "y", None, "x"]
    assert _run("value", "max", 2, vals, conds, cats) == "y:5,x:4"
    assert _run("value", "sum", 2, vals, conds, cats) == "y:5,x:4"


def test_top_n_value_avg_reference_float_format():
    c7 = [True] * 7 + [False] * 2
    assert _run("value", "avg", 2, V9, c7, K012) == "2:4.500000,0:4.000000"
    vals = [1, 2, 3, 4, 5, 6, None]
    conds = [False, None, True, True, True, True, True]
    cats = ["x", "y", "z", "x", "y", None, "x"]
    assert _run("value", "avg", 2, vals, conds, cats) == "y:5.000000,x:4.000000"


def test_top_n_in_group_aggregate(ray_session):
    """End-to-end through the GROUP BY exotic path."""
    import pandas as pd
    import ray.data

    from openmldb_ray.stages.relational import group_aggregate

    df = pd.DataFrame({
        "g": ["a"] * 9 + ["b"] * 3,
        "v": V9 + [10, 20, 30],
        "cond": C6 + [True, True, False],
        "cat": K012 + [5, 6, 7],
    })
    out = group_aggregate(
        ray.data.from_pandas(df), "g",
        [Agg.top_n_cate("sum", "v", "cond", "cat", 2, by="key", name="tk"),
         Agg.top_n_cate("max", "v", "cond", "cat", 2, by="value", name="tv")],
    ).to_pandas().sort_values("g").reset_index(drop=True)
    assert out["tk"].tolist() == ["2:9,1:7", "6:20,5:10"]
    assert out["tv"].tolist() == ["2:6,1:5", "6:20,5:10"]
