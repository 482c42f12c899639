"""Empty-input contract for the join family and reshaping ops.

Ray's map machinery SKIPS empty blocks, and ``to_pandas()`` over an
all-empty dataset drops column names — both found by the round-3
fuzz/robustness sweep. Guarantees pinned here:

- NO operator crashes on a legitimately rowless input (the empty-right
  broadcast collects used to KeyError on the join key; pivot's category
  scan used to KeyError on its internal column).
- Broadcast joins with an empty RIGHT return the correct rows (left rows
  for the outer flavors, zero for inner) with a TYPED schema.
- ``last_join``/``resample_asof`` keep a typed schema even when the LEFT
  side is empty (the 0-row seed block, join_stage._seed_typed_empty).
"""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.join_stage import (cross_join, full_outer_join,
                                            inner_join, last_join, left_join)
from openmldb_ray.stages.reshape import collect_list, pivot_agg


def _empty():
    return pd.DataFrame({"k": pd.array([], dtype="int64"),
                         "v": pd.array([], dtype="float64"),
                         "id": pd.array([], dtype="int64")})


def _full():
    return pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0], "id": [0, 1]})


@pytest.fixture
def fds(ray_session):
    return ray.data.from_pandas(_full())


@pytest.fixture
def rw(ray_session):
    return ray.data.from_pandas(
        _empty()[["k", "v"]].rename(columns={"v": "w"}))


def test_joins_empty_right_typed(fds, rw):
    out = inner_join(fds, rw, ("k", "k"))
    assert out.count() == 0 and out.schema() is not None

    out = left_join(fds, rw, ("k", "k"))
    df = out.to_pandas()
    assert len(df) == 2 and df["w"].isna().all()

    out = last_join(fds, ray.data.from_pandas(
        _empty().rename(columns={"v": "w"})), ("k", "k"), order_by="id")
    df = out.to_pandas()
    assert len(df) == 2 and df["w"].isna().all()

    out = cross_join(fds, rw.drop_columns(["k"]))
    assert out.count() == 0 and out.schema() is not None


def test_joins_empty_left_no_crash(ray_session, fds):
    eds = ray.data.from_pandas(_empty())
    for mk in (lambda: inner_join(eds, fds, ("k", "k")),
               lambda: left_join(eds, fds, ("k", "k")),
               lambda: full_outer_join(
                   eds, ray.data.from_pandas(
                       _empty()[["k", "v"]].rename(columns={"v": "w"})),
                   ("k", "k"))):
        assert mk().count() == 0

    out = last_join(eds, fds, ("k", "k"), order_by="id",
                    right_cols={"v": "rv"})
    assert out.count() == 0
    sch = out.schema()          # the typed 0-row seed block
    assert sch is not None and "rv" in sch.names


def test_reshape_empty_no_crash(ray_session):
    eds = ray.data.from_pandas(_empty())
    assert collect_list(eds, "k", "v", sort_by="id").count() == 0
    pv = pivot_agg(ray.data.from_pandas(pd.DataFrame({
        "k": pd.array([], dtype="int64"),
        "cat": pd.array([], dtype="string"),
        "v": pd.array([], dtype="float64")})), "k", "cat", "v", agg="sum")
    assert pv.count() == 0


def test_named_pandas_restores_columns(ray_session):
    from openmldb_ray.stages.join_stage import _named_pandas

    eds = ray.data.from_pandas(_empty())
    df = _named_pandas(eds)
    assert list(df.columns) == ["k", "v", "id"] and len(df) == 0
