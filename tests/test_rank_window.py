"""rank_window: per-key SQL rank-function family vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.rank import rank_window

ALL_OUTS = {"rn": "row_number", "rk": "rank", "dr": "dense_rank",
            "pr": "percent_rank", "nt": ("ntile", 4)}

ORACLE = """
  SELECT id,
    ROW_NUMBER() OVER wt AS rn, NTILE(4) OVER wt AS nt,
    RANK() OVER w AS rk, DENSE_RANK() OVER w AS dr,
    PERCENT_RANK() OVER w AS pr
  FROM df
  WINDOW w  AS (PARTITION BY k ORDER BY v {dirn} NULLS LAST),
         wt AS (PARTITION BY k ORDER BY v {dirn} NULLS LAST, id)
  ORDER BY id"""


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(41)
    n = 8_000
    df = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 53, n),
        # heavy ties + ~7% nulls to exercise the tie runs / NULLS LAST path
        "v": np.where(rng.random(n) < 0.07, np.nan,
                      rng.integers(0, 20, n).astype(float)),
    })
    # one singleton partition (percent_rank must be 0, ntile = 1)
    df.loc[n - 1, "k"] = 999
    return df


def _run(df, parts, **kw):
    ds = ray.data.from_pandas(df).repartition(parts)
    out = rank_window(ds, "v", key_col="k", tiebreak="id",
                      outs=ALL_OUTS, **kw).to_pandas()
    return out.sort_values("id").reset_index(drop=True)


@pytest.mark.parametrize("desc", [False, True])
def test_duckdb_parity(ray_session, data, desc):
    df = data  # noqa: F841 - duckdb replacement scan resolves local names
    out = _run(data, 7, descending=desc)
    oracle = duckdb.sql(
        ORACLE.format(dirn="DESC" if desc else "ASC")).df()
    for c in ["rn", "rk", "dr", "nt"]:
        assert (out[c].to_numpy() == oracle[c].to_numpy()).all(), c
    assert np.allclose(out["pr"].to_numpy(), oracle["pr"].to_numpy())


def test_split_invariance(ray_session, data):
    a = _run(data, 3)
    b = _run(data, 17, num_buckets=8)
    pd.testing.assert_frame_equal(a, b)


def test_string_order_and_null_keys(ray_session):
    rng = np.random.default_rng(5)
    n = 2_000
    df = pd.DataFrame({
        "id": np.arange(n),
        "k": pd.Series(np.where(rng.random(n) < 0.05, None,
                                rng.integers(0, 9, n).astype(str)),
                       dtype=object),
        "v": rng.choice(list("abcde"), n),
    })
    out = _run(df, 5)
    oracle = duckdb.sql(ORACLE.format(dirn="ASC")).df()
    for c in ["rn", "rk", "dr", "nt"]:
        assert (out[c].to_numpy() == oracle[c].to_numpy()).all(), c


def test_ntile_small_groups(ray_session):
    # n < k: every row its own tile, exactly SQL's dealing rule
    df = pd.DataFrame({"id": [0, 1, 2], "k": [1, 1, 2],
                       "v": [5.0, 3.0, 9.0]})
    ds = ray.data.from_pandas(df)
    out = rank_window(ds, "v", key_col="k", tiebreak="id",
                      outs={"nt": ("ntile", 4)}).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out["nt"].tolist() == [2, 1, 1]


def test_row_number_requires_tiebreak(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="tiebreak"):
        rank_window(ds, "v", key_col="k", outs={"rn": "row_number"})
    with pytest.raises(ValueError, match="unknown rank function"):
        rank_window(ds, "v", key_col="k", outs={"x": "median"})
