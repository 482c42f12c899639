"""INTERSECT / EXCEPT (distinct) — DuckDB parity, nulls, split-invariance."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from openmldb_ray.stages.setops import except_distinct, intersect_distinct


def _df_a():
    return pd.DataFrame({
        "k": [1, 1, 2, 3, None, None, 4, 5],
        "s": ["x", "x", "y", "z", "n", "n", None, "w"],
    })


def _df_b():
    return pd.DataFrame({
        "k": [1, 2, 2, None, 4, 9],
        "s": ["x", "q", "q", "n", None, "x"],
    })


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    key = df.astype(str).apply(lambda r: "|".join(r.values), axis=1)
    return df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


def _duck(op: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("ta", _df_a())
    con.register("tb", _df_b())
    return con.sql(f"SELECT * FROM ta {op} SELECT * FROM tb").df()


@pytest.mark.parametrize("op,fn", [("INTERSECT", intersect_distinct),
                                   ("EXCEPT", except_distinct)])
def test_duckdb_parity_with_nulls(ray_session, op, fn):
    got = fn(rd.from_pandas(_df_a()), rd.from_pandas(_df_b())).to_pandas()
    want = _duck(op)
    a, b = _norm(got), _norm(want)
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].fillna("<null>").astype(str)
                == b[c].fillna("<null>").astype(str)).all(), c


@pytest.mark.parametrize("fn", [intersect_distinct, except_distinct])
def test_split_invariance(ray_session, fn):
    one = fn(rd.from_pandas(_df_a()), rd.from_pandas(_df_b())).to_pandas()
    many = fn(rd.from_pandas(_df_a()).repartition(5),
              rd.from_pandas(_df_b()).repartition(3)).to_pandas()
    assert _norm(one).equals(_norm(many))


def test_output_distinct_and_column_align(ray_session):
    # b's columns in a different order must still match by name
    b = rd.from_pandas(_df_b()[["s", "k"]])
    out = intersect_distinct(rd.from_pandas(_df_a()), b).to_pandas()
    assert not out.duplicated().any()
    assert sorted(out.columns) == ["k", "s"]


def test_schema_mismatch_raises(ray_session):
    a = rd.from_pandas(pd.DataFrame({"x": [1]}))
    b = rd.from_pandas(pd.DataFrame({"y": [1]}))
    with pytest.raises(ValueError, match="schemas differ"):
        intersect_distinct(a, b)


def test_int_keys_past_2_53(ray_session):
    # canonicalization must not round int64 through float64
    big = 2**53
    a = rd.from_pandas(pd.DataFrame({"k": [big + 1, big + 2]}))
    b = rd.from_pandas(pd.DataFrame({"k": [big + 1, big + 3]}))
    got = intersect_distinct(a, b).to_pandas()
    assert got["k"].tolist() == [big + 1]


def test_stable_hash64_null_representations_agree():
    """Engine-wide shuffle-key invariant: every physical representation of
    a null (float NaN, Arrow null, object None, Arrow null-TYPED column
    from an all-NA pandas concat, masked Int64, bool null) must hash to
    the one fixed null value — else a null key splits across buckets
    depending on which block its row landed in (found via set-op
    split-invariance: repartition degraded an all-None slice to a
    null-typed column that hashed None as an object)."""
    import pyarrow as pa

    from openmldb_ray.core.hashing import _NULL_HASH, stable_hash64

    reps = [
        pd.Series([1.0, np.nan]),
        pa.array([1.0, None], pa.float64()),
        pa.array([1, None], pa.int64()),
        pd.Series(["a", None]),
        pa.array(["a", None], pa.string()),
        pa.array([None, None], pa.null()),
        pa.array([True, None], pa.bool_()),
        pd.Series([1, None], dtype="Int64"),
    ]
    for v in reps:
        assert stable_hash64(v)[-1] == _NULL_HASH, v
    # and non-null values must hash identically in null-carrying vs
    # null-free blocks of the same logical type
    for one, two in [
        (pa.array([5], pa.int64()), pa.array([5, None], pa.int64())),
        (pa.array(["a"], pa.string()), pa.array(["a", None], pa.string())),
        (pa.array([True], pa.bool_()), pa.array([True, None], pa.bool_())),
    ]:
        assert stable_hash64(one)[0] == stable_hash64(two)[0]
