"""Round-2 regression tests: ADVICE/VERDICT r1 fixes.

Covers: count-NULL semantics on the native groupby path, salted-window
merged-frame guard, char/hex/unhex/log scalar parity (reference
hybridse/src/udf/udf.cc:60-111,258), LAST JOIN residual ON conditions
(cases/function/join/test_lastjoin_simple.yaml:128-153 case 4-2), null
right-side order keys, hot-key-salted shuffle LAST JOIN equivalence, and
string-id dedup through the distributed anti-join.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rd(df: pd.DataFrame):
    import ray.data

    return ray.data.from_pandas(df)


def test_native_groupby_count_ignores_nulls(ray_session):
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.stages.relational import group_aggregate

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b"],
        "v": [1.0, None, 3.0, None, None],
    })
    out = group_aggregate(_rd(df), "k",
                          [Agg.count("v", "cnt_v"), Agg.sum("v", "sum_v")]
                          ).to_pandas().sort_values("k").reset_index(drop=True)
    # count(col) counts NON-NULL values (reference count semantics)
    assert out["cnt_v"].tolist() == [2, 0]
    assert out["sum_v"].tolist()[0] == 4.0


def test_salted_window_rejects_merged_and_rows_frames(ray_session):
    from openmldb_ray.core.aggregates import Agg
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.stages.window_stage import window_agg_salted

    ds = _rd(pd.DataFrame({"k": ["a"], "ts": [0], "v": [1.0]}))
    for bad in (FrameSpec(rows_preceding=2),
                FrameSpec(rows_preceding=2, range_preceding=1000)):
        with pytest.raises(ValueError):
            window_agg_salted(ds, "k", "ts", [Agg.sum("v")], bad, bucket_ms=10_000)


def test_scalar_char_hex_unhex_log():
    from openmldb_ray.functions.scalar import get

    assert get("char")(pa.array([65, 97, 256 + 66, None])).to_pylist() == \
        ["A", "a", "B", None]
    # hex("Spark SQL") from the reference docstring (default_udf_library.cc:600)
    assert get("hex")(pa.array(["Spark SQL"])).to_pylist() == ["537061726B2053514C"]
    assert get("unhex")(pa.array(["537061726B2053514C", "7B", "zfk"])).to_pylist() == \
        ["Spark SQL", "{", None]
    # log(x) = ln; log(base, x) = log_base(x) (base-first, reference arg order)
    assert get("log")(pa.array([1.0])).to_pylist() == [0.0]
    two = get("log")(pa.array([10.0, 2.0]), pa.array([100.0, 8.0])).to_pylist()
    assert np.allclose(two, [2.0, 3.0])


CASE_42_LEFT = pd.DataFrame({  # test_lastjoin_simple.yaml case 4-2
    "c1": ["aa", "aa", "bb", "dd"],
    "c2": [2, 20, 21, 41],
    "c3l": [3, 30, 31, 51],
    "c4": [1590738989000, 1590738991000, 1590738990000, 1590738990000],
})
CASE_42_RIGHT = pd.DataFrame({
    "c1": ["aa", "aa", "aa", "bb", "cc"],
    "c2": [2, 3, 4, 21, 41],
    "c3": [13, 14, 15, 131, 121],
    "c4": [1590738989000, 1590738990000, 1590738991000, 1590738990000, 1590738991000],
})


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_last_join_residual_condition(ray_session, strategy):
    """ON {0}.c1={1}.c1 AND {0}.c4={1}.c4 — the second clause as a residual."""
    from openmldb_ray.stages.join_stage import last_join

    out = last_join(
        _rd(CASE_42_LEFT), _rd(CASE_42_RIGHT), "c1",
        right_cols={"c3": "r_c3", "c4": "r_c4"},
        residual=lambda m: (m["c4"] == m["r_c4"]).to_numpy(),
        strategy=strategy,
    ).to_pandas().sort_values("c2").reset_index(drop=True)
    assert out["r_c3"].tolist()[:3] == [13.0, 15.0, 131.0]
    assert pd.isna(out["r_c3"].iloc[3])
    assert pd.isna(out["r_c4"].iloc[3])


def test_last_join_null_right_order_keys(ray_session):
    """Null right order values must be ignored, not crash merge_asof."""
    from openmldb_ray.stages.join_stage import last_join

    left = pd.DataFrame({"k": ["a", "b"], "ts": [100, 100]})
    right = pd.DataFrame({"k": ["a", "a", "b"], "ots": [50, None, None],
                          "val": [1.0, 2.0, 3.0]})
    out = last_join(_rd(left), _rd(right), "k", order_by="ots",
                    asof_left_ts="ts", right_cols={"val": "val"},
                    strategy="broadcast").to_pandas().sort_values("k")
    assert out["val"].tolist()[0] == 1.0
    assert pd.isna(out["val"].tolist()[1])


def test_last_join_hot_key_salted_equals_broadcast(ray_session):
    """70%-mass join key: salted shuffle path == broadcast reference."""
    from openmldb_ray.stages.join_stage import last_join

    rng = np.random.default_rng(7)
    n = 4000
    keys = np.where(rng.random(n) < 0.7, "hot", rng.choice(list("abcdef"), n))
    left = pd.DataFrame({
        "k": keys, "ts": rng.integers(0, 10_000, n), "lid": np.arange(n)})
    right = pd.DataFrame({
        "k": ["hot", "hot", "a", "b", "c"],
        "ots": [100, 5000, 50, 60, 70],
        "price": [1.0, 2.0, 3.0, 4.0, 5.0],
        "rid": [0, 1, 2, 3, 4]})
    kw = dict(order_by="ots", asof_left_ts="ts", tiebreak="rid",
              right_cols={"price": "price"})
    ref = last_join(_rd(left), _rd(right), "k", strategy="broadcast", **kw) \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    salted = last_join(_rd(left), _rd(right), "k", strategy="shuffle",
                       skew_salts=4, hot_key_threshold=0.05, **kw) \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(ref["price"], salted["price"])


def test_minhash_dedup_string_ids(ray_session):
    """String doc ids flow through LSH + the distributed anti-join."""
    from openmldb_ray.stages.dedup import minhash_lsh_dedup

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest looking for more interesting food")
    docs = pd.DataFrame({
        "doc_id": [f"doc-{i:03d}" for i in range(30)],
        "text": [base + f" unique tail {i} {'x' * (i % 7)}" for i in range(28)]
        + [base + " unique tail 0 ", base + " unique tail 1 x"],
    })
    out = minhash_lsh_dedup(_rd(docs), "text", "doc_id",
                            jaccard_threshold=0.9).to_pandas()
    assert set(out.columns) >= {"doc_id", "text"}
    # the two planted near-dups of doc-000/doc-001 are dropped, originals kept
    assert "doc-000" in set(out["doc_id"])
    assert len(out) < 30
    assert out["doc_id"].is_unique


def test_minhash_rejects_bad_band_split():
    from openmldb_ray.stages.dedup import minhash_lsh_dedup

    with pytest.raises(ValueError):
        minhash_lsh_dedup(None, "t", "i", num_perm=64, bands=10)


def test_farmhash_bit_exact():
    """hash64 == farmhash::Fingerprint64 over raw LE bytes — reference
    vectors from cases/function/function/test_udf_function.yaml ids 4/5."""
    import struct

    import numpy as np

    from openmldb_ray.functions.farmhash import (fingerprint64,
                                                 fingerprint64_fixed)

    def sgn(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    assert sgn(fingerprint64(struct.pack("<h", 90))) == -9205917472348398353
    assert sgn(fingerprint64(struct.pack("<i", 90))) == -3754664774081171349
    assert sgn(fingerprint64(struct.pack("<q", 90))) == -6110541762027922508
    assert sgn(fingerprint64(struct.pack("<d", 90.0))) == 42123122574000053
    assert sgn(fingerprint64(struct.pack("<f", 90.0))) == 3717229009355585768
    assert sgn(fingerprint64(b"g1")) == 3208330103598489124
    assert sgn(fingerprint64(struct.pack("<q", 1590115420000))) \
        == 4361965398422314040
    d = ((2020 - 1900) << 16) | ((7 - 1) << 8) | 15  # OpenMLDB Date packing
    assert sgn(fingerprint64(struct.pack("<i", d))) == -8740639806462273876
    assert sgn(fingerprint64(b"\x01")) == 5161771770385946686   # bool true
    assert fingerprint64(b"abc") == 2640714258260161385  # published vector
    assert fingerprint64(b"") == 11160318154034397263
    # vectorized fixed-width path parity with the scalar path
    for width, fmt, vals in [(8, "<q", [1, -7, 1590115420000]),
                             (4, "<i", [0, -1, 7865871]),
                             (2, "<h", [55, -90]), (1, "<b", [0, 1])]:
        le = np.array([int.from_bytes(struct.pack(fmt, v), "little")
                       for v in vals], dtype=np.uint64)
        vec = fingerprint64_fixed(le, width)
        assert [int(x) for x in vec] == [
            fingerprint64(struct.pack(fmt, v)) for v in vals]


def test_hash64_typed_arrays():
    """hash64 dispatches on the Arrow type (same value, different bytes)."""
    import pyarrow as pa

    from openmldb_ray.functions.scalar import REGISTRY

    h = REGISTRY["hash64"]
    assert h(pa.array([90], pa.int16())).to_pylist() == [-9205917472348398353]
    assert h(pa.array([90], pa.int32())).to_pylist() == [-3754664774081171349]
    assert h(pa.array([90], pa.int64())).to_pylist() == [-6110541762027922508]
    assert h(pa.array([90.0], pa.float64())).to_pylist() == [42123122574000053]
    assert h(pa.array([90.0], pa.float32())).to_pylist() == [3717229009355585768]
    assert h(pa.array(["g1", None])).to_pylist() == [3208330103598489124, None]
    assert h(pa.array([None, True, False], pa.bool_())).to_pylist() == \
        [None, 5161771770385946686, -4728684028706075820]
    import datetime
    assert h(pa.array([datetime.date(2020, 7, 15)])).to_pylist() == \
        [-8740639806462273876]
    assert h(pa.array([1590115420000], pa.timestamp("ms"))).to_pylist() == \
        [4361965398422314040]


def test_substr_reference_semantics():
    """sub_string edge cases (udf.cc:1048-1097) incl. column-valued args."""
    import pyarrow as pa

    from openmldb_ray.functions.scalar import REGISTRY

    sub = REGISTRY["substring"]
    s = pa.array(["hello world", None, "abc"])
    # scalar fast path
    assert sub(s, 1, 5).to_pylist() == ["hello", None, "abc"]
    # pos == 0 -> empty string, not NULL
    assert sub(s, 0, 3).to_pylist() == ["", None, ""]
    # len < 1 -> empty
    assert sub(s, 2, 0).to_pylist() == ["", None, ""]
    # negative pos counts from end
    assert sub(s, -3, 3).to_pylist() == ["rld", None, "abc"]
    # pos out of range -> empty
    assert sub(s, 99, 2).to_pylist() == ["", None, ""]
    # column-valued length with NULLs -> NULL rows
    lens = pa.array([5, 2, None], pa.int32())
    assert sub(s, 1, lens).to_pylist() == ["hello", None, None]
    # column-valued pos
    poss = pa.array([7, 1, -2], pa.int32())
    assert sub(s, poss, 2).to_pylist() == ["wo", None, "bc"]
