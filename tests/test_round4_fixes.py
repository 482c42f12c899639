"""Round-4 ADVICE/VERDICT regression tests.

- yaml_runner._arrow_blocks: empty pandas blocks (Ray's sort-based
  Aggregate emits them for empty partitions) must not poison the typed
  writers with Arrow ``null``-typed columns.
- core.sampling.hash_sample: ONE upstream execution, not a count() pass
  plus a scan pass.
- stages.pq rerank: contract violations (shortlist ids absent from the
  vectors source) raise a clear ValueError, not an opaque stack error.
- stages.scale.numeric_stats on pandas-Int64 blocks: exact integer fold
  (the Ray Schema.types ERROR path silently fell back to float64).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from openmldb_ray.core.sampling import hash_sample
from openmldb_ray.sql.yaml_runner import _arrow_blocks
from openmldb_ray.stages.scale import numeric_stats


class _FakeDS:
    """Just enough Dataset surface for _arrow_blocks: raw block refs the
    way to_arrow_refs returns them (Arrow tables AND pandas frames)."""

    def __init__(self, blocks):
        self._refs = [ray.put(b) for b in blocks]

    def to_arrow_refs(self):
        return self._refs

    def schema(self):
        return None


def test_arrow_blocks_drops_empty_pandas_blocks(ray_session):
    full = pa.table({"k": pa.array(["a", "b"]), "v": pa.array([1, 2])})
    blocks = [pd.DataFrame({"k": pd.Series([], dtype=object),
                            "v": pd.Series([], dtype=object)}),
              full,
              pd.DataFrame({"k": ["c"], "v": [3]})]
    out = _arrow_blocks(_FakeDS(blocks))
    # every surviving table must concat against the string-keyed block
    cat = pa.concat_tables(out)
    assert cat.num_rows == 3
    assert cat.schema.field("k").type == pa.string()


def test_arrow_blocks_all_empty_pandas_keeps_names(ray_session):
    blocks = [pd.DataFrame({"k": pd.Series([], dtype=object)}),
              pd.DataFrame({"k": pd.Series([], dtype=object)})]
    out = _arrow_blocks(_FakeDS(blocks))
    assert len(out) == 1 and out[0].num_rows == 0
    assert out[0].column_names == ["k"]


def test_hash_sample_single_upstream_pass(ray_session):
    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    c = Counter.remote()
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"embedding": list(rng.normal(size=(2000, 4)))})

    def bump(b):
        ray.get(c.inc.remote())
        return b

    ds = (ray.data.from_pandas(df).repartition(4)
          .map_batches(bump, batch_format="pandas", batch_size=None))
    s = hash_sample(ds, "embedding", 64)
    assert s.shape == (64, 4)
    # 4 blocks -> exactly one bump per block for a single pass; the old
    # count()+scan implementation executed the upstream twice (8 bumps)
    assert ray.get(c.get.remote()) <= 4


def test_hash_sample_still_partition_invariant(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"embedding": list(rng.normal(size=(1500, 6)))})
    outs = [hash_sample(ray.data.from_pandas(df).repartition(p),
                        "embedding", 128) for p in (1, 7)]
    np.testing.assert_array_equal(outs[0], outs[1])


def test_pq_rerank_missing_ids_raises_clearly(ray_session):
    from openmldb_ray.stages.pq import pq_adc_topk, pq_encode, pq_fit

    rng = np.random.default_rng(5)
    X = rng.normal(size=(400, 16))
    df = pd.DataFrame({"vec_id": np.arange(len(X)),
                       "embedding": list(X)})
    ds = ray.data.from_pandas(df)
    model = pq_fit(ds, "embedding", m=4, nbits=4, iters=2)
    enc = pq_encode(ds, model)
    # vectors source whose ids never match the shortlist
    wrong = ray.data.from_pandas(
        pd.DataFrame({"vec_id": np.arange(10_000, 10_000 + len(X)),
                      "embedding": list(X)}))
    with pytest.raises((ValueError, Exception)) as ei:
        pq_adc_topk(enc, model, X[:3], np.arange(3), k=3, rerank=8,
                    vectors=wrong, vec_col="embedding")
    assert "shortlist" in str(ei.value) or "vectors source" in str(ei.value)


def test_pq_rerank_empty_queries_returns_empty(ray_session):
    from openmldb_ray.stages.pq import pq_adc_topk, pq_encode, pq_fit

    rng = np.random.default_rng(6)
    X = rng.normal(size=(300, 16))
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(len(X)), "embedding": list(X)}))
    model = pq_fit(ds, "embedding", m=4, nbits=4, iters=2)
    enc = pq_encode(ds, model)
    out = pq_adc_topk(enc, model, np.zeros((0, 16)), np.zeros(0, int),
                      k=3, rerank=8)
    assert out.count() == 0
    # Ray's to_pandas drops columns on fully-empty datasets; the schema
    # contract lives on the Dataset
    assert list(out.schema().names) == ["query_id", "neighbor_id",
                                        "score", "rank"]


def test_numeric_stats_int64_blocks_take_integer_path(ray_session):
    # pandas-Int64 blocks used to resolve (via Ray's Schema.types ERROR
    # path -> None -> np.dtype(None) == float64) to a SILENT float fold
    # where 2^60 rounds; the integer path instead raises LOUDLY when the
    # exact sum of squares exceeds int64 — the raise IS the evidence the
    # int contract now applies to Int64 blocks
    big = 2 ** 60
    df = pd.DataFrame({"x": pd.array([big, 1, None, big + 1],
                                     dtype="Int64")})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="exact integer"):
        numeric_stats(ds, "x")

    # and with in-range values the exact integer fold just works
    df2 = pd.DataFrame({"x": pd.array([7, None, 2 ** 30, 5],
                                      dtype="Int64")})
    st = numeric_stats(ray.data.from_pandas(df2), "x")
    assert int(st["vsum"].iloc[0]) == 7 + 2 ** 30 + 5
    assert int(st["cnt"].iloc[0]) == 3
