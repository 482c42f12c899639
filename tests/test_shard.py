"""seeded_shard_shuffle: exact global prefix sum + shard cut points."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.shard import MOD, MULT, seeded_shard_shuffle


def _naive(df, id_col, w_col, budget):
    out = df.copy()
    out["h"] = (out[id_col].to_numpy(np.int64) * MULT) % MOD
    out = out.sort_values(["h", id_col], kind="stable").reset_index(drop=True)
    w = out[w_col].to_numpy(np.float64) if w_col else np.ones(len(out))
    out["cum_weight"] = np.cumsum(w)
    out["shard"] = np.floor(
        (out["cum_weight"].to_numpy() - w) / budget).astype(np.int64)
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(9)
    n = 20_000
    return pd.DataFrame({
        "doc_id": rng.permutation(10 * n)[:n],
        "w": rng.integers(1, 500, n).astype("int64"),
        "payload": rng.integers(0, 100, n)})


def test_parity_weighted(data):
    out = seeded_shard_shuffle(
        ray.data.from_pandas(data).repartition(9), "doc_id",
        shard_budget=40_000, weight_col="w").to_pandas()
    ref = _naive(data, "doc_id", "w", 40_000)
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = ref[a.columns].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_parity_rowcount_budget(data):
    out = seeded_shard_shuffle(
        ray.data.from_pandas(data).repartition(4), "doc_id",
        shard_budget=1000).to_pandas()
    ref = _naive(data, "doc_id", None, 1000)
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = ref[a.columns].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # row-count budget: every shard except the last has exactly 1000 rows
    sizes = a.groupby("shard").size()
    assert (sizes.iloc[:-1] == 1000).all() if len(sizes) > 1 else True


def test_split_invariance(data):
    outs = []
    for nparts in (1, 17):
        out = seeded_shard_shuffle(
            ray.data.from_pandas(data).repartition(nparts), "doc_id",
            shard_budget=25_000, weight_col="w",
            num_buckets=32).to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_oversized_row_takes_own_shard():
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "w": [10, 500, 10]})
    out = seeded_shard_shuffle(ray.data.from_pandas(df), "doc_id",
                               shard_budget=100, weight_col="w").to_pandas()
    ref = _naive(df, "doc_id", "w", 100)
    a = out.sort_values("h").reset_index(drop=True)
    # the row AFTER the oversized one (in shuffle order) starts a new shard
    pos = int(np.nonzero(a["w"].to_numpy() == 500)[0][0])
    if pos + 1 < len(a):
        assert a["shard"].iloc[pos + 1] > a["shard"].iloc[pos]
    pd.testing.assert_frame_equal(
        a, ref[a.columns].reset_index(drop=True), check_dtype=False)


def test_shard_sizes_near_budget(data):
    budget = 60_000
    out = seeded_shard_shuffle(
        ray.data.from_pandas(data), "doc_id", shard_budget=budget,
        weight_col="w").to_pandas()
    sizes = out.groupby("shard")["w"].sum()
    # every full shard is within one max-row-weight of the budget
    assert (sizes.iloc[:-1] >= budget - 500).all()
    assert (sizes <= budget + 500).all()
