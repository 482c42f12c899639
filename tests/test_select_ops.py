"""Sort-free distributed budget selection (stages/select.budget_select:
histogram-refinement order statistics) and the grouped top-N cap
(select.top_n_per_key)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _ref_budget(df, order, id_col, budget, weight=None, key=None,
                ascending=False):
    """SUM(w) OVER (PARTITION BY key ORDER BY order desc, id) <= budget."""
    w = df[weight] if weight else pd.Series(1, index=df.index)
    d = df.assign(__w=w).sort_values([order, id_col],
                                     ascending=[ascending, True],
                                     kind="stable")
    grp = d.groupby(key)["__w"] if key else d["__w"]
    cw = grp.cumsum() if key else d["__w"].cumsum()
    return d[cw <= budget].drop(columns="__w")


def _cmp(out, ref, id_col="i"):
    if len(ref) == 0:
        assert len(out) == 0
        return
    out = out.sort_values(id_col).reset_index(drop=True)
    ref = ref.sort_values(id_col).reset_index(drop=True)
    assert len(out) == len(ref), f"{len(out)} != {len(ref)}"
    np.testing.assert_array_equal(out[id_col].to_numpy(), ref[id_col].to_numpy())


def _mk(n=5000, n_keys=3, tie_heavy=False, seed=0):
    rng = np.random.default_rng(seed)
    score = (rng.integers(0, 12, n).astype("float64") if tie_heavy
             else rng.normal(size=n).round(3))
    return pd.DataFrame({
        "k": np.array([f"s{j}" for j in rng.integers(0, n_keys, n)]),
        "score": score,
        "i": rng.permutation(n).astype("int64"),
        "w": rng.integers(1, 50, n).astype("int64"),
    })


@pytest.mark.parametrize("budget", [0, 1, 700, 10**9])
def test_budget_select_global_topk(ray_session, budget):
    from openmldb_ray.stages.select import budget_select

    df = _mk()
    out = budget_select(rd.from_pandas(df).repartition(5), "score",
                        budget=budget, id_col="i").to_pandas()
    ref = _ref_budget(df, "score", "i", budget)
    _cmp(out, ref)


def test_budget_select_weighted_per_key(ray_session):
    from openmldb_ray.stages.select import budget_select

    df = _mk(seed=2)
    out = budget_select(rd.from_pandas(df).repartition(7), "score",
                        budget=5000, weight_col="w", key_col="k",
                        id_col="i").to_pandas()
    ref = _ref_budget(df, "score", "i", 5000, weight="w", key="k")
    _cmp(out, ref)


def test_budget_select_tie_heavy_id_phase(ray_session):
    """Scores drawn from 12 distinct values force the boundary bucket to a
    single order value — the id-axis refinement path — with collect_cap
    small enough that resolution still needs histogram rounds on ids."""
    from openmldb_ray.stages.select import budget_select

    df = _mk(n=8000, tie_heavy=True, seed=3)
    out = budget_select(rd.from_pandas(df).repartition(6), "score",
                        budget=3000, weight_col="w", key_col="k", id_col="i",
                        bins=16, collect_cap=40).to_pandas()
    ref = _ref_budget(df, "score", "i", 3000, weight="w", key="k")
    _cmp(out, ref)


def test_budget_select_ascending_and_exact_boundary(ray_session):
    """ascending=True flips the order; a budget landing exactly on a
    cumulative-sum boundary includes the boundary row (cw <= budget)."""
    from openmldb_ray.stages.select import budget_select

    df = pd.DataFrame({"score": [1.0, 2.0, 3.0, 4.0],
                       "i": [10, 11, 12, 13],
                       "w": [5, 5, 5, 5]})
    out = budget_select(rd.from_pandas(df), "score", budget=10,
                        weight_col="w", id_col="i",
                        ascending=True).to_pandas()
    assert sorted(out["i"]) == [10, 11]


def test_budget_select_null_rows_never_selected(ray_session):
    from openmldb_ray.stages.select import budget_select

    df = pd.DataFrame({"score": [5.0, None, 3.0], "i": [1, 2, 3]})
    out = budget_select(rd.from_pandas(df), "score", budget=10,
                        id_col="i").to_pandas()
    assert sorted(out["i"]) == [1, 3]


def test_budget_select_split_invariant(ray_session):
    from openmldb_ray.stages.select import budget_select

    df = _mk(n=2000, seed=5)
    ref = None
    for parts in (1, 4, 16):
        out = budget_select(rd.from_pandas(df).repartition(parts), "score",
                            budget=900, weight_col="w", id_col="i") \
            .to_pandas().sort_values("i").reset_index(drop=True)
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(out["i"].to_numpy(),
                                          ref["i"].to_numpy())


def test_top_n_per_key_matches_pandas(ray_session):
    from openmldb_ray.stages.select import top_n_per_key

    df = _mk(n=4000, n_keys=200, seed=7)
    out = top_n_per_key(rd.from_pandas(df).repartition(9), "k", "score", 5,
                        tiebreak="i").to_pandas()
    ref = (df.sort_values(["k", "score", "i"], ascending=[True, False, True],
                          kind="stable")
           .groupby("k", sort=False).head(5))
    assert len(out) == len(ref)
    a = out.sort_values(["k", "i"]).reset_index(drop=True)
    b = ref.sort_values(["k", "i"]).reset_index(drop=True)
    np.testing.assert_array_equal(a["i"].to_numpy(), b["i"].to_numpy())


def test_top_n_per_key_split_invariant(ray_session):
    from openmldb_ray.stages.select import top_n_per_key

    df = pd.DataFrame({"k": ["a"] * 12, "score": np.arange(12.0),
                       "i": np.arange(12, dtype="int64")})
    for parts in (1, 3, 12):
        out = top_n_per_key(rd.from_pandas(df).repartition(parts),
                            "k", "score", 3, tiebreak="i").to_pandas()
        assert sorted(out["i"]) == [9, 10, 11]
