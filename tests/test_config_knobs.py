"""RUNBOOK knobs (openmldb_ray/config.py): the cluster-scaling routing
thresholds must be env-overridable per job, with explicit call-site
arguments always winning."""

import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray import config


def test_resolution_order(monkeypatch):
    monkeypatch.delenv("OMR_BROADCAST_LIMIT", raising=False)
    assert config.broadcast_limit(None, 123) == 123
    monkeypatch.setenv("OMR_BROADCAST_LIMIT", "77")
    assert config.broadcast_limit(None, 123) == 77
    assert config.broadcast_limit(5, 123) == 5      # explicit wins
    monkeypatch.setenv("OMR_DRIVER_LIMIT", "0")
    assert config.driver_limit(None, 9) == 0        # 0 is a real value
    monkeypatch.delenv("OMR_DRIVER_LIMIT")
    assert config.driver_limit(None, 9) == 9


def test_num_buckets_pin(monkeypatch):
    from openmldb_ray.core.hashing import default_num_buckets

    monkeypatch.delenv("OMR_NUM_BUCKETS", raising=False)
    assert default_num_buckets() >= 256
    monkeypatch.setenv("OMR_NUM_BUCKETS", "32")
    assert default_num_buckets() == 32


def test_broadcast_limit_env_reroutes_semi_join(ray_session, monkeypatch):
    """Behavioral: OMR_BROADCAST_LIMIT=1 forces the shuffle path on a
    tiny right side (observable as an all-to-all in the plan stats);
    results stay identical either way."""
    from openmldb_ray.stages.semijoin import semi_join

    L = pd.DataFrame({"k": np.arange(50) % 7, "v": np.arange(50)})
    R = pd.DataFrame({"k": [1, 3, 5]})

    def run():
        out = semi_join(ray.data.from_pandas(L), ray.data.from_pandas(R),
                        on="k", strategy="auto")
        df = out.to_pandas().sort_values("v").reset_index(drop=True)
        return df, out.stats()

    monkeypatch.delenv("OMR_BROADCAST_LIMIT", raising=False)
    df_b, stats_b = run()
    monkeypatch.setenv("OMR_BROADCAST_LIMIT", "1")
    df_s, stats_s = run()
    pd.testing.assert_frame_equal(df_b, df_s)
    assert "Sort" not in stats_b and "Sort" in stats_s


def test_driver_limit_env_reroutes_components(ray_session, monkeypatch):
    from openmldb_ray.stages.graph import connected_components

    E = pd.DataFrame({"src": [1, 2, 3, 10], "dst": [2, 3, 4, 11]})

    def labels():
        out = connected_components(ray.data.from_pandas(E)).to_pandas()
        g = out.groupby("cluster_id")["node"].apply(
            lambda s: tuple(sorted(s))).tolist()
        return sorted(g)

    monkeypatch.delenv("OMR_DRIVER_LIMIT", raising=False)
    base = labels()
    monkeypatch.setenv("OMR_DRIVER_LIMIT", "1")   # force distributed path
    assert labels() == base == [(1, 2, 3, 4), (10, 11)]
