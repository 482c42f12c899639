"""Snapshot diff (stages/diff.snapshot_diff)."""

import numpy as np
import pandas as pd

import ray.data as rd


def test_snapshot_diff_statuses(ray_session):
    from openmldb_ray.stages.diff import snapshot_diff

    old = pd.DataFrame({"id": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, None],
                        "s": ["a", "b", "c", "d"]})
    new = pd.DataFrame({"id": [2, 3, 4, 5], "v": [20.0, 31.0, None, 50.0],
                        "s": ["b", "c", "d", "e"]})
    out = snapshot_diff(rd.from_pandas(old), rd.from_pandas(new), "id") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    st = dict(zip(out["id"], out["status"]))
    # 1 removed; 2 unchanged (dropped); 3 changed (30->31);
    # 4 unchanged (null==null); 5 added
    assert st == {1: "removed", 3: "changed", 5: "added"}
    row3 = out[out["id"] == 3].iloc[0]
    assert row3["old_v"] == 30.0 and row3["new_v"] == 31.0
    row1 = out[out["id"] == 1].iloc[0]
    assert row1["old_v"] == 10.0 and pd.isna(row1["new_v"])


def test_snapshot_diff_emit_unchanged_and_scale_shape(ray_session):
    from openmldb_ray.stages.diff import snapshot_diff

    rng = np.random.default_rng(0)
    n = 3000
    old = pd.DataFrame({"id": np.arange(n), "v": rng.normal(size=n).round(3)})
    new = old.copy()
    new.loc[new["id"] % 100 == 0, "v"] += 1.0          # 30 changed
    new = new[new["id"] % 97 != 0]                      # ~31 removed
    add = pd.DataFrame({"id": np.arange(n, n + 5), "v": np.ones(5)})
    new = pd.concat([new, add], ignore_index=True)
    out = snapshot_diff(rd.from_pandas(old).repartition(7),
                        rd.from_pandas(new).repartition(4), "id",
                        emit_unchanged=True).to_pandas()
    assert len(out) == n + 5
    vc = out["status"].value_counts()
    assert vc["added"] == 5
    # ids divisible by both 97 and 100 don't exist below 3000 except 0
    removed = set(out[out["status"] == "removed"]["id"])
    assert removed == {i for i in range(n) if i % 97 == 0}
    changed = set(out[out["status"] == "changed"]["id"])
    assert changed == {i for i in range(n)
                       if i % 100 == 0 and i % 97 != 0}
