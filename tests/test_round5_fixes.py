"""Round-5 VERDICT regression tests — task #1: LAST JOIN (and the
broadcast LEFT/INNER apply) on the typed Arrow exchange.

The exactness class that previously bit semi_join / hopping_agg / the
equi-joins before their Arrow rewrites: payload columns that pandas
cannot represent faithfully —

- nullable int64 (pandas upcasts to float64 through a merge),
- integers past 2^53 (silently rounded by any float64 round-trip),
- list<int64> payloads (degrade to object arrays),

must ride every join strategy bit-exact, and the output schema must keep
the input Arrow types. Mirrors the request_window payload tests
(VERDICT r4 "next round" #1 done-criteria).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from openmldb_ray.stages.join_stage import (inner_join, last_join,
                                            left_join, next_join)

BIG = 2 ** 61 + 12345           # exact in int64, rounds in float64
BIG2 = 2 ** 53 + 1              # the first int float64 cannot hold


def _left_table():
    return pa.table({
        "k": pa.array(["a", "a", "b", "b", "c", None], pa.string()),
        "ts": pa.array([10, 25, 5, 40, 7, 11], pa.int64()),
        "lpay": pa.array([BIG, None, 2, BIG2, 5, 6], pa.int64()),
    })


def _right_table():
    return pa.table({
        "k": pa.array(["a", "a", "a", "b", "d", None], pa.string()),
        "ots": pa.array([5, 20, 30, 35, 1, 2], pa.int64()),
        "pay_int": pa.array([BIG, None, BIG2, 7, 8, 9], pa.int64()),
        "pay_list": pa.array([[1, BIG], [2], None, [BIG2, 4], [], [5]],
                             pa.list_(pa.int64())),
        "pay_str": pa.array(["x", None, "y", "z", "w", "v"], pa.string()),
    })


# expected asof (backward) match per left row, ordered by (k, ts):
#   a@10 -> right a@5, a@25 -> right a@20, b@5 -> none, b@40 -> b@35,
#   c@7 -> none, null-k -> none
ASOF_EXPECT = {
    ("a", 10): (BIG, [1, BIG], "x"),
    ("a", 25): (None, [2], None),
    ("b", 5): (None, None, None),
    ("b", 40): (7, [BIG2, 4], "z"),
    ("c", 7): (None, None, None),
    (None, 11): (None, None, None),
}


def _collect(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    assert tabs, "join produced no rows"
    return pa.concat_tables(tabs, promote_options="permissive") \
        .combine_chunks()


def _check_payload_types(tab: pa.Table):
    assert tab.schema.field("pay_int").type == pa.int64()
    assert tab.schema.field("pay_list").type == pa.list_(pa.int64())
    assert tab.schema.field("pay_str").type == pa.string()
    assert tab.schema.field("lpay").type == pa.int64()


def _rows_by_key(tab: pa.Table) -> dict:
    rows = tab.to_pylist()
    return {(r["k"], r["ts"]): (r["pay_int"], r["pay_list"], r["pay_str"])
            for r in rows}


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_lastjoin_asof_payload_exact(ray_session, strategy):
    left = rd.from_arrow(_left_table())
    right = rd.from_arrow(_right_table())
    out = last_join(
        left, right, "k", order_by="ots", asof_left_ts="ts",
        right_cols={"pay_int": "pay_int", "pay_list": "pay_list",
                    "pay_str": "pay_str"},
        strategy=strategy)
    tab = _collect(out)
    assert tab.num_rows == 6
    _check_payload_types(tab)
    assert _rows_by_key(tab) == ASOF_EXPECT
    # left payload rides zero-copy: exact values incl. nulls and 2^53+1
    got = dict(zip(tab["ts"].to_pylist(), tab["lpay"].to_pylist()))
    assert got == {10: BIG, 25: None, 5: 2, 40: BIG2, 7: 5, 11: 6}


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_lastjoin_sorted_no_asof_payload_exact(ray_session, strategy):
    """order_by without a PIT bound: global max order per key."""
    left = rd.from_arrow(_left_table())
    right = rd.from_arrow(_right_table())
    out = last_join(
        left, right, "k", order_by="ots",
        right_cols={"pay_int": "pay_int", "pay_list": "pay_list"},
        strategy=strategy)
    tab = _collect(out)
    assert tab.schema.field("pay_int").type == pa.int64()
    assert tab.schema.field("pay_list").type == pa.list_(pa.int64())
    rows = {(r["k"], r["ts"]): (r["pay_int"], r["pay_list"])
            for r in tab.to_pylist()}
    # max-order right rows: a -> a@30 (BIG2, None); b -> b@35
    assert rows == {
        ("a", 10): (BIG2, None), ("a", 25): (BIG2, None),
        ("b", 5): (7, [BIG2, 4]), ("b", 40): (7, [BIG2, 4]),
        ("c", 7): (None, None), (None, 11): (None, None),
    }


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_lastjoin_unsorted_payload_exact(ray_session, strategy):
    """No order_by: the last stored right row per key wins."""
    left = rd.from_arrow(_left_table())
    right = rd.from_arrow(_right_table())
    out = last_join(left, right, "k",
                    right_cols={"pay_int": "pay_int"}, strategy=strategy)
    tab = _collect(out)
    assert tab.schema.field("pay_int").type == pa.int64()
    rows = {(r["k"], r["ts"]): r["pay_int"] for r in tab.to_pylist()}
    # last stored per key: a -> row 2 (BIG2), b -> row 3 (7)
    assert rows == {("a", 10): BIG2, ("a", 25): BIG2, ("b", 5): 7,
                    ("b", 40): 7, ("c", 7): None, (None, 11): None}


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_lastjoin_residual_payload_exact(ray_session, strategy):
    """Residual ON condition forces the generic path — payloads must still
    assemble via Arrow take (only the residual mask sees pandas)."""
    left = rd.from_arrow(_left_table())
    right = rd.from_arrow(_right_table())
    out = last_join(
        left, right, "k", order_by="ots", asof_left_ts="ts",
        right_cols={"pay_int": "pay_int", "pay_list": "pay_list",
                    "pay_str": "pay_str"},
        residual=lambda m: m["pay_str"].notna().to_numpy(),
        strategy=strategy)
    tab = _collect(out)
    _check_payload_types(tab)
    rows = _rows_by_key(tab)
    # a@25's asof pick (a@20) has a null pay_str -> residual drops it,
    # fallback to a@5 (BIG, [1, BIG], "x"). The generic path's equi-match
    # is NULL-SAFE (None == None, pandas-merge parity — and the
    # reference's LAST JOIN equality is null-safe too), so the null-key
    # left row matches the null-key right row (ots=2 <= 11, "v" not null).
    expect = dict(ASOF_EXPECT)
    expect[("a", 25)] = (BIG, [1, BIG], "x")
    expect[(None, 11)] = (9, [5], "v")
    assert rows == expect


def test_lastjoin_forward_next_join_payload(ray_session):
    """Label join (forward direction) through the same Arrow kernel."""
    left = rd.from_arrow(_left_table())
    right = rd.from_arrow(_right_table())
    out = next_join(left, right, "k", order_by="ots", asof_left_ts="ts",
                    right_cols={"pay_int": "pay_int"})
    tab = _collect(out)
    assert tab.schema.field("pay_int").type == pa.int64()
    rows = {(r["k"], r["ts"]): r["pay_int"] for r in tab.to_pylist()}
    # first right at-or-after: a@10 -> a@20 (None), a@25 -> a@30 (BIG2),
    # b@5 -> b@35 (7), b@40 -> none, c/null -> none
    assert rows == {("a", 10): None, ("a", 25): BIG2, ("b", 5): 7,
                    ("b", 40): None, ("c", 7): None, (None, 11): None}


@pytest.mark.parametrize("how", ["left", "inner"])
def test_broadcast_equi_join_payload_exact(ray_session, how):
    left = rd.from_arrow(_left_table())
    right = rd.from_arrow(_right_table())
    join = left_join if how == "left" else inner_join
    out = join(left, right, "k",
               right_cols={"pay_int": "pay_int", "pay_list": "pay_list"},
               strategy="broadcast")
    tab = _collect(out)
    assert tab.schema.field("pay_int").type == pa.int64()
    assert tab.schema.field("pay_list").type == pa.list_(pa.int64())
    assert tab.schema.field("lpay").type == pa.int64()
    rows = [(r["k"], r["ts"], r["pay_int"]) for r in tab.to_pylist()]
    matched = [
        ("a", 10, BIG), ("a", 10, None), ("a", 10, BIG2),
        ("a", 25, BIG), ("a", 25, None), ("a", 25, BIG2),
        ("b", 5, 7), ("b", 40, 7),
    ]
    if how == "inner":
        assert sorted(rows, key=str) == sorted(matched, key=str)
    else:
        unmatched = [("c", 7, None), (None, 11, None)]
        assert sorted(rows, key=str) == sorted(matched + unmatched, key=str)
        # 1-row-per-unmatched-left and left batch order preserved within
        # a block: ts sequence must be non-interleaved per input order
        ts_seq = tab["ts"].to_pylist()
        assert ts_seq == sorted(ts_seq, key=lambda t:
                                [10, 25, 5, 40, 7, 11].index(t))


def test_lastjoin_broadcast_pandas_right_payload(ray_session):
    """Driver-side pandas right table (the flagship shape): nullable Int64
    payload must not degrade to float64."""
    left = rd.from_arrow(_left_table())
    right = pd.DataFrame({
        "k": ["a", "a", "b"],
        "ots": [5, 20, 35],
        "pay_int": pd.array([BIG, None, BIG2], dtype="Int64"),
    })
    out = last_join(left, right, "k", order_by="ots", asof_left_ts="ts",
                    right_cols={"pay_int": "pay_int"})
    tab = _collect(out)
    assert pa.types.is_integer(tab.schema.field("pay_int").type)
    rows = {(r["k"], r["ts"]): r["pay_int"] for r in tab.to_pylist()}
    assert rows == {("a", 10): BIG, ("a", 25): None, ("b", 5): None,
                    ("b", 40): BIG2, ("c", 7): None, (None, 11): None}


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_lastjoin_multiblock_shuffle_exact(ray_session, strategy):
    """Many blocks + repartition: PIT answers and payload exactness hold
    when both sides are split across blocks (the 100 TB block shape)."""
    rng = np.random.default_rng(7)
    n_left, n_right = 400, 300
    lk = rng.integers(0, 20, n_left)
    lts = rng.integers(0, 1000, n_left)
    rk = rng.integers(0, 20, n_right)
    rts = rng.integers(0, 1000, n_right)
    pay = rng.integers(2 ** 54, 2 ** 60, n_right)
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()), "ts": pa.array(lts, pa.int64()),
    })).repartition(7)
    # unique (k, ts) on the right so the oracle is order-unambiguous
    rdf = pd.DataFrame({"k": rk, "ots": rts, "pay": pay}) \
        .drop_duplicates(["k", "ots"])
    right = rd.from_arrow(pa.Table.from_pandas(
        rdf, preserve_index=False)).repartition(5)
    out = last_join(left, right, "k", order_by="ots", asof_left_ts="ts",
                    right_cols={"pay": "pay", "ots": "r_ots"},
                    strategy=strategy)
    tab = _collect(out)
    assert tab.num_rows == n_left
    assert tab.schema.field("pay").type == pa.int64()
    # brute-force oracle
    by_key = {}
    for _, r in rdf.iterrows():
        by_key.setdefault(int(r["k"]), []).append(
            (int(r["ots"]), int(r["pay"])))
    got = {(r["k"], r["ts"]): (r["r_ots"], r["pay"])
           for r in tab.to_pylist()}
    import collections
    lcount = collections.Counter(zip(lk.tolist(), lts.tolist()))
    for (k, ts), (gots, gpay) in got.items():
        cands = [(o, p) for (o, p) in by_key.get(k, []) if o <= ts]
        if not cands:
            assert gots is None and gpay is None, (k, ts)
        else:
            eo, ep = max(cands)
            assert (gots, gpay) == (eo, ep), (k, ts)
    # every left (k, ts) pair surfaced exactly as many times as it occurred
    gcount = collections.Counter()
    for r in tab.to_pylist():
        gcount[(r["k"], r["ts"])] += 1
    assert gcount == lcount


def test_curation_chain_no_deadlock_at_2_cpus():
    """Chained curation stages must make progress on a 2-CPU session.

    Before round 5 each light-state stage was an actor POOL pinning >= 1
    CPU for the dataset's lifetime; quality -> pii -> decontaminate ->
    sample at num_cpus=2 deadlocked the streaming executor forever (one
    pool stuck pending while the read task + sibling pools held both
    CPUs). The stages now run as tasks with a per-process instance cache
    (core/stagecache.py). Fresh subprocess: the deadlock only manifests
    in its own small Ray session."""
    import os
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent("""
        import ray, sys
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 logging_level="ERROR")
        sys.path.insert(0, %r)
        import numpy as np, pandas as pd
        import ray.data as rd
        from openmldb_ray.stages.curation import (decontaminate,
            pii_redact, quality_filter, stratified_sample)
        from openmldb_ray.stages.dedup import minhash_lsh_dedup
        rng = np.random.default_rng(0)
        vocab = np.array(["the", "and", "of"] +
                         [f"w{i}" for i in range(500)])
        idx = rng.integers(0, len(vocab), (20000, 33))
        idx[:, :3] = rng.integers(0, 3, (20000, 3))
        docs = pd.DataFrame({
            "doc_id": np.arange(20000),
            "text": [" ".join(r) for r in vocab[idx]],
            "source": np.array(["a", "b"])[rng.integers(0, 2, 20000)],
        })
        ds = rd.from_pandas(docs).repartition(8)
        out = stratified_sample(
            minhash_lsh_dedup(
                decontaminate(pii_redact(quality_filter(ds)),
                              ["needle that matches nothing"]),
                "text", "doc_id"),
            rates={}, default_rate=0.5)
        n = out.count()
        assert n > 0, n
        print("OK", n)
        ray.shutdown()
    """) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_window_agg_payload_exact(ray_session):
    """Payload columns the window kernel never reads must not round-trip
    through pandas inside the bucket kernel (VERDICT r5 task #8)."""
    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.stages.window_stage import window_agg

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "ts": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
        "pay_int": pa.array([BIG, None, BIG2, 7, None], pa.int64()),
        "pay_list": pa.array([[1, BIG], None, [BIG2], [], [9]],
                             pa.list_(pa.int64())),
    })
    out = window_agg(rd.from_arrow(t), "k", "ts",
                     [AggSpec(kind="sum", name="sum_v", col="v")],
                     FrameSpec(rows_preceding=1))
    tab = _collect(out)
    assert tab.schema.field("pay_int").type == pa.int64()
    assert tab.schema.field("pay_list").type == pa.list_(pa.int64())
    rows = {(r["k"], r["ts"]): (r["sum_v"], r["pay_int"], r["pay_list"])
            for r in tab.to_pylist()}
    assert rows == {
        ("a", 1): (1.0, BIG, [1, BIG]),
        ("a", 2): (3.0, None, None),
        ("a", 3): (5.0, BIG2, [BIG2]),
        ("b", 1): (4.0, 7, []),
        ("b", 2): (9.0, None, [9]),
    }


def test_latest_snapshot_payload_exact(ray_session):
    from openmldb_ray.stages.join_stage import latest_snapshot

    t = pa.table({
        "k": pa.array(["a", "a", "b", "b", None], pa.string()),
        "ts": pa.array([1, 5, 2, None, 3], pa.int64()),
        "pay_int": pa.array([1, BIG, BIG2, 9, 9], pa.int64()),
        "pay_list": pa.array([[1], [BIG], [BIG2, 2], None, None],
                             pa.list_(pa.int64())),
    })
    out = latest_snapshot(rd.from_arrow(t), "k", "ts")
    tab = _collect(out)
    assert tab.schema.field("pay_int").type == pa.int64()
    assert tab.schema.field("pay_list").type == pa.list_(pa.int64())
    rows = {r["k"]: (r["ts"], r["pay_int"], r["pay_list"])
            for r in tab.to_pylist()}
    # null key never groups; b's null-ts row can never be "latest"
    assert rows == {"a": (5, BIG, [BIG]), "b": (2, BIG2, [BIG2, 2])}


def test_top_n_per_key_payload_exact(ray_session):
    from openmldb_ray.stages.select import top_n_per_key

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", None], pa.string()),
        "q": pa.array([0.9, 0.5, 0.7, 0.3, 0.8], pa.float64()),
        "pay_int": pa.array([BIG, 2, BIG2, None, 5], pa.int64()),
        "pay_list": pa.array([[BIG], [], [BIG2], None, [5]],
                             pa.list_(pa.int64())),
    })
    out = top_n_per_key(rd.from_arrow(t), "k", "q", 2)
    tab = _collect(out)
    assert tab.schema.field("pay_int").type == pa.int64()
    assert tab.schema.field("pay_list").type == pa.list_(pa.int64())
    rows = sorted((r["k"], r["q"], r["pay_int"], tuple(r["pay_list"] or []))
                  for r in tab.to_pylist())
    # top-2 by q desc per key; null key dropped
    assert rows == [("a", 0.7, BIG2, (BIG2,)), ("a", 0.9, BIG, (BIG,)),
                    ("b", 0.3, None, ())]


def test_rank_window_payload_exact(ray_session):
    from openmldb_ray.stages.rank import cume_dist, rank_window

    t = pa.table({
        "k": pa.array(["a", "a", "b", "b"], pa.string()),
        "s": pa.array([3.0, 1.0, 2.0, 2.0], pa.float64()),
        "uid": pa.array([1, 2, 3, 4], pa.int64()),
        "pay_int": pa.array([BIG, BIG2, None, 5], pa.int64()),
        "pay_list": pa.array([[BIG], [2], None, [BIG2, 1]],
                             pa.list_(pa.int64())),
    })
    out = rank_window(rd.from_arrow(t), "s", key_col="k",
                      outs={"rnk": "rank", "rn": "row_number"},
                      tiebreak="uid")
    tab = _collect(out)
    assert tab.schema.field("pay_int").type == pa.int64()
    assert tab.schema.field("pay_list").type == pa.list_(pa.int64())
    rows = {r["uid"]: (r["rnk"], r["rn"], r["pay_int"], r["pay_list"])
            for r in tab.to_pylist()}
    assert rows == {1: (2, 2, BIG, [BIG]), 2: (1, 1, BIG2, [2]),
                    3: (1, 1, None, None), 4: (1, 2, 5, [BIG2, 1])}

    out2 = cume_dist(rd.from_arrow(t), "s", key_col="k",
                     strategy="shuffle")
    tab2 = _collect(out2)
    assert tab2.schema.field("pay_int").type == pa.int64()
    rows2 = {r["uid"]: (round(r["cume_dist"], 6), r["pay_int"])
             for r in tab2.to_pylist()}
    assert rows2 == {1: (1.0, BIG), 2: (0.5, BIG2), 3: (1.0, None),
                     4: (1.0, 5)}
