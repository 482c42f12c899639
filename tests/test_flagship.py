"""Flagship-suite tests: deterministic generation, zero temporal leakage
(independent O(n²) pandas oracle), token-array passthrough equality, and
lineage-based resume."""

import numpy as np
import pandas as pd

from openmldb_ray.pipelines import flagship as FS

N_DOCS = 2000


def gen_all_pandas(n=N_DOCS, seed=42) -> pd.DataFrame:
    t = FS.gen_sequences_batch(np.arange(n, dtype=np.uint64), seed, n)
    return t.to_pandas()


def test_generation_deterministic_and_batch_independent():
    whole = FS.gen_sequences_batch(np.arange(100, dtype=np.uint64), 42, 100).to_pandas()
    parts = pd.concat([
        FS.gen_sequences_batch(np.arange(0, 37, dtype=np.uint64), 42, 100).to_pandas(),
        FS.gen_sequences_batch(np.arange(37, 100, dtype=np.uint64), 42, 100).to_pandas(),
    ], ignore_index=True)
    assert (whole["doc_id"] == parts["doc_id"]).all()
    assert (whole["n_tok"] == parts["n_tok"]).all()
    for a, b in zip(whole["tokens"], parts["tokens"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # hot-source skew present
    frac_web = (whole["source"] == "web").mean()
    assert 0.5 < frac_web < 0.9


oracle_features = FS.pit_oracle_features


def test_flagship_features_match_oracle_and_tokens_roundtrip(ray_session, tmp_path):
    out = FS.flagship(num_docs=N_DOCS).to_pandas()
    raw = gen_all_pandas()
    split_ts = FS.BASE_TS + (N_DOCS // 2) * FS.STEP_MS // 5

    exp = oracle_features(raw, split_ts)
    assert len(out) == len(exp)
    m = out.merge(exp, on="doc_id", suffixes=("", "_exp"))
    assert len(m) == len(exp)
    for c in ["sum_tok_6h", "cnt_6h", "avg_tok_6h", "min_tok_6h", "max_tok_6h",
              "lag1_tok", "dc_lang_6h"]:
        a = pd.to_numeric(m[c], errors="coerce").astype(float)
        b = pd.to_numeric(m[f"{c}_exp"], errors="coerce").astype(float)
        assert np.allclose(a, b, equal_nan=True), f"{c} mismatch"
    assert (m["top_lang_6h"].astype(str) == m["top_lang_6h_exp"].astype(str)).all()

    # point-in-time LAST JOIN: prev-day stats must never cover the event's own day
    j = out[out["prev_day_avail_ts"].notna()]
    assert (j["prev_day_avail_ts"] <= j["event_ts"]).all()

    # token passthrough: byte-identical to the generated input
    tok_in = dict(zip(raw["doc_id"], raw["tokens"]))
    for did, toks in zip(out["doc_id"], out["tokens"]):
        assert np.array_equal(np.asarray(toks, dtype=np.int32),
                              np.asarray(tok_in[did], dtype=np.int32)), did


def test_lineage_resume(ray_session, tmp_path):
    out_dir = str(tmp_path / "flag_out")
    FS.flagship(num_docs=400, out_dir=out_dir)
    from openmldb_ray.state.lineage import completed_partitions, write_partitioned_with_lineage

    done = completed_partitions(out_dir)
    assert len(done) >= 3  # most sources present
    # a rerun skips everything (read back hive-partitioned output; the
    # partition column lives in the path, so re-add it per dir)
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    parts = []
    for p in done:
        files = glob.glob(f"{out_dir}/source={p}/**/*.parquet", recursive=True)
        pdf = pd.concat([pq.read_table(f).to_pandas() for f in files])
        pdf["source"] = p
        parts.append(pdf)
    ds = rd.from_pandas(pd.concat(parts, ignore_index=True))
    summary = write_partitioned_with_lineage(ds, out_dir, "source", resume=True)
    assert summary["written"] == []
    assert set(summary["skipped"]) == done


def test_attach_paths_equivalent(ray_session):
    """regen (zero-shuffle), broadcast, and bucketed payload attach must
    produce identical feature rows and token arrays."""
    outs = {}
    for mode in ("regen", "broadcast", "bucketed"):
        df = FS.flagship(num_docs=600, attach=mode).to_pandas()
        df["tok_hash"] = df["tokens"].map(
            lambda t: hash(np.asarray(t, dtype=np.int32).tobytes()))
        outs[mode] = df.drop(columns=["tokens"]).sort_values("doc_id").reset_index(drop=True)
    base = outs["regen"]
    for mode in ("broadcast", "bucketed"):
        other = outs[mode]
        assert len(other) == len(base), mode
        m = base.merge(other, on="doc_id", suffixes=("", "_o"))
        for c in ["sum_tok_6h", "cnt_6h", "lag1_tok", "top_lang_6h", "tok_hash"]:
            a, b = m[c], m[f"{c}_o"]
            if a.dtype.kind in "fc":
                assert np.allclose(a.astype(float), b.astype(float), equal_nan=True), (mode, c)
            else:
                assert (a.fillna("<n>").astype(str) == b.fillna("<n>").astype(str)).all(), (mode, c)


def test_resume_does_not_duplicate_rows(ray_session, tmp_path):
    """Regression (found by e2e verification): a resumed run must REPLACE an
    incomplete partition's files, not append alongside them."""
    import glob

    import pyarrow.parquet as pq

    out_dir = str(tmp_path / "o")
    FS.flagship(num_docs=400, out_dir=out_dir)
    # simulate a crash after 'web' wrote data but before its lineage commit
    import os

    os.remove(os.path.join(out_dir, "lineage", "web.json"))
    FS.flagship(num_docs=400, out_dir=out_dir)  # resume
    files = sorted(glob.glob(f"{out_dir}/source=*/**/*.parquet", recursive=True))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert len(df) == df["doc_id"].nunique()


def test_flagship_seed_independence(ray_session):
    """Different seeds → different data, same invariants (PIT bound, token
    roundtrip); same seed → identical output (full determinism)."""
    a1 = FS.flagship(num_docs=500, seed=7).to_pandas().sort_values("doc_id").reset_index(drop=True)
    a2 = FS.flagship(num_docs=500, seed=7).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a1["doc_id"] == a2["doc_id"]).all()
    assert np.allclose(a1["sum_tok_6h"], a2["sum_tok_6h"], equal_nan=True)
    for t1, t2 in zip(a1["tokens"], a2["tokens"]):
        assert np.array_equal(np.asarray(t1), np.asarray(t2))
    b = FS.flagship(num_docs=500, seed=8).to_pandas()
    assert not np.array_equal(
        np.sort(a1["n_tok"].to_numpy()), np.sort(b["n_tok"].to_numpy()))
    j = b[b["prev_day_avail_ts"].notna()]
    assert (j["prev_day_avail_ts"] <= j["event_ts"]).all()
