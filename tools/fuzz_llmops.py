"""Differential fuzzer for the round-3c LLM-data ops (sibling of
tools/fuzz_relational.py — VERDICT r3 task #8).

Families and oracles:

- pq        — pq_fit + pq_encode + pq_adc_topk vs a NAIVE numpy ADC over
              the same fitted model: codes recomputed locally with
              _encode_mat, lookup-table distances summed per query, exact
              (score, id)-tiebroken top-k equality.
- knn_join  — broadcast path vs an exact numpy cosine matrix with the
              stage's own normalize/tiebreak; IVF path recall floor on
              clustered data.
- paradedup — both strategies vs a single-process first-occurrence
              (min (id, pos)) paragraph dedup, including min_chars
              exemption and drop_empty.
- encoders  — target_encode (smoothing, nulls) / count_encode vs exact
              DuckDB window replays.
- scale     — standard_scale / minmax_scale / bucketize (global and
              per-key, int/float dtypes, nulls) vs exact DuckDB replays.

Random dims/counts/dtypes/nulls/partitionings per seed. Usage:
    python tools/fuzz_llmops.py [--seeds 25] [--start 0] [--rows 250]
"""
from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _part(rng, ds):
    return ds.repartition(rng.randint(1, 9))


# ---------------------------------------------------------------------------
# pq: distributed fit/encode/ADC vs naive numpy ADC on the same model
# ---------------------------------------------------------------------------

def fuzz_pq(seed: int, rows: int, rd) -> list[str]:
    from openmldb_ray.stages.pq import (_encode_mat, pq_adc_topk, pq_encode,
                                        pq_fit)
    from openmldb_ray.stages.simsearch import _normalize

    rng = random.Random(seed + 710_000)
    nrng = np.random.default_rng(seed + 710_000)
    d = rng.choice([8, 16])
    m = rng.choice([2, 4])
    nbits = rng.choice([3, 4])
    n = max(80, rows)
    centers = nrng.normal(scale=4, size=(6, d))
    X = np.concatenate([c + nrng.normal(size=(n // 6 + 1, d))
                        for c in centers])[:n]
    X = X[nrng.permutation(n)]
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(X)})
    ds = _part(rng, rd.from_pandas(df))
    model = pq_fit(ds, "embedding", m=m, nbits=nbits, iters=2)
    enc = pq_encode(ds, model)
    nq = rng.randint(1, 5)
    k = rng.randint(1, 6)
    q = X[nrng.integers(0, n, nq)]
    qids = np.arange(nq)
    got = pq_adc_topk(enc, model, q, qids, k=k).to_pandas()

    # naive ADC: same codebooks, codes and lookup tables, locally
    books = model["codebooks"]
    mm, ksub, dsub = books.shape
    Xn = _normalize(X)
    codes = _encode_mat(Xn, books)
    qn = _normalize(q.astype(np.float64)).reshape(nq, mm, dsub)
    tables = ((qn[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
    bad = []
    for qi in range(nq):
        d2 = np.zeros(n)
        for j in range(mm):
            d2 += tables[qi, j][codes[:, j]]
        order = np.lexsort((np.arange(n), d2))[:k]
        exp = [(float(-d2[i]), int(i)) for i in order]
        g = got[got["query_id"] == qi].sort_values("rank")
        act = [(float(s), int(i)) for s, i in zip(g["score"],
                                                  g["neighbor_id"])]
        if len(act) != len(exp) or not all(
                abs(a[0] - e[0]) < 1e-9 and a[1] == e[1]
                for a, e in zip(act, exp)):
            bad.append(f"pq seed {seed}: q{qi} adc mismatch "
                       f"act={act} exp={exp}")
    return bad


# ---------------------------------------------------------------------------
# knn_join: broadcast exact vs numpy; ivf recall floor
# ---------------------------------------------------------------------------

def fuzz_knn_join(seed: int, rows: int, rd) -> list[str]:
    from openmldb_ray.stages.simsearch import _normalize, knn_join

    rng = random.Random(seed + 720_000)
    nrng = np.random.default_rng(seed + 720_000)
    d = rng.choice([4, 8])
    nl, nr = rng.randint(20, rows), rng.randint(20, rows)
    k = rng.randint(1, 4)
    centers = nrng.normal(scale=6, size=(5, d))
    L = centers[nrng.integers(0, 5, nl)] + nrng.normal(size=(nl, d)) * .3
    R = centers[nrng.integers(0, 5, nr)] + nrng.normal(size=(nr, d)) * .3
    lds = _part(rng, rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(nl), "embedding": list(L)})))
    rds = _part(rng, rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(nr), "embedding": list(R)})))
    got = knn_join(lds, rds, k=k, strategy="broadcast").to_pandas()

    s = _normalize(L) @ _normalize(R).T
    bad = []
    exp_pairs = set()
    for li in range(nl):
        order = np.lexsort((np.arange(nr), -s[li]))[:k]
        for rk, ri in enumerate(order, 1):
            exp_pairs.add((li, int(ri), rk))
    act_pairs = set(zip(got["query_id"].astype(int),
                        got["neighbor_id"].astype(int),
                        got["rank"].astype(int)))
    if act_pairs != exp_pairs:
        bad.append(f"knn_join seed {seed}: broadcast mismatch "
                   f"(missing {list(exp_pairs - act_pairs)[:3]}, "
                   f"extra {list(act_pairs - exp_pairs)[:3]})")

    ivf = knn_join(lds, rds, k=k, strategy="ivf", num_centroids=8,
                   nprobe=4).to_pandas()
    hit = len(set(zip(ivf["query_id"].astype(int),
                      ivf["neighbor_id"].astype(int)))
              & {(a, b) for a, b, _ in exp_pairs})
    recall = hit / max(1, len(exp_pairs))
    if recall < 0.85:
        bad.append(f"knn_join seed {seed}: ivf recall {recall:.2f} < 0.85")
    return bad


# ---------------------------------------------------------------------------
# paradedup: both strategies vs single-process first-occurrence dedup
# ---------------------------------------------------------------------------

def fuzz_paradedup(seed: int, rows: int, rd) -> list[str]:
    from openmldb_ray.stages.paradedup import paragraph_dedup

    rng = random.Random(seed + 730_000)
    nrng = np.random.default_rng(seed + 730_000)
    n = max(20, rows // 3)
    pool = [f"shared paragraph {i} lorem" for i in range(rng.randint(2, 8))]
    min_chars = rng.choice([1, 5])
    docs = []
    for i in range(n):
        paras = []
        for _ in range(int(nrng.integers(1, 6))):
            r = nrng.random()
            if r < 0.3:
                paras.append(pool[int(nrng.integers(0, len(pool)))])
            elif r < 0.4:
                paras.append("ab")               # short: min_chars exempt?
            elif r < 0.45:
                paras.append("")                 # empty paragraph
            else:
                paras.append(f"unique {i} {int(nrng.integers(0, 10 ** 6))}")
        docs.append({"doc_id": i, "text": "\n".join(paras)})
    df = pd.DataFrame(docs)

    def naive():
        seen: set = set()
        out = []
        for _, r in df.sort_values("doc_id").iterrows():
            keep = []
            for p in str(r["text"]).split("\n"):
                if len(p) < min_chars:
                    keep.append(p)
                    continue
                if p in seen:
                    continue
                seen.add(p)
                keep.append(p)
            t = "\n".join(keep)
            if t.strip() == "":
                continue
            out.append({"doc_id": r["doc_id"], "text": t})
        return pd.DataFrame(out)

    exp = naive().sort_values("doc_id").reset_index(drop=True)
    bad = []
    for strat in ("broadcast", "shuffle"):
        got = paragraph_dedup(
            _part(rng, rd.from_pandas(df)), text_col="text",
            id_col="doc_id", min_chars=min_chars,
            strategy=strat).to_pandas()
        got = got[["doc_id", "text"]].sort_values("doc_id") \
            .reset_index(drop=True)
        if len(got) != len(exp) or not got.equals(exp):
            bad.append(f"paradedup seed {seed}/{strat}: mismatch "
                       f"({len(got)} vs {len(exp)} rows)")
    return bad


# ---------------------------------------------------------------------------
# encoders: target/count encode vs exact DuckDB replays
# ---------------------------------------------------------------------------

def fuzz_encoders(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.encoders import count_encode, target_encode

    rng = random.Random(seed + 740_000)
    nrng = np.random.default_rng(seed + 740_000)
    ncat = rng.randint(2, 10)
    cats = [f"c{i}" for i in range(ncat)]
    key = np.array([cats[i] for i in nrng.integers(0, ncat, rows)],
                   dtype=object)
    key[nrng.random(rows) < 0.1] = None
    y = nrng.integers(0, 2, rows).astype(np.int64)
    df = pd.DataFrame({"rid": np.arange(rows), "k": key, "y": y})
    s = rng.choice([0.0, 0.5, 10.0])
    ds = _part(rng, rd.from_pandas(df))
    bad = []

    got = target_encode(ds, "k", "y", smoothing=s).to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql(f"""
        SELECT rid,
               (SUM(y) OVER (PARTITION BY k) + {s} *
                (SELECT CAST(SUM(y) AS DOUBLE)/COUNT(y) FROM t))
               / (COUNT(y) OVER (PARTITION BY k) + {s}) AS enc
        FROM t ORDER BY rid""").df()
    if s == 0.0:
        # smoothing 0: null keys form their own group in the engine and
        # in the SQL PARTITION BY alike
        pass
    a = got["k_te"].to_numpy(np.float64)
    b = exp["enc"].to_numpy(np.float64)
    if not np.allclose(a, b, rtol=0, atol=1e-12, equal_nan=True):
        i = int(np.nanargmax(np.abs(a - b)))
        bad.append(f"encoders seed {seed}: target_encode mismatch at "
                   f"rid {i}: {a[i]} vs {b[i]}")

    got_c = count_encode(ds, "k").to_pandas().sort_values("rid") \
        .reset_index(drop=True)
    exp_c = con.sql("""
        SELECT rid, COUNT(*) OVER (PARTITION BY k) AS cnt
        FROM t ORDER BY rid""").df()
    con.close()
    if not (got_c["k_count"].to_numpy(np.int64)
            == exp_c["cnt"].to_numpy(np.int64)).all():
        bad.append(f"encoders seed {seed}: count_encode mismatch")
    return bad


# ---------------------------------------------------------------------------
# scale: standard / minmax / bucketize vs exact DuckDB replays
# ---------------------------------------------------------------------------

def fuzz_scale(seed: int, rows: int, rd) -> list[str]:
    import duckdb

    from openmldb_ray.stages.scale import (bucketize, minmax_scale,
                                           standard_scale)

    rng = random.Random(seed + 750_000)
    nrng = np.random.default_rng(seed + 750_000)
    int_input = rng.random() < 0.5
    if int_input:
        x = nrng.integers(-1000, 1000, rows).astype(np.int64).astype(object)
    else:
        x = np.round(nrng.normal(scale=50, size=rows), 3).astype(object)
    x[nrng.random(rows) < 0.12] = None
    by = rng.choice([None, "g"])
    df = pd.DataFrame({"rid": np.arange(rows),
                       "g": nrng.integers(0, 4, rows),
                       "x": pd.array(
                           x, dtype="Int64" if int_input else "Float64")})
    pdf = df.copy()
    # NULLs must reach DuckDB as real NULLs: registering a pandas MASKED
    # array directly lets DuckDB read garbage under the mask, and a NaN
    # float is a VALUE to DuckDB (breaks MAX) — object column with None
    pdf["x"] = np.where(df["x"].isna(), None,
                        df["x"].astype("float64"))
    ds = _part(rng, rd.from_pandas(df))
    con = duckdb.connect()
    con.register("t", pdf)
    part = "PARTITION BY g" if by else ""
    bad = []

    got = standard_scale(ds, "x", by=by).to_pandas().sort_values("rid")
    exp = con.sql(f"""
        SELECT rid, (x - AVG(x) OVER ({part}))
                    / NULLIF(STDDEV_POP(x) OVER ({part}), 0) AS z
        FROM t ORDER BY rid""").df()
    a = got["x_z"].to_numpy(np.float64)
    b = exp["z"].to_numpy(np.float64)
    if not np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True):
        bad.append(f"scale seed {seed}: standard_scale by={by} mismatch")

    got = minmax_scale(ds, "x", by=by).to_pandas().sort_values("rid")
    exp = con.sql(f"""
        SELECT rid, (x - MIN(x) OVER ({part}))
                    / NULLIF(MAX(x) OVER ({part}) - MIN(x) OVER ({part}),
                             0) AS mn
        FROM t ORDER BY rid""").df()
    a = got["x_mm"].to_numpy(np.float64)
    b = exp["mn"].to_numpy(np.float64)
    if not np.allclose(a, b, rtol=0, atol=0, equal_nan=True):
        bad.append(f"scale seed {seed}: minmax_scale by={by} mismatch")

    edges = sorted(set(float(v) for v in nrng.integers(-500, 500, 4)))
    if len(edges) >= 2:
        got = bucketize(ds, "x", edges).to_pandas().sort_values("rid")
        nb = len(edges) - 1
        cases = " ".join(
            f"WHEN x < {edges[i + 1]} THEN {i}" for i in range(nb - 1))
        exp = con.sql(f"""
            SELECT rid, CASE WHEN x IS NULL THEN NULL
                        {cases} ELSE {nb - 1} END AS b
            FROM t ORDER BY rid""").df()
        a = pd.to_numeric(got["x_bin"], errors="coerce").to_numpy(float)
        b = pd.to_numeric(exp["b"], errors="coerce").to_numpy(float)
        if not np.allclose(a, b, equal_nan=True):
            bad.append(f"scale seed {seed}: bucketize mismatch")
    con.close()
    return bad


# ---------------------------------------------------------------------------
# dedup family: exact / minhash-LSH / simhash vs deterministic survivor sets
# ---------------------------------------------------------------------------

def fuzz_dedup(seed: int, rows: int, rd) -> list[str]:
    """Planted exact-duplicate groups among long random-word documents:
    the expected survivor set is DETERMINISTIC (min id per identical
    text; every unique doc survives — identical texts always collide at
    Jaccard 1 / Hamming 0, while long random-word docs sit far below any
    near-dup threshold), so all three dedup ops compare exactly."""
    from openmldb_ray.stages.dedup import (exact_dedup, minhash_lsh_dedup,
                                           simhash_dedup)

    rng = random.Random(seed + 760_000)
    nrng = np.random.default_rng(seed + 760_000)
    vocab = [f"w{i}x{i * 7919 % 10007}" for i in range(500)]
    n = max(30, rows // 2)
    texts: list = []
    for i in range(n):
        r = nrng.random()
        if r < 0.25 and texts:
            texts.append(texts[int(nrng.integers(0, len(texts)))])  # dup
        else:
            texts.append(" ".join(
                vocab[int(j)] for j in nrng.integers(0, len(vocab), 25)))
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})
    exp = set(df.groupby("text")["doc_id"].min())
    bad = []
    ds = _part(rng, rd.from_pandas(df))

    got = set(exact_dedup(ds, "text", keep_by="doc_id")
              .to_pandas()["doc_id"])
    if got != exp:
        bad.append(f"dedup seed {seed}: exact_dedup survivors "
                   f"{sorted(got ^ exp)[:5]} differ")

    got = set(minhash_lsh_dedup(_part(rng, rd.from_pandas(df)),
                                "text", "doc_id",
                                jaccard_threshold=0.8)
              .to_pandas()["doc_id"])
    if got != exp:
        bad.append(f"dedup seed {seed}: minhash survivors "
                   f"{sorted(got ^ exp)[:5]} differ")

    got = set(simhash_dedup(_part(rng, rd.from_pandas(df)),
                            "text", "doc_id", hamming_threshold=3)
              .to_pandas()["doc_id"])
    if got != exp:
        bad.append(f"dedup seed {seed}: simhash survivors "
                   f"{sorted(got ^ exp)[:5]} differ")
    return bad


OPS = [fuzz_pq, fuzz_knn_join, fuzz_paradedup, fuzz_encoders,
       fuzz_scale, fuzz_dedup]


def run_seed(seed: int, rows: int, rd) -> list[str]:
    bad = []
    for op in OPS:
        bad.extend(op(seed, rows, rd))
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=25)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--rows", type=int, default=250)
    args = ap.parse_args()

    import logging

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    failures = 0
    for seed in range(args.start, args.start + args.seeds):
        bad = run_seed(seed, args.rows, rd)
        for b in bad:
            print("FAIL", b)
        failures += len(bad)
        print(f"seed {seed}: {'ok' if not bad else f'{len(bad)} failures'}",
              flush=True)
    ray.shutdown()
    print(f"done: {failures} failures over {args.seeds} seeds")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
