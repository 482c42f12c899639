"""Flagship pipeline: the tokenized-sequence as-of-join + window suite.

Input shape per BASELINE.json input_hint: a Parquet-able table of
pre-tokenized training sequences
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``,
synthesized deterministically (hash-counter PRNG — batching-independent,
resumable) per FIXTURES.md §F5. Derived in-pipeline: ``entity_key :=
source``, ``event_ts`` (ms, with ties and out-of-order arrival).

Stages (SURVEY §7.2, the reference dataflow re-expressed Ray-Data-first):
1. distributed deterministic generation (or read) of sequences
2. payload split: ``tokens`` never enters the shuffle — only the narrow
   feature columns do (SURVEY §7.5 "wide token rows")
3. point-in-time LAST JOIN against per-(source, day) stats, available only
   after the day closes (zero temporal leakage)
4. salted multi-window features over (entity_key, event_ts) with WINDOW
   UNION backfill from the warm-up history stream
5. hash re-join of features to the token payload by doc_id
6. partitioned parquet output with per-partition lineage (resumable)

Per-row invariant: output ``tokens`` byte-identical to input ``tokens``
(tested in tests/test_flagship.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.aggregates import Agg
from ..core.frames import rows_range
from ..sources.io import read_table
from ..stages.join_stage import last_join
from ..stages.window_stage import window_agg_salted
from ..config import broadcast_limit as _cfg_broadcast_limit

VOCAB = 50257
BASE_TS = 1_700_000_000_000  # ms
STEP_MS = 60_000
SOURCES = ("web", "book", "code", "wiki", "chat")
SOURCE_CUM = (0.70, 0.80, 0.88, 0.95, 1.0)  # hot "web" ≈ 70% → real skew
DAY_MS = 86_400_000


def _h64(x: np.ndarray, stream: int) -> np.ndarray:
    """splitmix64-style counter hash: deterministic, vectorized,
    independent of batch boundaries (the generation is thus resumable)."""
    z = (x.astype(np.uint64) + np.uint64((stream * 0x9E3779B97F4A7C15) % (1 << 64)))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray, stream: int) -> np.ndarray:
    return _h64(x, stream).astype(np.float64) / float(2**64)


def _hashed_ids(ids: np.ndarray, seed: int) -> np.ndarray:
    return ids.astype(np.uint64) + np.uint64(seed) * np.uint64(0x100000001B3)


def _h64_inplace(z: np.ndarray, stream: int) -> np.ndarray:
    """splitmix64 finalizer computed with in-place ops (z is consumed) —
    minimizes DRAM traffic; the concurrent map tasks on one node are
    memory-bandwidth-bound, not ALU-bound."""
    np.add(z, np.uint64((stream * 0x9E3779B97F4A7C15) % (1 << 64)), out=z)
    t = z >> np.uint64(30)
    np.bitwise_xor(z, t, out=z)
    np.multiply(z, np.uint64(0xBF58476D1CE4E5B9), out=z)
    np.right_shift(z, np.uint64(27), out=t)
    np.bitwise_xor(z, t, out=z)
    np.multiply(z, np.uint64(0x94D049BB133111EB), out=z)
    np.right_shift(z, np.uint64(31), out=t)
    np.bitwise_xor(z, t, out=z)
    return z


_GEN_CHUNK_TOKENS = 1 << 18  # ~256k tokens ≈ a few MB of temporaries → cache-resident


def gen_tokens(raw_ids: np.ndarray, seed: int):
    """Token arrays for the given raw doc indices — tokens are a pure
    function of (doc index, seed), so any task can (re)produce its shard of
    the payload without a shuffle (the partition-aligned attach relies on
    this; for stored corpora the analog is re-reading the payload column of
    the feature row's source shard).

    Computed in cache-sized chunks with in-place uint64 arithmetic: the
    naive whole-batch version streams ~100 B of temporaries per 4 B token
    through DRAM, which saturates node memory bandwidth long before the
    cores are busy (measured: task time inflates ~7x at 32 concurrent
    workers). Chunking keeps temporaries L2-resident."""
    ids = _hashed_ids(raw_ids, seed)
    u_len = _u01(ids, 1)
    n_tok = (8 + np.floor(504 * u_len**3)).astype(np.int32)
    total = int(n_tok.sum())
    offs = np.empty(len(ids) + 1, dtype=np.int64)
    offs[0] = 0
    np.cumsum(n_tok, out=offs[1:])
    doc_keys = ids * np.uint64(2654435761)
    flat = np.empty(total, dtype=np.int32)
    # walk docs in chunks of ~_GEN_CHUNK_TOKENS tokens
    doc_starts = np.searchsorted(offs[1:], np.arange(0, total, _GEN_CHUNK_TOKENS), side="left")
    doc_bounds = list(doc_starts) + [len(ids)]
    with np.errstate(over="ignore"):
        for bi in range(len(doc_bounds) - 1):
            d0, d1 = doc_bounds[bi], doc_bounds[bi + 1]
            if d0 >= d1:
                continue
            lo, hi = offs[d0], offs[d1]
            z = np.repeat(doc_keys[d0:d1], n_tok[d0:d1])
            j = np.arange(lo, hi, dtype=np.uint64)
            j -= np.repeat(offs[d0:d1].astype(np.uint64), n_tok[d0:d1])
            np.add(z, j, out=z)
            _h64_inplace(z, 7)
            np.mod(z, np.uint64(VOCAB), out=z)
            flat[lo:hi] = z.astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32)), pa.array(flat))


def gen_narrow_batch(ids: np.ndarray, seed: int, num_docs: int) -> pa.Table:
    """Generate ONLY the narrow feature columns (no token payload) — what
    the shuffle stages consume. Columns: doc_num, n_tok, source, event_ts,
    lang_bucket."""
    raw_in = ids.astype(np.uint64)
    hids = _hashed_ids(raw_in, seed)
    u_len = _u01(hids, 1)
    n_tok = (8 + np.floor(504 * u_len**3)).astype(np.int32)  # zipf-ish [8,512]
    u_src = _u01(hids, 2)
    src_idx = np.searchsorted(np.asarray(SOURCE_CUM), u_src, side="left")
    src_idx = np.minimum(src_idx, len(SOURCES) - 1)
    source = np.asarray(SOURCES, dtype=object)[src_idx]
    # event_ts: hashed slot with deliberate ties (~2 docs/slot) — arrival
    # order is NOT ts order, the temporal shuffle must sort
    slots = (_h64(hids, 4) % np.uint64(max(1, num_docs // 2))).astype(np.int64)
    event_ts = BASE_TS + slots * STEP_MS
    import pyarrow.compute as pc

    lang_ids = pa.array((_h64(hids, 5) % np.uint64(8)).astype(np.int64))
    lang_bucket = pc.binary_join_element_wise("lb", pc.cast(lang_ids, pa.string()), "")
    return pa.Table.from_arrays(
        [pa.array(raw_in.astype(np.int64)), pa.array(n_tok),
         pa.array(source, type=pa.string()), pa.array(event_ts), lang_bucket],
        names=["doc_num", "n_tok", "source", "event_ts", "lang_bucket"],
    )


def gen_sequences_batch(ids: np.ndarray, seed: int, num_docs: int) -> pa.Table:
    """Generate the full F5 sequence rows for the given doc indices."""
    narrow = gen_narrow_batch(ids, seed, num_docs)
    raw = narrow["doc_num"].to_numpy()
    tokens = gen_tokens(raw.astype(np.uint64), seed)
    doc_id = _doc_id_strings(raw)
    return pa.Table.from_arrays(
        [doc_id, narrow["doc_num"].combine_chunks(), tokens,
         narrow["n_tok"].combine_chunks(), narrow["source"].combine_chunks(),
         narrow["event_ts"].combine_chunks(), narrow["lang_bucket"].combine_chunks()],
        names=["doc_id", "doc_num", "tokens", "n_tok", "source", "event_ts", "lang_bucket"],
    )


def make_sequences(num_docs: int, seed: int = 42, override_blocks: int | None = None):
    """Distributed deterministic sequence table (Dataset)."""
    import ray.data as rd

    ds = rd.range(num_docs, override_num_blocks=override_blocks)

    def fn(b: pa.Table) -> pa.Table:
        return gen_sequences_batch(b["id"].to_numpy(), seed, num_docs)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def make_narrow(num_docs: int, seed: int = 42, override_blocks: int | None = None):
    """Distributed generation of only the narrow feature columns."""
    import ray.data as rd

    ds = rd.range(num_docs, override_num_blocks=override_blocks)

    def fn(b: pa.Table) -> pa.Table:
        return gen_narrow_batch(b["id"].to_numpy(), seed, num_docs)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def default_num_docs(sf_dir: str | None) -> int:
    if sf_dir is None:
        return 5_000
    n_docs = read_table(sf_dir, "documents").count()
    return n_docs * 10  # sf0.001→5k, sf0.01→50k, sf0.1→500k


FEATURE_AGGS = [
    Agg.sum("n_tok", "sum_tok_6h"),
    Agg.count_star("cnt_6h"),
    Agg.avg("n_tok", "avg_tok_6h"),
    Agg.min("n_tok", "min_tok_6h"),
    Agg.max("n_tok", "max_tok_6h"),
    Agg.lag("n_tok", 1, "lag1_tok"),
    Agg.distinct_count("lang_bucket", "dc_lang_6h"),
    Agg.topn_frequency("lang_bucket", 3, "top_lang_6h"),
]
FRAME = rows_range("6h")
BUCKET_MS = DAY_MS  # >= frame extent; ~870 (entity, day) groups at bench scale

#: canonical feature-row schema (before the token payload is re-attached);
#: declared once so the bucketed payload join can pad statically
FEATURE_SCHEMA: dict[str, pa.DataType] = {
    "doc_num": pa.int64(),
    "source": pa.string(),
    "event_ts": pa.int64(),
    "n_tok": pa.int32(),
    "lang_bucket": pa.string(),
    "prev_day_sum_tok": pa.float64(),
    "prev_day_cnt": pa.float64(),
    "prev_day_avail_ts": pa.float64(),
    "sum_tok_6h": pa.float64(),
    "cnt_6h": pa.int64(),
    "avg_tok_6h": pa.float64(),
    "min_tok_6h": pa.float64(),
    "max_tok_6h": pa.float64(),
    "lag1_tok": pa.float64(),
    "dc_lang_6h": pa.int64(),
    "top_lang_6h": pa.string(),
}


def _canonicalize(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    arrays = [pc.cast(t[name], typ).combine_chunks() for name, typ in FEATURE_SCHEMA.items()]
    return pa.Table.from_arrays(arrays, names=list(FEATURE_SCHEMA))


def _doc_id_strings(nums) -> pa.Array:
    import pyarrow.compute as pc

    arr = nums if isinstance(nums, (pa.Array, pa.ChunkedArray)) else pa.array(
        np.asarray(nums, dtype=np.int64))
    padded = pc.utf8_lpad(pc.cast(arr, pa.string()), width=12, padding="0")
    out = pc.binary_join_element_wise("doc_", padded, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _doc_bucket(tbl: pa.Table, num_buckets: int) -> pa.Array:
    """Stable bucket from the numeric doc index — avoids process-dependent
    Python string hashing."""
    import pyarrow.compute as pc

    h = pc.multiply(tbl["doc_num"], pa.scalar(2654435761, pa.int64()))
    return pc.cast(pc.bit_wise_and(h, num_buckets - 1), pa.int32())


def attach_payload_regen(feats, seed: int = 42):
    """Partition-aligned payload attach (the 100 TB path, ZERO shuffle):
    each feature batch regenerates/re-reads exactly its own rows' token
    arrays by doc index — possible because the payload is a pure function
    of the key (synthetic corpus) or, for stored corpora, resides in the
    same source shard the feature row's lineage points at. Also emits the
    doc_id string. Fully elastic stateless tasks."""

    def fn(t: pa.Table) -> pa.Table:
        t = _canonicalize(t)
        nums = t["doc_num"].to_numpy()
        toks = gen_tokens(nums.astype(np.uint64), seed)
        t = t.append_column("doc_id", _doc_id_strings(nums))
        return t.append_column("tokens", toks)

    return feats.map_batches(fn, batch_format="pyarrow", batch_size=None)


def attach_payload(feats, payload, *, broadcast_limit: int | None = None,
                   num_buckets: int = 64):
    """Re-attach a STORED token payload to the feature rows by doc_num.

    Broadcast path (feature rows fit in the object store comfortably):
    the canonicalized feature table is collected once, ``ray.put``, and the
    payload STREAMS through a stateless arrow merge — tokens cross zero
    shuffles, zero pandas conversions. Fallback: bucketed hash join.
    """
    import ray

    ftbl_ds = feats.map_batches(_canonicalize, batch_format="pyarrow",
                                batch_size=None).materialize()
    if ftbl_ds.count() > _cfg_broadcast_limit(broadcast_limit, 2_000_000):
        return _bucketed_attach_tokens(ftbl_ds, payload, num_buckets=num_buckets)
    ftbl = pa.concat_tables(
        ftbl_ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    ref = ray.put(ftbl)

    class _Attach:
        def __init__(self):
            self.f = ray.get(ref)
            # build the doc_num hash index ONCE per actor (pc.index_in would
            # rebuild it for every batch — the dominant cost at 1M+ rows)
            self.idx = pd.Index(self.f["doc_num"].to_pandas())

        def __call__(self, t: pa.Table) -> pa.Table:
            pos = self.idx.get_indexer(t["doc_num"].to_pandas())
            mask = pos >= 0
            t = t.filter(pa.array(mask))
            sel = self.f.take(pa.array(pos[mask], type=pa.int64()))
            out = sel.append_column("doc_id", t["doc_id"].combine_chunks())
            return out.append_column("tokens", t["tokens"].combine_chunks())

    return payload.map_batches(_Attach, batch_format="pyarrow",
                               concurrency=(1, 16), batch_size=None)


def _bucketed_attach_tokens(feats, payload, num_buckets: int = 64):
    """Partitioned hash join feats ⋈ payload on doc_num (list payload stays
    in Arrow end to end; payload must carry doc_id, doc_num, tokens)."""
    import pyarrow.compute as pc

    tok_type = pa.list_(pa.int32())

    def tag_feats(t: pa.Table) -> pa.Table:
        t = t.append_column("__bucket", _doc_bucket(t, num_buckets))
        t = t.append_column("doc_id", pa.nulls(t.num_rows, type=pa.string()))
        t = t.append_column("tokens", pa.nulls(t.num_rows, type=tok_type))
        return t.append_column("__is_feat", pa.array(np.ones(t.num_rows, bool)))

    ft = feats.map_batches(_canonicalize, batch_format="pyarrow", batch_size=None).map_batches(
        tag_feats, batch_format="pyarrow", batch_size=None)
    feat_types = dict(FEATURE_SCHEMA)
    feat_names = [n for n in FEATURE_SCHEMA if n not in ("doc_num",)]
    col_order = list(FEATURE_SCHEMA) + ["__bucket", "doc_id", "tokens", "__is_feat"]

    def tag_payload(t: pa.Table) -> pa.Table:
        t = t.append_column("__bucket", _doc_bucket(t, num_buckets))
        for name in feat_names:
            t = t.append_column(name, pa.nulls(t.num_rows, type=feat_types[name]))
        t = t.append_column("__is_feat", pa.array(np.zeros(t.num_rows, bool)))
        return t.select(col_order)

    pl = payload.map_batches(tag_payload, batch_format="pyarrow", batch_size=None)
    both = ft.union(pl)

    def join_bucket(t: pa.Table) -> pa.Table:
        mask = t["__is_feat"].combine_chunks()
        f = t.filter(mask)
        p = t.filter(pc.invert(mask))
        idx = pc.index_in(f["doc_num"], value_set=p["doc_num"].combine_chunks())
        f = f.drop_columns(["doc_id", "tokens", "__bucket", "__is_feat"])
        f = f.append_column("doc_id", p["doc_id"].combine_chunks().take(idx))
        return f.append_column("tokens", p["tokens"].combine_chunks().take(idx))

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def flagship(
    sf_dir: str | None = None,
    *,
    num_docs: int | None = None,
    seed: int = 42,
    out_dir: str | None = None,
    resume: bool = True,
    attach: str = "regen",
):
    """Run the full suite; returns the feature Dataset (tokens re-attached).

    ``attach``: "regen" (partition-aligned regeneration — zero-shuffle 100 TB
    path), "broadcast" or "bucketed" (general stored-payload joins).
    When ``out_dir`` is given, also writes partitioned parquet with
    per-partition lineage and returns the written dataset.
    """
    if num_docs is None:
        num_docs = default_num_docs(sf_dir)

    # ---- payload split: tokens stay out of every shuffle -------------------
    # ONLY the narrow feature columns are generated/read for the shuffle
    # stages; the token payload is produced exactly once, in the final
    # partition-aligned attach (SURVEY §7.5 "wide token rows").
    # narrow is consumed TWICE (window shuffle + daily partial agg): at
    # bench scale pinning it via materialize() is cheapest, but at
    # north-rule scale (10^12 rows) that is tens of TB of object store —
    # generation is pure and partition-parallel, so each consumer streams
    # its own regeneration pass instead (recompute-per-consumer).
    narrow = make_narrow(num_docs, seed)
    if num_docs <= 50_000_000:
        narrow = narrow.materialize()

    # ---- WINDOW UNION backfill: warm-up history feeds state only ----------
    # primary/union membership is a row-level predicate of ONE stream, so
    # flag in a single pass instead of filter-splitting (which would run
    # the upstream twice)
    split_ts = BASE_TS + (num_docs // 2) * STEP_MS // 5  # first ~20% = history

    def flag_primary(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("__is_primary",
                               pc.greater_equal(t["event_ts"], split_ts))

    flagged = narrow.map_batches(flag_primary, batch_format="pyarrow", batch_size=None)
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    feats = window_agg_salted(
        flagged, "source", "event_ts", FEATURE_AGGS, FRAME,
        bucket_ms=BUCKET_MS, union="preflagged", tiebreak="doc_num",
        num_partitions=max(32, ncpu * 4),
    )

    # ---- per-(source, day) stats table, point-in-time available only after
    # the day closes (avail_ts = day end) — the LAST JOIN right side --------
    # partial-aggregate inside map_batches, combine the tiny partials on the
    # driver — the result is ~(sources x days) rows, so a distributed
    # groupby shuffle would be pure overhead (SURVEY §4 "pre-aggregate").
    # Joining AFTER the window keeps the prev_day_* columns out of the
    # window shuffle entirely.
    def partial_day(df: pd.DataFrame) -> pd.DataFrame:
        avail = (df["event_ts"] // DAY_MS) * DAY_MS + DAY_MS
        return (pd.DataFrame({"source": df["source"], "avail_ts": avail,
                              "day_sum_tok": df["n_tok"], "day_cnt": 1})
                .groupby(["source", "avail_ts"], as_index=False).sum())

    daily = (narrow.select_columns(["source", "event_ts", "n_tok"])
             .map_batches(partial_day, batch_format="pandas", batch_size=None)
             .to_pandas()
             .groupby(["source", "avail_ts"], as_index=False).sum())

    joined = last_join(
        feats, daily, ("source", "source"),
        order_by="avail_ts", asof_left_ts="event_ts", tiebreak="avail_ts",
        right_cols={"day_sum_tok": "prev_day_sum_tok", "day_cnt": "prev_day_cnt",
                    "avail_ts": "prev_day_avail_ts"},
        strategy="broadcast",
    )

    # ---- re-attach the token payload ---------------------------------------
    if attach == "regen":
        out = attach_payload_regen(joined, seed)
    else:
        payload = make_sequences(num_docs, seed).select_columns(
            ["doc_id", "doc_num", "tokens"])
        limit = 2_000_000_000 if attach == "broadcast" else 0
        out = attach_payload(joined, payload, broadcast_limit=limit)

    if out_dir is not None:
        from ..state.lineage import write_partitioned_with_lineage

        # no materialize: the fresh-run path is ONE streaming write pass;
        # pinning the full feature table in the object store to save a
        # recompute on the (rare) resume path is the wrong trade at scale
        write_partitioned_with_lineage(out, out_dir, "source",
                                       checksum_col="n_tok", resume=resume)
    return out


def pit_oracle_features(df: pd.DataFrame, split_ts: int) -> pd.DataFrame:
    """Independent point-in-time recomputation (brute force O(n²) per
    source): window of row r = rows of the same source with ts in
    [r.ts-6h, r.ts] that precede r in the sorted stream — history rows
    included, future rows excluded. Zero leakage by construction; used by
    both pytest and the driver parity query as the flagship's oracle."""
    frame_ms = 6 * 3600 * 1000
    out_rows = []
    for _, g in df.groupby("source"):
        g = g.sort_values(["event_ts", "doc_id"], kind="stable").reset_index(drop=True)
        ts = g["event_ts"].to_numpy()
        prim = ts >= split_ts
        for i in range(len(g)):
            if not prim[i]:
                continue
            lo = ts[i] - frame_ms
            win = [j for j in range(i + 1) if ts[j] >= lo]
            sub = g.iloc[win]
            lag1 = g["n_tok"].iloc[win[-2]] if len(win) >= 2 else None
            counts = sub["lang_bucket"].value_counts()
            items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            out_rows.append({
                "doc_id": g["doc_id"].iloc[i],
                "sum_tok_6h": float(sub["n_tok"].sum()),
                "cnt_6h": len(sub),
                "avg_tok_6h": float(sub["n_tok"].mean()),
                "min_tok_6h": int(sub["n_tok"].min()),
                "max_tok_6h": int(sub["n_tok"].max()),
                "lag1_tok": lag1,
                "dc_lang_6h": sub["lang_bucket"].nunique(),
                "top_lang_6h": ",".join(k for k, _ in items[:3]),
            })
    return pd.DataFrame(out_rows)
