"""Deduplication for training-data pipelines (north-rule extension;
no reference analog — OpenMLDB has no dedup operator, SparkPlanner.scala:274
throws on Distinct). All variants follow the same scale shape:

    vectorized per-batch signature computation (map_batches)
    → hash shuffle on the signature (groupby)
    → per-group survivor selection / candidate verification

Exact dedup is one shuffle on a 64-bit content hash. MinHash-LSH shuffles
(band_id, band_hash) pairs — b× row amplification of tiny rows, NOT of the
payload — then verifies candidates with real Jaccard. At 100 TB the
signature stream is orders of magnitude smaller than the documents; the
text/tokens payload never moves through the LSH shuffle (only doc ids do;
survivors are re-joined by id).
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from ..core.hashing import stable_hash64 as _stable_hash64  # noqa: F401 (re-export)
from ..config import broadcast_limit as _cfg_broadcast_limit

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_MERSENNE = (1 << 61) - 1
_M61 = np.uint64(_MERSENNE)


def _mod_mersenne61(m: np.ndarray) -> np.ndarray:
    """In-place x % (2^61-1) for uint64 arrays via shift-add fold.

    2^61 ≡ 1 (mod M61), so x = q·2^61 + r ⇒ x mod M61 = (q + r) mod M61
    with q = x>>61 < 8, r = x & M61 < M61, hence one conditional subtract.
    Bit-identical to ``%`` but all AVX-vectorizable ops — u64 hardware
    division is the single most expensive instruction in the signature
    kernel (the fold is ~3x faster end-to-end on the slab loop)."""
    q = m >> np.uint64(61)
    m &= _M61
    m += q
    np.subtract(m, _M61, out=m, where=m >= _M61)
    return m


def anti_join_ids(ds: "ray.data.Dataset", dup_ids: "ray.data.Dataset",
                  id_col: str, *, num_buckets: int = 256,
                  num_partitions: int | None = None,
                  broadcast_limit: int | None = None) -> "ray.data.Dataset":
    """Distributed hash ANTI-JOIN: rows of ``ds`` whose ``id_col`` appears in
    ``dup_ids`` (a one-column Dataset) are dropped.

    Auto strategy (same shape as join_stage.last_join's materialize-once +
    broadcast_limit): the dup side is materialized once (object store, NOT
    the driver heap) and its row count read from metadata. At or below
    ``broadcast_limit`` ids, the set is broadcast via ``ray.put`` and the
    anti-join is a shuffle-free ``pc.is_in`` filter over ``ds`` — dup sets
    are usually tiny relative to the corpus, and the all-to-all shuffle
    below costs more than the whole filter. Above the limit, both sides
    are bucketed by a hash of the id and co-grouped — one shuffle, nothing
    driver-side (at 100 TB duplicate ids can be billions of rows).
    Duplicate ids may repeat on the dup side in both paths."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..core.hashing import add_bucket_column

    dup_ids = dup_ids.materialize()
    n_dup = dup_ids.count()  # metadata read — the pipeline ran once above
    if n_dup == 0:
        return ds
    if n_dup <= _cfg_broadcast_limit(broadcast_limit, 2_000_000):
        vals = pa.concat_tables(
            [pa.table({id_col: b[id_col]})
             for b in dup_ids.iter_batches(batch_format="pyarrow")]
        )[id_col].combine_chunks()
        vref = ray.put(vals)

        def drop_broadcast(t: pa.Table) -> pa.Table:
            from ..core.hashing import quiet_ray_data_logs

            quiet_ray_data_logs()
            v = pc.cast(ray.get(vref), t[id_col].type.storage_type
                        if hasattr(t[id_col].type, "storage_type")
                        else t[id_col].type)
            keep = pc.invert(pc.is_in(t[id_col], value_set=v))
            return t.filter(pc.fill_null(keep, True))

        return ds.map_batches(drop_broadcast, batch_format="pyarrow",
                              batch_size=None)

    # normalize to Arrow blocks FIRST so the schema carries real Arrow types
    # (a pandas-block dataset reports numpy dtypes, which can't drive the
    # null-padding below)
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow", batch_size=None)
    schema = ds.schema()
    names, types = list(schema.names), list(schema.types)
    id_type = types[names.index(id_col)]

    def pad_dups(t: pa.Table) -> pa.Table:
        arrays = []
        for name, typ in zip(names, types):
            if name == id_col:
                arrays.append(pc.cast(t[id_col], typ).combine_chunks())
            else:
                arrays.append(pa.nulls(t.num_rows, typ))
        out = pa.Table.from_arrays(arrays, names=names)
        return out.append_column("__isdup", pa.array(np.ones(t.num_rows, bool)))

    def mark_rows(t: pa.Table) -> pa.Table:
        t = t.select(names).replace_schema_metadata(None)
        return t.append_column("__isdup", pa.array(np.zeros(t.num_rows, bool)))

    add_b = add_bucket_column([id_col], "__ab", num_buckets)
    left = ds.map_batches(mark_rows, batch_format="pyarrow", batch_size=None) \
             .map_batches(add_b, batch_format="pyarrow", batch_size=None)
    right = dup_ids.map_batches(pad_dups, batch_format="pyarrow", batch_size=None) \
                   .map_batches(add_b, batch_format="pyarrow", batch_size=None)

    def drop_dups(t: pa.Table) -> pa.Table:
        from ..core.hashing import quiet_ray_data_logs
        quiet_ray_data_logs()
        isdup = pc.fill_null(t["__isdup"], False)
        dup_vals = pc.cast(t[id_col].filter(isdup), id_type).combine_chunks()
        rows = t.filter(pc.invert(isdup))
        if len(dup_vals):
            keep = pc.invert(pc.is_in(rows[id_col], value_set=dup_vals))
            rows = rows.filter(pc.fill_null(keep, True))
        return rows.drop_columns(["__isdup", "__ab"])

    from ..core.empty_ds import union_any

    return (union_any(left, right)
            .groupby("__ab", num_partitions=num_partitions)
            .map_groups(drop_dups, batch_format="pyarrow"))


def exact_dedup(ds: "ray.data.Dataset", on: str, *, keep_by: str,
                num_partitions: int | None = None) -> "ray.data.Dataset":
    """Exact dedup on column ``on``; survivor = min ``keep_by`` per value.
    Hash-partition by content hash + per-group first (SURVEY §7.4)."""

    from ..core.hashing import add_bucket_column

    # shuffle on a COARSE bucket of the content hash (1024 groups), not the
    # raw hash: one map_groups call per mostly-singleton group would pay a
    # Python call per row; per-bucket pandas groupby is vectorized. The
    # bucket column is appended Arrow-native so shuffle blocks stay Arrow.
    add_b = add_bucket_column([on], "__b", 1024)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        # group by the actual value within the bucket — exact, no
        # hash-collision risk. dropna=False: null IS a dedup value (one
        # null-keyed survivor, SQL GROUP BY semantics) — the pandas
        # default silently DELETED every null-keyed row
        return (g.sort_values(keep_by, kind="stable")
                 .groupby(on, sort=False, dropna=False).head(1)
                 .drop(columns="__b"))

    return (ds.map_batches(add_b, batch_format="pyarrow", batch_size=None)
              .groupby("__b", num_partitions=num_partitions)
              .map_groups(pick, batch_format="pandas"))


def _txt(t) -> str:
    """Null text is EMPTY text, never the literal 'None' (library
    convention, same class as the HashTokenizer/lm/classify fixes): null
    docs must not share a phantom signature with each other beyond the
    empty-doc signature, nor collide with a real document whose text is
    the word 'None'."""
    if isinstance(t, str):
        return t
    if t is None or pd.isna(t):
        return ""
    return str(t)


def _shingles(text: str, k: int) -> set:
    t = " ".join(_txt(text).lower().split())
    if len(t) < k:
        return {t}
    return {t[i:i + k] for i in range(len(t) - k + 1)}


_ROLL_B = np.uint64(1099511628211)  # FNV prime, odd → invertible mod 2^64
_ROLL_BINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def rolling_hashes(t: bytes, k: int) -> np.ndarray:
    """In-order 64-bit rolling polynomial hashes of all k-byte windows,
    fully vectorized (wraparound uint64): h_i = (S_{i+k} - S_i)·B^{-i}
    where S is the prefix sum of c_j·B^j."""
    c = np.frombuffer(t, np.uint8).astype(np.uint64) + np.uint64(1)
    n = c.shape[0]
    with np.errstate(over="ignore"):
        powB = np.empty(n, np.uint64)
        powB[0] = 1
        np.cumprod(np.full(n - 1, _ROLL_B, np.uint64), out=powB[1:])
        S = np.zeros(n + 1, np.uint64)
        np.cumsum(c * powB, out=S[1:])
        powBinv = np.empty(n - k + 1, np.uint64)
        powBinv[0] = 1
        if n - k > 0:
            np.cumprod(np.full(n - k, _ROLL_BINV, np.uint64), out=powBinv[1:])
        h = (S[k:] - S[:-k]) * powBinv
    return h


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique 64-bit hashes of all k-char shingles of the normalized text."""
    t = " ".join(_txt(text).lower().split()).encode("utf-8", "ignore")
    if len(t) <= k:
        return np.asarray(
            [int.from_bytes(hashlib.blake2b(t, digest_size=8).digest(), "big")],
            dtype=np.uint64)
    return np.unique(rolling_hashes(t, k))


def _minhash_coeffs(num_perm: int, seed: int):
    """Deterministic permutation coefficients, cached per worker process
    (cheap to build — no actor pool needed for this stage)."""
    key = (num_perm, seed)
    got = _minhash_coeffs._cache.get(key)
    if got is None:
        rng = np.random.default_rng(seed)
        got = (rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64),
               rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64))
        _minhash_coeffs._cache[key] = got
    return got


_minhash_coeffs._cache = {}

# --- mega-group-safe within-bucket verification -----------------------------
#
# LSH buckets on real web corpora are wildly skewed: boilerplate (empty pages,
# templated headers) creates degenerate (band, band_hash) groups holding
# millions of near-identical docs. A naive O(g²) pairwise verify pins one
# worker for hours on such a group (the reference's skew machinery,
# utils/SkewDataFrameUtils.scala:26-143, solves the analogous problem for
# window groups). The scale-safe shape used by every verify below:
#
#   1. exact-key collapse (vectorized np.unique on the raw signature bytes):
#      byte-identical signatures are certain duplicates of the min-id row —
#      the degenerate mega-bucket case costs ONE sort, zero pairwise work;
#   2. bounded greedy verify for the surviving representatives: if more than
#      _VERIFY_CAP reps remain, sort them by signature bytes (near-identical
#      signatures sort adjacent) and verify within consecutive cap-sized
#      chunks only. Pairs spanning chunks are missed — bounded recall loss
#      on an already-approximate algorithm (other bands/segments/tables give
#      further chances) in exchange for O(g · cap) worst-case work.
#
# Groups at or under the cap run the exact same greedy as before (min-id
# survivor), so small-scale results are unchanged.

_VERIFY_CAP = 2048

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _collapse_exact(keys_void: np.ndarray, ids: np.ndarray, payload: np.ndarray,
                    dups: list):
    """Drop rows whose key equals an earlier (smaller-id) row's key.

    ``keys_void`` is any np.unique-able 1-D key array (void byte view or
    plain uint64). ``ids`` must be pre-sorted ascending so np.unique's
    first-occurrence index IS the min-id representative. Appends collapsed
    ids to ``dups`` and returns (ids, payload, keys) of the reps."""
    first = np.unique(keys_void, return_index=True)[1]
    if len(first) == len(ids):
        return ids, payload, keys_void
    mask = np.zeros(len(ids), bool)
    mask[first] = True
    dups.extend(ids[~mask])
    first.sort()
    return ids[first], payload[first], keys_void[first]


def _greedy_sig_dups(sigs: np.ndarray, ids: np.ndarray, need: int, dups: list):
    """Greedy min-id-survivor scan, one vectorized compare per row against
    the kept set: row i is a dup iff ≥``need`` signature components agree
    with some kept row."""
    K = np.empty_like(sigs)
    K[0] = sigs[0]
    kn = 1
    for i in range(1, len(ids)):
        if int((K[:kn] == sigs[i]).sum(axis=1).max()) >= need:
            dups.append(ids[i])
        else:
            K[kn] = sigs[i]
            kn += 1


def _collapse_exact_pairs(keys_void: np.ndarray, ids: np.ndarray,
                          payload: np.ndarray, pairs: list):
    """Pair-emitting variant of _collapse_exact: members of an identical-key
    group pair to the group's min-id representative. Returns the reps."""
    first, inverse = np.unique(keys_void, return_index=True,
                               return_inverse=True)[1:]
    if len(first) == len(ids):
        return ids, payload, keys_void
    rep_ids = ids[first][inverse]
    member = np.ones(len(ids), bool)
    member[first] = False
    pairs.extend(zip(ids[member], rep_ids[member]))
    first.sort()
    return ids[first], payload[first], keys_void[first]


def _greedy_sig_pairs(sigs: np.ndarray, ids: np.ndarray, need: int,
                      pairs: list):
    """Pair-emitting variant of _greedy_sig_dups: a duplicate row pairs to
    the kept row it agrees with most."""
    K = np.empty_like(sigs)
    K[0] = sigs[0]
    kept_ids = [ids[0]]
    for i in range(1, len(ids)):
        agree = (K[:len(kept_ids)] == sigs[i]).sum(axis=1)
        j = int(agree.argmax())
        if int(agree[j]) >= need:
            pairs.append((ids[i], kept_ids[j]))
        else:
            K[len(kept_ids)] = sigs[i]
            kept_ids.append(ids[i])


def _greedy_hamming_dups(h: np.ndarray, ids: np.ndarray, thresh: int, dups: list):
    """Greedy min-id-survivor scan under hamming distance (uint64 keys),
    popcount via byte LUT — no per-pair Python bin()."""
    K = np.empty_like(h)
    K[0] = h[0]
    kn = 1
    for i in range(1, len(ids)):
        x = K[:kn] ^ h[i]
        d = _POP8[np.ascontiguousarray(x).view(np.uint8).reshape(kn, 8)] \
            .sum(axis=1, dtype=np.int64)
        if int(d.min()) <= thresh:
            dups.append(ids[i])
        else:
            K[kn] = h[i]
            kn += 1


def _chunked_verify(payload: np.ndarray, ids: np.ndarray, keys_void: np.ndarray,
                    greedy, dups: list, cap: int = _VERIFY_CAP):
    """Run ``greedy(payload_chunk, ids_chunk, dups)`` exactly if the group is
    at most ``cap`` rows, else over key-sorted cap-sized chunks."""
    if len(ids) <= cap:
        greedy(payload, ids, dups)
        return
    order = np.argsort(keys_void, kind="stable")
    for s in range(0, len(order), cap):
        sel = order[s:s + cap]
        sel = sel[np.argsort(ids[sel], kind="stable")]  # min-id survivor
        greedy(payload[sel], ids[sel], dups)

# cap on windows × num_perm temp matrix size per vectorized slab — sized so
# the (windows × num_perm) uint64 temp stays cache-resident (~16 MB at 64
# perms); larger slabs thrash memory bandwidth and run ~7x slower
_SIG_SLAB_WINDOWS = 32_000


def minhash_signatures(texts, num_perm: int = 64, shingle_k: int = 5,
                       seed: int = 42) -> np.ndarray:
    """(n, num_perm) MinHash signature matrix for a batch of texts —
    batch-vectorized: all docs' shingle windows hash in ONE rolling-hash
    pass over the concatenated bytes, then per-doc minima come from
    ``np.minimum.reduceat`` (duplicated shingles can't change a min, so no
    per-doc ``unique`` sort). Bit-identical to the per-doc formula
    ``min((h%p)·a + b  [u64 wrap] % p)``."""
    a, b = _minhash_coeffs(num_perm, seed)
    k = shingle_k
    norm = [" ".join(_txt(t).lower().split()).encode("utf-8", "ignore")
            for t in texts]
    n = len(norm)
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    lens = np.fromiter((len(x) for x in norm), np.int64, n)
    long_idx = np.nonzero(lens > k)[0]
    short_idx = np.nonzero(lens <= k)[0]
    # short docs: single whole-doc hash (same fallback as _shingle_hashes)
    for i in short_idx:
        h0 = np.uint64(int.from_bytes(
            hashlib.blake2b(norm[i], digest_size=8).digest(), "big")
            % _MERSENNE)
        with np.errstate(over="ignore"):
            sigs[i] = (h0 * a + b) % _MERSENNE
    # long docs: slabs bounded by window count to cap the temp matrix
    pos = 0
    while pos < long_idx.size:
        counts_all = lens[long_idx[pos:]] - k + 1
        take = max(1, int(np.searchsorted(
            np.cumsum(counts_all), _SIG_SLAB_WINDOWS) ) )
        sl = long_idx[pos:pos + take]
        pos += take
        bufs = [norm[i] for i in sl]
        buf = b"".join(bufs)
        L = lens[sl]
        counts = L - k + 1
        offs = np.concatenate(([0], np.cumsum(L[:-1])))
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        h_all = rolling_hashes(buf, k)
        sel = np.repeat(offs - starts, counts) + np.arange(int(counts.sum()))
        h = _mod_mersenne61(h_all[sel])
        with np.errstate(over="ignore"):
            # (perm, windows) layout: reduceat along contiguous rows is
            # ~15x faster than the column-strided axis-0 form
            m = a[:, None] * h[None, :]
            m += b[:, None]
            _mod_mersenne61(m)
        sigs[sl] = np.minimum.reduceat(m, starts, axis=1).T
    return sigs


class MinHasher:
    """Per-batch MinHash signature stage (kept as a callable class for API
    compatibility; stateless — coefficients are cached per process)."""

    def __init__(self, text_col: str, num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
        self.text_col = text_col
        self.k = shingle_k
        self.num_perm = num_perm
        self.seed = seed

    def signature(self, text: str) -> np.ndarray:
        return minhash_signatures([text], self.num_perm, self.k, self.seed)[0]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = df.copy()
            out["__minhash"] = []
            return out
        sigs = minhash_signatures(list(df[self.text_col]), self.num_perm,
                                  self.k, self.seed)
        out = df.copy()
        out["__minhash"] = list(sigs.astype("int64"))
        return out


def _make_explode_bands(id_col: str, bands: int, rows_per_band: int):
    """map_batches fn: one row per (doc, band) carrying the band hash, a
    coarse shuffle bucket, and the full signature as fixed-width
    little-endian bytes (one compact binary cell, decoded zero-copy with
    np.frombuffer — not a pickled ndarray replicated ``bands`` times).
    Shared by minhash_lsh_dedup and minhash_candidate_pairs so the band
    hashing / sig-encoding schemes can never diverge."""

    def explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: [], "__band": [], "__bh": [],
                                 "__sig": [], "__cb": []})
        sigs = np.stack(df["__minhash"].to_numpy()).astype(np.uint64)
        n = sigs.shape[0]
        r = sigs.reshape(n, bands, rows_per_band)
        # vectorized band hash: wraparound polynomial over the band slice
        B = np.uint64(0x100000001B3)
        with np.errstate(over="ignore"):
            h = np.zeros((n, bands), np.uint64)
            for j in range(rows_per_band):
                h = h * B + r[:, :, j]
        ids = np.repeat(df[id_col].to_numpy(), bands)
        sig_bytes = np.array([s.tobytes() for s in sigs.astype("<i8")],
                             dtype=object)
        return pd.DataFrame({
            id_col: ids,
            "__band": np.tile(np.arange(bands, dtype=np.int64), n),
            "__bh": h.reshape(-1).astype(np.int64),
            "__sig": np.repeat(sig_bytes, bands),
            # coarse shuffle key: ~256 groups instead of one per (band, hash)
            "__cb": (h.reshape(-1) & np.uint64(255)).astype(np.int64),
        })

    return explode_bands


def minhash_lsh_dedup(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """MinHash+LSH near-duplicate removal.

    shingle → minhash (actor pool) → explode to (band, band_hash, id, sig)
    → groupby band bucket → within-bucket pairwise sig-Jaccard → duplicate
    ids (keep min id per cluster by union toward the smallest id seen) →
    distributed hash anti-join back. Returns the surviving rows of ``ds``.
    """
    if num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by bands ({bands})")
    rows_per_band = num_perm // bands

    # plain tasks, not an actor pool: coefficient setup is trivial and
    # process-cached, so tasks avoid actor-pool startup latency entirely
    hasher = MinHasher(text_col=text_col, num_perm=num_perm,
                       shingle_k=shingle_k, seed=seed)
    sig_ds = ds.map_batches(hasher, batch_format="pandas", batch_size=None)

    explode_bands = _make_explode_bands(id_col, bands, rows_per_band)

    banded = sig_ds.select_columns([id_col, "__minhash"]).map_batches(
        explode_bands, batch_format="pandas", batch_size=None)

    def bucket_dups(g: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs
        quiet_ray_data_logs()
        # one coarse bucket holds many (band, band_hash) groups; only
        # multi-member groups can yield duplicates
        sizes = g.groupby(["__band", "__bh"])[id_col].transform("size")
        g = g[sizes > 1]
        dups: list = []
        for _, sub in g.groupby(["__band", "__bh"], sort=False):
            sub = sub.sort_values(id_col, kind="stable")
            sigs = np.frombuffer(b"".join(sub["__sig"]),
                                 dtype="<i8").reshape(len(sub), -1)
            ids = sub[id_col].to_numpy()
            # estimated Jaccard = fraction of agreeing minhash components;
            # byte-identical signatures (est. 1.0) collapse vectorized first,
            # then bounded greedy verify (see _chunked_verify)
            sv = np.ascontiguousarray(sigs).view(
                np.dtype((np.void, sigs.shape[1] * 8))).ravel()
            ids, sigs, sv = _collapse_exact(sv, ids, sigs, dups)
            if len(ids) > 1:
                need = int(np.ceil(jaccard_threshold * sigs.shape[1]))
                _chunked_verify(
                    sigs, ids, sv,
                    lambda p, i, d: _greedy_sig_dups(p, i, need, d), dups)
        # keep the id column's NATIVE dtype (string doc ids work too)
        return pd.DataFrame(
            {id_col: pd.Series(sorted(set(dups)), dtype=g[id_col].dtype)})

    dup_ids = banded.groupby("__cb").map_groups(bucket_dups, batch_format="pandas")
    return anti_join_ids(ds, dup_ids, id_col)


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Verified near-duplicate PAIRS (src, dst) instead of a survivor set —
    the edge stream for duplicate clustering (stages/graph.dup_clusters).

    Same signature + banded-shuffle stages as minhash_lsh_dedup; within each
    (band, band_hash) group the exact-signature collapse and capped greedy
    emit (member, representative) star edges, so a cluster's edges always
    connect it even when chunked verification splits a mega-group (other
    bands re-link the chunks). Pairs may repeat across bands; connected
    components is idempotent to that, so no dedup shuffle is spent here."""
    if num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by bands ({bands})")

    hasher = MinHasher(text_col=text_col, num_perm=num_perm,
                       shingle_k=shingle_k, seed=seed)
    sig_ds = ds.map_batches(hasher, batch_format="pandas", batch_size=None)
    rows_per_band = num_perm // bands

    explode_bands = _make_explode_bands(id_col, bands, rows_per_band)

    banded = sig_ds.select_columns([id_col, "__minhash"]).map_batches(
        explode_bands, batch_format="pandas", batch_size=None)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs
        quiet_ray_data_logs()
        sizes = g.groupby(["__band", "__bh"])[id_col].transform("size")
        g = g[sizes > 1]
        pairs: list = []
        for _, sub in g.groupby(["__band", "__bh"], sort=False):
            sub = sub.sort_values(id_col, kind="stable")
            sigs = np.frombuffer(b"".join(sub["__sig"]),
                                 dtype="<i8").reshape(len(sub), -1)
            ids = sub[id_col].to_numpy()
            sv = np.ascontiguousarray(sigs).view(
                np.dtype((np.void, sigs.shape[1] * 8))).ravel()
            ids, sigs, sv = _collapse_exact_pairs(sv, ids, sigs, pairs)
            if len(ids) > 1:
                need = int(np.ceil(jaccard_threshold * sigs.shape[1]))
                _chunked_verify(
                    sigs, ids, sv,
                    lambda p, i, d: _greedy_sig_pairs(p, i, need, d), pairs)
        if not pairs:
            return pd.DataFrame({"src": pd.Series([], dtype=g[id_col].dtype),
                                 "dst": pd.Series([], dtype=g[id_col].dtype)})
        src, dst = zip(*pairs)
        return pd.DataFrame({"src": pd.Series(list(src), dtype=g[id_col].dtype),
                             "dst": pd.Series(list(dst), dtype=g[id_col].dtype)})

    return banded.groupby("__cb").map_groups(bucket_pairs,
                                             batch_format="pandas")


class SimHasher:
    """64-bit SimHash over word 3-gram features (actor pool stage).

    Feature hashing is one vectorized SipHash call over ALL features of the
    batch (pandas hash_array); the ±1 bit accumulation per document is a
    single reduceat — no per-feature Python hashing in the hot path."""

    _SHIFTS = np.arange(64, dtype=np.uint64)
    _POWS = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __init__(self, text_col: str, out_col: str = "simhash"):
        self.text_col = text_col
        self.out_col = out_col

    @classmethod
    def simhash64(cls, text: str) -> int:
        return int(cls._simhash_many([_txt(text)])[0])

    @classmethod
    def _simhash_many(cls, texts, chunk: int = 4096) -> np.ndarray:
        # chunk the (features × 64) expansion so peak memory stays bounded
        # regardless of block size
        if len(texts) > chunk:
            return np.concatenate([cls._simhash_many(texts[i:i + chunk])
                                   for i in range(0, len(texts), chunk)])
        feats: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = _txt(t).lower().split()
            n = max(1, len(words) - 2)
            feats.extend(" ".join(words[j:j + 3]) for j in range(n))
            counts[i] = n
        h = _stable_hash64(np.array(feats, dtype=object))
        pm = ((h[:, None] >> cls._SHIFTS) & np.uint64(1)).astype(np.int32) * 2 - 1
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        acc = np.add.reduceat(pm, offsets, axis=0)
        out = ((acc > 0).astype(np.uint64) @ cls._POWS)
        return out.astype(np.int64)  # two's-complement view

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df[self.out_col] = np.array([], dtype=np.int64)
            return df
        df[self.out_col] = self._simhash_many(df[self.text_col].to_numpy())
        return df


def simhash_dedup(ds: "ray.data.Dataset", text_col: str, id_col: str, *,
                  hamming_threshold: int = 3, concurrency=(1, 8)) -> "ray.data.Dataset":
    """SimHash near-dup: 64-bit fingerprints, 4-segment pigeonhole blocking
    (any pair within hamming distance 3 shares at least one exact 16-bit
    segment), verify hamming distance within blocks, drop non-minimal ids."""
    # plain tasks (no actor pool): SimHasher carries no per-actor state
    hashed = ds.map_batches(SimHasher(text_col=text_col),
                            batch_format="pandas", batch_size=None)

    def explode_segments(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy(np.int64).astype(np.uint64)
        out = []
        for seg in range(4):
            part = ((h >> np.uint64(16 * seg)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pd.DataFrame({id_col: df[id_col].to_numpy(),
                                     "__seg": seg, "__key": part,
                                     "__h": h.astype(np.int64),
                                     "__cb": part & 255}))
        return pd.concat(out, ignore_index=True)

    def block_dups(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["__seg", "__key"])[id_col].transform("size")
        g = g[sizes > 1]
        dups: list = []
        for _, sub in g.groupby(["__seg", "__key"], sort=False):
            sub = sub.sort_values(id_col, kind="stable").drop_duplicates(id_col)
            h = sub["__h"].to_numpy(np.int64).astype(np.uint64)
            ids = sub[id_col].to_numpy()
            if len(ids) < 2:
                continue
            # equal fingerprints (hamming 0) collapse vectorized, then
            # bounded greedy hamming verify (see _chunked_verify); the
            # fingerprint itself is the collapse/chunk-sort key
            ids, h, _hk = _collapse_exact(h, ids, h, dups)
            if len(ids) > 1:
                _chunked_verify(
                    h, ids, h,
                    lambda p, i, d: _greedy_hamming_dups(
                        p, i, hamming_threshold, d), dups)
        return pd.DataFrame(
            {id_col: pd.Series(sorted(set(dups)), dtype=g[id_col].dtype)})

    dup_ids = (hashed.select_columns([id_col, "simhash"])
                     .map_batches(explode_segments, batch_format="pandas", batch_size=None)
                     .groupby("__cb")
                     .map_groups(block_dups, batch_format="pandas"))
    return anti_join_ids(ds, dup_ids, id_col)


def ngram_jaccard_dedup(ds: "ray.data.Dataset", text_col: str, id_col: str, *,
                        shingle_k: int = 5, threshold: float = 0.8,
                        num_perm: int = 128, concurrency=(1, 8)) -> "ray.data.Dataset":
    """Character-n-gram Jaccard near-dup. Same LSH plumbing as minhash but
    with a stricter verify (real shingle-set Jaccard would be exact; at
    num_perm=128 the signature estimate is within ~0.09 at 95% conf —
    acceptable for dedup, and the payload never reshuffles)."""
    return minhash_lsh_dedup(ds, text_col, id_col, num_perm=num_perm,
                             bands=32, shingle_k=shingle_k,
                             jaccard_threshold=threshold, concurrency=concurrency)
