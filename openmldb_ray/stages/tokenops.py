"""Token-payload operators for pre-tokenized training sequences
(north-rule extension: the input contract is ``doc_id:string|int,
tokens:array<int32>, n_tok:int32, source:string`` per BASELINE.json).

Two first-class ops a 100 TB token pipeline needs:

- ``exact_substring_dedup`` — remove duplicated token spans of length >= L
  across the whole corpus, keeping the first occurrence in (doc_id, pos)
  order (the ExactSubstr operation of Lee et al. 2021, "Deduplicating
  Training Data Makes Language Models Better", re-expressed as hash
  shuffles instead of a monolithic suffix array).
- ``pack_sequences`` — greedy first-fit packing of documents into
  fixed-length training examples (sequence packing), per-block so it
  streams with zero shuffle.

Scale shape of exact_substring_dedup:

    per-batch vectorized rolling window hashes over concatenated tokens
      (two independent Mersenne-31 rolling hashes -> one 62-bit key,
       plus a third as in-group verifier: ~2^93 of hash state, expected
       false merges ~ n^2/2^94 — negligible at 10^12 windows)
    -> hash shuffle of (key, h3, doc_id, pos) candidate rows   [wide #1]
    -> per-group canonical = min (doc_id, pos); others emit removal spans
    -> bucketed co-shuffle of removal spans with the docs      [wide #2]
    -> per-doc vectorized span-mask deletion, tokens rebuilt zero-copy

The candidate stream is one tiny fixed-width row PER TOKEN (stride=1 ==
exact detection of every duplicated span >= L). That is the honest cost of
exactness — the same corpus scan a distributed suffix array pays. For
web-scale corpora the ``winnow`` option keeps only windows that are local
minima over ``winnow`` consecutive hashes (MOSS winnowing): the shuffle
shrinks ~winnow×, with the documented guarantee that any duplicated region
of length >= L + winnow - 1 still shares a selected window (shorter dups
may be missed; removal boundaries stay exact for detected windows).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_M31 = np.uint64((1 << 31) - 1)
# fixed odd bases < 2^31-1 (arbitrary public constants)
_BASES = (np.uint64(1_000_003), np.uint64(16_777_619), np.uint64(805_306_457))


def _fold31(x: np.ndarray) -> np.ndarray:
    """x mod (2^31-1) for uint64 arrays holding values < 2^62, branch-free:
    two shift-add folds + one conditional subtract (same trick as the
    Mersenne-61 fold in dedup.py, narrowed so PRODUCTS fit in uint64)."""
    x = (x & _M31) + (x >> np.uint64(31))
    x = (x & _M31) + (x >> np.uint64(31))
    np.subtract(x, _M31, out=x, where=x >= _M31)
    return x


def _mulmod31(a: np.ndarray, b) -> np.ndarray:
    return _fold31(a * b)


def _pow_array(base: np.uint64, n: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] mod M31 via vectorized doubling
    (log n rounds, no sequential cumprod)."""
    pows = np.ones(1, dtype=np.uint64)
    while len(pows) < n:
        k = len(pows)
        nxt = _mulmod31(pows, pows[k - 1])          # pows * base^(k-1)
        nxt = _mulmod31(nxt, base)                  # ... * base -> base^(k..2k-1)
        pows = np.concatenate([pows, nxt])
    return pows[:n]


def _modinv31(a: int) -> int:
    return pow(int(a), int(_M31) - 2, int(_M31))


def rolling_window_hashes(tokens: np.ndarray, starts: np.ndarray,
                          lengths: np.ndarray, span_len: int) -> tuple:
    """Vectorized rolling hashes of every ``span_len``-token window of every
    doc in a batch.

    ``tokens`` is the batch's concatenated int token stream; doc d occupies
    ``tokens[starts[d]:starts[d]+lengths[d]]``. Returns (keys u64, h3 u64,
    doc_idx int64, pos int64) for every window that fits inside one doc.

    Window hash: H_B(i) = sum_j v[i+j] * B^(L-1-j) mod (2^31-1) with
    v = token+1, computed for the whole batch in O(n) via inverse-power
    prefix sums (the cumsum stays exact because per-batch token counts are
    << 2^33; asserted)."""
    n = len(tokens)
    assert n < (1 << 33), "batch too large for exact cumsum folding"
    v = (tokens.astype(np.uint64) + np.uint64(1))
    v = _fold31(v)

    # window start indices (global) for windows fully inside one doc
    nwin = np.maximum(lengths - span_len + 1, 0)
    doc_idx = np.repeat(np.arange(len(starts), dtype=np.int64), nwin)
    pos = np.arange(int(nwin.sum()), dtype=np.int64)
    if len(pos):
        off = np.concatenate([[0], np.cumsum(nwin)[:-1]])
        pos = pos - np.repeat(off, nwin)            # within-doc positions
    gidx = np.repeat(starts, nwin) + pos            # global positions

    hs = []
    for base in _BASES:
        binv = np.uint64(_modinv31(base))
        ipows = _pow_array(binv, n + 1)
        pows = _pow_array(base, n + span_len)
        term = _mulmod31(v, ipows[:n])
        s = np.concatenate([[np.uint64(0)], np.cumsum(term, dtype=np.uint64)])
        # windows: T(i) = (S[i+L] - S[i]) mod M31  (cumsum is exact, so the
        # difference of folded residues needs one more fold after +M31*pad)
        t = (s[gidx + span_len] - s[gidx]) % _M31 if len(gidx) else \
            np.zeros(0, np.uint64)
        h = _mulmod31(_mulmod31(t, pows[gidx] if len(gidx) else t),
                      pows[span_len - 1])
        hs.append(h)
    keys = (hs[0] << np.uint64(31)) | hs[1]
    return keys, hs[2], doc_idx, pos


def _winnow_select(keys: np.ndarray, doc_idx: np.ndarray, w: int) -> np.ndarray:
    """Boolean mask of winnowed windows: local minima of ``keys`` over each
    trailing run of ``w`` consecutive windows within one doc (MOSS
    winnowing — selection depends only on content, so both copies of a
    duplicated region >= L + w - 1 select the same window).

    Fully vectorized exact-uint64 trailing sliding min: the classic
    block-decomposition (prefix-min + suffix-min over w-aligned blocks,
    O(n), no per-doc Python), with the first w-1 positions of each doc
    fixed up by one C-level grouped cummin."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, bool)
    if w <= 1:
        return np.ones(n, bool)
    k = keys.astype(np.uint64)
    pad = (-n) % w
    kp = np.concatenate([k, np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF))])
    blocks = kp.reshape(-1, w)
    pre = np.minimum.accumulate(blocks, axis=1).reshape(-1)[:n]
    suf = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].reshape(-1)
    win = pre.copy()
    idx = np.arange(n)
    j = idx - (w - 1)
    valid = j >= 0
    win[valid] = np.minimum(pre[valid], suf[j[valid]])
    # windows that would cross a doc start: within-doc truncated min instead
    first = np.concatenate([[0], 1 + np.nonzero(np.diff(doc_idx))[0]])
    counts = np.diff(np.concatenate([first, [n]]))
    doc_start_of = np.repeat(first, counts)
    early = (idx - doc_start_of) < (w - 1)
    if early.any():
        cm = pd.Series(k).groupby(doc_idx).cummin().to_numpy(np.uint64)
        win[early] = cm[early]
    return k == win


def _flat_tokens(t, tokens_col: str):
    """(flat values ndarray, normalized offsets ndarray) for a Table's list
    column. ``flatten()`` compacts sliced arrays, so offsets are rebased to
    start at 0 to stay aligned with it."""
    import pyarrow as pa

    if t.num_rows == 0:
        return np.zeros(0, np.int64), np.zeros(1, np.int64)
    toks = t[tokens_col].combine_chunks()
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.chunk(0) if toks.num_chunks == 1 else \
            pa.concat_arrays(toks.chunks)
    flat = np.asarray(toks.flatten())
    offsets = np.asarray(toks.offsets).astype(np.int64)
    return flat, offsets - offsets[0]


def exact_substring_dedup(ds: "ray.data.Dataset", tokens_col: str = "tokens",
                          id_col: str = "doc_id", span_len: int = 50,
                          *, winnow: int = 1,
                          num_buckets: int | None = None,
                          num_partitions: int | None = None) -> "ray.data.Dataset":
    """Remove every later occurrence of any duplicated ``span_len``-token
    span; the globally-first occurrence (min (doc_id, pos)) survives.

    ``winnow`` > 1 trades exactness for shuffle volume (see module doc).
    Docs shorter than ``span_len`` pass through untouched.
    """
    import pyarrow as pa

    from ..core.hashing import add_bucket_column, default_num_buckets, \
        quiet_ray_data_logs

    nb = num_buckets or default_num_buckets()

    def emit_candidates(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        flat, offsets = _flat_tokens(t, tokens_col)
        starts, lengths = offsets[:-1], np.diff(offsets)
        keys, h3, didx, pos = rolling_window_hashes(
            flat, starts.astype(np.int64), lengths.astype(np.int64), span_len)
        if winnow > 1:
            m = _winnow_select(keys, didx, winnow)
            keys, h3, didx, pos = keys[m], h3[m], didx[m], pos[m]
        ids = t[id_col].take(pa.array(didx)) if len(didx) else \
            t[id_col].slice(0, 0)
        return pa.table({
            "__key": pa.array(keys.astype(np.int64)),
            "__h3": pa.array(h3.astype(np.int64)),
            id_col: ids,
            "__pos": pa.array(pos),
        })

    def pick_removals(g: pd.DataFrame) -> pd.DataFrame:
        # canonical occurrence = min (doc_id, pos) per exact window content
        g = g.sort_values([id_col, "__pos"], kind="stable")
        dup = g.duplicated(["__key", "__h3"], keep="first")
        out = g.loc[dup, [id_col, "__pos"]]
        return out.rename(columns={"__pos": "__start"})

    cands = ds.map_batches(emit_candidates, batch_format="pyarrow",
                           batch_size=None)
    add_b = add_bucket_column(["__key"], "__b", nb)
    removals = (cands.map_batches(add_b, batch_format="pyarrow", batch_size=None)
                .groupby("__b", num_partitions=num_partitions)
                .map_groups(pick_removals, batch_format="pandas"))
    return _apply_span_removals(ds, removals, tokens_col, id_col, span_len,
                                num_buckets=nb, num_partitions=num_partitions)


def _apply_span_removals(ds: "ray.data.Dataset", removals: "ray.data.Dataset",
                         tokens_col: str, id_col: str, span_len: int,
                         *, num_buckets: int,
                         num_partitions: int | None) -> "ray.data.Dataset":
    """Bucketed co-shuffle of removal spans with the docs (same shape as
    dedup.anti_join_ids: no driver-side materialization of the removal
    set), then per-doc vectorized mask deletion."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..core.empty_ds import union_any
    from ..core.hashing import add_bucket_column, quiet_ray_data_logs

    ds = ds.map_batches(lambda t: t.replace_schema_metadata(None),
                        batch_format="pyarrow", batch_size=None)
    schema = ds.schema()
    names, types = list(schema.names), list(schema.types)
    id_type = types[names.index(id_col)]
    tok_type = types[names.index(tokens_col)]
    value_type = tok_type.value_type

    def pad_removals(t: pa.Table) -> pa.Table:
        arrays = []
        for name, typ in zip(names, types):
            if name == id_col:
                arrays.append(pc.cast(t[id_col], typ).combine_chunks())
            else:
                arrays.append(pa.nulls(t.num_rows, typ))
        out = pa.Table.from_arrays(arrays, names=names)
        return out.append_column(
            "__start", pc.cast(t["__start"], pa.int64()).combine_chunks())

    def mark_rows(t: pa.Table) -> pa.Table:
        t = t.select(names).replace_schema_metadata(None)
        return t.append_column("__start", pa.nulls(t.num_rows, pa.int64()))

    add_b = add_bucket_column([id_col], "__ab", num_buckets)
    left = ds.map_batches(mark_rows, batch_format="pyarrow", batch_size=None) \
             .map_batches(add_b, batch_format="pyarrow", batch_size=None)
    right = removals.map_batches(pad_removals, batch_format="pyarrow",
                                 batch_size=None) \
                    .map_batches(add_b, batch_format="pyarrow", batch_size=None)

    def apply_group(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        is_rm = pc.is_valid(t["__start"])
        rows = t.filter(pc.invert(is_rm))
        rm = t.filter(is_rm)
        rows = rows.drop_columns(["__start", "__ab"])
        if rm.num_rows == 0 or rows.num_rows == 0:
            return rows
        # removal starts per doc id (python dict of small int arrays — only
        # docs WITH removals pay any per-doc work)
        rm_ids = rm[id_col].to_pandas()
        rm_starts = rm["__start"].to_numpy(zero_copy_only=False)
        by_doc: dict = {}
        for i, s in zip(rm_ids.to_numpy(), rm_starts):
            by_doc.setdefault(i, []).append(int(s))
        row_ids = rows[id_col].to_pandas().to_numpy()
        hit_rows = np.nonzero(pd.Series(row_ids).isin(by_doc).to_numpy())[0]
        if len(hit_rows) == 0:
            return rows
        flat, offsets = _flat_tokens(rows, tokens_col)
        keep_mask = np.ones(len(flat), bool)
        for r in hit_rows:
            lo, hi = int(offsets[r]), int(offsets[r + 1])
            for s in by_doc[row_ids[r]]:
                keep_mask[lo + s: min(lo + s + span_len, hi)] = False
        # reduceat indices must stay < len(flat): clip trailing-empty-row
        # offsets, then zero out genuinely-empty rows via the diff guard
        kept_per_row = np.add.reduceat(
            keep_mask, np.minimum(offsets[:-1], len(flat) - 1)) \
            if len(flat) else np.zeros(rows.num_rows, np.int64)
        kept_per_row = np.where(np.diff(offsets) == 0, 0, kept_per_row)
        new_offsets = np.concatenate([[0], np.cumsum(kept_per_row)])
        new_list = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()),
            pa.array(flat[keep_mask], type=value_type))
        out = rows.set_column(rows.column_names.index(tokens_col),
                              tokens_col, pc.cast(new_list, tok_type))
        if "n_tok" in out.column_names:
            out = out.set_column(out.column_names.index("n_tok"), "n_tok",
                                 pc.cast(pa.array(kept_per_row),
                                         out.schema.field("n_tok").type))
        return out

    return (union_any(left, right)
            .groupby("__ab", num_partitions=num_partitions)
            .map_groups(apply_group, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# text -> tokens bridge


class HashTokenizer:
    """Vocabulary-free word tokenizer: token id = 31-polynomial hash of the
    word, masked to 31 bits (deterministic, whitespace pretokenization).
    ``vocab_path`` loads a JSON ``{word: id}`` vocabulary ONCE PER ACTOR
    (the actor-pool contract — stand-in for a real BPE vocab file; words
    missing from the vocab fall back to the hash). Per-batch work hashes
    each UNIQUE word once and maps the rest through a dict."""

    def __init__(self, text_col: str = "text", vocab_path: str | None = None,
                 lowercase: bool = False):
        self.text_col = text_col
        self.lowercase = lowercase
        self.vocab: dict[str, int] = {}
        if vocab_path is not None:
            import json
            import os

            if os.path.isfile(vocab_path):
                try:
                    self.vocab = {str(k): int(v) for k, v in
                                  json.load(open(vocab_path)).items()}
                except (ValueError, TypeError, OSError):
                    self.vocab = {}

    @staticmethod
    def word_id(w: str) -> int:
        h = 0
        for ch in w:
            h = (h * 31 + ord(ch)) & 0x7FFFFFFF
        return h

    def __call__(self, df: pd.DataFrame):
        import pyarrow as pa

        s = df[self.text_col].fillna("").astype(str)  # null -> no tokens
        if self.lowercase:
            s = s.str.lower()
        words = s.str.strip().str.split()
        lut = dict(self.vocab)
        for ws in words:
            for w in ws:
                if w not in lut:
                    lut[w] = self.word_id(w)
        toks = [np.fromiter((lut[w] for w in ws), np.int32, len(ws))
                for ws in words]
        lens = np.array([len(x) for x in toks], np.int64)
        # emit a REAL Arrow list<int32> column (a pandas object column of
        # ndarrays would be converted to Ray's variable-shaped tensor
        # extension type, which the downstream Arrow token kernels reject)
        flat = np.concatenate(toks) if toks else np.zeros(0, np.int32)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        out = pa.Table.from_pandas(df.drop(columns=[self.text_col]),
                                   preserve_index=False) \
            .replace_schema_metadata(None)
        out = out.append_column("tokens", pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat, pa.int32())))
        return out.append_column("n_tok", pa.array(lens))


def tokenize_text(ds: "ray.data.Dataset", text_col: str = "text",
                  vocab_path: str | None = None, lowercase: bool = False,
                  concurrency=(1, 8), batch_size: int = 4096) -> "ray.data.Dataset":
    """documents(text) -> (tokens:list<int32>, n_tok) — the bridge from the
    text tables to the token ops (north-rule input shape)."""
    return ds.map_batches(HashTokenizer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              text_col=text_col, vocab_path=vocab_path,
                              lowercase=lowercase))


def chunk_tokens(ds: "ray.data.Dataset", seq_len: int = 2048,
                 stride: int | None = None, tokens_col: str = "tokens",
                 id_col: str = "doc_id",
                 batch_size: int | None = None) -> "ray.data.Dataset":
    """Split each doc's token array into training sequences of at most
    ``seq_len`` tokens starting every ``stride`` tokens (stride < seq_len
    gives overlapping context windows; the default stride == seq_len is
    plain chunking). Emits (id, chunk_idx, tokens, n_tok). Shuffle-free,
    fully vectorized gather: chunk starts come from arithmetic over the
    list offsets; token bytes are copied once via one fancy index."""
    import pyarrow as pa

    from ..core.hashing import quiet_ray_data_logs

    L = int(seq_len)
    S = int(stride or seq_len)
    if S <= 0 or L <= 0:
        raise ValueError("seq_len and stride must be positive")

    def chunk(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        flat, offsets = _flat_tokens(t, tokens_col)
        lengths = np.diff(offsets)
        n_chunks = -(-lengths // S)  # ceil(n/S); 0 chunks for empty docs
        doc_of = np.repeat(np.arange(t.num_rows), n_chunks)
        total = int(n_chunks.sum())
        cidx = np.arange(total, dtype=np.int64)
        if total:
            first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
            cidx = cidx - np.repeat(first, n_chunks)
        starts = cidx * S
        clens = np.minimum(L, np.repeat(lengths, n_chunks) - starts)
        gstart = np.repeat(offsets[:-1], n_chunks) + starts
        # one gather for all chunk tokens
        take = (np.repeat(gstart, clens)
                + _ranges(clens)) if total else np.zeros(0, np.int64)
        new_offsets = np.concatenate([[0], np.cumsum(clens)])
        toks = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()),
            pa.array(flat[take], type=t.schema.field(tokens_col).type.value_type))
        ids = t[id_col].take(pa.array(doc_of)) if total else t[id_col].slice(0, 0)
        return pa.table({
            id_col: ids,
            "chunk_idx": pa.array(cidx),
            tokens_col: toks,
            "n_tok": pa.array(clens.astype(np.int64)),
        })

    return ds.map_batches(chunk, batch_format="pyarrow", batch_size=batch_size)


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concatenate([arange(c) for c in counts]) without the Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    out = np.arange(total, dtype=np.int64)
    first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return out - np.repeat(first, counts)


# ---------------------------------------------------------------------------
# sequence packing


def pack_block(n_tok: np.ndarray, max_len: int) -> tuple:
    """Greedy in-order packing of one block: returns (example_id_per_doc,
    chunks) where docs longer than max_len are split into ceil(n/max_len)
    full chunks. O(#examples) python steps via searchsorted on the cumsum,
    vectorized otherwise."""
    n = len(n_tok)
    ex_of_doc = np.zeros(n, np.int64)
    c = np.concatenate([[0], np.cumsum(n_tok, dtype=np.int64)])
    ex, i = 0, 0
    splits = []  # (doc_index, n_chunks) for oversized docs
    while i < n:
        j = int(np.searchsorted(c, c[i] + max_len, side="right")) - 1
        if j <= i:  # single doc exceeds max_len -> split into chunks
            k = int(-(-int(n_tok[i]) // max_len))
            splits.append((i, k))
            ex_of_doc[i] = ex
            ex += k
            i += 1
            continue
        ex_of_doc[i:j] = ex
        ex += 1
        i = j
    return ex_of_doc, splits, ex


class SequencePacker:
    """Greedy first-fit sequence packing into ``max_len``-token examples,
    per block (a block boundary flushes the current example — at scale that
    costs at most one under-filled example per block and keeps the stage
    shuffle-free and order-deterministic within each input file)."""

    def __init__(self, max_len: int = 2048, n_tok_col: str = "n_tok",
                 id_col: str = "doc_id"):
        self.max_len = int(max_len)
        self.n_tok_col = n_tok_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_tok = df[self.n_tok_col].to_numpy(np.int64)
        ids = df[self.id_col].to_numpy()
        ex_of_doc, splits, n_ex = pack_block(n_tok, self.max_len)
        if n_ex == 0:
            return pd.DataFrame({"example_id": pd.Series([], dtype=object),
                                 "n_docs": pd.Series([], dtype=np.int64),
                                 "total_tok": pd.Series([], dtype=np.int64)})
        tot = np.bincount(ex_of_doc, weights=n_tok, minlength=n_ex).astype(np.int64)
        ndocs = np.bincount(ex_of_doc, minlength=n_ex).astype(np.int64)
        # first doc id per example: ex_of_doc is nondecreasing, so the first
        # occurrence index per example comes from one np.unique pass
        first = np.zeros(n_ex, dtype=object)
        ex_vals, ex_first = np.unique(ex_of_doc, return_index=True)
        first[ex_vals] = ids[ex_first]
        # oversized docs: split into k chunks (full chunks + remainder)
        for i, k in splits:
            e = ex_of_doc[i]
            tot[e] = min(int(n_tok[i]), self.max_len)
            ndocs[e] = 1
            rem = int(n_tok[i]) - self.max_len
            for c in range(1, k):
                first[e + c] = ids[i]
                tot[e + c] = min(rem, self.max_len)
                ndocs[e + c] = 1
                rem -= self.max_len
        return pd.DataFrame({
            "example_id": first,
            "n_docs": ndocs,
            "total_tok": tot,
        })


def pack_sequences(ds: "ray.data.Dataset", max_len: int = 2048,
                   n_tok_col: str = "n_tok", id_col: str = "doc_id",
                   batch_size: int | None = None,
                   concurrency=(1, 8)) -> "ray.data.Dataset":
    """Greedy sequence packing; output one row per packed training example
    (example_id = first doc id in the example, n_docs, total_tok)."""
    return ds.map_batches(SequencePacker, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              max_len=max_len, n_tok_col=n_tok_col,
                              id_col=id_col))


def token_freq(ds: "ray.data.Dataset", tokens_col: str = "tokens",
               top_k: int = 100, num_buckets: int | None = None,
               concurrency=None) -> "ray.data.Dataset":
    """Corpus-wide token-frequency top-k over pre-tokenized sequences (the
    vocabulary-usage histogram every tokenizer audit starts from).

    Same wide shape as curation.ngram_counts but fully Arrow/numpy — no
    string work at all: per-batch ``list_flatten`` (zero-copy) +
    ``np.unique`` COMBINER so the shuffle carries (token, partial_count)
    rows, never one row per token occurrence; coarse hash shuffle on the
    token id; per-bucket sum + top-k (a token id lives in exactly one
    bucket, so the global top-k is a subset of the union of bucket
    top-ks); tiny global sort+limit. Ties break on the smaller token id.
    """
    import pyarrow as pa

    from ..core.hashing import add_bucket_column, default_num_buckets, \
        quiet_ray_data_logs

    nb = num_buckets or default_num_buckets()

    def partial(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        flat, _ = _flat_tokens(t, tokens_col)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(np.asarray(flat, dtype=np.int64), return_counts=True)
        return pa.table({"token": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    add_b = add_bucket_column(["token"], "__b", nb)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", as_index=False)["cnt"].sum()
        return agg.sort_values(["cnt", "token"], ascending=[False, True],
                               kind="stable").head(top_k)[["token", "cnt"]]

    return (ds.select_columns([tokens_col])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None, concurrency=concurrency)
            .map_batches(add_b, batch_format="pyarrow", batch_size=None)
            .groupby("__b").map_groups(bucket_topk, batch_format="pandas")
            .sort(["cnt", "token"], descending=[True, False])
            .limit(top_k))


# --------------------------------------------------------------------------
# BPE vocabulary induction over pre-tokenized sequences
# --------------------------------------------------------------------------

def _bpe_resolve_overlaps(idx: np.ndarray) -> np.ndarray:
    """Left-to-right greedy over candidate merge positions: within each run
    of CONSECUTIVE positions (possible only when merging (a,a) — e.g.
    'aaaa'), keep every other one starting at the run head. Vectorized:
    runs found by one diff, offsets by one cumsum-style gather."""
    if len(idx) == 0:
        return idx
    run_start = np.ones(len(idx), bool)
    run_start[1:] = idx[1:] != idx[:-1] + 1
    run_id = np.cumsum(run_start) - 1
    run_first = idx[run_start][run_id]
    return idx[((idx - run_first) % 2) == 0]


def _merge_pair_flat(flat: np.ndarray, offsets: np.ndarray, a: int, b: int,
                     new_id: int) -> tuple:
    """Apply one BPE merge (a,b)->new_id over a flat token array with doc
    offsets, fully vectorized; pairs never cross doc boundaries. Returns
    (new_flat, new_offsets)."""
    n = len(flat)
    if n < 2:
        return flat, offsets
    cand = (flat[:-1] == a) & (flat[1:] == b)
    if len(offsets) > 2:
        # i+1 must not start a new doc
        starts = offsets[1:-1]
        cand[starts[(starts > 0) & (starts < n)] - 1] = False
    idx = _bpe_resolve_overlaps(np.nonzero(cand)[0])
    if len(idx) == 0:
        return flat, offsets
    out = flat.copy()
    out[idx] = new_id
    keep = np.ones(n, bool)
    keep[idx + 1] = False
    doc_of = np.searchsorted(offsets, idx, side="right") - 1
    losses = np.bincount(doc_of, minlength=len(offsets) - 1)
    new_offsets = offsets.copy()
    new_offsets[1:] -= np.cumsum(losses)
    return out[keep], new_offsets


def _pair_keys(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """uint64 keys a<<32|b of every within-doc adjacent token pair
    (overlaps counted, the classic BPE get_stats convention)."""
    n = len(flat)
    if n < 2:
        return np.zeros(0, np.uint64)
    valid = np.ones(n - 1, bool)
    if len(offsets) > 2:
        starts = offsets[1:-1]
        valid[starts[(starts > 0) & (starts < n)] - 1] = False
    f = flat.astype(np.uint64)
    return (f[:-1][valid] << np.uint64(32)) | f[1:][valid]


def learn_bpe(ds: "ray.data.Dataset", tokens_col: str = "tokens",
              num_merges: int = 10, num_buckets: int | None = None
              ) -> list[tuple[int, int, int]]:
    """Distributed BPE vocabulary induction (Sennrich et al. 2016) over
    list<int32> token arrays: per round, count every within-doc adjacent
    token pair (overlaps included) with a batch-local np.unique COMBINER ->
    pair-hash shuffle -> per-bucket (max count, min pair) champion -> a
    <=num_buckets-row driver fold picks the global best (deterministic
    tie-break: smaller (a,b)); the merge is then applied in one vectorized
    map pass and the corpus re-materialized for the next round.

    Returns [(a, b, new_id), ...] in merge order; new ids start above the
    corpus max token id. Each round is one coarse shuffle of DISTINCT-pair
    partials (never per-occurrence rows) + one map — O(num_merges) passes,
    the honest cost of exact BPE. At web scale train on a bounded sample
    of the corpus (standard practice — the merge table converges long
    before the full corpus is counted) and ``apply_bpe`` to the rest.
    """
    import pyarrow as pa

    from ..core.hashing import add_bucket_column, default_num_buckets, \
        quiet_ray_data_logs

    nb = num_buckets or default_num_buckets()
    add_b = add_bucket_column(["key"], "__b", nb)

    def partials(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        flat, offsets = _flat_tokens(t, tokens_col)
        keys = _pair_keys(flat, offsets)
        mx = int(flat.max()) if len(flat) else -1
        u, c = (np.unique(keys, return_counts=True) if len(keys)
                else (np.zeros(0, np.uint64), np.zeros(0, np.int64)))
        if not len(u) and mx >= 0:
            # a block of only <2-token docs still must report its max
            # token id — next_id = max(mx)+1 would otherwise collide
            # with an existing token that lives only in such docs
            u = np.zeros(1, np.uint64)
            c = np.zeros(1, np.int64)
        return pa.table({"key": pa.array(u, pa.uint64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64()),
                         "mx": pa.array(np.full(len(u), mx, np.int64),
                                        pa.int64())})

    def bucket_best(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("key", as_index=False)["cnt"].sum()
        best = agg.sort_values(["cnt", "key"], ascending=[False, True],
                               kind="stable").head(1)
        return best.assign(mx=g["mx"].max())

    cur = ds
    merges: list[tuple[int, int, int]] = []
    next_id = None
    for _ in range(num_merges):
        champs = (cur.map_batches(partials, batch_format="pyarrow",
                                  batch_size=None)
                  .map_batches(add_b, batch_format="pyarrow", batch_size=None)
                  .groupby("__b").map_groups(bucket_best,
                                             batch_format="pandas")
                  ).to_pandas()
        if len(champs) == 0 or champs["cnt"].max() < 2:
            break
        if next_id is None:
            next_id = int(champs["mx"].max()) + 1
        if next_id + num_merges > 0x7FFFFFFF:
            # the tokens contract is int32; a near-full 31-bit hash vocab
            # leaves no headroom for merge ids — compact the vocab first
            raise ValueError(
                f"BPE merge ids would overflow int32 (corpus max token id "
                f"{next_id - 1}); re-map tokens to a dense vocabulary before "
                f"learn_bpe")
        champs = champs.sort_values(["cnt", "key"], ascending=[False, True],
                                    kind="stable")
        key = int(champs["key"].iloc[0])
        a, b = key >> 32, key & 0xFFFFFFFF
        merges.append((a, b, next_id))

        def apply_one(t: pa.Table, a=a, b=b, nid=next_id) -> pa.Table:
            quiet_ray_data_logs()
            flat, offsets = _flat_tokens(t, tokens_col)
            nf, no = _merge_pair_flat(flat, offsets, a, b, nid)
            toks = pa.ListArray.from_arrays(
                pa.array(no, pa.int32()), pa.array(nf, pa.int32()))
            return t.drop_columns([tokens_col]).append_column(tokens_col, toks)

        cur = cur.map_batches(apply_one, batch_format="pyarrow",
                              batch_size=None).materialize()
        next_id += 1
    return merges


class BpeApplier:
    """Actor-pool stage: apply a learned merge list (in order) to every
    batch — merge table loaded once per actor, each merge one vectorized
    pass over the flat token buffer."""

    def __init__(self, merges, tokens_col: str = "tokens"):
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        import ray as _ray

        self.merges = _ray.get(merges) if not isinstance(merges, list) else merges
        self.tokens_col = tokens_col

    def __call__(self, t):
        import pyarrow as pa

        flat, offsets = _flat_tokens(t, self.tokens_col)
        for a, b, nid in self.merges:
            flat, offsets = _merge_pair_flat(flat, offsets, a, b, nid)
        toks = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.int32()))
        return t.drop_columns([self.tokens_col]) \
                .append_column(self.tokens_col, toks)


def apply_bpe(ds: "ray.data.Dataset", merges: list,
              tokens_col: str = "tokens", batch_size: int | None = None,
              concurrency=(1, 8)) -> "ray.data.Dataset":
    """Re-tokenize a corpus with a learned BPE merge list (shuffle-free)."""
    return ds.map_batches(BpeApplier, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              merges=merges, tokens_col=tokens_col))


def compact_vocab(ds: "ray.data.Dataset", tokens_col: str = "tokens",
                  num_buckets: int | None = None, oov_id: int = -1,
                  concurrency=None):
    """Remap token ids to a DENSE vocabulary [0, V): new id = rank by
    (global count DESC, original id ASC) — embedding-table compaction, and
    the remedy for learn_bpe's int32-headroom guard on sparse hash vocabs.

    One distinct-token count (np.unique combiner -> token-hash shuffle ->
    per-bucket sum, same shape as token_freq but unbounded: a vocabulary
    must fit one worker to be broadcast at all, which is this op's
    contract) -> driver rank -> broadcast sorted key table -> one
    shuffle-free vectorized np.searchsorted remap pass. Tokens unseen at
    count time (when applied to OTHER data) map to ``oov_id``.

    Returns (remapped_ds, vocab DataFrame[token, new_id, cnt])."""
    import pyarrow as pa

    from ..core.hashing import add_bucket_column, default_num_buckets, \
        quiet_ray_data_logs

    nb = num_buckets or default_num_buckets()

    def partial(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        flat, _ = _flat_tokens(t, tokens_col)
        u, c = (np.unique(np.asarray(flat, np.int64), return_counts=True)
                if len(flat) else (np.zeros(0, np.int64), np.zeros(0, np.int64)))
        return pa.table({"token": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    add_b = add_bucket_column(["token"], "__b", nb)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False)["cnt"].sum()

    vocab = (ds.select_columns([tokens_col])
             .map_batches(partial, batch_format="pyarrow", batch_size=None,
                          concurrency=concurrency)
             .map_batches(add_b, batch_format="pyarrow", batch_size=None)
             .groupby("__b").map_groups(bucket_sum, batch_format="pandas")
             ).to_pandas()
    vocab = vocab.sort_values(["cnt", "token"], ascending=[False, True],
                              kind="stable").reset_index(drop=True)
    vocab["new_id"] = np.arange(len(vocab), dtype=np.int64)
    keys = np.sort(vocab["token"].to_numpy())
    new_of_key = vocab.set_index("token").loc[keys, "new_id"].to_numpy()
    import ray as _ray

    ref = _ray.put((keys, new_of_key.astype(np.int32)))

    def remap(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        k, v = _ray.get(ref)
        flat, offsets = _flat_tokens(t, tokens_col)
        f = np.asarray(flat, np.int64)
        pos = np.searchsorted(k, f)
        pos_c = np.clip(pos, 0, len(k) - 1)
        hit = (len(k) > 0) & (k[pos_c] == f)
        out = np.where(hit, v[pos_c] if len(k) else 0, oov_id).astype(np.int32)
        toks = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                        pa.array(out, pa.int32()))
        return t.drop_columns([tokens_col]).append_column(tokens_col, toks)

    remapped = ds.map_batches(remap, batch_format="pyarrow", batch_size=None)
    return remapped, vocab[["token", "new_id", "cnt"]]
