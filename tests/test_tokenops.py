"""Token-payload ops (round 3): exact substring dedup over token arrays
and greedy sequence packing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from openmldb_ray.stages.tokenops import (
    SequencePacker,
    exact_substring_dedup,
    pack_block,
    pack_sequences,
    rolling_window_hashes,
)


def _naive_window_hash_groups(docs, L):
    """Map window content tuple -> [(doc_idx, pos)] for parity checks."""
    groups = {}
    for d, toks in enumerate(docs):
        for p in range(max(0, len(toks) - L + 1)):
            groups.setdefault(tuple(toks[p:p + L]), []).append((d, p))
    return groups


def test_rolling_window_hashes_content_equality():
    rng = np.random.default_rng(7)
    docs = [rng.integers(0, 5, size=rng.integers(0, 40)).astype(np.int32)
            for _ in range(30)]
    L = 4
    flat = np.concatenate([d for d in docs]) if docs else np.zeros(0, np.int32)
    lengths = np.array([len(d) for d in docs], np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    keys, h3, didx, pos = rolling_window_hashes(flat, starts, lengths, L)
    # same content <-> same (key, h3); different content -> different
    naive = _naive_window_hash_groups(docs, L)
    got = {}
    for k, h, d, p in zip(keys, h3, didx, pos):
        got.setdefault((int(k), int(h)), []).append((int(d), int(p)))
    assert sorted(map(sorted, got.values())) == \
        sorted(map(sorted, naive.values()))
    # window count and positions per doc
    assert len(keys) == sum(max(0, len(d) - L + 1) for d in docs)
    for d, p in zip(didx, pos):
        assert 0 <= p <= len(docs[d]) - L


def test_exact_substring_dedup_removes_later_spans(ray_session):
    rng = np.random.default_rng(11)
    span = list(rng.integers(100, 200, size=12).astype(int))
    rows = []
    for i in range(20):
        toks = list(rng.integers(0, 50, size=30).astype(int))
        if i in (3, 9, 15):  # plant the span at position 5
            toks[5:5 + 12] = span
        rows.append({"doc_id": i, "tokens": [int(x) for x in toks],
                     "n_tok": len(toks)})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = exact_substring_dedup(ds, span_len=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def contains(toks, needle):
        t, m = list(toks), list(needle)
        return any(t[i:i + len(m)] == m for i in range(len(t) - len(m) + 1))

    holders = [r.doc_id for r in out.itertuples()
               if contains(r.tokens, span[:10])]
    assert holders == [3]  # first occurrence survives, later ones removed
    # doc 3 untouched, docs 9/15 lost exactly the planted 12-token span
    assert list(out.loc[out.doc_id == 3, "tokens"].iloc[0]) == \
        [int(x) for x in rows[3]["tokens"]]
    for d in (9, 15):
        kept = list(out.loc[out.doc_id == d, "tokens"].iloc[0])
        orig = rows[d]["tokens"]
        assert kept == orig[:5] + orig[17:]
        assert out.loc[out.doc_id == d, "n_tok"].iloc[0] == len(kept)
    # all other docs byte-identical
    for r in rows:
        if r["doc_id"] in (3, 9, 15):
            continue
        assert list(out.loc[out.doc_id == r["doc_id"], "tokens"].iloc[0]) \
            == r["tokens"]


def test_exact_substring_dedup_within_doc_and_short_docs(ray_session):
    # self-repetition inside ONE doc: second copy removed; short docs pass
    rep = list(range(400, 412))
    rows = [
        {"doc_id": 0, "tokens": rep + [1, 2, 3] + rep, "n_tok": 27},
        {"doc_id": 1, "tokens": [7, 8], "n_tok": 2},  # shorter than span_len
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = exact_substring_dedup(ds, span_len=12).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.loc[0, "tokens"]) == rep + [1, 2, 3]
    assert list(out.loc[1, "tokens"]) == [7, 8]


def test_exact_substring_dedup_winnow_long_region(ray_session):
    # winnow=4 still catches regions >= span_len + winnow - 1
    rng = np.random.default_rng(5)
    region = list(rng.integers(300, 400, size=30).astype(int))
    rows = [{"doc_id": 0, "tokens": region + [1, 2], "n_tok": 32},
            {"doc_id": 1, "tokens": [9, 9] + region, "n_tok": 32}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = exact_substring_dedup(ds, span_len=10, winnow=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.loc[0, "tokens"]) == region + [1, 2]   # first kept
    assert len(out.loc[1, "tokens"]) < 32                  # later copy shrunk


def test_winnow_select_parity_with_naive():
    from openmldb_ray.stages.tokenops import _winnow_select

    rng = np.random.default_rng(31)
    for trial in range(20):
        nd = int(rng.integers(1, 8))
        lens = rng.integers(0, 30, size=nd)
        doc_idx = np.repeat(np.arange(nd), lens)
        keys = rng.integers(0, 2**62, size=int(lens.sum()), dtype=np.uint64)
        w = int(rng.integers(1, 7))
        got = _winnow_select(keys, doc_idx, w)
        # naive: select i iff keys[i] == min over [max(doc_start, i-w+1), i]
        want = np.zeros(len(keys), bool)
        pos = 0
        for ln in lens:
            for i in range(ln):
                lo = max(0, i - w + 1)
                want[pos + i] = keys[pos + i] == keys[pos + lo: pos + i + 1].min()
            pos += ln
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial} w={w}")


def test_pack_block_greedy():
    ex, splits, n = pack_block(np.array([100, 200, 300, 250, 50]), 512)
    # 100+200 = 300, +300 = 600 > 512 -> [0,1], [2,3(550>512? 300+250=550>512)]
    assert list(ex) == [0, 0, 1, 2, 2]
    assert n == 3 and splits == []
    # oversized doc splits into chunks
    ex2, splits2, n2 = pack_block(np.array([1200, 100]), 512)
    assert list(ex2) == [0, 3]
    assert splits2 == [(0, 3)] and n2 == 4


def test_sequence_packer_frame():
    df = pd.DataFrame({"doc_id": [10, 11, 12, 13],
                       "n_tok": [400, 200, 1100, 30]})
    out = SequencePacker(max_len=512)(df)
    # [10]=400, [11]=200 doesn't fit (600) -> new; 12 split 512+512+76; 13
    assert out["total_tok"].sum() == 1730
    assert (out["total_tok"] <= 512).all()
    assert out["example_id"].tolist() == [10, 11, 12, 12, 12, 13]
    assert out["n_docs"].tolist() == [1, 1, 1, 1, 1, 1]


def test_pack_sequences_dataset_invariants(ray_session):
    rng = np.random.default_rng(3)
    rows = [{"doc_id": i, "n_tok": int(rng.integers(1, 600))}
            for i in range(500)]
    total = sum(r["n_tok"] for r in rows)
    ds = rd.from_items(rows)
    out = pack_sequences(ds, max_len=1024).to_pandas()
    assert out["total_tok"].sum() == total          # conservation
    assert (out["total_tok"] <= 1024).all()         # cap
    assert len(out) >= -(-total // 1024)            # >= lower bound


def test_hash_tokenizer_vocab_path_and_fallback(ray_session, tmp_path):
    import json

    from openmldb_ray.stages.tokenops import HashTokenizer, tokenize_text

    vocab = tmp_path / "vocab.json"
    vocab.write_text(json.dumps({"hello": 1, "world": 2}))
    rows = [{"doc_id": 0, "text": "hello world"},
            {"doc_id": 1, "text": "hello unknown"}]
    out = tokenize_text(rd.from_items(rows), vocab_path=str(vocab)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.loc[0, "tokens"]) == [1, 2]
    t1 = list(out.loc[1, "tokens"])
    assert t1[0] == 1 and t1[1] == HashTokenizer.word_id("unknown")
    assert out["n_tok"].tolist() == [2, 2]
    assert "text" not in out.columns
    # missing vocab file -> pure hash fallback, no error
    out2 = tokenize_text(rd.from_items(rows),
                         vocab_path=str(tmp_path / "nope.json")).to_pandas()
    assert len(out2) == 2


def test_chunk_tokens_exact(ray_session):
    from openmldb_ray.stages.tokenops import chunk_tokens

    rows = [{"doc_id": 0, "tokens": list(range(10)), "n_tok": 10},
            {"doc_id": 1, "tokens": [], "n_tok": 0},
            {"doc_id": 2, "tokens": list(range(100, 104)), "n_tok": 4}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = chunk_tokens(ds, seq_len=4, stride=3).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # doc0 (10 toks, L=4, S=3): starts 0,3,6,9 -> lens 4,4,4,1
    d0 = out[out.doc_id == 0]
    assert d0["chunk_idx"].tolist() == [0, 1, 2, 3]
    assert d0["n_tok"].tolist() == [4, 4, 4, 1]
    assert list(d0["tokens"].iloc[1]) == [3, 4, 5, 6]   # overlap window
    assert list(d0["tokens"].iloc[3]) == [9]
    assert (out.doc_id == 1).sum() == 0                 # empty doc -> none
    d2 = out[out.doc_id == 2]
    assert d2["n_tok"].tolist() == [4, 1]
    # token conservation at stride == seq_len (plain chunking)
    plain = chunk_tokens(ds, seq_len=4).to_pandas()
    assert plain["n_tok"].sum() == 14
