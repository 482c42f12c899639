"""Regression tests for the eighth review pass (dedup / textstats /
interval_join / pca)."""

import numpy as np
import pandas as pd
import pytest


def _rd(df, nparts=2):
    import ray.data

    return ray.data.from_pandas(df).repartition(nparts)


def test_exact_dedup_keeps_one_null_keyed_survivor(ray_session):
    """pandas groupby defaults dropna=True — every null-keyed row used to
    VANISH instead of one surviving per the min-keep_by contract."""
    from openmldb_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({"text": ["a", None, None], "ts": [2, 3, 1],
                       "id": [0, 1, 2]})
    out = exact_dedup(_rd(df, 1), "text", keep_by="ts").to_pandas()
    assert len(out) == 2
    nrow = out[out["text"].isna()]
    assert len(nrow) == 1 and int(nrow["ts"].iloc[0]) == 1  # min keep_by


def test_minhash_null_text_no_phantom_none(ray_session):
    """Null text normalizes to EMPTY, not the literal 'none': a null doc
    must not share a signature with a real doc whose text is 'None'."""
    from openmldb_ray.stages.dedup import (MinHasher, SimHasher,
                                           minhash_signatures)

    sig = minhash_signatures([None, "None", ""])
    assert (sig[0] == sig[2]).all()         # null == empty
    assert not (sig[0] == sig[1]).all()     # null != literal "None"
    sh = SimHasher._simhash_many([None, "None", ""])
    assert sh[0] == sh[2] and sh[0] != sh[1]
    # through the batch stage
    df = pd.DataFrame({"doc_id": [0, 1], "text": [None, "None"]})
    out = MinHasher(text_col="text")(df.copy())
    s = np.stack(out["__minhash"].to_numpy())
    assert not (s[0] == s[1]).all()


def test_textstats_null_text_zero_stats(ray_session):
    """TextQuality / TokenCounter / Fingerprinter / HashEmbedder on null
    text: zero chars/words/tokens, the EMPTY-doc hashes (never the word
    'none'), zero embedding."""
    from openmldb_ray.stages.textstats import (Fingerprinter, HashEmbedder,
                                               TextQuality, TokenCounter)

    df = pd.DataFrame({"text": [None, "", "none"]})
    q = TextQuality()(df.copy())
    assert q["q_n_chars"].tolist()[:2] == [0, 0]
    assert q["q_n_words"].tolist()[:2] == [0, 0]
    t = TokenCounter()(df.copy())
    assert t["n_ws_tokens"].tolist()[:2] == [0, 0]
    f = Fingerprinter()(df.copy())
    assert f["content_hash"].iloc[0] == f["content_hash"].iloc[1]
    assert f["content_hash"].iloc[0] != f["content_hash"].iloc[2]
    e = HashEmbedder()(df.copy())
    assert np.allclose(np.asarray(e["embedding"].iloc[0]), 0.0)
    assert not np.allclose(np.asarray(e["embedding"].iloc[2]), 0.0)


def test_tfidf_empty_batch_keeps_string_id_dtype(ray_session):
    """A batch of only-whitespace docs used to emit int64 ids that clash
    with string-id blocks."""
    import ray.data

    from openmldb_ray.stages.textstats import tfidf_top_terms

    df1 = pd.DataFrame({"doc_id": ["a", "b"], "text": ["  ", "   "]})
    df2 = pd.DataFrame({"doc_id": ["c", "d"], "text": ["hello world", "hello"]})
    ds = ray.data.from_pandas([df1, df2])
    out = tfidf_top_terms(ds, text_col="text", id_col="doc_id",
                          top_k=2).to_pandas()
    assert set(out["doc_id"]) <= {"a", "b", "c", "d"}
    assert out["doc_id"].map(type).eq(str).all()


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_interval_join_left_preserves_big_ints(ray_session, strategy):
    """how='left' used to float64-cast matched int columns, collapsing
    int64 ids past 2^53 — they now ride as nullable Int64."""
    from openmldb_ray.stages.interval_join import interval_join

    big = 2 ** 53 + 1
    left = pd.DataFrame({"ts": [5, 50]})
    right = pd.DataFrame({"s": [0], "e": [10], "rid": [big]})
    out = interval_join(
        _rd(left, 1), _rd(right, 1), ts_col="ts", start_col="s",
        end_col="e", how="left", strategy=strategy,
        bucket_width=10).to_pandas().sort_values("ts")
    hit = out[out["ts"] == 5]["rid"].iloc[0]
    assert int(hit) == big          # NOT big - 1 via float64
    assert pd.isna(out[out["ts"] == 50]["rid"].iloc[0])


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_interval_join_null_keys_never_match(ray_session, strategy):
    """String equi-keys with nulls used to crash np.argsort (None vs str);
    SQL semantics: null keys match nothing, on either side."""
    from openmldb_ray.stages.interval_join import interval_join

    left = pd.DataFrame({"ts": [5, 6, 7],
                         "k": ["a", None, "b"]}).astype({"k": object})
    right = pd.DataFrame({"s": [0, 0, 0], "e": [10, 10, 10],
                          "k": ["a", None, "zz"], "rid": [1, 2, 3]})
    out = interval_join(
        _rd(left, 1), _rd(right, 1), ts_col="ts", start_col="s",
        end_col="e", on="k", how="left", strategy=strategy,
        bucket_width=10).to_pandas().sort_values("ts")
    assert int(out[out["ts"] == 5]["rid"].iloc[0]) == 1
    assert pd.isna(out[out["ts"] == 6]["rid"].iloc[0])  # null left key
    assert pd.isna(out[out["ts"] == 7]["rid"].iloc[0])  # no right match


def test_interval_join_pandas_block_input_shuffle(ray_session):
    """The shuffle path read schemas before normalizing to Arrow, so a
    pandas-block input (object string columns) crashed pa.from_numpy_dtype
    before any task ran."""
    from openmldb_ray.stages.interval_join import interval_join

    left = _rd(pd.DataFrame({"ts": [5], "txt": ["hello"]}), 1) \
        .map_batches(lambda d: d, batch_format="pandas")
    right = _rd(pd.DataFrame({"s": [0], "e": [10], "tag": ["x"]}), 1) \
        .map_batches(lambda d: d, batch_format="pandas")
    out = interval_join(left, right, ts_col="ts", start_col="s",
                        end_col="e", strategy="shuffle",
                        bucket_width=5).to_pandas()
    assert len(out) == 1 and out["tag"].iloc[0] == "x"


def test_pca_null_and_ragged_embeddings_rejected(ray_session):
    """ListArray.flatten() drops null slots — reshape would misalign rows
    silently when lengths happen to divide; both cases must raise."""
    import pyarrow as pa
    import ray.data

    from openmldb_ray.stages.pca import fit_pca

    null_t = pa.table({"embedding": pa.array(
        [[1.0, 2.0], None, [3.0, 4.0]], pa.list_(pa.float64()))})
    with pytest.raises(Exception, match="null"):
        fit_pca(ray.data.from_arrow(null_t), k=1)
    # ragged with total divisible by n: [4, 2, 2] over 2 rows after drop
    rag_t = pa.table({"embedding": pa.array(
        [[1.0, 2.0, 3.0, 4.0], [5.0, 6.0], [7.0, 8.0], [9.0, 10.0]],
        pa.list_(pa.float64()))})
    with pytest.raises(Exception, match="ragged"):
        fit_pca(ray.data.from_arrow(rag_t), k=1)
    # all-empty input: the documented error, not IndexError
    empty = pa.table({"embedding": pa.array([], pa.list_(pa.float64()))})
    with pytest.raises(ValueError, match="at least 2 rows"):
        fit_pca(ray.data.from_arrow(empty), k=1)


def test_minhash_pair_and_dedup_band_schemes_agree(ray_session):
    """explode_bands is one shared factory now — the dedup survivor set
    and the pair stream must see identical (band, hash) buckets."""
    from openmldb_ray.stages.dedup import (minhash_candidate_pairs,
                                           minhash_lsh_dedup)

    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "the quick brown fox jumps over the lazy dog  " * 3,
             "completely different text about something else " * 3]
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    surv = minhash_lsh_dedup(_rd(df, 1), "text", "doc_id",
                             jaccard_threshold=0.7).to_pandas()
    pairs = minhash_candidate_pairs(_rd(df, 1), "text", "doc_id",
                                    jaccard_threshold=0.7).to_pandas()
    assert len(surv) == 2           # near-dup pair collapsed
    linked = set(map(tuple, pairs[["src", "dst"]].to_numpy()))
    assert any({0, 1} == {a, b} for a, b in linked)


# ---- ninth pass: window core (window_fast / window_stage) ----------------


def test_top1_ratio_all_null_partition(ray_session):
    """A partition whose top1_ratio column is entirely null used to crash
    the matrix path (zero-size C.max reduction); exact kernel returns 0.0."""
    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.core.window_fast import compute_window_features

    g = pd.DataFrame({"ts": [1, 2, 3], "v": [None, None, None]})
    out = compute_window_features(
        g, "ts", [AggSpec(kind="top1_ratio", name="r", col="v")],
        FrameSpec(rows_preceding=2))
    assert out["r"].astype(float).tolist() == [0.0, 0.0, 0.0]


def test_exact_kernel_order_keys_past_2_53(ray_session):
    """The exact path round-tripped order keys through float64: ts values
    past 2^53 were corrupted and in-window rows fell outside the bound."""
    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.core.window_fast import compute_window_features

    base = 2 ** 53
    g = pd.DataFrame({"ts": np.array([base + 1, base + 2], np.int64),
                      "v": [10, 20]})
    # max_size forces the exact kernel (non-fast frame)
    out = compute_window_features(
        g, "ts", [AggSpec(kind="count", name="c", col="v")],
        FrameSpec(range_preceding=1, max_size=10))
    assert out["c"].tolist() == [1, 2]  # both rows in the 1ms window


def test_exact_kernel_stable_dtypes_across_partitions(ray_session):
    """Exact-kernel numeric outputs used to take data-dependent dtypes
    (int64 / object / Arrow-null depending on empty windows); all-null and
    value partitions must now carry ONE Arrow type end-to-end."""
    import ray.data

    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.stages.window_stage import window_agg

    df = pd.DataFrame({
        "k": ["a"] * 3 + ["b"] * 3,
        "ts": [1, 2, 3, 1, 2, 3],
        "v": pd.array([1, 2, 3, None, None, None], dtype="Int64"),
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = window_agg(
        ds, "k", "ts",
        [AggSpec(kind="sum", name="s", col="v"),
         AggSpec(kind="avg", name="m", col="v")],
        FrameSpec(rows_preceding=2, max_size=10),  # exact kernel
    ).to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    assert out["s"].tolist()[:3] == [1, 3, 6]
    assert out["s"].isna().tolist()[3:] == [True, True, True]
    assert np.isnan(out["m"].to_numpy(np.float64, na_value=np.nan)[3:]).all()


def test_window_nan_partition_keys_one_group(ray_session):
    """Float NaN partition keys used to split into one-row groups (Arrow
    not_equal(NaN, NaN) is true); they must window together like pandas
    groupby(dropna=False)."""
    import ray.data

    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.stages.window_stage import window_agg

    df = pd.DataFrame({"k": [np.nan, np.nan, 1.0], "ts": [1, 2, 1],
                       "v": [10.0, 20.0, 5.0]})
    out = window_agg(
        ray.data.from_pandas(df), "k", "ts",
        [AggSpec(kind="sum", name="s", col="v")],
        FrameSpec(rows_preceding=5),
    ).to_pandas()
    nan_rows = out[out["k"].isna()].sort_values("ts")
    assert nan_rows["s"].tolist() == [10.0, 30.0]  # second row sees first


def test_salted_history_ms_guard(ray_session):
    """An explicit history_ms shorter than the frame's range_preceding
    silently dropped boundary history — now rejected."""
    import ray.data

    from openmldb_ray.core.aggregates import AggSpec
    from openmldb_ray.core.frames import FrameSpec
    from openmldb_ray.stages.window_stage import window_agg_salted

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "ts": [1],
                                            "v": [1.0]}))
    with pytest.raises(ValueError, match="history_ms"):
        window_agg_salted(ds, "k", "ts",
                          [AggSpec(kind="sum", name="s", col="v")],
                          FrameSpec(range_preceding=5000),
                          bucket_ms=10_000, history_ms=1000)


def test_empty_block_log_filters_installed():
    """Importing the package installs two narrowly-scoped log filters for
    Ray-internal empty-block noise: (1) the schema-divergence warning when
    the NEW schema is empty (Ray's sort shuffle emits zero-column blocks
    for empty partitions), and (2) the pandas size-estimator warning that
    only zero-row object-column blocks can trigger. Real divergences and
    real size failures must still pass through."""
    import logging

    import openmldb_ray  # noqa: F401 — installs the filters on import

    ses = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    pdb_ = logging.getLogger("ray.data._internal.pandas_block")

    def passes(lg, msg):
        rec = logging.LogRecord(lg.name, logging.WARNING, __file__, 0,
                                msg, None, None)
        return all(f.filter(rec) for f in lg.filters)

    # benign: divergence to an EMPTY schema — suppressed
    assert not passes(ses, "Operator produced a RefBundle with a different "
                           "schema than the previous one. Previous schema: "
                           "a: int64, new schema: . This may lead to "
                           "unexpected behavior.")
    # real: divergence between two non-empty schemas — kept
    assert passes(ses, "Operator produced a RefBundle with a different "
                       "schema than the previous one. Previous schema: "
                       "a: int64, new schema: a: string. This may lead to "
                       "unexpected behavior.")
    # benign: np.vectorize on a size-0 sample — suppressed
    assert not passes(pdb_, "Error calculating size for column 'doc_id': "
                            "cannot call `vectorize` on size 0 inputs "
                            "unless `otypes` is set")
    # real: any other size-estimation failure — kept
    assert passes(pdb_, "Error calculating size for column 'x': boom")
