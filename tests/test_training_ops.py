"""Training-data pipeline ops: dedup variants, text stats, similarity
search, multimodal plumbing — correctness against brute-force oracles."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_catches_planted_near_dups(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.dedup import minhash_lsh_dedup

    base = ("the quick brown fox jumps over the lazy dog and then runs far away "
            "into the deep dark forest where nobody can find it anymore today")
    rows = []
    for i in range(50):
        # disjoint word ranges → genuinely unique docs
        rows.append({"doc_id": i, "text": f"unique document number {i} " + " ".join(
            f"w{i * 31 + j}" for j in range(30))})
    # planted near-duplicates of doc 100
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base})                     # exact dup
    rows.append({"doc_id": 102, "text": base.replace("dog", "cat")})  # near dup
    ds = rd.from_items(rows)
    out = minhash_lsh_dedup(ds, "text", "doc_id", jaccard_threshold=0.7).to_pandas()
    ids = set(out["doc_id"])
    assert 100 in ids          # smallest id of the cluster survives
    assert 101 not in ids      # exact dup removed
    assert 102 not in ids      # near dup removed
    assert len(ids & set(range(50))) == 50  # uniques all survive


def test_simhash_catches_exact_dups(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.dedup import simhash_dedup

    text = "a fairly long piece of text with many common words repeated " * 3
    rows = [{"doc_id": i, "text": f"doc {i} " + " ".join(
        f"tok{(i * 13 + j) % 211}" for j in range(40))} for i in range(30)]
    rows += [{"doc_id": 200, "text": text}, {"doc_id": 201, "text": text}]
    out = simhash_dedup(rd.from_items(rows), "text", "doc_id").to_pandas()
    ids = set(out["doc_id"])
    assert 200 in ids and 201 not in ids


def test_embedding_dedup_cosine(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.simsearch import embedding_dedup

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(40)]
    # planted near-duplicate of vec 0
    rows.append({"vec_id": 100, "embedding": (vecs[0] * 1.001 + 1e-4).tolist()})
    out = embedding_dedup(rd.from_items(rows), cosine_threshold=0.99).to_pandas()
    ids = set(out["vec_id"])
    assert 0 in ids and 100 not in ids
    assert len(ids) == 40


def test_knn_matches_numpy_oracle(ray_session):
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.simsearch import knn_brute_force

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    pdf = emb.to_pandas()
    mat = np.stack([np.asarray(v, float) for v in pdf["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = mat[:5]
    out = knn_brute_force(emb, q, pdf["vec_id"].to_numpy()[:5], k=3).to_pandas()
    scores = q @ mat.T
    for qi in range(5):
        order = np.lexsort((pdf["vec_id"].to_numpy(), -scores[qi]))[:3]
        expected = pdf["vec_id"].to_numpy()[order].tolist()
        got = out[out["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        assert got == expected, qi


def test_knn_lsh_recall(ray_session):
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.simsearch import knn_brute_force, knn_lsh

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    pdf = emb.to_pandas()
    mat = np.stack([np.asarray(v, float) for v in pdf["embedding"]])
    q = mat[:5]
    ids = pdf["vec_id"].to_numpy()[:5]
    exact = knn_brute_force(emb, q, ids, k=5).to_pandas()
    approx = knn_lsh(emb, q, ids, k=5, num_bits=6, num_tables=6).to_pandas()
    recalls = []
    for qi in ids:
        e = set(exact[exact["query_id"] == qi]["neighbor_id"])
        a = set(approx[approx["query_id"] == qi]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # approximate, but must find most neighbors


def test_text_stats_and_langid(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.textstats import LangId, text_stats

    rows = [
        {"doc_id": 0, "text": "the cat and the dog sat on the mat for a while"},
        {"doc_id": 1, "text": "der Hund und die Katze sind nicht auf der Matte"},
        {"doc_id": 2, "text": "123 456!!!"},
        {"doc_id": 3, "text": ""},
    ]
    ds = rd.from_items(rows)
    out = text_stats(ds).to_pandas().sort_values("doc_id")
    assert out["n_ws_tokens"].tolist() == [12, 10, 2, 0]
    assert out["q_n_chars"].iloc[0] == len(rows[0]["text"])
    assert out["q_digit_ratio"].iloc[2] > 0.5
    lang = ds.map_batches(LangId, batch_format="pandas", batch_size=None,
                          concurrency=(1, 2)).to_pandas().sort_values("doc_id")
    assert lang["lang_pred"].iloc[0] == "en"
    assert lang["lang_pred"].iloc[1] == "de"


def test_fingerprint_stability(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.textstats import Fingerprinter

    rows = [{"doc_id": 0, "text": "identical content here"},
            {"doc_id": 1, "text": "identical content here"},
            {"doc_id": 2, "text": "different content entirely"}]
    out = rd.from_items(rows).map_batches(
        Fingerprinter, batch_format="pandas", batch_size=None,
        concurrency=(1, 2)).to_pandas().sort_values("doc_id")
    assert out["content_hash"].iloc[0] == out["content_hash"].iloc[1]
    assert out["content_hash"].iloc[0] != out["content_hash"].iloc[2]
    assert out["winnow_hash"].iloc[0] == out["winnow_hash"].iloc[1]


def test_multimodal_plumbing(ray_session):
    from openmldb_ray.stages.multimodal import (
        ImageFeatureExtractor,
        extract_image_features,
        make_multimodal_dataset,
        sample_audio_frames,
    )

    mm = make_multimodal_dataset(16)
    out = extract_image_features(mm, fake_decode=True).to_pandas()
    assert len(out) == 16
    assert all(len(v) == 3 for v in out["img_mean_rgb"])
    # decode is deterministic
    out2 = extract_image_features(make_multimodal_dataset(16), fake_decode=True).to_pandas()
    a = np.stack([np.asarray(v) for v in out.sort_values("mm_id")["img_mean_rgb"]])
    b = np.stack([np.asarray(v) for v in out2.sort_values("mm_id")["img_mean_rgb"]])
    assert np.allclose(a, b)
    # default decode is REAL since round 4: unknown magic bytes raise a
    # clear ValueError naming decode_fn= (not a silent fake)
    ex = ImageFeatureExtractor()
    with pytest.raises(ValueError, match="decode_fn"):
        ex.decode(b"xx")
    audio = sample_audio_frames(mm, fake_decode=True).to_pandas()
    assert (audio["n_frames"] >= 1).all()


def test_exact_dedup_collision_safety(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.dedup import exact_dedup

    rows = [{"doc_id": i, "text": f"t{i % 10}"} for i in range(100)]
    out = exact_dedup(rd.from_items(rows), "text", keep_by="doc_id").to_pandas()
    assert sorted(out["doc_id"]) == list(range(10))  # min id per distinct text


def test_knn_ivf_recall(ray_session):
    from openmldb_ray.sources.io import read_table
    from openmldb_ray.stages.simsearch import knn_brute_force, knn_ivf

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    pdf = emb.to_pandas()
    mat = np.stack([np.asarray(v, float) for v in pdf["embedding"]])
    q = mat[:5]
    ids = pdf["vec_id"].to_numpy()[:5]
    exact = knn_brute_force(emb, q, ids, k=5).to_pandas()
    approx = knn_ivf(emb, q, ids, k=5, num_centroids=16, nprobe=6).to_pandas()
    recalls = []
    for qi in ids:
        e = set(exact[exact["query_id"] == qi]["neighbor_id"])
        a = set(approx[approx["query_id"] == qi]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6


def test_hash_embed_deterministic_and_normalized(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.textstats import HashEmbedder, hash_embed

    rows = [{"doc_id": 0, "text": "alpha beta gamma"},
            {"doc_id": 1, "text": "ALPHA beta GAMMA"},   # case-folded: same
            {"doc_id": 2, "text": "totally different words here"},
            {"doc_id": 3, "text": ""}]
    out = hash_embed(rd.from_items(rows), dim=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    v = [np.asarray(x, float) for x in out["embedding"]]
    assert np.allclose(v[0], v[1])                      # identical content
    assert np.linalg.norm(v[0]) == pytest.approx(1.0)   # unit norm
    assert np.linalg.norm(v[3]) == 0.0                  # empty doc -> zeros
    assert abs(float(v[0] @ v[2])) < 0.9                # distinct texts differ
    # per-batch vs whole-frame parity (no cross-row state)
    one = HashEmbedder(dim=32)(pd.DataFrame(rows[:1]))
    assert np.allclose(np.asarray(one["embedding"].iloc[0], float), v[0])


def test_multimodal_resize_and_video(ray_session):
    from openmldb_ray.stages.multimodal import (
        VideoFrameSampler,
        make_multimodal_dataset,
        resize_images,
        sample_video_frames,
    )

    mm = make_multimodal_dataset(8)
    out = resize_images(mm, out_hw=(4, 4), fake_decode=True).to_pandas()
    assert (out["payload_resized"].map(len) == 4 * 4 * 3).all()
    assert out["resized_hw"].map(lambda x: tuple(x) == (4, 4)).all()
    vid = sample_video_frames(mm, stride=2, fake_decode=True).to_pandas()
    assert (vid["frame_offsets"].map(len) >= 1).all()
    # offsets follow the stride
    offs = vid["frame_offsets"].iloc[0]
    assert list(offs) == list(range(0, len(offs) * 2, 2))
    # default demux is REAL (OMRV container): unknown bytes raise a
    # clear ValueError naming the demuxer escape hatch
    import pyarrow as pa

    with pytest.raises(Exception, match="OMRV|demuxer"):
        VideoFrameSampler()(pa.table({"payload": [b"xx"]}))
