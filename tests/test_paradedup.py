"""paragraph_dedup: CCNet-style first-occurrence paragraph dedup."""
import numpy as np
import pandas as pd
import pytest
import ray

from openmldb_ray.stages.paradedup import (_drops_to_map, paragraph_dedup)


def _naive(df, *, sep="\n", min_chars=1, drop_empty=True):
    seen = set()
    out = []
    for _, r in df.sort_values("doc_id").iterrows():
        kept = []
        for p in str(r["text"]).split(sep):
            if len(p) < min_chars:
                kept.append(p)
            elif p not in seen:
                seen.add(p)
                kept.append(p)
        t = sep.join(kept)
        if drop_empty and t.strip() == "":
            continue
        out.append({"doc_id": r["doc_id"], "text": t})
    return pd.DataFrame(out)


def _mkdocs():
    boiler = "accept all cookies to continue"
    foot = "(c) 2020 example corp all rights reserved"
    rows = []
    for i in range(40):
        paras = [f"unique body paragraph {i} alpha", boiler,
                 f"unique body paragraph {i} beta"]
        if i % 2 == 0:
            paras.append(foot)
        if i % 7 == 0:
            paras.append("")  # short: always kept
        if i == 13:
            paras = [boiler, foot]  # becomes empty after dedup? no: i>0
        rows.append({"doc_id": i, "text": "\n".join(paras), "n": i})
    # one doc that is ENTIRELY dups of earlier content -> drop_empty target
    rows.append({"doc_id": 99, "text": boiler + "\n" + foot, "n": 99})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_matches_naive(ray_session, strategy):
    df = _mkdocs()
    ds = ray.data.from_pandas(df).repartition(5)
    out = paragraph_dedup(ds, "text", "doc_id", min_chars=2,
                          strategy=strategy).to_pandas()
    exp = _naive(df, min_chars=2)
    got = out[["doc_id", "text"]].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp.sort_values("doc_id").reset_index(drop=True))
    # passthrough columns survive (broadcast keeps n intact)
    assert "n" in out.columns
    # the all-duplicate doc is gone
    assert 99 not in set(out["doc_id"])


def test_first_occurrence_order(ray_session):
    # same paragraph at different positions: survivor is the lexicographic
    # (doc_id, position) first, independent of partitioning
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["x same one\nkeep a", "keep b\nx same one",
                 "x same one\nkeep c"],
    })
    for parts in (1, 3):
        out = paragraph_dedup(ray.data.from_pandas(df).repartition(parts),
                              "text", "doc_id").to_pandas()
        got = dict(zip(out["doc_id"], out["text"]))
        assert got[1] == "x same one\nkeep a"
        assert got[2] == "keep b"
        assert got[3] == "keep c"


def test_min_chars_exempts_short(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["aa\nlong paragraph here",
                                "aa\nlong paragraph here\naa"]})
    out = paragraph_dedup(ray.data.from_pandas(df), "text", "doc_id",
                          min_chars=5).to_pandas()
    got = dict(zip(out["doc_id"], out["text"]))
    assert got[1] == "aa\nlong paragraph here"
    assert got[2] == "aa\naa"  # short 'aa' never deduped, long one is


def test_no_dups_passthrough(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["only one here", "another only here"]})
    out = paragraph_dedup(ray.data.from_pandas(df), "text",
                          "doc_id").to_pandas()
    assert sorted(out["text"]) == sorted(df["text"])


def test_drops_to_map():
    keys, m = _drops_to_map(np.array([3, 1, 3, 1, 2]),
                            np.array([5, 2, 1, 0, 9]))
    assert sorted(keys.tolist()) == [1, 2, 3]
    assert m[1].tolist() == [0, 2]
    assert m[2].tolist() == [9]
    assert m[3].tolist() == [1, 5]
    k0, m0 = _drops_to_map(np.array([], np.int64), np.array([], np.int64))
    assert len(k0) == 0 and m0 == {}
