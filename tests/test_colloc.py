"""collocations: bigram lift top-k vs naive + DuckDB."""
import duckdb
import numpy as np
import pandas as pd
import ray

from openmldb_ray.stages.colloc import collocations


def _naive(texts, top_k, min_count):
    from collections import Counter
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws[:-1], ws[1:]))
    n = sum(uni.values())
    rows = []
    for (a, b), cab in bi.items():
        if cab < min_count:
            continue
        lift = (np.float64(cab) * np.float64(n)) / \
            (np.float64(uni[a]) * np.float64(uni[b]))
        rows.append({"w1": a, "w2": b, "pair_cnt": cab, "w1_cnt": uni[a],
                     "w2_cnt": uni[b], "lift": lift})
    df = pd.DataFrame(rows).sort_values(
        ["lift", "w1", "w2"], ascending=[False, True, True], kind="stable")
    return df.head(top_k).reset_index(drop=True)


def _corpus():
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(300):
        ws = list(rng.choice(vocab, size=40))
        # plant a strong collocation
        if i % 3 == 0:
            for j in (5, 20):
                ws[j:j + 2] = ["hong", "kong"]
        texts.append(" ".join(ws))
    texts.append("")  # empty doc
    texts.append("single")  # 1-word doc
    return texts


def test_matches_naive_and_duckdb(ray_session):
    texts = _corpus()
    df = pd.DataFrame({"text": texts})
    got = collocations(ray.data.from_pandas(df).repartition(7),
                       top_k=20, min_count=5, num_partitions=8)
    exp = _naive(texts, 20, 5)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # planted collocation dominates
    assert got.iloc[0]["w1"] == "hong" and got.iloc[0]["w2"] == "kong"
    # cross-check the lift float bit-for-bit with DuckDB
    con = duckdb.connect()
    con.register("documents", df)
    o = con.execute(r"""
        WITH w AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
                   FROM documents WHERE trim(text) <> ''),
        uni AS (SELECT u AS g, count(*) AS c
                FROM (SELECT unnest(ws) AS u FROM w) GROUP BY u),
        tot AS (SELECT sum(c) AS n FROM uni),
        bi AS (SELECT a, b, count(*) AS cab FROM (
                 SELECT unnest(ws[1:len(ws)-1]) AS a,
                        unnest(ws[2:len(ws)]) AS b
                 FROM w WHERE len(ws) >= 2) GROUP BY a, b
               HAVING count(*) >= 5)
        SELECT bi.a AS w1, bi.b AS w2, cab AS pair_cnt,
               ua.c AS w1_cnt, ub.c AS w2_cnt,
               (cab * 1.0 * n) / (ua.c * 1.0 * ub.c) AS lift
        FROM bi JOIN uni ua ON ua.g = bi.a
                JOIN uni ub ON ub.g = bi.b CROSS JOIN tot
        ORDER BY lift DESC, w1, w2 LIMIT 20
    """).fetchdf()
    assert np.array_equal(got["lift"].to_numpy(), o["lift"].to_numpy())
    assert got["w1"].tolist() == o["w1"].tolist()


def test_split_invariance(ray_session):
    texts = _corpus()
    df = pd.DataFrame({"text": texts})
    a = collocations(ray.data.from_pandas(df).repartition(1),
                     top_k=15, min_count=3, num_partitions=4)
    b = collocations(ray.data.from_pandas(df).repartition(11),
                     top_k=15, min_count=3, num_partitions=4)
    pd.testing.assert_frame_equal(a, b)


def test_empty_corpus(ray_session):
    df = pd.DataFrame({"text": ["", "  "]})
    got = collocations(ray.data.from_pandas(df), top_k=5, min_count=1,
                       num_partitions=2)
    assert len(got) == 0
