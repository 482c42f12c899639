"""Sources/sinks (LoadDataPlan / SelectIntoPlan), ConcatJoin zip,
scalar-function registry (user-extension surface), lineage resume filter."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_load_data_soft_and_deep_copy(ray_session, tmp_path):
    from openmldb_ray.sources.io import load_data

    ds = load_data(f"{SF}/nation.parquet", "parquet", columns=["n_nationkey", "n_name"])
    assert ds.count() == 25
    deep = str(tmp_path / "deep")
    ds2 = load_data(f"{SF}/nation.parquet", "parquet", deep_copy_to=deep)
    assert ds2.count() == 25
    assert os.path.isdir(deep) and os.listdir(deep)


def test_load_data_catalog_source(ray_session, tmp_path):
    """hive://db.table resolves through the registered catalog and follows
    the same soft/deep copy modes (LoadDataPlan.scala:30-134 hive branch)."""
    from openmldb_ray.sources.catalog import register_table, unregister_table
    from openmldb_ray.sources.io import load_data

    register_table("tpch", "nation", f"{SF}/nation.parquet")
    try:
        ds = load_data("hive://tpch.nation", columns=["n_nationkey"])
        assert ds.count() == 25
        assert ds.schema().names == ["n_nationkey"]
        deep = str(tmp_path / "cat_deep")
        assert load_data("catalog://tpch.nation", deep_copy_to=deep).count() == 25
        assert os.listdir(deep)
        with pytest.raises(KeyError, match="not registered"):
            load_data("hive://tpch.missing")
    finally:
        unregister_table("tpch", "nation")


def test_select_into_write_modes(ray_session, tmp_path):
    import ray.data as rd

    from openmldb_ray.sources.io import select_into

    ds = rd.from_items([{"a": i} for i in range(10)])
    out = str(tmp_path / "out")
    select_into(ds, out, "parquet", mode="overwrite")
    assert rd.read_parquet(out).count() == 10
    with pytest.raises(FileExistsError):
        select_into(ds, out, "parquet", mode="errorifexists")
    select_into(ds, out, "parquet", mode="append")
    assert rd.read_parquet(out).count() == 20
    select_into(ds, out, "parquet", mode="overwrite")
    assert rd.read_parquet(out).count() == 10
    csv_out = str(tmp_path / "csv")
    select_into(ds, csv_out, "csv")
    assert rd.read_csv(csv_out).count() == 10


def test_concat_zip(ray_session):
    import ray.data as rd

    from openmldb_ray.stages.relational import concat_zip

    a = rd.from_items([{"x": i} for i in range(5)])
    b = rd.from_items([{"y": i * 10} for i in range(5)])
    out = concat_zip(a, b).to_pandas()
    assert (out["y"] == out["x"] * 10).all()


def test_scalar_registry_and_user_extension(ray_session):
    import pyarrow.compute as pc

    from openmldb_ray.functions.scalar import REGISTRY, get, register

    arr = pa.array([1.5, -2.5, None])
    assert get("abs")(arr).to_pylist() == [1.5, 2.5, None]
    assert get("ceil")(arr).to_pylist() == [2.0, -2.0, None]
    s = pa.array(["Hello World", None])
    assert get("lower")(s).to_pylist() == ["hello world", None]
    assert get("char_length")(s).to_pylist() == [11, None]
    assert get("substr")(s, 7, 5).to_pylist() == ["World", None]
    assert get("concat")(s, s).to_pylist() == ["Hello WorldHello World", None]
    assert get("like_match")(s, "Hello%").to_pylist() == [True, None]
    assert get("strcmp")(pa.array(["a", "b", "c"]), pa.array(["b", "b", "a"])).to_pylist() == [-1, 0, 1]
    ts = pa.array([1590738990000], type=pa.int64())  # 2020-05-29 UTC
    assert get("year")(ts).to_pylist() == [2020]
    assert get("month")(ts).to_pylist() == [5]
    assert get("day")(ts).to_pylist() == [29]
    assert get("is_null")(arr).to_pylist() == [False, False, True]
    assert get("if_null")(arr, 0.0).to_pylist() == [1.5, -2.5, 0.0]
    # user extension (reference analog: external .so UDF registration,
    # SparkPlanner.scala:349-378)
    register("plus_one", lambda x: pc.add(x, 1))
    assert get("plus_one")(pa.array([1, 2])).to_pylist() == [2, 3]
    assert "farm_fingerprint" in REGISTRY and "ifnull" in REGISTRY


def test_lineage_filter_completed(ray_session, tmp_path):
    import ray.data as rd

    from openmldb_ray.state.lineage import (
        filter_completed,
        write_partitioned_with_lineage,
    )

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 5, "v": range(10)})
    out_dir = str(tmp_path / "o")
    write_partitioned_with_lineage(rd.from_pandas(df), out_dir, "k")
    # simulate a restart: partition 'a' complete → its rows are dropped
    os.remove(os.path.join(out_dir, "lineage", "b.json"))
    remaining = filter_completed(rd.from_pandas(df), out_dir, "k").to_pandas()
    assert set(remaining["k"]) == {"b"}
    assert len(remaining) == 5


def test_feature_zero_string_family():
    """split / split_by_key / split_by_value / join
    (feature_zero_def.cc:558-676)."""
    from openmldb_ray.functions.scalar import get

    # NULL input -> EMPTY list, reference parity
    # (test_feature_zero_function.yaml id 2: fz_join(fz_split(NULL)) = '')
    s = pa.array(["a,b,c", "x", None])
    assert get("split")(s, ",").to_pylist() == [["a", "b", "c"], ["x"], []]
    kv = pa.array(["k1:1,k2:2", "k3:3", None])
    assert get("split_by_key")(kv, ",", ":").to_pylist() == [["k1", "k2"], ["k3"], []]
    assert get("split_by_value")(kv, ",", ":").to_pylist() == [["1", "2"], ["3"], []]
    lst = get("split")(s, ",")
    assert get("join")(lst, "-").to_pylist() == ["a-b-c", "x", ""]
    assert get("fz_join")(lst, "|").to_pylist() == ["a|b|c", "x", ""]
    # round-trip through a projection stage shape
    assert get("size")(lst).to_pylist() == [3, 1, 0]


def test_jsonl_round_trip(ray_session, tmp_path):
    """LOAD DATA / SELECT INTO with format json: newline-delimited JSON —
    the interchange format of most public LLM corpora (an extension past
    the reference's csv/parquet LoadData surface)."""
    import pandas as pd
    import ray.data as rd

    from openmldb_ray.sources.io import load_data, select_into

    src = pd.DataFrame({"doc_id": ["a", "b", "c"],
                        "n_tok": [3, 5, 8],
                        "text": ["x y z", "hello", 'quote " comma,']})
    out = str(tmp_path / "docs_json")
    select_into(rd.from_pandas(src), out, fmt="jsonl")

    back = load_data(out, "jsonl").to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == ["a", "b", "c"]
    assert back["n_tok"].tolist() == [3, 5, 8]
    assert back["text"].tolist() == src["text"].tolist()

    proj = load_data(out, "json", columns=["doc_id"]).to_pandas()
    assert list(proj.columns) == ["doc_id"]

    with pytest.raises(FileExistsError):
        select_into(rd.from_pandas(src), out, fmt="jsonl",
                    mode="errorifexists")


def test_get_json_object_semantics():
    """get_json_object follows Spark/Hive + DuckDB json_extract_string
    semantics: raw text for scalars, compact JSON for objects/arrays,
    NULL for invalid JSON / missing path / JSON null / bad path; nested
    field and array-index steps compose. Differential vs DuckDB on the
    shared cases."""
    import duckdb

    from openmldb_ray.functions.scalar import get

    f = get("get_json_object")
    docs = ['{"k": 87}', '{"k": null}', '{"a": {"b": [1, {"c": "x y"}]}}',
            'not json', None, '{"f": 1.5, "t": true, "s": "hi"}']
    s = pa.array(docs, pa.string())

    for path in ("$.k", "$.a.b[1].c", "$.f", "$.t", "$.s", "$.a",
                 "$.a.b", "$.missing", "$[0]"):
        got = f(s, path).to_pylist()
        # TRY_CAST: DuckDB raises on malformed JSON where Spark (and this
        # engine) return NULL — normalize that one divergence for the diff
        want = [duckdb.sql(
            "SELECT json_extract_string(TRY_CAST(? AS JSON), ?)",
            params=[d, path]
        ).fetchone()[0] if d is not None else None for d in docs]
        assert got == want, (path, got, want)

    # malformed path -> all NULL (no crash), alias registered
    assert f(s, "no_dollar").to_pylist() == [None] * len(docs)
    assert get("json_extract_string") is f


def test_expression_shorthand_udfs():
    """add/inc/minimum/maximum (reference expression-shorthand UDFs,
    default_udf_library.cc:2390-2586): SQL null semantics — a null
    comparand nulls the result (cond-expr lowering), unlike the
    null-skipping min/max aggregates."""
    from openmldb_ray.functions.scalar import get

    x = pa.array([1, 5, None, 3], pa.int64())
    y = pa.array([4, 2, 7, None], pa.int64())
    assert get("add")(x, y).to_pylist() == [5, 7, None, None]
    assert get("inc")(x).to_pylist() == [2, 6, None, 4]
    assert get("minimum")(x, y).to_pylist() == [1, 2, None, None]
    assert get("maximum")(x, y).to_pylist() == [4, 5, None, None]
