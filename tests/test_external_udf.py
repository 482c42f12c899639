"""External UDF registration from a module FILE — the environment's
analog of the reference's dynamic ``.so`` loading
(SparkPlanner.scala:349-378; hybridse/src/udf/dynamic_lib_manager.h).

The worker-visibility contract mirrors the reference's (the library file
must exist on every executor): the module path travels via the
OMR_EXTERNAL_UDFS env var and worker processes lazily re-load it on a
registry miss, so external UDFs resolve through the SQL engine's
per-process function lookup too."""

import os
import textwrap

import numpy as np
import pyarrow as pa
import pytest


UDF_MODULE = textwrap.dedent('''
    import pyarrow.compute as pc

    def _private_helper(x):
        return x

    def double_plus1(x):
        return pc.add(pc.multiply(x, 2), 1)

    OMR_UDFS = {"double_plus1": double_plus1}
''')


@pytest.fixture
def udf_path(tmp_path):
    p = tmp_path / "my_udfs.py"
    p.write_text(UDF_MODULE)
    return str(p)


@pytest.fixture(autouse=True)
def _clean_registry():
    from openmldb_ray.functions import scalar

    yield
    scalar.REGISTRY.pop("double_plus1", None)
    scalar.REGISTRY.pop("ext_double_plus1", None)
    os.environ.pop(scalar.EXTERNAL_UDFS_ENV, None)
    scalar._external_loaded.clear()
    scalar._EXTERNAL_FNS.clear()


def test_register_external_and_project(ray_session, udf_path):
    import ray.data as rd

    from openmldb_ray.functions import scalar

    names = scalar.register_external(udf_path)
    assert names == ["double_plus1"]
    fn = scalar.get("double_plus1")
    out = fn(pa.array([1, 2, 3], pa.int64()))
    assert out.to_pylist() == [3, 5, 7]

    ds = rd.from_arrow(pa.table({"v": pa.array([10, 20], pa.int64())}))
    f = scalar.get("double_plus1")          # captured driver-side, ships
    res = scalar.project(ds, {"d": lambda t: f(t["v"])},  # by value
                         keep=["v"]).to_pandas()
    assert res["d"].tolist() == [21, 41]


def test_external_udf_through_sql_worker_resolution(ray_session, udf_path):
    """The SQL engine resolves functions per-process inside map workers;
    an external UDF registered in the driver must resolve there via the
    env-announced lazy reload."""
    import ray.data as rd

    from openmldb_ray.functions import scalar
    from openmldb_ray.sql import sql_query

    scalar.register_external(udf_path, names=["double_plus1"])
    t = pa.table({"v": pa.array([5, 6, 7], pa.int64()),
                  "__rid": pa.array(range(3), pa.int64())})
    out = sql_query("select v, double_plus1(v) as d from t0",
                    {"t0": rd.from_arrow(t)})
    df = out.to_pandas().sort_values("v").reset_index(drop=True)
    assert df["d"].tolist() == [11, 13, 15]


def test_register_external_prefix_and_missing_name(udf_path):
    from openmldb_ray.functions import scalar

    names = scalar.register_external(udf_path, prefix="ext_")
    assert names == ["ext_double_plus1"]
    assert scalar.get("ext_double_plus1") is not None
    with pytest.raises(ValueError, match="does not define"):
        scalar.register_external(udf_path, names=["nope"])


def test_private_helpers_not_registered(udf_path):
    from openmldb_ray.functions import scalar

    scalar.register_external(udf_path)
    assert "_private_helper" not in scalar.REGISTRY
