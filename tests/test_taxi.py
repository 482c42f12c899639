"""Taxi demo parity: the reference's 10-feature vector
(demo/predict-taxi-trip-duration/script/taxi.sql:9-23) vs a DuckDB oracle
over the same deterministic synthetic trips."""

import duckdb
import numpy as np
import pandas as pd


def test_taxi_feature_vector_vs_duckdb(ray_session):
    from openmldb_ray.pipelines.taxi import gen_taxi_batch, taxi_features

    n = 3000
    out = taxi_features(n).to_pandas()
    raw = gen_taxi_batch(np.arange(n, dtype=np.uint64), 42).to_pandas()

    con = duckdb.connect()
    con.register("t1", raw)
    oracle = con.sql("""
        SELECT id, trip_duration, passenger_count,
               SUM(pickup_latitude) OVER w AS vendor_sum_pl,
               MAX(pickup_latitude) OVER w AS vendor_max_pl,
               MIN(pickup_latitude) OVER w AS vendor_min_pl,
               AVG(pickup_latitude) OVER w AS vendor_avg_pl,
               SUM(pickup_latitude) OVER w2 AS pc_sum_pl,
               MAX(pickup_latitude) OVER w2 AS pc_max_pl,
               MIN(pickup_latitude) OVER w2 AS pc_min_pl,
               AVG(pickup_latitude) OVER w2 AS pc_avg_pl,
               COUNT(vendor_id) OVER w2 AS pc_cnt,
               COUNT(vendor_id) OVER w AS vendor_cnt
        FROM t1
        WINDOW w AS (PARTITION BY vendor_id ORDER BY pickup_datetime
                     RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY passenger_count ORDER BY pickup_datetime
                      RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
    """).df()
    # RANGE windows + ties: ensure synthetic pickup ts are unique per key so
    # DuckDB peer semantics match arrival semantics
    assert raw.groupby(["vendor_id", "pickup_datetime"]).size().max() == 1
    assert raw.groupby(["passenger_count", "pickup_datetime"]).size().max() == 1

    m = out.merge(oracle, on="id", suffixes=("", "_o"))
    assert len(m) == n
    for c in ["vendor_sum_pl", "vendor_max_pl", "vendor_min_pl", "vendor_avg_pl",
              "vendor_cnt", "pc_sum_pl", "pc_max_pl", "pc_min_pl", "pc_avg_pl",
              "pc_cnt"]:
        a = pd.to_numeric(m[c], errors="coerce").astype(float)
        b = pd.to_numeric(m[f"{c}_o"], errors="coerce").astype(float)
        assert np.allclose(a, b, equal_nan=True), c
