"""Taxi-trip feature extraction — the reference's canonical demo workload
(demo/predict-taxi-trip-duration/script/taxi.sql:9-23): the exact
10-feature vector over two ROWS_RANGE 1d windows (PARTITION BY vendor_id
and PARTITION BY passenger_count), fused into two window stages over the
same stream (the ConcatJoin multi-window pattern, SparkPlanner.scala:
100-108, executed as sequential window stages instead of zip — same
result, no row-index bookkeeping).

The taxi table is synthesized deterministically (FIXTURES.md §F4 schema;
no taxi parquet ships with the test data) with the same hash-counter PRNG
as the flagship, so every run and every oracle sees identical input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.aggregates import Agg
from ..core.frames import rows_range
from ..stages.window_stage import window_agg
from .flagship import _h64, _u01

BASE_TS = 1_546_300_800_000  # 2019-01-01


def gen_taxi_batch(ids: np.ndarray, seed: int) -> pa.Table:
    raw = ids.astype(np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B1)
    n = raw.shape[0]
    vendor_id = (_h64(raw, 1) % np.uint64(2)).astype(np.int32) + 1
    passenger_count = (_h64(raw, 2) % np.uint64(6)).astype(np.int32) + 1
    # unique per id (slot + sub-slot jitter) — RANGE-frame oracles need
    # tie-free order keys; ties are exercised by the YAML golden cases
    pickup = (BASE_TS + ids.astype(np.int64) * 900_000
              + (_h64(raw, 3) % np.uint64(900_000)).astype(np.int64))
    dur = (120 + _u01(raw, 4) * 3000).astype(np.int32)
    lat = 40.6 + _u01(raw, 5) * 0.3
    lon = -74.1 + _u01(raw, 6) * 0.3
    return pa.Table.from_arrays(
        [pa.array([f"id{int(i):08d}" for i in ids.astype(np.int64)], type=pa.string()),
         pa.array(vendor_id), pa.array(pickup), pa.array(pickup + dur * 1000),
         pa.array(passenger_count), pa.array(lon), pa.array(lat),
         pa.array(lon + 0.01), pa.array(lat + 0.01),
         pa.array(np.where(_h64(raw, 7) % np.uint64(10) == 0, "Y", "N").astype(object), type=pa.string()),
         pa.array(dur)],
        names=["id", "vendor_id", "pickup_datetime", "dropoff_datetime",
               "passenger_count", "pickup_longitude", "pickup_latitude",
               "dropoff_longitude", "dropoff_latitude", "store_and_fwd_flag",
               "trip_duration"],
    )


def make_taxi(n: int = 5000, seed: int = 42):
    import ray.data as rd

    ds = rd.range(n)

    def fn(b: pa.Table) -> pa.Table:
        return gen_taxi_batch(b["id"].to_numpy(), seed)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def taxi_features(n: int = 5000, seed: int = 42):
    """The demo's exact feature vector: label + 10 window features."""
    t1 = make_taxi(n, seed).select_columns(
        ["id", "vendor_id", "passenger_count", "pickup_datetime",
         "pickup_latitude", "trip_duration"])
    frame = rows_range("1d")
    w1 = window_agg(
        t1, "vendor_id", "pickup_datetime",
        [Agg.sum("pickup_latitude", "vendor_sum_pl"),
         Agg.max("pickup_latitude", "vendor_max_pl"),
         Agg.min("pickup_latitude", "vendor_min_pl"),
         Agg.avg("pickup_latitude", "vendor_avg_pl"),
         Agg.count("vendor_id", "vendor_cnt")],
        frame, tiebreak="id",
    )
    w2 = window_agg(
        w1, "passenger_count", "pickup_datetime",
        [Agg.sum("pickup_latitude", "pc_sum_pl"),
         Agg.max("pickup_latitude", "pc_max_pl"),
         Agg.min("pickup_latitude", "pc_min_pl"),
         Agg.avg("pickup_latitude", "pc_avg_pl"),
         Agg.count("vendor_id", "pc_cnt")],
        frame, tiebreak="id",
    )
    return w2
