"""Seeded global shuffle into token-balanced training shards.

The last step of a curation pipeline: give every document a deterministic
pseudo-random position (a multiplicative hash of its id — the "seeded
shuffle"), then cut the stream IN THAT ORDER into shards of ~``budget``
tokens each.  Every row needs its EXACT global running token count at its
shuffled position — a global prefix sum over a total order — which a
naive engine gets from a full sort + sequential scan.

Scale design (no global sort, ONE shuffle):

* the shuffle order key ``h = (id * MULT) % MOD`` is uniform on [0, MOD),
  so RANGE partitioning by ``h`` is balanced analytically — bucket
  ``h * B // MOD`` — with no quantile sampling;
* pass 1 is a shuffle-free narrow scan: per-batch ``np.bincount`` of
  weights by bucket, summed on the driver (B × 8 bytes), yielding each
  bucket's EXCLUSIVE global offset;
* pass 2 is one bucketed exchange: each bucket sorts locally by
  ``(h, id)`` (ties on h are resolved by id, so the order is total),
  cumsums locally, adds its bucket offset — the global prefix sum is
  exact, and the shard id is pure arithmetic on it.

``shard = floor((cum - w) / budget)`` — i.e. a row starts a new shard
when the budget was already full before it; a single row larger than the
budget takes (at least) a shard by itself.

Determinism contract: ids must be unique non-negative ints below
~3.4e9 (so ``id * MULT`` fits int64 — the same expression a SQL engine
evaluates); weights non-null and >= 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MULT = 2654435761      # Knuth multiplicative hash constant
MOD = 2**31


def shuffle_hash(ids: np.ndarray) -> np.ndarray:
    """The shuffle position key: SQL-expressible (id * MULT) % MOD."""
    return (ids.astype(np.int64) * MULT) % MOD


def seeded_shard_shuffle(
    ds,
    id_col: str,
    *,
    shard_budget: float,
    weight_col: str | None = None,
    hash_col: str = "h",
    cum_col: str = "cum_weight",
    shard_col: str = "shard",
    num_buckets: int | None = None,
    num_partitions: int | None = None,
    materialize_input: bool = False,
):
    """Append ``hash_col`` (the seeded shuffle position), ``cum_col`` (the
    exact inclusive running ``weight_col`` in (h, id) order) and
    ``shard_col`` (the ~``shard_budget``-sized shard index).

    ``materialize_input`` pins ``ds`` in the object store once: pass 1's
    narrow totals scan and pass 2's exchange otherwise EACH re-run the
    full upstream lineage — when this stage sits at the tail of an
    expensive curation pipeline (the usual place), that doubles its cost
    (the budget_select materialize_narrow trade)."""
    from ..core.grouping import map_groups_typed
    from ..core.hashing import default_num_buckets, quiet_ray_data_logs

    B = num_buckets or default_num_buckets()
    if materialize_input:
        ds = ds.materialize()

    # ---- pass 1: per-bucket weight totals, shuffle-free ------------------
    def bucket_totals(t):
        import pyarrow as pa

        ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        h = shuffle_hash(ids)
        b = h * B // MOD
        w = (np.asarray(t.column(weight_col).to_numpy(zero_copy_only=False),
                        dtype=np.float64)
             if weight_col else np.ones(len(ids)))
        return pa.table({"b": np.arange(B, dtype=np.int64),
                         "w": np.bincount(b, weights=w, minlength=B)})

    cols = [id_col] + ([weight_col] if weight_col else [])
    tot = (ds.select_columns(cols)
             .map_batches(bucket_totals, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas().groupby("b")["w"].sum())
    totals = np.zeros(B)
    totals[tot.index.to_numpy()] = tot.to_numpy()
    offsets = np.concatenate(([0.0], np.cumsum(totals)[:-1]))

    # ---- pass 2: one bucketed exchange, local sort + cumsum --------------
    def add_bucket(t):
        import pyarrow as pa

        quiet_ray_data_logs()
        ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        h = shuffle_hash(ids)
        return (t.replace_schema_metadata(None)
                 .append_column(hash_col, pa.array(h, type=pa.int64()))
                 .append_column("__sb", pa.array(h * B // MOD,
                                                 type=pa.int64())))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        b = int(g["__sb"].iloc[0])
        g = g.sort_values([hash_col, id_col], kind="stable") \
             .reset_index(drop=True).drop(columns="__sb")
        w = (g[weight_col].to_numpy(np.float64) if weight_col
             else np.ones(len(g)))
        cum = offsets[b] + np.cumsum(w)
        g[cum_col] = cum
        g[shard_col] = np.floor((cum - w) / float(shard_budget)) \
            .astype(np.int64)
        return g

    pre = ds.map_batches(add_bucket, batch_format="pyarrow",
                         batch_size=None)
    return map_groups_typed(pre, "__sb", per_bucket,
                            batch_format="pandas",
                            num_partitions=num_partitions)
