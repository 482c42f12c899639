"""Exponentially time-decayed window aggregates (EWMA-style features).

North-rule extension: recency-weighted features are the continuous
complement to the reference's hard ROWS_RANGE windows — instead of a cliff
at the window bound, every prior event of the key contributes
``value * exp(-lambda * (ts - ts_i))`` with ``lambda = ln 2 / half_life``.
OpenMLDB ships no EWMA; the classic feature-platform formulation is the
time-decayed counter of Agarwal et al. / ad-CTR systems.

Exact definition (matches oracle_sql()['decayed_sum']'s lateral join):

  decayed_sum(j) = sum over rows i of the SAME key with ts_i <= ts_j of
                   v_i * exp(-lambda * (ts_j - ts_i))      (self included;
                   SAME-ts rows all included regardless of storage order)
  decayed_cnt(j) = same with v_i = 1 (the effective sample size)

Scale shape: one coarse hash shuffle on the key (the SAME
``_coarse_grouped`` contract as sessionize/window), then per bucket a
fully vectorized computation — NO per-row recurrence:

  sort (key, ts) -> r = lambda*(ts - key_start) -> fixed 500-wide chunks
  c = floor(r/500), u = r - 500c  (so exp(u) < e^500 never overflows and
  exp(-u) never underflows) -> within-chunk prefix A = grouped cumsum of
  v*exp(u) -> cross-chunk carry C_m = (C_{m-1} + A_end_{m-1}) *
  exp(-500*(c_m - c_{m-1})), evaluated round-vectorized over chunk
  ORDINALS (the only loop is over max-chunks-per-key ≈
  lambda*time_range/500 — e.g. 13 rounds for a year of data at a 1 h
  half-life; each round is one numpy gather over every key at once)
  -> result_j = exp(-u_j) * (A_at_tie_group_end + C_chunk(j)).

Carry factors are <= e^-500 per hop, so fully-decayed history underflows
to exactly the same 0.0 the direct formula produces.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_CHUNK = 500.0  # lambda-time chunk width; e^500 ~ 1e217 < double max


def _decayed_bucket(g: pd.DataFrame, keys: list, order_by: str,
                    value_col: str, lam: float, sum_col: str,
                    cnt_col: str) -> pd.DataFrame:
    if len(g) == 0:
        g[sum_col] = np.array([], dtype=np.float64)
        g[cnt_col] = np.array([], dtype=np.float64)
        return g.drop(columns="__sb", errors="ignore")
    g = g.sort_values(keys + [order_by], kind="stable").copy()
    arr = g[order_by].to_numpy()
    if arr.dtype.kind == "M":
        # datetime -> epoch MICROSECONDS, the library-wide convention
        # (interval_join._to_i64, stream_window): half_life for datetime
        # columns is in us like every other time stage, not pandas' ns
        ts = arr.astype("datetime64[us]").astype(np.int64) \
                .astype(np.float64)
    else:
        ts = pd.to_numeric(g[order_by]).to_numpy(np.float64)
    v = pd.to_numeric(g[value_col]).to_numpy(np.float64)
    n = len(g)
    from ..core.grouping import key_change_mask

    new_key = key_change_mask(g, keys)
    key_id = np.cumsum(new_key) - 1
    key_start_ts = ts[new_key][key_id]
    r = lam * (ts - key_start_ts)
    c = np.floor(r / _CHUNK)
    u = r - _CHUNK * c
    w = np.exp(u)
    inv = np.exp(-u)

    # within-chunk prefix sums of v*e^u and e^u, grouped by (key, chunk).
    # TRUE segmented cumsum (pandas groupby, C-level) — a global cumsum
    # rebased per chunk would catastrophically cancel: prior chunks carry
    # ~e^500-magnitude terms that wipe out a later chunk's ~e^0 increments
    new_chunk = new_key.copy()
    new_chunk[1:] |= (c[1:] != c[:-1]) | (key_id[1:] != key_id[:-1])
    chunk_id = np.cumsum(new_chunk) - 1          # global chunk enumeration
    wv, w1 = w * v, w
    grp = pd.DataFrame({"wv": wv, "w1": w1}).groupby(chunk_id)
    As = grp["wv"].cumsum().to_numpy()
    Ac = grp["w1"].cumsum().to_numpy()
    chunk_first = np.nonzero(new_chunk)[0]

    # per-chunk table in (key, ord) order == chunk_id order
    chunk_last = np.concatenate([chunk_first[1:] - 1, [n - 1]])
    A_end_s, A_end_c = As[chunk_last], Ac[chunk_last]
    ch_key = key_id[chunk_first]
    ch_c = c[chunk_first]
    first_of_key = np.empty(len(chunk_first), bool)
    first_of_key[0] = True
    first_of_key[1:] = ch_key[1:] != ch_key[:-1]
    ordn = np.arange(len(chunk_first)) - \
        np.maximum.accumulate(np.where(first_of_key,
                                       np.arange(len(chunk_first)), 0))
    C_s = np.zeros(len(chunk_first))
    C_c = np.zeros(len(chunk_first))
    max_ord = int(ordn.max()) if len(ordn) else 0
    for o in range(1, max_ord + 1):               # rounds, not rows
        m = np.nonzero(ordn == o)[0]
        f = np.exp(-_CHUNK * (ch_c[m] - ch_c[m - 1]))
        C_s[m] = (C_s[m - 1] + A_end_s[m - 1]) * f
        C_c[m] = (C_c[m - 1] + A_end_c[m - 1]) * f

    # SAME-ts rows all see the tie group's full prefix (ts_i <= ts_j)
    tie_new = np.empty(n, bool)
    tie_new[0] = True
    tie_new[1:] = (ts[1:] != ts[:-1]) | (key_id[1:] != key_id[:-1])
    tie_first = np.nonzero(tie_new)[0]
    tie_last = np.concatenate([tie_first[1:] - 1, [n - 1]])
    tie_of = np.cumsum(tie_new) - 1
    last_idx = tie_last[tie_of]

    g[sum_col] = inv * (As[last_idx] + C_s[chunk_id])
    g[cnt_col] = inv * (Ac[last_idx] + C_c[chunk_id])
    return g.drop(columns="__sb", errors="ignore")


def decayed_agg(
    ds: "ray.data.Dataset",
    partition_by,
    order_by: str,
    value_col: str,
    *,
    half_life: float,
    sum_col: str = "decayed_sum",
    cnt_col: str = "decayed_cnt",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Add exponentially time-decayed sum/count columns per partition key
    (see module docstring for the exact semantics and the chunked
    overflow-safe prefix scheme). ``half_life`` is in ``order_by`` units."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    lam = float(np.log(2.0) / half_life)

    from .session_stage import _coarse_grouped

    def fn(bucket: pd.DataFrame) -> pd.DataFrame:
        from ..core.hashing import quiet_ray_data_logs

        quiet_ray_data_logs()
        return _decayed_bucket(bucket, keys, order_by, value_col, lam,
                               sum_col, cnt_col)

    return _coarse_grouped(ds, keys, fn, num_partitions)
