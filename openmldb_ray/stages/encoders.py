"""Categorical feature encoders — the feature-engineering core.

The reference's end purpose is feature engineering for ML training
(SURVEY.md §0; its `fz_*` / feature-zero function family exists to turn
raw columns into model inputs). These are the standard categorical
encoders every tabular feature platform ships, re-expressed as Ray Data
two-pass stages:

- ``target_encode``  — smoothed mean encoding (a.k.a. likelihood / mean
  encoding): ``enc(k) = (sum_y(k) + s*prior) / (cnt_y(k) + s)`` with the
  global target mean as the prior, plus the leave-one-out variant that
  excludes the row's own label (the standard anti-leakage form,
  Micci-Barreca 2001).
- ``count_encode``   — per-category row count (optionally normalized to a
  frequency in (0, 1]).
- ``one_hot``        — fixed- or scanned-vocabulary 0/1 indicator
  columns for a low-cardinality column.
- ``feature_cross``  — hashed cross of N categorical columns into
  ``num_buckets`` ids (feature hashing; Weinberger et al. 2009). Uses the
  engine-wide :func:`openmldb_ray.core.hashing.stable_hash64` so the same
  inputs bucket identically across processes and runs.

Scale shape (all encoders): ONE streaming pass over the corpus emitting
batch-local per-category partials (category, cnt, tsum) — the shuffle
carries *distinct-category* partial rows, never data rows — folded
per-bucket, then the bounded encoding table (≤ ``max_categories`` rows)
is broadcast once via ``ray.put`` and applied in a shuffle-free
vectorized ``map_batches`` pass. ``one_hot`` / ``feature_cross`` are
purely row-local after the (tiny) vocab scan. Nothing corpus-sized ever
reaches the driver; the table-size guard raises before an unbounded-
cardinality key can OOM the broadcast.

Bit-exact SQL replay: with an integer-valued target the per-category
sums are exact integers, so ``(tsum + s*prior) / (tcnt + s)`` evaluates
to the bit-identical float64 in numpy and DuckDB when both sides use the
same expression tree (the driver queries do).

Null semantics: a null category is a real group (SQL ``GROUP BY``
keeps NULLs) — internally it rides the shuffle as the engine's NUL-framed
sentinel so blocks stay typed-string; null targets contribute to ``cnt``
but not to ``tcnt`` / ``tsum`` (SQL ``AVG`` semantics).

Reference surface: `hybridse/src/udf` cate aggregates
(`*_cate`, `top_n_key_*_cate_where`) cover the aggregation half of this;
the encode-and-attach half is the offline feature-store step OpenMLDB
users run via SELECT ... LAST JOIN against a feature table.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray

from ..core.grouping import (
    NULL_KEY_SENTINEL as _NULL_KEY,
    key_strings as _key_strings,
    null_int_types_mapper,
    sentinel_keys as _sentinel_keys,
)


def category_stats(
    ds: "ray.data.Dataset",
    key_col: str,
    target_col: str | None = None,
    *,
    max_categories: int = 1_000_000,
    num_buckets: int | None = None,
    batch_size: int = 8192,
) -> pd.DataFrame:
    """One streaming pass → per-category stats table.

    Returns a DataFrame with columns ``key`` (string; null category as
    None), ``cnt`` (rows, int64) and — when ``target_col`` is given —
    ``tcnt`` (non-null targets, int64) and ``tsum`` (int64 for integer
    targets, float64 otherwise; SQL SUM ignores nulls).

    The pass emits batch-local per-category partials, folds them exactly
    in a coarse-bucket shuffle (a category lives in exactly one bucket),
    and raises if the fold exceeds ``max_categories`` — the table is
    destined for a driver-side broadcast, so unbounded cardinality must
    fail fast instead of OOMing.
    """
    from ..core.hashing import add_bucket_column, default_num_buckets

    cols = [key_col] + ([target_col] if target_col else [])
    narrow = ds.select_columns(cols)
    int_target = False
    if target_col:
        import pyarrow as pa

        from ..core.grouping import arrow_col_type

        try:
            tp = arrow_col_type(narrow.schema(), target_col)
        except TypeError:
            raise TypeError(
                f"category_stats: target {target_col!r} must be "
                f"numeric") from None
        if not (pa.types.is_integer(tp) or pa.types.is_floating(tp)
                or pa.types.is_boolean(tp)):
            raise TypeError(
                f"category_stats: target {target_col!r} must be numeric, "
                f"got {tp}")
        int_target = pa.types.is_integer(tp) or pa.types.is_boolean(tp)
    sum_dtype = np.int64 if int_target else np.float64

    def partial(t) -> pd.DataFrame:
        # convert from Arrow with nullable Int64 (house convention): a
        # null in an int64 target must not promote the block to float64,
        # where values past 2^53 silently round before the exact int fold
        df = t.to_pandas(types_mapper=null_int_types_mapper)
        key = _key_strings(df[key_col])
        if target_col:
            tc = df[target_col]
            m = tc.notna().to_numpy()
            tv = tc.fillna(0).to_numpy(sum_dtype)
            g = pd.DataFrame({
                "key": key,
                "cnt": np.ones(len(df), np.int64),
                "tcnt": m.astype(np.int64),
                "tsum": np.where(m, tv, sum_dtype(0)),
            }).groupby("key", as_index=False, sort=False).sum()
            g["tsum"] = g["tsum"].astype(sum_dtype)
        else:
            g = pd.DataFrame({
                "key": key,
                "cnt": np.ones(len(df), np.int64),
            }).groupby("key", as_index=False, sort=False).sum()
        return g

    nb = num_buckets or default_num_buckets()
    add_b = add_bucket_column(["key"], "__b", nb)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return (g.drop(columns="__b")
                 .groupby("key", as_index=False, sort=False).sum())

    stats = (narrow.map_batches(partial, batch_format="pyarrow",
                                batch_size=batch_size)
             .map_batches(add_b, batch_format="pyarrow", batch_size=None)
             .groupby("__b").map_groups(bucket_sum, batch_format="pandas")
             ).to_pandas()
    if len(stats) > max_categories:
        raise ValueError(
            f"category_stats: {key_col!r} has {len(stats)} categories "
            f"(> max_categories={max_categories}); a broadcast encoding "
            f"table this large belongs in a shuffle join — raise the cap "
            f"only if the driver can hold it")
    if len(stats) == 0:
        stats = pd.DataFrame({"key": pd.Series(dtype=object),
                              "cnt": pd.Series(dtype=np.int64)})
        if target_col:
            stats["tcnt"] = pd.Series(dtype=np.int64)
            stats["tsum"] = pd.Series(dtype=sum_dtype)
    stats = stats.sort_values("key", kind="stable").reset_index(drop=True)
    stats["key"] = stats["key"].where(stats["key"] != _NULL_KEY, None)
    return stats


class _BroadcastEncoder:
    """Actor-pool apply stage: the (category → value(s)) table is fetched
    once per actor from the object store; each batch is one vectorized
    ``Series.map`` per output column."""

    def __init__(self, ref, key_col: str, out_cols: list[str],
                 defaults: list[float]):
        maps = ray.get(ref) if not isinstance(ref, dict) else ref
        self.maps = maps  # {out_col: dict[key_str, float]}
        self.key_col, self.out_cols, self.defaults = key_col, out_cols, defaults

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        key = pd.Series(_key_strings(df[self.key_col]), index=df.index)
        for c, d in zip(self.out_cols, self.defaults):
            df[c] = key.map(self.maps[c]).astype(np.float64)
            if d is not None:
                df[c] = df[c].fillna(d)
        return df


def target_encode(
    ds: "ray.data.Dataset",
    key_col: str,
    target_col: str,
    *,
    smoothing: float = 0.0,
    prior: float | None = None,
    out_col: str | None = None,
    loo: bool = False,
    stats: pd.DataFrame | None = None,
    max_categories: int = 1_000_000,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Smoothed mean target encoding as a new float64 column.

    ``enc(k) = (tsum(k) + smoothing * prior) / (tcnt(k) + smoothing)``
    where ``prior`` defaults to the global mean of the target. Categories
    unseen in ``stats`` (only possible when a pre-fitted ``stats`` table
    is supplied — the train→apply split) and categories with
    ``tcnt + smoothing == 0`` fall back to the prior.

    ``loo=True`` adds the leave-one-out column ``{out_col}_loo``:
    rows with a non-null target get
    ``(tsum(k) - y_i + smoothing*prior) / (tcnt(k) - 1 + smoothing)``
    (prior when that denominator is 0); null-target rows get the plain
    encoding. Two streaming passes total: one stats fold, one broadcast
    apply — the corpus is never collected.
    """
    if stats is None:
        stats = category_stats(ds, key_col, target_col,
                               max_categories=max_categories,
                               batch_size=batch_size)
    out_col = out_col or f"{key_col}_te"
    tot_cnt = int(stats["tcnt"].sum())
    if prior is None:
        if tot_cnt == 0:
            raise ValueError("target_encode: no non-null targets and no "
                             "explicit prior")
        prior = float(stats["tsum"].sum()) / tot_cnt
    key = _sentinel_keys(stats["key"])
    tsum = stats["tsum"].to_numpy(np.float64)
    tcnt = stats["tcnt"].to_numpy(np.float64)
    den = tcnt + smoothing
    with np.errstate(invalid="ignore", divide="ignore"):
        enc = np.where(den > 0, (tsum + smoothing * prior) / den, prior)
    maps = {out_col: dict(zip(key, enc))}
    out_cols, defaults = [out_col], [float(prior)]
    if loo:
        # per-row adjustment needs tsum/tcnt, not the folded encoding
        maps["__tsum"] = dict(zip(key, tsum))
        maps["__tcnt"] = dict(zip(key, tcnt))

    if not loo:
        ref = ray.put(maps)
        return ds.map_batches(
            _BroadcastEncoder, batch_format="pandas", batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs=dict(ref=ref, key_col=key_col,
                                       out_cols=out_cols, defaults=defaults))

    loo_col = f"{out_col}_loo"
    s, p = float(smoothing), float(prior)

    class _LooEncoder(_BroadcastEncoder):
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            key = pd.Series(_key_strings(df[self.key_col]), index=df.index)
            enc_v = key.map(self.maps[out_col]).fillna(p).to_numpy(np.float64)
            df[out_col] = enc_v
            y = pd.to_numeric(df[target_col], errors="coerce")
            m = y.notna().to_numpy()
            ts = key.map(self.maps["__tsum"]).to_numpy(np.float64)
            tc = key.map(self.maps["__tcnt"]).to_numpy(np.float64)
            den = tc - 1.0 + s
            with np.errstate(invalid="ignore", divide="ignore"):
                lv = np.where(den > 0,
                              (ts - y.fillna(0).to_numpy(np.float64) + s * p)
                              / den, p)
            df[loo_col] = np.where(m, lv, enc_v)
            return df

    ref = ray.put(maps)
    return ds.map_batches(
        _LooEncoder, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(ref=ref, key_col=key_col,
                                   out_cols=out_cols, defaults=defaults))


def count_encode(
    ds: "ray.data.Dataset",
    key_col: str,
    *,
    normalize: bool = False,
    out_col: str | None = None,
    stats: pd.DataFrame | None = None,
    max_categories: int = 1_000_000,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Per-category row count (``normalize=True`` → count / total rows)
    as a new float64 column; unseen categories (pre-fitted ``stats``
    only) encode to 0."""
    if stats is None:
        stats = category_stats(ds, key_col, max_categories=max_categories,
                               batch_size=batch_size)
    out_col = out_col or f"{key_col}_count"
    key = _sentinel_keys(stats["key"])
    cnt = stats["cnt"].to_numpy(np.float64)
    if normalize:
        total = float(stats["cnt"].sum())
        if total > 0:
            cnt = cnt / total
    ref = ray.put({out_col: dict(zip(key, cnt))})
    return ds.map_batches(
        _BroadcastEncoder, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(ref=ref, key_col=key_col,
                                   out_cols=[out_col], defaults=[0.0]))


def woe_table(
    stats: pd.DataFrame,
    *,
    smoothing: float = 0.5,
) -> pd.DataFrame:
    """Weight-of-Evidence table from a :func:`category_stats` fold over a
    BINARY integer target (tsum = positives per category).

    ``woe(k) = ln( ((pos_k + s) / (pos_tot + s*K)) /
                   ((neg_k + s) / (neg_tot + s*K)) )`` — the additive
    smoothing keeps zero-count cells finite; ``iv`` is the per-category
    information-value contribution
    ``((pos_k+s)/(pos_tot+s*K) − (neg_k+s)/(neg_tot+s*K)) * woe(k)``
    (sum it for the feature's IV). The count ratios are exact-integer
    divisions shared with a SQL replay; ``ln`` last bits differ between
    libms — compare WoE at the engine-wide round-6 band.

    Returns ``(key, cnt, pos, neg, woe, iv)`` sorted by key.
    """
    if "tsum" not in stats.columns:
        raise ValueError("woe_table: stats must come from "
                         "category_stats(..., target_col=...)")
    if not pd.api.types.is_integer_dtype(stats["tsum"]):
        raise ValueError("woe_table: target must be an integer 0/1 column")
    pos = stats["tsum"].astype(object)
    if ((stats["tsum"] < 0) | (stats["tsum"] > stats["tcnt"])).any():
        raise ValueError("woe_table: target must be binary 0/1 "
                         "(per-category positive count out of range)")
    neg = (stats["tcnt"] - stats["tsum"]).astype(object)
    kk = len(stats)
    pos_tot = int(pos.sum()) if kk else 0
    neg_tot = int(neg.sum()) if kk else 0
    s = float(smoothing)
    if kk == 0 or (pos_tot + s * kk) <= 0 or (neg_tot + s * kk) <= 0:
        return pd.DataFrame({"key": stats.get("key", pd.Series(dtype=object)),
                             "cnt": pd.Series(dtype=np.int64),
                             "pos": pd.Series(dtype=np.int64),
                             "neg": pd.Series(dtype=np.int64),
                             "woe": pd.Series(dtype=np.float64),
                             "iv": pd.Series(dtype=np.float64)})
    p = (pos.to_numpy(np.float64) + s) / (pos_tot + s * kk)
    q = (neg.to_numpy(np.float64) + s) / (neg_tot + s * kk)
    woe = np.log(p / q)
    return pd.DataFrame({"key": stats["key"],
                         "cnt": stats["cnt"].astype(np.int64),
                         "pos": pos.astype(np.int64),
                         "neg": neg.astype(np.int64),
                         "woe": woe, "iv": (p - q) * woe})


def woe_encode(
    ds: "ray.data.Dataset",
    key_col: str,
    target_col: str,
    *,
    smoothing: float = 0.5,
    out_col: str | None = None,
    stats: pd.DataFrame | None = None,
    max_categories: int = 1_000_000,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Weight-of-Evidence encoding of a categorical column against a
    binary 0/1 target (the credit-scoring / risk-feature standard).
    One stats fold + one broadcast apply — same two-pass scale shape as
    :func:`target_encode`. Unseen categories (pre-fitted ``stats`` only)
    encode to 0.0 (no evidence)."""
    if stats is None:
        stats = category_stats(ds, key_col, target_col,
                               max_categories=max_categories,
                               batch_size=batch_size)
    out_col = out_col or f"{key_col}_woe"
    wt = woe_table(stats, smoothing=smoothing)
    key = _sentinel_keys(wt["key"])
    ref = ray.put({out_col: dict(zip(key, wt["woe"].to_numpy(np.float64)))})
    return ds.map_batches(
        _BroadcastEncoder, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(ref=ref, key_col=key_col,
                                   out_cols=[out_col], defaults=[0.0]))


def _sanitize(v: str) -> str:
    return re.sub(r"[^0-9A-Za-z]+", "_", v).strip("_") or "x"


def scan_vocab(ds: "ray.data.Dataset", col: str, *,
               max_categories: int = 10_000) -> list[str]:
    """Distinct non-null values of a column (canonical string form,
    see core.grouping.key_strings), sorted. One streaming pass of
    batch-local uniques — each block ships at most ``max_categories``
    distinct values to the driver or raises (wrapped by Ray, but the
    driver never materializes an unbounded vocab); the driver fold
    re-checks the global cap."""
    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        # nulls are excluded by MASK, never by comparing against the NUL
        # sentinel: numpy's object-array != str-scalar comparison converts
        # the scalar through U-dtype, truncating the trailing NUL, so the
        # sentinel never compares equal and would leak into the vocab
        na = df[col].isna().to_numpy()
        ks = _key_strings(df[col])
        u = np.unique(ks[~na])
        if len(u) > max_categories:
            raise ValueError(
                f"one_hot: {col!r} exceeds max_categories="
                f"{max_categories} within one block")
        return pd.DataFrame({"v": u})

    parts = (ds.select_columns([col])
             .map_batches(uniq, batch_format="pandas", batch_size=None)
             .to_pandas())
    vocab = sorted(parts["v"].unique().tolist())
    if len(vocab) > max_categories:
        raise ValueError(f"one_hot: {col!r} has {len(vocab)} categories "
                         f"(> max_categories={max_categories})")
    return vocab


def one_hot(
    ds: "ray.data.Dataset",
    col: str,
    *,
    vocab: list[str] | None = None,
    max_categories: int = 10_000,
    prefix: str | None = None,
    batch_size: int | None = 8192,
) -> "ray.data.Dataset":
    """0/1 int64 indicator column per vocabulary value
    (``{prefix}_{sanitized_value}``). ``vocab=None`` scans the distinct
    values first (tiny pass); a supplied vocab makes the op fully
    row-local (one streaming pass, no scan — the train→apply split).
    Null / out-of-vocab rows are all-zeros. Column-name collisions after
    sanitization raise (two categories must not share an output column).
    """
    if vocab is None:
        vocab = scan_vocab(ds, col, max_categories=max_categories)
    vocab = [str(v) for v in vocab]
    if len(set(vocab)) != len(vocab):
        raise ValueError("one_hot: vocab contains duplicate values")
    prefix = prefix or col
    names = [f"{prefix}_{_sanitize(v)}" for v in vocab]
    if len(set(names)) != len(names):
        dup = [n for n in names if names.count(n) > 1][0]
        raise ValueError(f"one_hot: sanitized column collision on {dup!r}")
    varr = np.array(vocab, dtype=object)
    # searchsorted needs SORTED input; a user-supplied vocab arrives in
    # caller order (which also fixes the output column order) — search a
    # sorted view and map hits back through the argsort permutation
    order = np.argsort(varr)
    vsorted = varr[order]

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        sv = _key_strings(df[col])
        pos = np.clip(np.searchsorted(vsorted, sv), 0, len(varr) - 1)
        hit = vsorted[pos] == sv
        onehot = np.zeros((len(df), len(varr)), np.int64)
        rows = np.flatnonzero(hit)
        onehot[rows, order[pos[rows]]] = 1
        block = pd.DataFrame(onehot, columns=names, index=df.index)
        return pd.concat([df, block], axis=1)

    return ds.map_batches(apply, batch_format="pandas",
                          batch_size=batch_size)


def feature_cross(
    ds: "ray.data.Dataset",
    cols: list[str],
    *,
    num_buckets: int,
    out_col: str | None = None,
    batch_size: int | None = 8192,
) -> "ray.data.Dataset":
    """Hashed cross of N categorical columns → int64 bucket id in
    ``[0, num_buckets)`` (feature hashing). Purely row-local (zero
    shuffle, zero state): the engine-wide :func:`stable_hash64` over each
    column, splitmix-combined — the exact combiner the shuffle bucket ids
    use (core/hashing.bucket_ids), so the cross is deterministic across
    processes and runs. Null components hash as a fixed null value (two
    rows null in the same component cross identically)."""
    from ..core.hashing import bucket_ids

    if num_buckets <= 0:
        raise ValueError("feature_cross: num_buckets must be positive")
    out_col = out_col or ("cross_" + "_".join(cols))

    def apply(t):
        import pyarrow as pa

        ids = bucket_ids(t, cols, num_buckets)
        return t.append_column(out_col, pa.array(ids, pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow",
                          batch_size=batch_size)
