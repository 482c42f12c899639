"""Numeric feature scaling & discretization — feature-eng core.

The transforms every tabular feature pipeline applies after the raw
aggregates (reference analog: the scalar expression layer users compose
in SELECTs; here they are first-class two-pass stages so the statistics
come from the data instead of hand-written constants):

- ``standard_scale`` — z-score ``(x - mean) / std_pop``, global or
  per-key.
- ``minmax_scale``   — ``(x - min) / (max - min)`` into [0, 1], global
  or per-key (constant groups → null, SQL ``NULLIF`` semantics).
- ``bucketize``      — clamped fixed-edge binning (same semantics as
  stages/drift.py: bin i covers ``[edges[i], edges[i+1])``, out-of-range
  clamps into the end bins, null stays null). Pair with
  stages/quantile.exact_quantiles to derive edges for equal-frequency
  (quantile) binning.

Scale shape: ONE streaming stats pass emitting per-block (or per-key
per-block) partials — (cnt, sum, sumsq, min, max) — folded exactly
(per-key partials ride a coarse-bucket shuffle of distinct-key rows,
global partials fold on the driver as #blocks tiny rows), then a
shuffle-free broadcast apply pass. ``bucketize`` is purely row-local.

Bit-exact SQL replay: for integer columns the folded sum / sumsq are
exact int64, and both engines evaluate the IDENTICAL float64 expression
tree — mean ``= CAST(sum AS DOUBLE)/cnt``, variance
``= (CAST(sumsq AS DOUBLE) - CAST(sum AS DOUBLE)*CAST(sum AS DOUBLE)/cnt)/cnt``
— so the z-scores hash-match DuckDB bit for bit. Float columns make the
sum order-dependent; ``minmax_scale`` (no sums) stays bit-exact for any
numeric dtype. Integer sums assume no int64 overflow (SQL BIGINT's own
contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..core.grouping import (
    NULL_KEY_SENTINEL as _NULL_KEY,
    key_strings as _key_strings,
    null_int_types_mapper,
    sentinel_keys as _sentinel_keys,
)

_I64_LIM = 2 ** 63


def _pysum(s: pd.Series) -> int:
    """Exact fold of integer partials: Python-int arithmetic (no int64
    wraparound, unlike numpy) — partial tables are tiny, so the object
    path costs nothing measurable."""
    return int(s.astype(object).sum()) if len(s) else 0


def _check_i64(col: pd.Series, what: str) -> pd.Series:
    if len(col) and col.abs().ge(_I64_LIM).any():
        raise ValueError(
            f"numeric_stats: exact integer {what} exceeds int64 — the "
            f"column's magnitude is too large for exact integer "
            f"statistics; cast it to float64 for approximate scaling")
    return col.astype(np.int64)


def numeric_stats(
    ds: "ray.data.Dataset",
    col: str,
    *,
    by: str | None = None,
    max_keys: int = 1_000_000,
    num_buckets: int | None = None,
    batch_size: int = 8192,
) -> pd.DataFrame:
    """One streaming pass → (per-key) ``cnt / vsum / vsumsq / vmin /
    vmax`` over the non-null values of ``col``.

    Returns one row per key (column ``key``; null key as None — SQL
    GROUP BY keeps nulls) or a single global row when ``by`` is None.
    Integer/boolean inputs fold sums in exact int64; floats in float64.
    """
    import pyarrow as pa

    from ..core.grouping import arrow_col_type

    cols = [col] + ([by] if by else [])
    narrow = ds.select_columns(cols)
    try:
        tp = arrow_col_type(narrow.schema(), col)
    except TypeError:
        raise TypeError(
            f"numeric_stats: {col!r} must be numeric") from None
    if not (pa.types.is_integer(tp) or pa.types.is_floating(tp)
            or pa.types.is_boolean(tp)):
        raise TypeError(f"numeric_stats: {col!r} must be numeric, got {tp}")
    int_in = pa.types.is_integer(tp) or pa.types.is_boolean(tp)
    sum_dtype = np.int64 if int_in else np.float64

    def partial(t) -> pd.DataFrame:
        # Arrow → pandas with nullable Int64 (house convention): a null
        # must not promote an int64 block to float64, where values past
        # 2^53 would silently round before the exact fold below
        df = t.to_pandas(types_mapper=null_int_types_mapper)
        v = df[col]
        m = v.notna().to_numpy()
        vv = v.fillna(0).to_numpy(sum_dtype)
        vals = np.where(m, vv, sum_dtype(0))
        if int_in:
            # exact integer sums with a LOUD overflow path (SQL BIGINT
            # errors on overflow; numpy int64 silently wraps): the fast
            # vectorized path runs whenever block-total bounds prove no
            # wrap is possible, else squares/sums fold in Python ints
            mx = int(np.abs(vals).max()) if len(vals) else 0
            if mx == 0 or (mx * mx * len(vals) < 2 ** 62
                           and mx * len(vals) < 2 ** 62):
                sq = vals * vals
                obj = False
            else:
                vo = vals.astype(object)
                sq = vo * vo
                vals = vo
                obj = True
        else:
            sq = vals * vals
            obj = False
        base = pd.DataFrame({
            "key": _key_strings(df[by]) if by
            else np.full(len(df), "", object),
            "cnt": m.astype(np.int64),
            "vsum": vals,
            "vsumsq": sq,
            # min/max as float64 with null→±inf so the fold is a plain agg
            "vmin": np.where(m, vv.astype(np.float64), np.inf),
            "vmax": np.where(m, vv.astype(np.float64), -np.inf),
        })
        if int_in and obj:
            g = base.groupby("key", as_index=False, sort=False).agg(
                cnt=("cnt", "sum"), vsum=("vsum", _pysum),
                vsumsq=("vsumsq", _pysum), vmin=("vmin", "min"),
                vmax=("vmax", "max"))
            g["vsum"] = _check_i64(g["vsum"], "sum")
            g["vsumsq"] = _check_i64(g["vsumsq"], "sum of squares")
        else:
            g = base.groupby("key", as_index=False, sort=False).agg(
                cnt=("cnt", "sum"), vsum=("vsum", "sum"),
                vsumsq=("vsumsq", "sum"), vmin=("vmin", "min"),
                vmax=("vmax", "max"))
            g["vsum"] = g["vsum"].astype(sum_dtype)
            g["vsumsq"] = g["vsumsq"].astype(sum_dtype)
        return g

    partials = narrow.map_batches(partial, batch_format="pyarrow",
                                  batch_size=batch_size)
    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # int path folds partials as Python ints (#blocks-bounded tiny
        # tables) so cross-block sums also can't silently wrap int64
        if int_in:
            r = g.groupby("key", as_index=False, sort=False).agg(
                cnt=("cnt", "sum"), vsum=("vsum", _pysum),
                vsumsq=("vsumsq", _pysum), vmin=("vmin", "min"),
                vmax=("vmax", "max"))
            r["vsum"] = _check_i64(r["vsum"], "sum")
            r["vsumsq"] = _check_i64(r["vsumsq"], "sum of squares")
            return r
        r = g.groupby("key", as_index=False, sort=False).agg(
            cnt=("cnt", "sum"), vsum=("vsum", "sum"),
            vsumsq=("vsumsq", "sum"), vmin=("vmin", "min"),
            vmax=("vmax", "max"))
        r["vsum"] = r["vsum"].astype(sum_dtype)
        r["vsumsq"] = r["vsumsq"].astype(sum_dtype)
        return r

    if by is None:
        folded = partials.to_pandas()  # ≤ one row per block
        folded["key"] = ""
    else:
        from ..core.hashing import add_bucket_column, default_num_buckets

        nb = num_buckets or default_num_buckets()
        add_b = add_bucket_column(["key"], "__b", nb)

        folded = (partials.map_batches(add_b, batch_format="pyarrow",
                                       batch_size=None)
                  .groupby("__b")
                  .map_groups(lambda g: fold(g.drop(columns="__b")),
                              batch_format="pandas")
                  ).to_pandas()
        if len(folded) > max_keys:
            raise ValueError(
                f"numeric_stats: {by!r} has {len(folded)} keys "
                f"(> max_keys={max_keys}); the stats table is broadcast — "
                f"unbounded key cardinality needs a shuffle join instead")
    if len(folded) == 0:
        return pd.DataFrame({"key": pd.Series(dtype=object),
                             "cnt": pd.Series(dtype=np.int64),
                             "vsum": pd.Series(dtype=sum_dtype),
                             "vsumsq": pd.Series(dtype=sum_dtype),
                             "vmin": pd.Series(dtype=np.float64),
                             "vmax": pd.Series(dtype=np.float64)})
    out = (fold(folded)
           .sort_values("key", kind="stable").reset_index(drop=True))
    out.loc[out["cnt"] == 0, ["vmin", "vmax"]] = np.nan
    out["key"] = out["key"].where(out["key"] != _NULL_KEY, None)
    if by is None:
        out = out.drop(columns="key")
    return out


class _ScaleApply:
    """Broadcast apply: per-key (sub, den) pairs fetched once per actor;
    each batch is two vectorized maps + one arithmetic expression.
    ``z = (x - sub) / den``; den null/0 → null output."""

    def __init__(self, ref, col, by, out_col):
        self.sub, self.den = ray.get(ref)
        self.col, self.by, self.out_col = col, by, out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # na_value unconditionally: nullable Float64 with an NA raises on
        # a plain to_numpy(float64); plain dtypes ignore the kwarg
        x = df[self.col].to_numpy(np.float64, na_value=np.nan)
        if self.by is None:
            sub = self.sub.get("", np.nan)
            den = self.den.get("", np.nan)
            subv = np.full(len(df), sub)
            denv = np.full(len(df), den)
        else:
            key = pd.Series(_key_strings(df[self.by]), index=df.index)
            subv = key.map(self.sub).to_numpy(np.float64)
            denv = key.map(self.den).to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (x - subv) / denv
        z[~np.isfinite(denv) | (denv == 0)] = np.nan
        df[self.out_col] = z
        return df


def _apply_scale(ds, col, by, out_col, sub_map, den_map, *,
                 concurrency, batch_size):
    ref = ray.put((sub_map, den_map))
    return ds.map_batches(
        _ScaleApply, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(ref=ref, col=col, by=by, out_col=out_col))


def _stats_keyed(stats: pd.DataFrame, by):
    if by is None:
        return [""], stats
    return list(_sentinel_keys(stats["key"])), stats


def standard_scale(
    ds: "ray.data.Dataset",
    col: str,
    *,
    by: str | None = None,
    out_col: str | None = None,
    stats: pd.DataFrame | None = None,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Population z-score column ``(x - mean) / sqrt(var_pop)``; ``by``
    scopes the statistics per key. Zero-variance (or empty) groups give
    null. Two streaming passes; the stats table is broadcast once."""
    if stats is None:
        stats = numeric_stats(ds, col, by=by, batch_size=batch_size)
    out_col = out_col or f"{col}_z"
    keys, st = _stats_keyed(stats, by)
    cnt = st["cnt"].to_numpy(np.float64)
    vsum = st["vsum"].to_numpy(np.float64)
    vsumsq = st["vsumsq"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = vsum / cnt
        var = (vsumsq - vsum * vsum / cnt) / cnt
        std = np.sqrt(var)
    return _apply_scale(ds, col, by, out_col,
                        dict(zip(keys, mean)), dict(zip(keys, std)),
                        concurrency=concurrency, batch_size=batch_size)


def minmax_scale(
    ds: "ray.data.Dataset",
    col: str,
    *,
    by: str | None = None,
    out_col: str | None = None,
    stats: pd.DataFrame | None = None,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Min-max column ``(x - min) / (max - min)`` into [0, 1]; constant
    or empty groups give null (``NULLIF(max - min, 0)`` semantics).
    Bit-exact vs SQL for ANY numeric dtype — no sums involved."""
    if stats is None:
        stats = numeric_stats(ds, col, by=by, batch_size=batch_size)
    out_col = out_col or f"{col}_mm"
    keys, st = _stats_keyed(stats, by)
    vmin = st["vmin"].to_numpy(np.float64)
    vmax = st["vmax"].to_numpy(np.float64)
    return _apply_scale(ds, col, by, out_col,
                        dict(zip(keys, vmin)),
                        dict(zip(keys, vmax - vmin)),
                        concurrency=concurrency, batch_size=batch_size)


def robust_scale(
    ds: "ray.data.Dataset",
    col: str,
    *,
    by: str | None = None,
    out_col: str | None = None,
    q_low: float = 0.25,
    q_high: float = 0.75,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Outlier-robust scaling ``(x - median) / (Q_high - Q_low)`` —
    sklearn RobustScaler semantics with exact ``quantile_disc`` statistics
    (stages/quantile: sort-free histogram refinement, O(log) streaming
    scans). The quantiles are ACTUAL data values and the apply expression
    is shared with SQL, so the output is bit-identical to a
    ``(x - median) / NULLIF(q3 - q1, 0)`` DuckDB replay for any numeric
    dtype — no sums involved. Zero-IQR (constant) or empty groups give
    null; ``by`` scopes the statistics per key (small-cardinality keys,
    the exact_quantiles_by_key contract)."""
    from .quantile import exact_quantiles, exact_quantiles_by_key

    out_col = out_col or f"{col}_rs"
    qs = [q_low, 0.5, q_high]
    if by is None:
        qt = exact_quantiles(ds, col, qs, interpolation="disc")
        med = float(qt["value"].iloc[1])
        iqr = float(qt["value"].iloc[2]) - float(qt["value"].iloc[0])
        sub_map = {"": med}
        den_map = {"": (np.nan if iqr == 0 else iqr)}
    else:
        qt = exact_quantiles_by_key(ds, col, qs, by, interpolation="disc")
        sub_map, den_map = {}, {}
        for key, g in qt.groupby(by, dropna=False, sort=False):
            ks = _key_strings(pd.Series([key]))[0]
            v = g.set_index("q")["value"]
            med = float(v.loc[0.5])
            iqr = float(v.loc[q_high]) - float(v.loc[q_low])
            sub_map[ks] = med
            den_map[ks] = np.nan if iqr == 0 else iqr
    return _apply_scale(ds, col, by, out_col, sub_map, den_map,
                        concurrency=concurrency, batch_size=batch_size)


class _ImputeApply:
    """Broadcast apply: null → (per-key) fill value, float64 output."""

    def __init__(self, ref, col, by, out_col):
        import ray

        self.fill = ray.get(ref) if not isinstance(ref, dict) else ref
        self.col, self.by, self.out_col = col, by, out_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        x = df[self.col].to_numpy(np.float64, na_value=np.nan)
        if self.by is None:
            fv = np.full(len(df), self.fill.get("", np.nan))
        else:
            key = pd.Series(_key_strings(df[self.by]), index=df.index)
            fv = key.map(self.fill).to_numpy(np.float64)
        df[self.out_col] = np.where(np.isnan(x), fv, x)
        return df


def impute(
    ds: "ray.data.Dataset",
    col: str,
    *,
    strategy: str = "mean",
    fill_value: float | None = None,
    by: str | None = None,
    out_col: str | None = None,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> "ray.data.Dataset":
    """Missing-value imputation as a new float64 column: null →
    ``mean`` / ``median`` / ``constant`` of the column, globally or per
    ``by`` key. ``mean`` derives from the exact integer/float moment fold
    (stages/scale.numeric_stats; integer means are bit-identical to SQL
    ``CAST(sum AS DOUBLE)/cnt``); ``median`` is exact ``quantile_disc``
    (an actual data value). Groups with no observed values (or keys
    unseen at fit time) leave nulls in place. Two streaming passes; the
    fill table broadcasts once."""
    import ray

    from .quantile import exact_quantiles, exact_quantiles_by_key

    out_col = out_col or f"{col}_filled"
    if strategy == "constant":
        if fill_value is None:
            raise ValueError("impute: strategy='constant' needs fill_value")
        if by is not None:
            raise ValueError("impute: strategy='constant' is global — "
                             "drop by=")
        fill = {"": float(fill_value)}
    elif strategy == "mean":
        st = numeric_stats(ds, col, by=by, batch_size=batch_size)
        if by is None:
            cnt = int(st["cnt"].iloc[0]) if len(st) else 0
            fill = {"": (float(st["vsum"].iloc[0]) / cnt if cnt else np.nan)}
        else:
            keys = _sentinel_keys(st["key"])
            cnt = st["cnt"].to_numpy(np.float64)
            vsum = st["vsum"].to_numpy(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = np.where(cnt > 0, vsum / cnt, np.nan)
            fill = dict(zip(keys, mean))
    elif strategy == "median":
        if by is None:
            qt = exact_quantiles(ds, col, [0.5], interpolation="disc")
            fill = {"": float(qt["value"].iloc[0])}
        else:
            qt = exact_quantiles_by_key(ds, col, [0.5], by,
                                        interpolation="disc")
            fill = {}
            for key, g in qt.groupby(by, dropna=False, sort=False):
                ks = _key_strings(pd.Series([key]))[0]
                fill[ks] = float(g["value"].iloc[0])
    else:
        raise ValueError(f"impute: unknown strategy {strategy!r}")

    ref = ray.put(fill)
    return ds.map_batches(
        _ImputeApply, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(ref=ref, col=col, by=by, out_col=out_col))


def quantile_bin(
    ds: "ray.data.Dataset",
    col: str,
    nbins: int,
    *,
    out_col: str | None = None,
    batch_size: int | None = 8192,
) -> "ray.data.Dataset":
    """Equal-frequency (quantile) binning — pandas ``qcut`` shape: edges
    are the exact ``quantile_disc`` values at ``i/nbins`` for
    ``i = 0..nbins`` (actual data values from the sort-free refinement),
    de-duplicated when heavy ties collapse adjacent quantiles, then one
    row-local clamped :func:`bucketize` pass. Deterministic and
    SQL-replayable: the oracle recomputes the same edge list and the same
    clamped ``searchsorted`` bin. Null stays null; with fewer than two
    distinct edges every non-null row bins to 0."""
    if nbins < 1:
        raise ValueError("quantile_bin: nbins must be >= 1")
    from .quantile import exact_quantiles

    out_col = out_col or f"{col}_qbin"
    qs = [i / nbins for i in range(nbins + 1)]
    qt = exact_quantiles(ds, col, qs, interpolation="disc")
    edges = np.unique(qt["value"].to_numpy(np.float64))
    edges = edges[np.isfinite(edges)]
    if len(edges) < 2:
        # constant (or empty) column: single bin 0 for non-null rows
        def const_bin(df: pd.DataFrame) -> pd.DataFrame:
            m = df[col].notna().to_numpy()
            df[out_col] = pd.array(np.zeros(len(df), np.int64),
                                   dtype=pd.Int64Dtype())
            if not m.all():
                df.loc[~m, out_col] = pd.NA
            return df

        return ds.map_batches(const_bin, batch_format="pandas",
                              batch_size=batch_size)
    return bucketize(ds, col, edges, out_col=out_col, batch_size=batch_size)


def bucketize(
    ds: "ray.data.Dataset",
    col: str,
    edges,
    *,
    out_col: str | None = None,
    batch_size: int | None = 8192,
) -> "ray.data.Dataset":
    """Fixed-edge binning: bin i covers ``[edges[i], edges[i+1])``;
    out-of-range values clamp into the end bins; null stays null
    (nullable Int64 output). Purely row-local — zero shuffle, zero
    state. Derive ``edges`` from stages/quantile.exact_quantiles for
    equal-frequency bins."""
    edges = np.asarray(edges, np.float64)
    # NOT (diff <= 0).any(): NaN edges make every comparison False and
    # would pass, then searchsorted on an unsorted-by-definition array
    # bins silently wrong — require strictly ascending, finite
    if len(edges) < 2 or not np.all(np.isfinite(edges)) \
            or not np.all(np.diff(edges) > 0):
        raise ValueError("bucketize: edges must be finite, strictly "
                         "ascending, >= 2 entries")
    nbins = len(edges) - 1
    out_col = out_col or f"{col}_bin"

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col]
        m = v.notna().to_numpy()
        x = v.fillna(0).to_numpy(np.float64)
        idx = np.clip(np.searchsorted(edges, x, side="right") - 1,
                      0, nbins - 1)
        df[out_col] = pd.array(np.where(m, idx, 0), dtype=pd.Int64Dtype())
        if not m.all():
            df.loc[~m, out_col] = pd.NA
        return df

    return ds.map_batches(apply, batch_format="pandas",
                          batch_size=batch_size)
