"""Feature selection / feature–target association statistics.

The screening statistics every tabular feature platform runs before (or
while) materializing wide feature sets — which raw columns are worth the
window-aggregate spend, which categorical keys actually carry signal:

- ``corr_matrix``       — pairwise Pearson correlation over N numeric
  columns in ONE streaming moment pass (complete-case rows).
- ``anova_f``           — one-way ANOVA F statistic of a numeric column
  against a categorical group (sklearn ``f_classif`` shape), from the
  same per-key (cnt, sum, sumsq) partials ``stages/scale.numeric_stats``
  already folds.
- ``categorical_assoc`` — contingency-table association of two
  categorical columns: chi-squared, Cramér's V and mutual information
  (nats), from one distinct-cell counting pass.

Scale shape: every statistic here folds to driver-sized state. The
moment pass emits ONE partial row per block (corr_matrix) or per-key /
per-cell partial rows bounded by ``max_keys`` / ``max_cells`` that ride
a coarse-bucket shuffle of *distinct-key* rows — never data rows. The
corpus itself streams through exactly one ``map_batches`` pass per
statistic and is never collected.

Bit-exact SQL replay (corr_matrix over integer columns): block partials
fold as Python ints (no int64 wraparound, matching SQL HUGEINT sums), so
``n*Sxy - Sx*Sy`` is an exact integer on both engines; both then convert
once to float64 (IEEE round-to-nearest, identical) and evaluate the same
``num / (sqrt(den_i) * sqrt(den_j))`` tree — bit-identical to DuckDB.
F / chi² / MI sum float terms across groups/cells, whose ORDER a SQL
engine does not pin — driver queries compare those at the engine-wide
round-6 band (see ``__ray_entry__._round_cols``), the drift_psi
precedent.

Reference surface: the reference ships the aggregation machinery
(`hybridse/src/udf` sum/avg/count families) users compose into ad-hoc
screens; these stages are the distributed, single-pass versions of those
screens.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..core.grouping import (
    key_strings as _key_strings,
    null_int_types_mapper,
)

_I64_LIM = 2 ** 63


def _numeric_types(ds, cols):
    """Validate columns are numeric; return per-column is-integer flags."""
    import pyarrow as pa

    from ..core.grouping import arrow_col_type

    sch = ds.schema()
    flags = []
    for c in cols:
        try:
            tp = arrow_col_type(sch, c)
        except TypeError:
            raise TypeError(
                f"featsel: column {c!r} must be numeric") from None
        if not (pa.types.is_integer(tp) or pa.types.is_floating(tp)
                or pa.types.is_boolean(tp)):
            raise TypeError(f"featsel: column {c!r} must be numeric, got {tp}")
        flags.append(pa.types.is_integer(tp) or pa.types.is_boolean(tp))
    return flags


def corr_matrix(
    ds: "ray.data.Dataset",
    cols: list[str],
    *,
    batch_size: int = 8192,
) -> pd.DataFrame:
    """Pairwise Pearson correlation over ``cols`` in ONE streaming pass.

    Complete-case semantics: a row with a null in ANY of ``cols`` is
    excluded from every pair (so all pairs share one ``n`` — the shape a
    downstream whitening/selection step needs; SQL replay is a single
    ``WHERE ... IS NOT NULL`` conjunction).

    Each block emits ONE partial row — ``n``, per-column sums and the
    upper-triangle product sums — folded on the driver (#blocks tiny
    rows). All-integer inputs fold exactly in Python ints (loud, not
    wrapping) and reproduce DuckDB bit-for-bit; float inputs are standard
    float64 moment sums (document the round-6 compare). Returns the
    long-form table ``(col_a, col_b, corr)`` for a < b (input order);
    zero-variance columns yield null.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError("corr_matrix: duplicate columns")
    int_flags = _numeric_types(ds, cols)
    all_int = all(int_flags)
    k = len(cols)
    pairs = [(i, j) for i in range(k) for j in range(i, k)]

    def partial(t) -> pd.DataFrame:
        df = t.to_pandas(types_mapper=null_int_types_mapper)
        mask = np.ones(len(df), bool)
        for c in cols:
            mask &= df[c].notna().to_numpy()
        out = {"n": np.int64(int(mask.sum()))}
        if all_int:
            # exact integer moments with a LOUD overflow path: vectorize
            # in int64 when block-total bounds prove no wrap, else fold
            # the block's sums in Python ints (object path)
            xs = [df[c].fillna(0).to_numpy(np.int64)[mask] for c in cols]
            mx = max((int(np.abs(x).max()) if len(x) else 0) for x in xs) \
                if xs else 0
            nrow = int(mask.sum())
            if mx == 0 or (mx * mx * max(nrow, 1) < 2 ** 62):
                for i, c in enumerate(cols):
                    out[f"s{i}"] = np.int64(xs[i].sum())
                for i, j in pairs:
                    out[f"p{i}_{j}"] = np.int64((xs[i] * xs[j]).sum())
            else:
                xo = [x.astype(object) for x in xs]
                for i, c in enumerate(cols):
                    v = int(xo[i].sum()) if nrow else 0
                    if abs(v) >= _I64_LIM:
                        raise ValueError(
                            "corr_matrix: exact integer sum exceeds int64; "
                            "cast the column to float64 for approximate "
                            "correlation")
                    out[f"s{i}"] = np.int64(v)
                for i, j in pairs:
                    v = int((xo[i] * xo[j]).sum()) if nrow else 0
                    if abs(v) >= _I64_LIM:
                        raise ValueError(
                            "corr_matrix: exact integer product sum exceeds "
                            "int64; cast to float64 for approximate "
                            "correlation")
                    out[f"p{i}_{j}"] = np.int64(v)
        else:
            xs = [df[c].astype("float64").to_numpy(np.float64,
                                                   na_value=np.nan)[mask]
                  for c in cols]
            for i, c in enumerate(cols):
                out[f"s{i}"] = np.float64(xs[i].sum())
            for i, j in pairs:
                out[f"p{i}_{j}"] = np.float64((xs[i] * xs[j]).sum())
        return pd.DataFrame({c: [v] for c, v in out.items()})

    parts = (ds.select_columns(cols)
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=batch_size)
             .to_pandas())
    if all_int:
        # Python-int fold: exact like SQL's HUGEINT accumulation
        n = int(parts["n"].astype(object).sum()) if len(parts) else 0
        s = [int(parts[f"s{i}"].astype(object).sum()) if len(parts) else 0
             for i in range(k)]
        p = {(i, j): (int(parts[f"p{i}_{j}"].astype(object).sum())
                      if len(parts) else 0)
             for i, j in pairs}
    else:
        n = int(parts["n"].sum()) if len(parts) else 0
        s = [float(parts[f"s{i}"].sum()) if len(parts) else 0.0
             for i in range(k)]
        p = {(i, j): (float(parts[f"p{i}_{j}"].sum()) if len(parts) else 0.0)
             for i, j in pairs}

    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            if n == 0:
                rows.append((cols[i], cols[j], math.nan))
                continue
            # exact integers converted ONCE to float64, then one shared
            # expression tree — the identical sequence a SQL replay runs
            num = float(n * p[(i, j)] - s[i] * s[j])
            den_i = float(n * p[(i, i)] - s[i] * s[i])
            den_j = float(n * p[(j, j)] - s[j] * s[j])
            if den_i <= 0 or den_j <= 0:
                rows.append((cols[i], cols[j], math.nan))
            else:
                rows.append((cols[i], cols[j],
                             num / (math.sqrt(den_i) * math.sqrt(den_j))))
    return pd.DataFrame(rows, columns=["col_a", "col_b", "corr"])


def anova_f(
    ds: "ray.data.Dataset",
    value_col: str,
    group_col: str,
    *,
    max_keys: int = 1_000_000,
    batch_size: int = 8192,
) -> pd.DataFrame:
    """One-way ANOVA F of ``value_col`` across ``group_col`` levels
    (sklearn ``f_classif`` / SQL "is this feature's mean different per
    class" screen).

    Reuses :func:`openmldb_ray.stages.scale.numeric_stats` — per-key
    (cnt, sum, sumsq) partials folded in one coarse-bucket shuffle; the
    F statistic derives on the driver from #keys tiny rows:

    ``SSB = Σ_g s_g²/n_g − S²/N``, ``SSW = Σ_g (ss_g − s_g²/n_g)``,
    ``F = (SSB/(k−1)) / (SSW/(N−k))``.

    Groups with zero non-null values are dropped (they carry no
    evidence); a null group key is a real level (SQL GROUP BY). Returns
    one row: ``(f_stat, df_between, df_within)``; F is null when either
    df ≤ 0 or SSW == 0. Per-group float terms sum in sorted-key order —
    compare against SQL at the round-6 band (drift_psi precedent).
    """
    from .scale import numeric_stats

    # numeric_stats returns keys already sorted (sentinel order); do NOT
    # re-sort here — the null key is a Python None by now and object-sort
    # would raise on None-vs-str comparison
    stats = numeric_stats(ds, value_col, by=group_col, max_keys=max_keys,
                          batch_size=batch_size)
    stats = stats[stats["cnt"] > 0]
    kk = len(stats)
    n = int(stats["cnt"].sum())
    if kk < 2 or n <= kk:
        return pd.DataFrame({"f_stat": [math.nan],
                             "df_between": [max(kk - 1, 0)],
                             "df_within": [max(n - kk, 0)]})
    cnt = stats["cnt"].to_numpy(np.float64)
    vsum = stats["vsum"].to_numpy(np.float64)
    vsumsq = stats["vsumsq"].to_numpy(np.float64)
    grand = float(stats["vsum"].astype(object).sum())
    ssb = float((vsum * vsum / cnt).sum()) - grand * grand / n
    ssw = float((vsumsq - vsum * vsum / cnt).sum())
    if ssw <= 0:
        f = math.nan
    else:
        f = (ssb / (kk - 1)) / (ssw / (n - kk))
    return pd.DataFrame({"f_stat": [f], "df_between": [kk - 1],
                         "df_within": [n - kk]})


_SEP = "\x1f"  # cell separator: never appears in key_strings output


def contingency(
    ds: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    *,
    max_cells: int = 1_000_000,
    num_buckets: int | None = None,
    batch_size: int = 8192,
) -> pd.DataFrame:
    """Distinct-cell counting pass → ``(a, b, cnt)`` contingency table.

    Rows where EITHER side is null are excluded (the association
    statistics below are defined over observed pairs; SQL replay is a
    two-sided ``IS NOT NULL``). Each block emits per-cell partial counts;
    one coarse-bucket shuffle folds them exactly (a cell lives in one
    bucket); the bounded table returns to the driver or raises past
    ``max_cells``.
    """
    from ..core.hashing import add_bucket_column, default_num_buckets

    def partial(t) -> pd.DataFrame:
        df = t.to_pandas(types_mapper=null_int_types_mapper)
        m = (df[col_a].notna() & df[col_b].notna()).to_numpy()
        if not m.any():
            return pd.DataFrame({"cell": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype=np.int64)})
        ka = _key_strings(df[col_a])[m]
        kb = _key_strings(df[col_b])[m]
        cell = np.array([a + _SEP + b for a, b in zip(ka, kb)], object)
        u, c = np.unique(cell, return_counts=True)
        return pd.DataFrame({"cell": u, "cnt": c.astype(np.int64)})

    nb = num_buckets or default_num_buckets()
    add_b = add_bucket_column(["cell"], "__b", nb)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return (g.drop(columns="__b")
                 .groupby("cell", as_index=False, sort=False).sum())

    cells = (ds.select_columns([col_a, col_b])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=batch_size)
             .map_batches(add_b, batch_format="pyarrow", batch_size=None)
             .groupby("__b").map_groups(fold, batch_format="pandas")
             ).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"contingency: {col_a!r} x {col_b!r} has {len(cells)} distinct "
            f"cells (> max_cells={max_cells}); association statistics over "
            f"an unbounded cross need hashing/bucketing first")
    if len(cells) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=object),
                             "b": pd.Series(dtype=object),
                             "cnt": pd.Series(dtype=np.int64)})
    split = cells["cell"].str.split(_SEP, n=1, expand=True)
    out = pd.DataFrame({"a": split[0], "b": split[1],
                        "cnt": cells["cnt"].astype(np.int64)})
    return out.sort_values(["a", "b"], kind="stable").reset_index(drop=True)


def categorical_assoc(
    ds: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    *,
    max_cells: int = 1_000_000,
    batch_size: int = 8192,
) -> pd.DataFrame:
    """Association screen of two categorical columns from ONE
    contingency pass: chi-squared, Cramér's V and mutual information.

    ``chi2 = Σ_cells (o − e)² / e`` with ``e = row_tot * col_tot / n``;
    ``cramers_v = sqrt(chi2 / (n * (min(R,C) − 1)))``;
    ``mi = Σ_cells (o/n) * ln(o*n / (row_tot*col_tot))`` (nats; only
    observed cells contribute — absent cells are the 0·ln0 = 0 limit).

    Returns one row ``(chi2, cramers_v, mi, n, n_rows_a, n_cols_b)``.
    Cells sum in sorted (a, b) order; a SQL engine does not pin its SUM
    order, so driver queries compare at the round-6 band.
    """
    ct = contingency(ds, col_a, col_b, max_cells=max_cells,
                     batch_size=batch_size)
    n = int(ct["cnt"].sum()) if len(ct) else 0
    if n == 0 or ct["a"].nunique() < 2 or ct["b"].nunique() < 2:
        return pd.DataFrame({
            "chi2": [math.nan], "cramers_v": [math.nan], "mi": [math.nan],
            "n": [n], "n_rows_a": [ct["a"].nunique() if len(ct) else 0],
            "n_cols_b": [ct["b"].nunique() if len(ct) else 0]})
    row_tot = ct.groupby("a")["cnt"].transform("sum").to_numpy(np.float64)
    col_tot = ct.groupby("b")["cnt"].transform("sum").to_numpy(np.float64)
    o = ct["cnt"].to_numpy(np.float64)
    e = row_tot * col_tot / n
    chi2 = float((((o - e) ** 2) / e).sum())
    r = int(ct["a"].nunique())
    c = int(ct["b"].nunique())
    v = math.sqrt(chi2 / (n * (min(r, c) - 1)))
    mi = float(((o / n) * np.log(o * n / (row_tot * col_tot))).sum())
    return pd.DataFrame({"chi2": [chi2], "cramers_v": [v], "mi": [mi],
                         "n": [n], "n_rows_a": [r], "n_cols_b": [c]})
