"""Driver-sim: run every queries()[name] against its oracle_sql()[name]
via DuckDB at a given sf and report row-count / schema / value matches.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if not len(df):
        # apply(axis=1) on a 0-row frame returns a DataFrame, not a
        # Series — short-circuit (a 0-row result still compares schema)
        return df.reset_index(drop=True)
    sort_cols = list(df.columns)
    # sort by stringified values for a stable order-insensitive compare
    key = df.astype(str).apply(lambda r: "|".join(r.values), axis=1)
    return df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


def compare(name, ray_df, ora_df) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} oracle={sorted(ora_df.columns)}")
        return problems
    if len(ray_df) != len(ora_df):
        problems.append(f"rows: ray={len(ray_df)} oracle={len(ora_df)}")
        return problems
    a, b = norm(ray_df), norm(ora_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        a_num = pd.to_numeric(av, errors="coerce")
        b_num = pd.to_numeric(bv, errors="coerce")
        both_num = (pd.api.types.is_numeric_dtype(av) or a_num.notna().any()) and \
                   (pd.api.types.is_numeric_dtype(bv) or b_num.notna().any())
        if both_num and pd.api.types.is_numeric_dtype(av) and pd.api.types.is_numeric_dtype(bv):
            try:
                exact = np.array_equal(av.to_numpy(np.float64), bv.to_numpy(np.float64),
                                       equal_nan=True)
            except TypeError:
                exact = np.array_equal(av.to_numpy(), bv.to_numpy())
            close = np.allclose(a_num.astype(float), b_num.astype(float),
                                equal_nan=True, rtol=1e-9, atol=1e-9)
            if not close:
                bad = (~np.isclose(a_num.astype(float), b_num.astype(float),
                                   equal_nan=True)).sum()
                problems.append(f"col {c}: {bad} values differ "
                                f"(e.g. {a_num.iloc[0]} vs {b_num.iloc[0]})")
            elif not exact:
                problems.append(f"col {c}: allclose but NOT bit-identical "
                                f"(hash compare may fail)")
        else:
            eq = av.fillna("<null>").astype(str) == bv.fillna("<null>").astype(str)
            if not eq.all():
                i = int(np.nonzero(~eq.to_numpy())[0][0])
                problems.append(f"col {c}: {int((~eq).sum())} values differ "
                                f"(e.g. {av.iloc[i]!r} vs {bv.iloc[i]!r})")
    # dtype drift (driver checks schema)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype {c}: ray={a[c].dtype} oracle={b[c].dtype} (warn)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            rdf = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(rdf)} rows  ({t1-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, rdf, odf)
        hard = [p for p in problems if "(warn)" not in p and "bit-identical" not in p]
        status = "FAIL" if hard else ("warn" if problems else "ok")
        if hard:
            failures += 1
        print(f"[{status}] {name}: {len(rdf)} rows ({t1-t0:.1f}s)"
              + ("".join(f"\n         {p}" for p in problems) if problems else ""))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
