"""Pinned differential-fuzz seeds: engine vs DuckDB on the shared dialect.

The generators live in tools/fuzz_{sql,window,groupby}.py; CI pins a fixed
seed range of each plus the seeds that historically found bugs (float %
as trunc-div instead of C fmod; literal-NULL args stringified to 'None' /
crashing string kernels). Wider sweeps run offline via the CLIs.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import (fuzz_groupby, fuzz_lastjoin, fuzz_sql, fuzz_stages,  # noqa: E402
                   fuzz_union, fuzz_window)

# seeds that found real bugs, pinned forever; 2000+ = time-fn grammar,
# window 500+ = end-bound / EXCLUDE CURRENT_ROW frames
SCALAR_REGRESSION = [93, 133, 1143, 2020, 2039, 2042, 2055]
SCALAR_RANGE = list(range(0, 8)) + list(range(2000, 2004))
WINDOW_RANGE = list(range(0, 6)) + list(range(500, 506))
GROUPBY_RANGE = [13, 17, 18] + list(range(0, 5))
LASTJOIN_RANGE = list(range(0, 8))
UNION_RANGE = list(range(0, 6))
STAGES_RANGE = list(range(0, 4))


def _rd():
    import ray.data as rd
    return rd


def _sql_query():
    from openmldb_ray.sql import sql_query
    return sql_query


@pytest.mark.parametrize("seed", SCALAR_REGRESSION + SCALAR_RANGE)
def test_fuzz_scalar_seed(ray_session, seed):
    import duckdb
    import random
    rng = random.Random(seed)
    tbl = fuzz_sql.gen_table(rng, 64)
    con = duckdb.connect()
    con.register("tbl", tbl)
    bad = fuzz_sql.run_seed(seed, 64, con, _sql_query(), _rd())
    con.close()
    assert not bad, "\n".join(bad)


@pytest.mark.parametrize("seed", WINDOW_RANGE)
def test_fuzz_window_seed(ray_session, seed):
    bad = fuzz_window.run_seed(seed, 150, _sql_query(), _rd())
    assert not bad, "\n".join(bad)


@pytest.mark.parametrize("seed", GROUPBY_RANGE)
def test_fuzz_groupby_seed(ray_session, seed):
    bad = fuzz_groupby.run_seed(seed, 200, _sql_query(), _rd())
    assert not bad, "\n".join(bad)


@pytest.mark.parametrize("seed", LASTJOIN_RANGE)
def test_fuzz_lastjoin_seed(ray_session, seed):
    bad = fuzz_lastjoin.run_seed(seed, 200, _sql_query(), _rd())
    assert not bad, "\n".join(bad)


@pytest.mark.parametrize("seed", UNION_RANGE)
def test_fuzz_union_seed(ray_session, seed):
    bad = fuzz_union.run_seed(seed, 150, _sql_query(), _rd())
    assert not bad, "\n".join(bad)


@pytest.mark.parametrize("seed", STAGES_RANGE)
def test_fuzz_stages_seed(ray_session, seed):
    bad = fuzz_stages.run_seed(seed, 120, _rd())
    assert not bad, "\n".join(bad)
