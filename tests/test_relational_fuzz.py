"""Pinned seeds of the relational differential fuzzer (tools/fuzz_relational).

Full campaigns run offline (`python tools/fuzz_relational.py --seeds N`);
CI pins the first few seeds of every op family, including seed 9 — the
zero-match inner join whose all-empty-blocks to_pandas artifact the
fuzzer's comparison had to learn about.
"""

import pytest

from tools.fuzz_relational import (fuzz_joins, fuzz_pivot, fuzz_qsketch,
                                   fuzz_rank, fuzz_resample, fuzz_reshape,
                                   fuzz_rollup)

OPS = {"rank": fuzz_rank, "pivot": fuzz_pivot, "rollup": fuzz_rollup,
       "joins": fuzz_joins, "resample": fuzz_resample,
       "reshape": fuzz_reshape, "qsketch": fuzz_qsketch}


@pytest.mark.parametrize("op", sorted(OPS))
@pytest.mark.parametrize("seed", [0, 1, 2, 9, 25])
def test_fuzz_seed(ray_session, op, seed):
    import ray.data as rd

    assert OPS[op](seed, 150, rd) == []
