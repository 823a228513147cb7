"""Recursive-CTE DP oracle formulations (__ray_entry__) pinned bit-exact
against the Python kernels on random strings.

These CTEs are what makes the non-builtin metrics SQL-oracle-checkable
(OSA at n=2, merge-and-split, weighted OCR sets, restricted
substitutions): DuckDB executes the SAME dynamic program the kernel
implements, so any drift in either side shows up as a hash mismatch in
the driver.  No Ray needed — pure duckdb vs kernel.
"""

import random
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry  # noqa: E402
from liblevenshtein_rust_ray.kernel.distance import (  # noqa: E402
    merge_and_split_distance,
    transposition_distance,
)
from liblevenshtein_rust_ray.kernel.operations import (  # noqa: E402
    OperationSet,
    weighted_distance,
)
from liblevenshtein_rust_ray.kernel.substitution import phonetic_basic  # noqa: E402
from liblevenshtein_rust_ray.kernel.vectorized import batch_distances  # noqa: E402


def _pairs(seed: int, alpha: str, n: int = 400, maxlen: int = 8) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen))),
        )
        for _ in range(n)
    ]
    return pd.DataFrame(rows, columns=["a", "b"])


def _run_cte(cte: str, pairs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("pairs", pairs)
    sql = f"""
        WITH RECURSIVE hard AS (SELECT a, b FROM pairs),
        {cte}
        SELECT a, b, d FROM dpres
    """
    return con.sql(sql).df()


def test_osa_cte_equals_kernel():
    pairs = _pairs(7, "abc ")
    got = _run_cte(entry._OSA_DP_CTE, pairs)
    assert len(got) == len(pairs)
    for a, b, d in got.itertuples(index=False):
        assert transposition_distance(a, b) == d, (a, b)


def test_merge_split_cte_equals_kernel():
    pairs = _pairs(11, "abc")
    got = _run_cte(entry._MS_DP_CTE, pairs)
    assert len(got) == len(pairs)
    for a, b, d in got.itertuples(index=False):
        assert merge_and_split_distance(a, b) == d, (a, b)


def test_weighted_ocr_cte_equals_kernel():
    ops = OperationSet.ocr()
    pairs = _pairs(3, "abc")
    got = _run_cte(entry._weighted_dp_cte(0.5, merge=0.5, split=0.5), pairs)
    for a, b, d in got.itertuples(index=False):
        assert weighted_distance(a, b, ops) == pytest.approx(d), (a, b)


def test_weighted_restricted_cte_equals_kernel():
    ops = OperationSet.ocr_restricted()
    # alphabet rich in rule characters so the restricted segments fire
    pairs = _pairs(5, "rnmcldovw015s")
    got = _run_cte(entry._weighted_dp_cte(1.0, rules=ops.rules), pairs)
    for a, b, d in got.itertuples(index=False):
        assert weighted_distance(a, b, ops) == pytest.approx(d), (a, b)


def test_subst_lev_cte_equals_kernel():
    sub = phonetic_basic()
    pairs = _pairs(9, "fpckszaeiy")
    got = _run_cte(entry._subst_lev_dp_cte(), pairs)
    for a, b, d in got.itertuples(index=False):
        # n=10 > any distance here, so the kernel value is uncapped
        assert int(batch_distances([a], [b], 10, "standard", sub)[0]) == d, (a, b)


def test_subst_translate_prefilter_is_lower_bound():
    """The translate() canonicalization used as the oracle prefilter is a
    sound LOWER bound on the restricted-substitution distance (free subs
    map within transitive-closure classes)."""
    from liblevenshtein_rust_ray.kernel.distance import standard_distance

    canon = str.maketrans("eypksz", "aifccc")
    sub = phonetic_basic()
    rng = random.Random(13)
    for _ in range(400):
        a = "".join(rng.choice("fpckszaeiy") for _ in range(rng.randint(0, 8)))
        b = "".join(rng.choice("fpckszaeiy") for _ in range(rng.randint(0, 8)))
        sd = int(batch_distances([a], [b], 10, "standard", sub)[0])
        lb = standard_distance(a.translate(canon), b.translate(canon))
        assert lb <= sd, (a, b, lb, sd)
