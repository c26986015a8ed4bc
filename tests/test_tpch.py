"""TPC-H corpus vs DuckDB oracle — mirrors the driver's t2 gate.

Smoke scale (sf0.001) by default; set BS_TEST_FULL=1 to also run the
correctness scale (sf0.01) the driver uses.
"""

from __future__ import annotations

import os

import pytest

from ballista_spark.queries.tpch import TPCH_QUERIES
from tests.conftest import SF_CORRECT, SF_SMOKE, run_compare

FULL = os.environ.get("BS_TEST_FULL") == "1"


@pytest.mark.parametrize("name", sorted(TPCH_QUERIES))
def test_tpch_smoke_scale(spark, duck, name):
    run_compare(spark, duck, TPCH_QUERIES[name], SF_SMOKE, "smoke")


@pytest.mark.skipif(not FULL, reason="set BS_TEST_FULL=1 for sf0.01 scale")
@pytest.mark.parametrize("name", sorted(TPCH_QUERIES))
def test_tpch_correctness_scale(spark, duck, name):
    run_compare(spark, duck, TPCH_QUERIES[name], SF_CORRECT, "correct")


def test_queries_nonempty(spark):
    """Each TPC-H query should return rows at sf0.001 (except those whose
    selective filters can legitimately return few) — guard against
    trivially-empty results making the oracle gate vacuous."""
    allowed_empty = {"tpch_q21"}  # strict NOT EXISTS can prune all at tiny SF
    for name, q in TPCH_QUERIES.items():
        n = q.run(spark, SF_SMOKE).count()
        if name not in allowed_empty:
            assert n > 0, f"{name} returned 0 rows at smoke scale"
