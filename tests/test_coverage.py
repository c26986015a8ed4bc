"""Operator-coverage corpus vs DuckDB oracle (SURVEY.md §2 checklist)."""

from __future__ import annotations

import os

import pytest

from ballista_spark.queries.coverage import COVERAGE_QUERIES
from tests.conftest import SF_CORRECT, SF_SMOKE, run_compare

FULL = os.environ.get("BS_TEST_FULL") == "1"


@pytest.mark.parametrize("name", sorted(COVERAGE_QUERIES))
def test_coverage_smoke_scale(spark, duck, name):
    run_compare(spark, duck, COVERAGE_QUERIES[name], SF_SMOKE, "smoke")


@pytest.mark.skipif(not FULL, reason="set BS_TEST_FULL=1 for sf0.01 scale")
@pytest.mark.parametrize("name", sorted(COVERAGE_QUERIES))
def test_coverage_correctness_scale(spark, duck, name):
    run_compare(spark, duck, COVERAGE_QUERIES[name], SF_CORRECT, "correct")
