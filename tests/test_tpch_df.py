"""DataFrame-API TPC-H twins vs the shared DuckDB oracle."""

from __future__ import annotations

import os

import pytest

from ballista_spark.queries.tpch_df import TPCH_DF_QUERIES
from tests.conftest import SF_CORRECT, SF_SMOKE, run_compare

FULL = os.environ.get("BS_TEST_FULL") == "1"


@pytest.mark.parametrize("name", sorted(TPCH_DF_QUERIES))
def test_tpch_df_smoke_scale(spark, duck, name):
    run_compare(spark, duck, TPCH_DF_QUERIES[name], SF_SMOKE, "smoke")


@pytest.mark.skipif(not FULL, reason="set BS_TEST_FULL=1 for sf0.01 scale")
@pytest.mark.parametrize("name", sorted(TPCH_DF_QUERIES))
def test_tpch_df_correctness_scale(spark, duck, name):
    run_compare(spark, duck, TPCH_DF_QUERIES[name], SF_CORRECT, "correct")
