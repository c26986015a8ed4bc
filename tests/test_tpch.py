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


def test_tpch_q15_view_based_beyond_reference(spark, duck):
    """q15 is the one TPC-H query the reference corpus omits (view-based;
    python/examples/testquery.py skips it).  Beyond-parity check: the
    CREATE TEMPORARY VIEW lifecycle + view-referencing scalar subquery run
    here and match DuckDB (same reduced schema, decimal-exact revenue)."""
    from ballista_spark.sources.registry import register_tables

    register_tables(spark, SF_SMOKE)
    rev = """
SELECT l_suppkey AS supplier_no,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
GROUP BY l_suppkey
"""
    spark.sql("DROP VIEW IF EXISTS revenue0")
    spark.sql(f"CREATE TEMPORARY VIEW revenue0 AS {rev}")
    got = spark.sql("""
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""").collect()
    duck.execute("SET schema 'smoke'")
    want = duck.execute(f"""
WITH revenue0 AS ({rev})
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""").fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) >= 1
    spark.sql("DROP VIEW IF EXISTS revenue0")
