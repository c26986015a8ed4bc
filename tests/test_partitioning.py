"""Bucketing (shuffle-free co-located joins), salting (skew), and
optional-connector behavior."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.partitioning import (
    salted_agg,
    salted_join,
    write_bucketed,
)
from ballista_spark.plans.explain import plan_summary
from ballista_spark.sources.connectors import ConnectorUnavailable, read_delta
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    """With broadcast disabled (so co-location, not small-table luck, is
    what's proven): equal bucket counts → SortMergeJoin with zero
    exchanges; mismatched counts shuffle one side."""
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    write_bucketed(orders, "b_orders16", ["o_orderkey"], 16)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        s = plan_summary(joined)
        assert s.n_shuffles == 0, f"bucketed join must not shuffle: {s}"
        assert "SortMergeJoin" in s.joins
        mismatched = spark.table("b_orders16").join(
            spark.table("b_lineitem"), "o_orderkey"
        )
        assert plan_summary(mismatched).n_shuffles == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert joined.count() == load_table(spark, SF_SMOKE, "lineitem").count()


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {"n": "count:l_orderkey", "qty_max": "max:l_quantity"},
        salt_cols=["l_orderkey"],
        n_salts=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("l_orderkey").alias("n"), F.max("l_quantity").alias("qty_max")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_rejects_non_algebraic():
    with pytest.raises(ValueError):
        salted_agg(None, ["k"], {"a": "avg:v"}, ["k"])  # type: ignore[arg-type]


def test_salted_join_matches_plain(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    salted = salted_join(orders, cust, on="o_custkey", n_salts=4).select(
        "o_orderkey", "c_name"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_connector_unavailable_is_actionable(spark):
    with pytest.raises(ConnectorUnavailable, match="spark.jars.packages"):
        read_delta(spark, "/tmp/nonexistent")


def test_jdbc_reader_builds(spark):
    # no database to dial here; just assert the reader surface exists and
    # fails with a JDBC-level (not engine-level) error
    from ballista_spark.sources.connectors import read_jdbc

    with pytest.raises(Exception) as ei:
        read_jdbc(spark, "jdbc:invalid://nowhere", "t").collect()
    assert "jdbc" in str(ei.value).lower() or "driver" in str(ei.value).lower()
