"""The reference's integration query set (q1,3,5,6,10,12 —
``rust/benchmarks/tpch/run.sh:6``) re-expressed through the
BallistaDataFrame / functions client API instead of SQL.

This is the surface the reference's DataFrame clients would have used
(``rust/client/src/context.rs:241-314``, ``python/src/dataframe.rs`` — where
join was still a TODO).  Each builder produces the same result as its SQL
twin in :mod:`ballista_spark.queries.tpch` (asserted by
``tests/test_tpch_df.py``) and shares its DuckDB oracle, so the DataFrame
surface itself is under the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import ballista_spark.functions as bf
from ballista_spark.dataframe import BallistaDataFrame
from ballista_spark.queries.base import Query
from ballista_spark.queries.tpch import TPCH_QUERIES
from ballista_spark.sources.registry import load_table

TPCH_DF_QUERIES: dict[str, Query] = {}

_DEC = "decimal(18,6)"


def _dsum_raw(expr) -> F.Column:
    return bf.sum(bf.cast(expr, _DEC))


def _dsum(expr) -> F.Column:
    # mirror of base.dec_sum incl. the money-granularity ROUND
    return F.round(_dsum_raw(expr), 2).cast("double")


def _davg(expr, count_col) -> F.Column:
    # mirror of base.dec_avg: round(sum_dec_as_double / count, 6)
    return F.round(_dsum_raw(expr).cast("double") / bf.count(count_col), 6)


def _t(spark: SparkSession, sf_dir: str, name: str) -> BallistaDataFrame:
    return BallistaDataFrame(load_table(spark, sf_dir, name))


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = bf.col("l_extendedprice") * (1 - bf.col("l_discount"))
    return (
        li.filter(bf.col("l_shipdate") <= bf.lit("2001-09-02").cast("timestamp"))
        .aggregate(
            [bf.col("l_returnflag"), bf.col("l_linestatus")],
            [
                _dsum(bf.col("l_quantity")).alias("sum_qty"),
                _dsum(bf.col("l_extendedprice")).alias("sum_base_price"),
                _dsum(rev).alias("sum_disc_price"),
                _dsum(rev * (1 + bf.col("l_tax"))).alias("sum_charge"),
                _davg(bf.col("l_quantity"), "l_quantity").alias("avg_qty"),
                _davg(bf.col("l_extendedprice"), "l_extendedprice").alias("avg_price"),
                _davg(bf.col("l_discount"), "l_discount").alias("avg_disc"),
                bf.count(F.lit(1)).alias("count_order"),
            ],
        )
        .sort(bf.col("l_returnflag").asc(), bf.col("l_linestatus").asc())
        .df
    )


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(bf.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        bf.col("o_orderdate") < bf.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        bf.col("l_shipdate") > bf.lit("1998-03-15").cast("timestamp")
    )
    rev = bf.col("l_extendedprice") * (1 - bf.col("l_discount"))
    return (
        cust.join(orders, on=[cust.df.c_custkey == orders.df.o_custkey])
        .join(li, on=[F.col("o_orderkey") == li.df.l_orderkey])
        .aggregate(
            [bf.col("l_orderkey"), bf.col("o_orderdate"), bf.col("o_orderpriority")],
            [_dsum(rev).alias("revenue")],
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .sort(bf.col("revenue").desc(), bf.col("o_orderdate").asc(), bf.col("l_orderkey").asc())
        .limit(10)
        .df
    )


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (bf.col("o_orderdate") >= bf.lit("1996-01-01").cast("timestamp"))
        & (bf.col("o_orderdate") < bf.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(bf.col("r_name") == "ASIA")
    rev = bf.col("l_extendedprice") * (1 - bf.col("l_discount"))
    return (
        cust.join(orders, on=[cust.df.c_custkey == orders.df.o_custkey])
        .join(li, on=[F.col("o_orderkey") == li.df.l_orderkey])
        .join(
            supp,
            on=[
                (F.col("l_suppkey") == supp.df.s_suppkey)
                & (F.col("c_nationkey") == supp.df.s_nationkey)
            ],
        )
        .join(nation, on=[F.col("s_nationkey") == nation.df.n_nationkey])
        .join(region, on=[F.col("n_regionkey") == region.df.r_regionkey])
        .aggregate([bf.col("n_name")], [_dsum(rev).alias("revenue")])
        .sort(bf.col("revenue").desc(), bf.col("n_name").asc())
        .df
    )


def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (bf.col("l_shipdate") >= bf.lit("1997-01-01").cast("timestamp"))
            & (bf.col("l_shipdate") < bf.lit("1998-01-01").cast("timestamp"))
            & bf.col("l_discount").between(0.03, 0.07)
            & (bf.col("l_quantity") < 24)
        )
        .aggregate(
            [],
            [_dsum(bf.col("l_extendedprice") * bf.col("l_discount")).alias("revenue")],
        )
        .df
    )


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (bf.col("o_orderdate") >= bf.lit("1997-10-01").cast("timestamp"))
        & (bf.col("o_orderdate") < bf.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(bf.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    rev = bf.col("l_extendedprice") * (1 - bf.col("l_discount"))
    return (
        cust.join(orders, on=[cust.df.c_custkey == orders.df.o_custkey])
        .join(li, on=[F.col("o_orderkey") == li.df.l_orderkey])
        .join(nation, on=[F.col("c_nationkey") == nation.df.n_nationkey])
        .aggregate(
            [bf.col("c_custkey"), bf.col("c_name"), bf.col("c_acctbal"), bf.col("n_name")],
            [_dsum(rev).alias("revenue")],
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .sort(bf.col("revenue").desc(), bf.col("c_custkey").asc())
        .limit(20)
        .df
    )


def _q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (bf.col("l_shipdate") >= bf.lit("1997-01-01").cast("timestamp"))
        & (bf.col("l_shipdate") < bf.lit("1998-01-01").cast("timestamp"))
    )
    high = bf.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, on=[orders.df.o_orderkey == li.df.l_orderkey])
        .aggregate(
            [bf.col("l_returnflag")],
            [
                bf.sum(bf.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
                bf.sum(bf.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
            ],
        )
        .sort(bf.col("l_returnflag").asc())
        .df
    )


for _name, _builder in [
    ("tpch_df_q1", _q1), ("tpch_df_q3", _q3), ("tpch_df_q5", _q5),
    ("tpch_df_q6", _q6), ("tpch_df_q10", _q10), ("tpch_df_q12", _q12),
]:
    _sql_twin = _name.replace("_df", "")
    TPCH_DF_QUERIES[_name] = Query(
        doc=(
            f"DataFrame-API twin of {_sql_twin} (client surface of "
            "rust/client/src/context.rs:241-314); same oracle."
        ),
        builder=_builder,
        oracle=TPCH_QUERIES[_sql_twin].oracle_text(),
    )


def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS rewritten as a left-semi join (SURVEY §7.4: 'if the DataFrame
    API must express them, rewrite as joins')."""
    orders = _t(spark, sf_dir, "orders").filter(
        (bf.col("o_orderdate") >= bf.lit("1997-07-01").cast("timestamp"))
        & (bf.col("o_orderdate") < bf.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        on=[
            (orders.df.o_orderkey == li.df.l_orderkey)
            & (li.df.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        ],
        how="left_semi",
    )
    return (
        matched.aggregate([bf.col("o_orderpriority")], [bf.count(F.lit(1)).alias("order_count")])
        .sort(bf.col("o_orderpriority").asc())
        .df
    )


def _q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER JOIN with an extra join predicate + double aggregation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        on=[
            (cust.df.c_custkey == orders.df.o_custkey)
            & (orders.df.o_orderpriority != "5-LOW")
        ],
        how="left",
    )
    counts = joined.aggregate(
        [bf.col("c_custkey")], [bf.count("o_orderkey").alias("c_count")]
    )
    return (
        counts.aggregate([bf.col("c_count")], [bf.count(F.lit(1)).alias("custdist")])
        .sort(bf.col("custdist").desc(), bf.col("c_count").desc())
        .df
    )


def _q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN rewritten as a left-anti join + COUNT(DISTINCT)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (bf.col("p_brand") != "Brand#1") & bf.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(bf.col("s_acctbal") < 0).select("s_suppkey")
    li_ok = li.join(bad_supp, on=[li.df.l_suppkey == F.col("s_suppkey")], how="left_anti")
    return (
        li_ok.join(part, on=[F.col("l_partkey") == part.df.p_partkey])
        .aggregate(
            [bf.col("p_brand"), bf.col("p_type"), bf.col("p_size")],
            [bf.count_distinct("l_suppkey").alias("supplier_cnt")],
        )
        .sort(
            bf.col("supplier_cnt").desc(), bf.col("p_brand").asc(),
            bf.col("p_type").asc(), bf.col("p_size").asc(),
        )
        .df
    )


for _name, _builder in [
    ("tpch_df_q4", _q4), ("tpch_df_q13", _q13), ("tpch_df_q16", _q16),
]:
    _sql_twin = _name.replace("_df", "")
    TPCH_DF_QUERIES[_name] = Query(
        doc=(
            f"DataFrame-API twin of {_sql_twin}: subquery shape rewritten as "
            "semi/anti/outer join (SURVEY §7.4); same oracle."
        ),
        builder=_builder,
        oracle=TPCH_QUERIES[_sql_twin].oracle_text(),
    )
