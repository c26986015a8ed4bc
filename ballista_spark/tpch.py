"""TPC-H utilities: the reference benchmark's canonical schemas and its
``.tbl`` → CSV/Parquet converter, re-expressed on Spark.

Reference: ``rust/benchmarks/tpch/src/main.rs`` — ``get_schema`` (267-359,
signed integers by design so the data works in Spark, per the comment at
268-271) and the ``convert`` subcommand (196-265: read pipe-delimited
``.tbl`` with an explicit schema, optionally repartition, write
csv/parquet with a compression option).  FIXTURES.md reproduces the schema
tables.

The driver's synthetic testdata is a *reduced* TPC-H; these full schemas
serve users converting real dbgen output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ballista_spark.types import schema as _schema

#: canonical column -> arrow-alias type, straight from get_schema
#: (main.rs:273-359); nullable=false there, we keep Spark's default nullable
#: columns (parquet round-trips preserve values either way).
TPCH_SCHEMAS: dict[str, dict[str, str]] = {
    "part": {
        "p_partkey": "i32", "p_name": "utf8", "p_mfgr": "utf8",
        "p_brand": "utf8", "p_type": "utf8", "p_size": "i32",
        "p_container": "utf8", "p_retailprice": "f64", "p_comment": "utf8",
    },
    "supplier": {
        "s_suppkey": "i32", "s_name": "utf8", "s_address": "utf8",
        "s_nationkey": "i32", "s_phone": "utf8", "s_acctbal": "f64",
        "s_comment": "utf8",
    },
    "partsupp": {
        "ps_partkey": "i32", "ps_suppkey": "i32", "ps_availqty": "i32",
        "ps_supplycost": "f64", "ps_comment": "utf8",
    },
    "customer": {
        "c_custkey": "i32", "c_name": "utf8", "c_address": "utf8",
        "c_nationkey": "i32", "c_phone": "utf8", "c_acctbal": "f64",
        "c_mktsegment": "utf8", "c_comment": "utf8",
    },
    "orders": {
        "o_orderkey": "i32", "o_custkey": "i32", "o_orderstatus": "utf8",
        "o_totalprice": "f64", "o_orderdate": "date32",
        "o_orderpriority": "utf8", "o_clerk": "utf8",
        "o_shippriority": "i32", "o_comment": "utf8",
    },
    "lineitem": {
        "l_orderkey": "i32", "l_partkey": "i32", "l_suppkey": "i32",
        "l_linenumber": "i32", "l_quantity": "f64",
        "l_extendedprice": "f64", "l_discount": "f64", "l_tax": "f64",
        "l_returnflag": "utf8", "l_linestatus": "utf8",
        "l_shipdate": "date32", "l_commitdate": "date32",
        "l_receiptdate": "date32", "l_shipinstruct": "utf8",
        "l_shipmode": "utf8", "l_comment": "utf8",
    },
    "nation": {
        "n_nationkey": "i32", "n_name": "utf8", "n_regionkey": "i32",
        "n_comment": "utf8",
    },
    "region": {
        "r_regionkey": "i32", "r_name": "utf8", "r_comment": "utf8",
    },
}


def read_tbl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read dbgen ``.tbl`` output (pipe-delimited, no header, trailing
    delimiter column dropped by the explicit schema)."""
    if table not in TPCH_SCHEMAS:
        raise ValueError(f"unknown TPC-H table: {table}")
    return (
        spark.read.schema(_schema(TPCH_SCHEMAS[table]))
        .option("delimiter", "|")
        .option("header", False)
        .csv(path)
    )


def convert_tbl(
    spark: SparkSession,
    tbl_path: str,
    out_path: str,
    table: str,
    file_format: str = "parquet",
    partitions: int | None = None,
    compression: str = "snappy",
) -> None:
    """The reference's ``tpch convert`` subcommand (main.rs:196-265):
    ``.tbl`` → csv/parquet with optional repartitioning."""
    df = read_tbl(spark, tbl_path, table)
    if partitions:
        df = df.repartition(partitions)
    writer = df.write.mode("overwrite").option("compression", compression)
    if file_format == "parquet":
        writer.parquet(out_path)
    elif file_format == "csv":
        writer.option("header", True).csv(out_path)
    else:
        raise ValueError(f"unsupported output format: {file_format}")
