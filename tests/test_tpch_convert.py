"""The .tbl converter (reference `tpch convert` subcommand analog)."""

from __future__ import annotations

import datetime
import os
import tempfile

from ballista_spark.tpch import TPCH_SCHEMAS, convert_tbl, read_tbl


def test_all_eight_schemas_declared():
    assert set(TPCH_SCHEMAS) == {
        "part", "supplier", "partsupp", "customer",
        "orders", "lineitem", "nation", "region",
    }
    assert len(TPCH_SCHEMAS["lineitem"]) == 16  # full reference lineitem


def test_tbl_read_and_convert_round_trip(spark):
    d = tempfile.mkdtemp()
    tbl = os.path.join(d, "nation.tbl")
    with open(tbl, "w") as f:
        f.write("0|ALGERIA|0|haggle. carefully final deposits|\n")
        f.write("1|ARGENTINA|1|al foxes promise slyly|\n")
    df = read_tbl(spark, tbl, "nation")
    rows = df.collect()
    assert [(r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in rows] == [
        (0, "ALGERIA", 0), (1, "ARGENTINA", 1),
    ]
    out = os.path.join(d, "nation_parquet")
    convert_tbl(spark, tbl, out, "nation", partitions=2)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert back.schema["n_nationkey"].dataType.simpleString() == "int"


def test_tbl_date_columns_parse(spark):
    d = tempfile.mkdtemp()
    tbl = os.path.join(d, "orders.tbl")
    with open(tbl, "w") as f:
        f.write("1|370|O|172799.49|1996-01-02|5-LOW|Clerk#000000951|0|blithely|\n")
    r = read_tbl(spark, tbl, "orders").collect()[0]
    assert r["o_orderdate"] == datetime.date(1996, 1, 2)
    assert r["o_totalprice"] == 172799.49
