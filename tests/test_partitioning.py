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
    spread_to_cluster,
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


def test_range_spread_folds_into_terminal_sort(spark):
    """``spread_to_cluster(by_range=True)`` on the sort key leaves exactly
    ONE shuffle in a map + ``orderBy(key)`` pipeline — the spread's range
    partitioning satisfies the terminal sort's OrderedDistribution, so the
    sort runs partition-local (guide §2.4; the r10 text_stats/text_langid/
    multimodal_meta shape).  The hash variant pays a second (range)
    exchange for the global sort.  Results are identical."""
    docs = load_table(spark, SF_SMOKE, "documents")

    def pipe(spread):
        return spread.select("doc_id", F.length("text").alias("n")).orderBy(
            "doc_id"
        )

    rng = pipe(spread_to_cluster(docs, "doc_id", by_range=True))
    hsh = pipe(spread_to_cluster(docs, "doc_id"))
    assert plan_summary(rng).n_shuffles == 1, "range spread must fold the sort"
    assert plan_summary(hsh).n_shuffles == 2
    assert rng.collect() == hsh.collect()


def test_range_spread_carries_through_alias(spark):
    """Project's alias-aware output partitioning keeps the fold when the
    spread key is renamed downstream (attach_media's doc_id → media_id)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    renamed = (
        spread_to_cluster(docs, "doc_id", by_range=True)
        .select(F.col("doc_id").alias("media_id"), F.length("text").alias("n"))
        .orderBy("media_id")
    )
    assert plan_summary(renamed).n_shuffles == 1
    rows = renamed.collect()
    assert [r.media_id for r in rows] == sorted(r.media_id for r in rows)


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


def test_aqe_skew_join_split_boundary_and_fallbacks(spark):
    """The 100 TB skew case at model scale: a fact with 40% of rows on
    ONE key, merge-hinted against a dim too big to broadcast (modeled
    by disabling broadcast); AQE thresholds scaled to the local data
    volume.  Pins the measured boundary of AQE's OptimizeSkewedJoin on
    this engine version:

    - pure join (no same-key downstream requirement): the hot
      partition IS split — SortMergeJoin(skew=true) in the final
      adaptive plan;
    - join feeding a same-key groupBy: AQE declines (the join's output
      partitioning satisfies the aggregation; observed even with
      forceOptimizeSkewedJoin=true) — the case where the explicit
      fallbacks are REQUIRED;
    - both fallbacks produce the identical aggregate: salted_join
      (spreads the hot key across salts) and the aggregate-below-join
      rewrite (partial-agg the fact per host FIRST — post-agg there is
      one row per host, no skew left at all — the plan to prefer when
      the aggregate is algebraic)."""
    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        fact = spark.range(30000).select(
            F.col("id").alias("page_id"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(100)) < 40, F.lit("hot"))
            .otherwise(
                F.concat(
                    F.lit("h"),
                    F.pmod(F.xxhash64(F.col("id") + 7), F.lit(500)).cast("string"),
                )
            )
            .alias("host"),
            (F.col("id") % 1000 / 10.0).alias("value"),
        )
        dim = spark.range(500).select(
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
            (F.col("id") % 97 / 9.7).alias("w"),
        ).unionAll(spark.createDataFrame([("hot", 5.0)], "host string, w double"))

        # 1. pure join: AQE splits the hot partition
        pure = fact.join(dim.hint("merge"), "host").agg(
            F.round(F.sum(F.col("value") * F.col("w")), 4).alias("s")
        )
        pure.collect()
        assert "skew=true" in pure._jdf.queryExecution().executedPlan().toString()

        # 2. join + same-key agg: AQE declines — fallbacks required
        def agg(joined):
            return joined.groupBy("host").agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.col("value") * F.col("w")), 6).alias("s"),
            )

        plain = agg(fact.join(dim.hint("merge"), "host"))
        plain_rows = sorted(map(tuple, plain.collect()))
        assert "skew=true" not in (
            plain._jdf.queryExecution().executedPlan().toString()
        )

        salted = agg(salted_join(fact, dim, "host", n_salts=8))
        assert sorted(map(tuple, salted.collect())) == plain_rows

        preagg = (
            fact.groupBy("host")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
            .join(dim.hint("merge"), "host")
            .select(
                "host", "n", F.round(F.col("sv") * F.col("w"), 6).alias("s")
            )
        )
        assert sorted(map(tuple, preagg.collect())) == plain_rows
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


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


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """Z-order vs linear sort on (l_orderkey, l_partkey): a mid-range
    predicate on EITHER column overlaps well under half the z-ordered
    files' min/max ranges, while the linear layout only prunes its leading
    column (~every file overlaps on the trailing one).  File-level min/max
    is exactly what drives parquet scan pruning at 100 TB."""
    import pyarrow.parquet as pq

    from ballista_spark.operators.partitioning import write_zordered
    from ballista_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], n_files=64, bits=8)
    (
        li.repartitionByRange(64, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def file_ranges(path, col):
        out = []
        import glob as g

        for f in sorted(g.glob(os.path.join(path, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                        hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
            if lo is not None:
                out.append((lo, hi))
        return out

    bounds = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]

    def overlap_frac(path, col, lo, hi):
        rngs = file_ranges(path, col)
        assert rngs, path
        return sum(1 for a, b in rngs if not (b < lo or a > hi)) / len(rngs)

    # 10%-wide bands at two positions per column (one straddling the
    # central z-quadrant boundary — the adversarial case)
    for col, mn, mx in (
        ("l_orderkey", bounds[0], bounds[1]),
        ("l_partkey", bounds[2], bounds[3]),
    ):
        width = mx - mn
        for start in (0.1, 0.45):
            lo, hi = mn + int(start * width), mn + int((start + 0.1) * width)
            zf = overlap_frac(zpath, col, lo, hi)
            assert zf <= 0.6, (col, start, zf)
    # the linear layout prunes its leading column but NOT the trailing one
    width = bounds[3] - bounds[2]
    lo, hi = bounds[2] + int(0.45 * width), bounds[2] + int(0.55 * width)
    lin_trailing = overlap_frac(lpath, "l_partkey", lo, hi)
    assert lin_trailing >= 0.9, lin_trailing
    # and the z-ordered data is the same multiset of rows
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0
