"""Plan-quality gates: the 100 TB traits (pushdown, pruning, broadcast,
bounded shuffles) asserted on the headline queries.  A query that passes the
oracle but regresses here is wrong at scale."""

from __future__ import annotations

import os

import pytest

from ballista_spark.plans.explain import explain_text, plan_summary
from ballista_spark.queries.tpch import TPCH_QUERIES
from tests.conftest import SF_CORRECT


def _summary(spark, name):
    return plan_summary(TPCH_QUERIES[name].run(spark, SF_CORRECT))


def test_q1_pushdown_and_pruning(spark):
    s = _summary(spark, "tpch_q1")
    li = s.scan_for("lineitem")
    assert li is not None
    assert any("l_shipdate" in f for f in li["pushed_filters"]), li
    # projection pruning: lineitem has 11 columns, q1 needs 7
    assert len(li["read_schema"]) <= 7, li["read_schema"]
    assert s.joins == []


def test_q6_full_pushdown_single_exchange(spark):
    s = _summary(spark, "tpch_q6")
    li = s.scan_for("lineitem")
    pushed = " ".join(li["pushed_filters"])
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    assert len(li["read_schema"]) <= 4
    # global agg: one shuffle (partial -> final), nothing else
    assert s.n_shuffles <= 1, s


def test_q3_broadcasts_small_dimensions(spark):
    s = _summary(spark, "tpch_q3")
    assert "BroadcastHashJoin" in s.joins, s.joins
    # customer/orders broadcast; no sort-merge join should appear at this SF
    assert s.n_broadcast_exchanges >= 1


def test_q5_six_way_join_stays_broadcast_at_test_scale(spark):
    s = _summary(spark, "tpch_q5")
    assert "BroadcastHashJoin" in s.joins
    # region/nation/supplier are tiny: they must never shuffle
    assert s.n_shuffles <= 3, s


def test_explain_modes_render(spark):
    df = TPCH_QUERIES["tpch_q1"].run(spark, SF_CORRECT)
    for mode in ("simple", "extended", "formatted", "cost"):
        text = explain_text(df, mode)
        assert "lineitem" in text or "Aggregate" in text or "Scan" in text


def test_aqe_enabled_in_plans(spark):
    s = _summary(spark, "tpch_q18")
    assert s.has_aqe


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """Writing date-partitioned parquet and filtering on the partition col
    must prune at the scan (PartitionFilters), not post-filter — the trait
    that makes day-scoped queries cheap at 100 TB."""
    import os

    from pyspark.sql import functions as F

    from ballista_spark.sources.registry import load_table

    out = os.path.join(str(tmp_path), "events_by_day")
    ev = load_table(spark, SF_CORRECT, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    q = spark.read.parquet(out).where(F.col("day") == "2024-01-05")
    text = explain_text(q, "formatted")
    assert "PartitionFilters" in text and "2024-01-05" in text
    n_days = ev.select("day").distinct().count()
    assert q.count() > 0
    # pruned scan reads one partition dir, not all n_days
    import re

    m = re.search(r"Location: \S+ \[(.*?)\]", text)
    assert m is not None


def test_codegen_spans_in_executed_plans(spark):
    """Headline queries must run inside whole-stage codegen (>=1 span);
    q1's wide aggregate must not fall out (codegen.maxFields=256)."""
    from ballista_spark.plans.explain import codegen_span_count

    for name, minimum in (("tpch_q1", 1), ("tpch_q6", 1), ("tpch_q3", 1)):
        df = TPCH_QUERIES[name].run(spark, SF_CORRECT)
        n = codegen_span_count(df)
        assert n >= minimum, f"{name}: {n} codegen spans"


def test_plan_dot_renders_tree(spark):
    from ballista_spark.plans.explain import plan_dot

    dot = plan_dot(TPCH_QUERIES["tpch_q3"].run(spark, SF_CORRECT))
    assert dot.startswith("digraph physical_plan {") and dot.endswith("}")
    assert "Scan parquet" in dot or "ColumnarToRow" in dot
    assert "->" in dot  # at least one edge


def test_text_stats_is_map_only(spark):
    """The per-document text metrics (token count, quality, fingerprint,
    repetition) are pure projections — the plan must contain NO exchange
    besides the final sort's: at 100 TB this operator is a single map pass
    over the corpus."""
    from ballista_spark.queries.pipeline import PIPELINE_QUERIES

    df = PIPELINE_QUERIES["text_stats"].run(spark, SF_CORRECT)
    s = plan_summary(df)
    assert s.joins == [], s.joins
    # the orderBy for deterministic output adds one exchange; the
    # small-file spread (a no-op at scale: it only fires when the scan has
    # fewer partitions than cores) may add one more
    assert s.n_shuffles <= 2, s
    txt = explain_text(df)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_quantized_scan_has_no_python_and_no_corpus_shuffle(spark):
    """int8 quantize/dequantize + scoring stay JVM-side; the corpus side is
    scanned once with the (bounded) query side broadcast — no shuffle of
    the corpus, no Python eval nodes."""
    from ballista_spark.operators.similarity import quantized_cosine_topk
    from ballista_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_CORRECT, "embeddings")
    q = quantized_cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=3)
    txt = explain_text(q)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt
    assert "BroadcastExchange" in txt  # query side
    assert "CartesianProduct" not in txt  # broadcast NLJ, never a shuffle product


@pytest.mark.skipif(
    os.environ.get("BS_TEST_FULL") != "1", reason="corpus-wide sweep; BS_TEST_FULL=1"
)
def test_planlint_corpus_sweep_is_clean(spark):
    """Every driver entry's executed plan passes the scale anti-pattern
    lint (tools/planlint.py): no cartesians or nested-loop joins outside
    the documented allow-lists, no row-at-a-time Python, pushdown/pruning
    on every TPC-H scan."""
    import __spark_entry__ as entry
    from tools.planlint import SF_DIR, lint

    bad = {}
    for name, fn in entry.queries().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        errs = lint(name, plan)
        if errs:
            bad[name] = errs
    assert not bad, bad


def test_planlint_headline_subset_default(spark):
    """Fast plan lint on the 13 bench headline entries — runs in the
    DEFAULT suite so a cartesian/NLJ/row-Python/pushdown regression on a
    headline query fails CI even when the BS_TEST_FULL corpus sweep is
    skipped (the sweep remains the full gate)."""
    import __spark_entry__ as entry
    from bench import HEADLINE
    from tools.planlint import SF_DIR, lint

    names = HEADLINE + ["dedup_minhash_lsh", "ann_cosine_topk", "text_stats"]
    qs = entry.queries()
    bad = {}
    for name in names:
        plan = qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        errs = lint(name, plan)
        if errs:
            bad[name] = errs
    assert not bad, bad
