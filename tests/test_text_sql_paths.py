"""Round-10 build-cost fast paths must be result-identical to the
Column-API forms they replace (operators/text.py lang_id SQL text,
keyword_hits driver-side lengths, validate single-pass unique)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_spark.operators.text import keyword_hits, lang_id
from ballista_spark.operators.validate import (
    in_range,
    not_null,
    row_count,
    unique,
    validate,
)

LANG_DOCS = [
    (0, "the cat of a hat the of"),
    (1, "le chat et la maison le"),
    (2, "der hund und die katze"),
    (3, "el gato y los perros el"),
    (4, "de shi le de shi"),          # zh beats fr despite shared 'le'
    (5, ""),                           # empty -> every score 0 -> 'en'
    (6, "no stopwords at all xyz"),
    (7, "le la et der und die"),       # fr/de tie -> precedence fr
]


def _n_jobs(spark, fn):
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().nextJobId()
    out = fn()
    return out, sc._jsc.sc().dagScheduler().nextJobId() - before


def test_lang_id_sql_path_equals_column_path(spark):
    df = spark.createDataFrame(LANG_DOCS, "doc_id long, text string")
    got = df.select(
        "doc_id",
        lang_id("text").alias("by_name"),
        lang_id(F.col("text")).alias("by_col"),
    ).collect()
    assert all(r["by_name"] == r["by_col"] for r in got)
    by = {r["doc_id"]: r["by_name"] for r in got}
    assert by[0] == "en" and by[1] == "fr" and by[2] == "de"
    assert by[3] == "es" and by[4] == "zh"
    assert by[5] == "en" and by[6] == "en" and by[7] == "fr"


def test_keyword_hits_ascii_list_builds_with_zero_jobs(spark):
    """ASCII list terms derive the phrase lengths driver-side — the
    plan build must not run the lengths-probe Spark job any more."""
    df = spark.createDataFrame(
        [(0, "free money now"), (1, "clean doc")], "doc_id long, text string"
    )
    _, jobs = _n_jobs(spark, lambda: keyword_hits(df, ["Free Money", "spam"]))
    assert jobs == 0


def test_keyword_hits_nonascii_falls_back_and_matches(spark):
    """Non-ASCII terms keep the Spark-side lengths probe; both input
    forms (list vs DataFrame) must agree on a corpus that exercises
    unicode word splitting."""
    docs = [(0, "café au lait"), (1, "cafe au lait"), (2, "café-au lait")]
    terms = ["Café au", "lait"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    via_list = {
        (r["key"], r["term"]): r["n_occurrences"]
        for r in keyword_hits(df, terms).collect()
    }
    via_df = {
        (r["key"], r["term"]): r["n_occurrences"]
        for r in keyword_hits(df, tdf).collect()
    }
    assert via_list == via_df
    assert (0, "café au") in via_list and (2, "café au") in via_list


def test_validate_unique_rides_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "c"), (4, "d")],
        "id long, cat string",
    )
    base = [row_count(lo=1), not_null("cat"), in_range("id", 0, 10)]
    # warm the plan shapes once so codegen/AQE job-count is steady
    validate(df, base + [unique("id")])
    (report, ok), jobs_two = _n_jobs(
        spark, lambda: validate(df, base + [unique("id"), unique("cat")])
    )
    by = {r["check"]: r for r in report.collect()}
    assert by["unique(id)"]["passed"] is False
    assert "1 duplicate" in by["unique(id)"]["observed"]
    assert by["unique(cat)"]["passed"] is True  # NULL is not a dup
    assert ok is False
    # unique checks ride the shared agg pass: a SECOND unique check must
    # not add Spark jobs (the old code ran one extra count/countDistinct
    # job per unique check)
    _, jobs_one = _n_jobs(spark, lambda: validate(df, base + [unique("id")]))
    assert jobs_two == jobs_one
