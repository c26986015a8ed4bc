"""Corpus data-card report (operators/report.py): value checks against a
Python mirror on a constructed corpus, a DuckDB twin for the exact
metrics over the real documents table, and the one-shuffle plan gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.report import corpus_report
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def test_report_values_on_constructed_corpus(spark):
    rows = [
        # grp a: 3 docs, one exact dup pair, english-looking text
        (1, "a", "the cat sat on the mat of the house"),
        (2, "a", "the cat sat on the mat of the house"),
        (3, "a", "a quiet morning of soft light and long shadows"),
        # grp b: 1 doc
        (4, "b", "short doc here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    rep = {r["source"]: r for r in corpus_report(docs).collect()}

    a_tokens = [len(r[2].split()) for r in rows if r[1] == "a"]
    assert rep["a"]["n_docs"] == 3
    assert rep["a"]["n_tokens"] == sum(a_tokens)
    assert rep["a"]["n_chars"] == sum(len(r[2]) for r in rows if r[1] == "a")
    assert rep["a"]["exact_dup_frac"] == pytest.approx(1 - 2 / 3)
    assert rep["a"]["tokens_p50"] == pytest.approx(
        float(np.percentile(a_tokens, 50, method="linear"))
    )
    assert rep["a"]["tokens_max"] == max(a_tokens)
    assert rep["a"]["lang_en_frac"] == pytest.approx(1.0)
    assert rep["b"]["n_docs"] == 1
    assert rep["b"]["exact_dup_frac"] == 0.0


def test_report_contamination_column(spark):
    bench_text = "what is the capital of france paris is the capital"
    rows = [
        (1, "a", bench_text + " plus tail"),  # heavily contaminated
        (2, "a", "an unrelated sentence about rivers and winter mornings"),
        (3, "b", "zz"),  # shorter than the shingle width -> clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    bench = spark.createDataFrame([(9, bench_text)], "doc_id long, text string")
    rep = {
        r["source"]: r
        for r in corpus_report(docs, benchmark=bench).collect()
    }
    assert rep["a"]["contaminated_frac"] == pytest.approx(0.5)
    assert rep["b"]["contaminated_frac"] == 0.0


def test_report_exact_metrics_match_duckdb(spark, duck):
    got = corpus_report(load_table(spark, SF_SMOKE, "documents")).select(
        "source", "n_docs", "n_tokens", "n_chars", "tokens_max", "exact_dup_frac"
    )
    oracle = duck.sql(
        f"""
WITH t AS (
  SELECT source, text,
         LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
                         x -> LEN(x) > 0)) AS nt
  FROM read_parquet('{SF_SMOKE}/documents.parquet')
)
SELECT source, COUNT(*) AS n_docs,
       SUM(nt) AS n_tokens,
       SUM(LENGTH(text)) AS n_chars,
       MAX(nt) AS tokens_max,
       1.0 - COUNT(DISTINCT MD5(text)) * 1.0 / COUNT(*) AS exact_dup_frac
FROM t GROUP BY source ORDER BY source
"""
    ).fetchdf()
    mine = got.toPandas()
    assert len(mine) == len(oracle)
    for col in ("n_docs", "n_tokens", "n_chars", "tokens_max"):
        assert list(mine[col].astype(int)) == list(oracle[col].astype(int)), col
    assert np.allclose(mine["exact_dup_frac"], oracle["exact_dup_frac"])


def test_report_plan_is_one_aggregate_pass(spark):
    """Without a benchmark: no join anywhere; one aggregate over the scan
    (count_distinct expands to a two-phase aggregate, still no join)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = corpus_report(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan


# ------------------------- tokenizer_report -------------------------

def test_tokenizer_report_matches_duckdb_twin(spark, duck, tmp_path):
    """Whitespace-token arrays written to parquet, aggregates replayed
    exactly by DuckDB from the same file — fertility / bytes-per-token /
    vocab_used are pure arithmetic over identical inputs."""
    from ballista_spark.operators.report import tokenizer_report
    from ballista_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").withColumn(
        "toks", F.filter(F.split(F.trim("text"), "\\s+"), lambda t: F.length(t) > 0)
    )
    path = str(tmp_path / "tokdocs")
    docs.select("doc_id", "source", "text", "toks").write.mode(
        "overwrite"
    ).parquet(path)
    back = spark.read.parquet(path)
    got = [
        (
            r["source"], r["n_docs"], r["total_tokens"], r["total_words"],
            r["total_bytes"], round(r["fertility"], 9),
            round(r["bytes_per_token"], 9), r["vocab_used"],
        )
        for r in tokenizer_report(
            back, "toks", include_vocab=True
        ).collect()
    ]
    want = [
        tuple(
            round(v, 9) if isinstance(v, float) else v for v in row
        )
        for row in duck.execute(f"""
            WITH base AS (
              SELECT source, COUNT(*) AS n_docs,
                     SUM(LEN(toks)) AS total_tokens,
                     SUM(LEN(toks)) AS total_words,
                     SUM(STRLEN(text)) AS total_bytes
              FROM read_parquet('{path}/*.parquet') GROUP BY source
            ), voc AS (
              SELECT source, COUNT(DISTINCT t) AS vocab_used
              FROM read_parquet('{path}/*.parquet'), UNNEST(toks) AS u(t)
              GROUP BY source
            )
            SELECT base.source, n_docs, total_tokens, total_words,
                   total_bytes,
                   total_tokens / CAST(total_words AS DOUBLE) AS fertility,
                   total_bytes / CAST(total_tokens AS DOUBLE) AS bpt,
                   vocab_used
            FROM base JOIN voc USING (source) ORDER BY source
        """).fetchall()
    ]
    assert got == want


def test_tokenizer_report_null_arrays_and_plan(spark):
    from ballista_spark.operators.report import tokenizer_report

    df = spark.createDataFrame(
        [(0, "a", "one two", ["on", "e", "two"]),
         (1, "a", None, None),
         (2, "b", "x", ["x"])],
        "doc_id long, source string, text string, toks array<string>",
    )
    rows = {r["source"]: r for r in tokenizer_report(df, "toks").collect()}
    assert rows["a"]["n_docs"] == 2
    assert rows["a"]["total_tokens"] == 3      # NULL array counts 0
    assert rows["a"]["total_words"] == 2
    assert rows["b"]["fertility"] == 1.0
    plan = (
        tokenizer_report(df, "toks")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan            # no vocab -> single aggregation
    assert "PythonUDF" not in plan
