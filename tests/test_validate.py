"""Data-contract validation (operators/validate.py): per-check
semantics against hand-computed values, DuckDB twins over the real
documents table, the one-aggregation plan shape for row-level checks,
and the enforce gate.
"""

from __future__ import annotations

import pytest

from ballista_spark.operators.validate import (
    ContractViolation,
    accepted_values,
    enforce,
    in_range,
    matches_regex,
    mean_between,
    not_null,
    referential,
    row_count,
    unique,
    validate,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "b", 2.0),
            (3, None, 3.0),
            (3, "a", None),   # duplicate id, NULL v
            (9, "zz", 100.0),
        ],
        "id long, cat string, v double",
    )


def test_row_level_checks(spark):
    df = _df(spark)
    report, ok = validate(
        df,
        [
            row_count(1, 10),
            not_null("cat", max_null_frac=0.25),   # 1/5 = 0.2 ok
            not_null("v"),                          # 1 null -> fail
            in_range("id", 1, 9),
            in_range("v", 0.0, 10.0),               # 100.0 violates
            accepted_values("cat", ["a", "b"], min_frac=0.75),  # 1/5 bad ok
            matches_regex("cat", "^[ab]$", min_frac=0.9),       # fail
            mean_between("id", 3.0, 4.0),           # mean=3.6 ok
        ],
    )
    by = {r["check"]: r for r in report.collect()}
    assert by["row_count[1,10]"]["passed"] is True
    assert by["not_null(cat)"]["passed"] is True
    assert by["not_null(v)"]["passed"] is False
    assert by["in_range(id)"]["passed"] is True
    assert by["in_range(v)"]["passed"] is False
    assert "1 violations" in by["in_range(v)"]["observed"]
    assert by["accepted_values(cat)"]["passed"] is True
    assert by["matches_regex(cat)"]["passed"] is False
    assert by["mean_between(id)"]["passed"] is True
    assert ok is False


def test_unique_and_referential(spark):
    df = _df(spark)
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    report, ok = validate(
        df,
        [unique("id"), unique("v"), referential("id", dim, "k")],
    )
    by = {r["check"]: r for r in report.collect()}
    assert by["unique(id)"]["passed"] is False  # id=3 twice
    assert "1 duplicate" in by["unique(id)"]["observed"]
    assert by["unique(v)"]["passed"] is True    # NULLs are not dups
    assert by["referential(id)"]["passed"] is False  # id=9 orphan
    assert "1 orphans" in by["referential(id)"]["observed"]
    assert ok is False


def test_frac_checks_measure_non_null_values(spark):
    """min_frac is over NON-NULL values (review finding: the original
    code divided by all rows, so NULL-heavy columns passed gates the
    docstring said they should fail)."""
    rows = [(i, None if i < 50 else ("ok" if i < 90 else "BAD"))
            for i in range(100)]
    df = spark.createDataFrame(rows, "id long, cat string")
    # 50 non-NULL, 10 bad -> ok fraction 40/50 = 0.80 < 0.85: FAIL
    report, ok = validate(df, [accepted_values("cat", ["ok"], min_frac=0.85)])
    assert ok is False
    assert "0.2" in report.collect()[0]["observed"]
    # all-NULL column: vacuously ok (pair with not_null for the budget)
    allnull = spark.createDataFrame([(1, None)], "id long, cat string")
    _, ok2 = validate(allnull, [matches_regex("cat", "x")])
    assert ok2 is True


def test_enforce_gate(spark):
    df = _df(spark)
    # passing contract returns the frame untouched
    out = enforce(df, [row_count(1), in_range("id", 0, 100)])
    assert out is df
    with pytest.raises(ContractViolation, match=r"not_null\(v\)"):
        enforce(df, [not_null("v")])


def test_duckdb_twin_on_documents(spark, duck):
    """The same contract computed by an independent engine on the real
    documents table — identical violation counts."""
    from ballista_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    report, _ = validate(
        docs,
        [
            not_null("text"),
            matches_regex("lang", "^[a-z]{2}$", min_frac=0.5),
            unique("doc_id"),
        ],
    )
    by = {r["check"]: r["observed"] for r in report.collect()}
    n, nulls, bad_lang, dups = duck.execute(
        """
        SELECT count(*),
               sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END),
               sum(CASE WHEN lang IS NOT NULL
                        AND NOT regexp_matches(lang, '^[a-z]{2}$')
                        THEN 1 ELSE 0 END),
               count(doc_id) - count(DISTINCT doc_id)
        FROM smoke.documents
        """
    ).fetchall()[0]
    assert f"{nulls or 0} nulls" in by["not_null(text)"]
    assert f"{bad_lang or 0} violations" in by["matches_regex(lang)"]
    assert f"{dups} duplicate" in by["unique(doc_id)"]


def test_row_level_checks_are_one_aggregation(spark):
    """All row-level checks ride ONE agg pass: the compiled expression
    list for N checks is a single-row aggregate (plan has exactly one
    pair of partial/final HashAggregates over one scan)."""
    from ballista_spark.operators.validate import _observed_exprs

    df = _df(spark)
    checks = [
        not_null("cat"), in_range("id", 0, 10),
        accepted_values("cat", ["a"]), matches_regex("cat", "a"),
        mean_between("v", 0, 10), row_count(1),
    ]
    agg = df.agg(*_observed_exprs(checks))
    plan = agg._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert plan.count("Scan") == 1
    assert "Exchange" in plan  # the single partial->final exchange
    assert plan.count("Exchange") == 1
