"""Line-level boilerplate removal (operators.text.remove_boilerplate):
DuckDB twin, edge cases, partitioning invariance, plan shape.

The driver's synthetic documents have no line structure, so these tests
synthesize a multi-line corpus; the operator itself is delimiter-generic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ballista_spark.operators.text import remove_boilerplate, span_doc_frequencies

BANNER = "ACCEPT COOKIES TO CONTINUE"
FOOTER = "(c) example.com all rights reserved"

DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            f"{BANNER}\nunique zero\n{FOOTER}",
            f"{BANNER}\nunique one line a\nunique one line b\n{FOOTER}",
            f"{BANNER}\n{FOOTER}",  # all boilerplate
            "only unique text here",
            f"repeated within\nrepeated within\n{FOOTER}",  # in-doc repeat
            "",  # empty document
        ],
        "source": ["s0", "s0", "s1", "s1", "s2", "s2"],
    }
)

_TWIN = """
WITH parts AS (
  SELECT doc_id, source, g.i AS pos, l[g.i] AS span
  FROM (SELECT doc_id, source, STRING_SPLIT(text, CHR(10)) AS l FROM docs),
       UNNEST(GENERATE_SERIES(1, LEN(l))) AS g(i)
  WHERE TRIM(l[g.i]) <> ''
), freq AS (
  SELECT span FROM (
    SELECT span, COUNT(DISTINCT doc_id) AS n_docs FROM parts GROUP BY span
  ) WHERE n_docs >= 3
), kept AS (
  SELECT doc_id, STRING_AGG(span, CHR(10) ORDER BY pos) AS text,
         COUNT(*) AS n_kept
  FROM parts ANTI JOIN freq USING (span)
  GROUP BY doc_id
), totals AS (
  SELECT doc_id, source, COUNT(pos) AS n_spans
  FROM (SELECT doc_id, source FROM docs) d
  LEFT JOIN parts USING (doc_id, source)
  GROUP BY doc_id, source
)
SELECT t.doc_id, COALESCE(k.text, '') AS text, t.source,
       CAST(t.n_spans AS BIGINT) AS n_spans,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM totals t LEFT JOIN kept k USING (doc_id)
ORDER BY t.doc_id
"""


def _spark_docs(spark, n_parts=1):
    df = spark.createDataFrame(DOCS)
    return df.repartition(n_parts, "doc_id") if n_parts > 1 else df


def test_matches_duckdb_twin(spark, duck):
    from tests.conftest import assert_frames_match

    out = remove_boilerplate(_spark_docs(spark), max_docs=3).orderBy("doc_id")
    duck.register("docs", DOCS)
    try:
        assert_frames_match(out, duck.sql(_TWIN))
    finally:
        duck.unregister("docs")


def test_semantics_explicit(spark):
    rows = {
        r["doc_id"]: r
        for r in remove_boilerplate(_spark_docs(spark), max_docs=3).collect()
    }
    # banner (3 docs) stripped; footer (4 docs) stripped; unique lines kept
    assert rows[0]["text"] == "unique zero"
    assert rows[1]["text"] == "unique one line a\nunique one line b"
    # all-boilerplate doc -> empty text, counters reveal it
    assert rows[2]["text"] == "" and rows[2]["n_spans"] == 2 and rows[2]["n_kept"] == 0
    assert rows[3]["text"] == "only unique text here"
    # a span repeated only WITHIN one doc is not boilerplate (df counted once)
    assert rows[4]["text"] == "repeated within\nrepeated within"
    assert rows[5]["text"] == "" and rows[5]["n_spans"] == 0
    # non-key columns ride through
    assert rows[4]["source"] == "s2"


def test_partitioning_invariant(spark):
    a = sorted(
        map(tuple, remove_boilerplate(_spark_docs(spark), max_docs=3).collect())
    )
    b = sorted(
        map(tuple, remove_boilerplate(_spark_docs(spark, 5), max_docs=3).collect())
    )
    assert a == b


def test_span_frequencies_count_documents_not_occurrences(spark):
    freq = {
        r["span"]: r["n_docs"]
        for r in span_doc_frequencies(_spark_docs(spark)).collect()
    }
    assert freq[BANNER] == 3 and freq[FOOTER] == 4
    assert freq["repeated within"] == 1  # within-doc repeat counted once


def test_plan_stays_jvm_side(spark):
    plan = remove_boilerplate(_spark_docs(spark), max_docs=3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # the span set must not arrive via a nested-loop broadcast
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dedup_lines_within_document(spark, duck):
    """Within-doc line dedup keeps first occurrences in order, preserves
    empty lines, and matches a DuckDB single-pass replay."""
    from ballista_spark.operators.text import dedup_lines_within

    rows = [
        (1, "a\nb\na\nc\nb\nd"),
        (2, "x\n\nx\n\ny"),      # empties preserved, dup x dropped
        (3, "only one line"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t2"]
        for r in df.select("doc_id", dedup_lines_within("text").alias("t2")).collect()
    }
    assert got[1] == "a\nb\nc\nd"
    assert got[2] == "x\n\n\ny"
    assert got[3] == "only one line"
    assert got[4] == ""

    oracle = {
        k: v
        for k, v in duck.execute(
            """
WITH t(doc_id, text) AS (VALUES (1, 'a' || chr(10) || 'b' || chr(10) || 'a' || chr(10) || 'c' || chr(10) || 'b' || chr(10) || 'd'),
                               (2, 'x' || chr(10) || chr(10) || 'x' || chr(10) || chr(10) || 'y')),
s AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, chr(10))) AS sp,
             GENERATE_SUBSCRIPTS(STRING_SPLIT(text, chr(10)), 1) AS i FROM t),
f AS (SELECT doc_id, sp, i,
             ROW_NUMBER() OVER (PARTITION BY doc_id, sp ORDER BY i) AS rn
      FROM s)
SELECT doc_id, STRING_AGG(sp, chr(10) ORDER BY i) FROM f
WHERE TRIM(sp) = '' OR rn = 1 GROUP BY doc_id
"""
        ).fetchall()
    }
    assert got[1] == oracle[1] and got[2] == oracle[2]


def test_dedup_lines_within_regex_delim_and_null(spark):
    """A regex-metacharacter delimiter is treated literally, and NULL text
    stays NULL (not '')."""
    from ballista_spark.operators.text import dedup_lines_within

    df = spark.createDataFrame(
        [(1, "a.b.a.c"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["t2"]
        for r in df.select(
            "doc_id", dedup_lines_within("text", delim=".").alias("t2")
        ).collect()
    }
    assert got[1] == "a.b.c"
    assert got[2] is None


def test_normalize_for_dedup_canonicalizes_variants(spark, duck):
    """Case/punctuation/whitespace variants of the same passage normalize
    to one canonical form (and so dedup together); DuckDB replays it."""
    from ballista_spark.operators.dedup import exact_dedup
    from ballista_spark.operators.text import normalize_for_dedup

    rows = [
        (1, "The Cat sat, on the MAT!"),
        (2, "the   cat sat on\tthe mat"),
        (3, "a genuinely different document"),
        (4, "你好，世界！这是中文。"),
        (5, "Привет, мир! Это кириллица."),
        (6, "Él añadió: «café» über straße"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "norm", normalize_for_dedup("text")
    )
    got = {r["doc_id"]: r["norm"] for r in df.collect()}
    assert got[1] == got[2] == "the cat sat on the mat"
    # Unicode survival: non-Latin text must NOT normalize to empty (the
    # ASCII-only strip regression would dedup all non-Latin docs together)
    assert got[4] == "你好 世界 这是中文"
    assert got[5] == "привет мир это кириллица"
    assert got[6] == "él añadió café über straße"

    dd = exact_dedup(df, text_col="norm")
    canon = {r["doc_id"]: r["is_canonical"] for r in dd.collect()}
    assert canon == {1: True, 2: False, 3: True, 4: True, 5: True, 6: True}

    oracle = duck.execute(
        """
        SELECT TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(t), '[^\\p{L}\\p{N}\\s]', ' ', 'g'),
                                   '\\s+', ' ', 'g'))
        FROM (VALUES ('The Cat sat, on the MAT!')) v(t)
        """
    ).fetchone()[0]
    assert oracle == got[1]
    oracle_cjk = duck.execute(
        """
        SELECT TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(t), '[^\\p{L}\\p{N}\\s]', ' ', 'g'),
                                   '\\s+', ' ', 'g'))
        FROM (VALUES ('你好，世界！这是中文。')) v(t)
        """
    ).fetchone()[0]
    assert oracle_cjk == got[4]


# ---------------------------------------------------------------------------
# corpus-wide span dedup (keep-first semantics)

SYND = "syndicated paragraph appearing everywhere"

DOCS2 = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            f"{SYND}\nunique zero",
            f"intro one\n{SYND}",
            f"{SYND}",                        # nothing survives (non-canonical)
            "self repeat\nself repeat\ntail",  # within-doc dedup vs itself
            "wholly unique document",
        ],
        "source": ["s0", "s0", "s1", "s1", "s2"],
    }
)

_DEDUP_TWIN = """
WITH parts AS (
  SELECT doc_id, source, g.i AS pos, l[g.i] AS span
  FROM (SELECT doc_id, source, STRING_SPLIT(text, CHR(10)) AS l FROM docs),
       UNNEST(GENERATE_SERIES(1, LEN(l))) AS g(i)
  WHERE TRIM(l[g.i]) <> ''
), f AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY span) AS cnt
  FROM parts
), kept AS (
  SELECT doc_id, STRING_AGG(span, CHR(10) ORDER BY pos) AS text,
         COUNT(*) AS n_kept
  FROM f WHERE cnt < 2 OR rn = 1 GROUP BY doc_id
), totals AS (
  SELECT doc_id, source, COUNT(pos) AS n_spans
  FROM (SELECT doc_id, source FROM docs) d
  LEFT JOIN parts USING (doc_id, source)
  GROUP BY doc_id, source
)
SELECT t.doc_id, COALESCE(k.text, '') AS text, t.source,
       CAST(t.n_spans AS BIGINT) AS n_spans,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM totals t LEFT JOIN kept k USING (doc_id)
ORDER BY t.doc_id
"""


def test_span_dedup_matches_duckdb_twin(spark, duck):
    from tests.conftest import assert_frames_match

    from ballista_spark.operators.text import dedup_spans_corpus

    out = dedup_spans_corpus(spark.createDataFrame(DOCS2)).orderBy("doc_id")
    duck.register("docs", DOCS2)
    try:
        assert_frames_match(out, duck.sql(_DEDUP_TWIN))
    finally:
        duck.unregister("docs")


def test_span_dedup_keep_first_semantics(spark):
    from ballista_spark.operators.text import dedup_spans_corpus

    rows = {
        r["doc_id"]: r
        for r in dedup_spans_corpus(spark.createDataFrame(DOCS2)).collect()
    }
    # globally-first occurrence (doc 0) keeps the syndicated paragraph
    assert rows[0]["text"] == f"{SYND}\nunique zero"
    assert rows[1]["text"] == "intro one"
    assert rows[2]["text"] == "" and rows[2]["n_spans"] == 1 and rows[2]["n_kept"] == 0
    # within-document repeats deduplicate against themselves (first kept)
    assert rows[3]["text"] == "self repeat\ntail"
    assert rows[4]["text"] == "wholly unique document"
    assert rows[4]["source"] == "s2"


def test_span_dedup_min_count_threshold(spark):
    """min_count=3: a span with only two occurrences is left alone."""
    from ballista_spark.operators.text import dedup_spans_corpus

    rows = {
        r["doc_id"]: r["text"]
        for r in dedup_spans_corpus(
            spark.createDataFrame(DOCS2), min_count=3
        ).collect()
    }
    # SYND occurs 3x -> still deduped; "self repeat" occurs 2x -> kept both
    assert rows[1] == "intro one" and rows[2] == ""
    assert rows[3] == "self repeat\nself repeat\ntail"


def test_span_dedup_partitioning_invariant(spark):
    from ballista_spark.operators.text import dedup_spans_corpus

    df = spark.createDataFrame(DOCS2)
    a = sorted(map(tuple, dedup_spans_corpus(df).collect()))
    b = sorted(
        map(tuple, dedup_spans_corpus(df.repartition(7, "doc_id")).collect())
    )
    assert a == b


def test_span_dedup_plan_stays_jvm_side(spark):
    from ballista_spark.operators.text import dedup_spans_corpus

    plan = (
        dedup_spans_corpus(spark.createDataFrame(DOCS2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # canonical-first must come from a hash aggregate, not a span Window
    assert "Window" not in plan, plan


# --- sentence segmentation -------------------------------------------


def test_split_sentences_basic(spark):
    from ballista_spark.operators.text import split_sentences

    df = spark.createDataFrame(
        [(1, "First sentence. Second one! Is this third? Yes.")],
        "doc_id long, text string",
    )
    got = [r["sentence"] for r in split_sentences(df).orderBy("sentence_id").collect()]
    assert got == ["First sentence.", "Second one!", "Is this third?", "Yes."]


def test_split_sentences_guards(spark):
    from ballista_spark.operators.text import split_sentences

    cases = {
        1: "Dr. Smith saw Mr. Jones. They met at 3.14 Main St. in town.",
        2: 'He said "Stop!" Then left.',
        3: "See Fig. 2 for details. The plot thickens.",
        4: "J. R. Tolkien wrote it. Everyone read it.",
        5: "",
        6: "   ",
    }
    df = spark.createDataFrame(list(cases.items()), "doc_id long, text string")
    got = {}
    for r in split_sentences(df).collect():
        got.setdefault(r["key"], []).append((r["sentence_id"], r["sentence"]))
    s1 = [s for _, s in sorted(got[1])]
    assert s1 == [
        "Dr. Smith saw Mr. Jones.",
        "They met at 3.14 Main St. in town.",
    ]
    s2 = [s for _, s in sorted(got[2])]
    assert s2 == ['He said "Stop!"', "Then left."]
    s3 = [s for _, s in sorted(got[3])]
    assert s3 == ["See Fig. 2 for details.", "The plot thickens."]
    s4 = [s for _, s in sorted(got[4])]
    assert s4 == ["J. R. Tolkien wrote it.", "Everyone read it."]
    assert 5 not in got and 6 not in got


def test_split_sentences_plan_map_only(spark):
    from ballista_spark.operators.text import split_sentences

    df = spark.createDataFrame([(1, "A. B.")], "doc_id long, text string")
    plan = split_sentences(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
