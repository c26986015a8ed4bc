"""Unicode normalization UDFs: known-answer literals (independent of the
implementation library), NULL handling, Arrow (not row-at-a-time) plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.unicodeops import (
    nfkc_normalize,
    strip_accents,
    unicode_normalize,
)

#: (input, NFKC expected) — known answers from the Unicode standard, not
#: recomputed via unicodedata (that would test the library against itself)
NFKC_KNOWN = [
    ("ﬁre", "fire"),  # ﬁ ligature → fi
    ("ＡBC", "ABC"),  # full-width Ａ → A
    ("①", "1"),  # circled one → 1
    ("é", "é"),  # e + combining acute → é (composition)
    ("é", "é"),  # composed é stays
    ("⁵", "5"),  # superscript five → 5
    ("½", "1⁄2"),  # ½ → 1⁄2 (fraction slash)
    ("plain ascii", "plain ascii"),
    ("", ""),
]

ACCENT_KNOWN = [
    ("été", "ete"),  # été → ete
    ("ñ", "n"),  # n + combining tilde → n
    ("ñ", "n"),  # precomposed ñ → n
    ("straße", "straße"),  # ß is not a combining mark — kept
    ("中文", "中文"),  # CJK unchanged
    ("", ""),
]


def test_nfkc_known_answers(spark):
    df = spark.createDataFrame([(s,) for s, _ in NFKC_KNOWN], "t string")
    got = [r.c for r in df.select(nfkc_normalize("t").alias("c")).collect()]
    assert got == [want for _, want in NFKC_KNOWN]


def test_strip_accents_known_answers(spark):
    df = spark.createDataFrame([(s,) for s, _ in ACCENT_KNOWN], "t string")
    got = [r.c for r in df.select(strip_accents("t").alias("c")).collect()]
    assert got == [want for _, want in ACCENT_KNOWN]


def test_nulls_pass_through(spark):
    df = spark.createDataFrame([(None,), ("x",)], "t string")
    rows = df.select(
        nfkc_normalize("t").alias("a"), strip_accents("t").alias("b")
    ).collect()
    assert (rows[0].a, rows[0].b) == (None, None)
    assert (rows[1].a, rows[1].b) == ("x", "x")


def test_invalid_form_rejected():
    with pytest.raises(ValueError, match="form must be"):
        unicode_normalize("t", form="NFX")


def test_nfd_decomposes(spark):
    df = spark.createDataFrame([("é",)], "t string")
    [r] = df.select(unicode_normalize("t", "NFD").alias("c")).collect()
    assert r.c == "é"


def test_plan_is_arrow_not_row_python(spark):
    df = spark.createDataFrame([("x",)], "t string")
    plan = (
        df.select(nfkc_normalize("t").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_tokenizer_prep_composition(spark):
    """The documented use: normalize before a vocabulary fit so
    compatibility variants merge into one word key."""
    df = spark.createDataFrame(
        [(1, "ﬁre ＦIRE"), (2, "fire FIRE")], "doc_id long, text string"
    )
    norm = df.select(
        "doc_id", F.lower(nfkc_normalize("text")).alias("text")
    )
    words = (
        norm.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    assert {(r.w, r["count"]) for r in words} == {("fire", 4)}


def test_strip_accents_does_not_recompose(spark):
    """BERT's _run_strip_accents returns the NFD remainder WITHOUT NFC
    recomposition: a Hangul syllable stays decomposed Jamo (category Lo,
    untouched by the Mn filter) — recomposing would mismatch tokens
    against a vocab built with the reference tokenizer."""
    import unicodedata

    from ballista_spark.operators.unicodeops import strip_accents

    han = "한"  # HANGUL SYLLABLE HAN
    df = spark.createDataFrame([(han,)], "text string")
    [r] = df.select(strip_accents("text").alias("s")).collect()
    want = "".join(
        c
        for c in unicodedata.normalize("NFD", han)
        if unicodedata.category(c) != "Mn"
    )
    assert r["s"] == want            # decomposed Jamo
    assert r["s"] != han             # NOT recomposed
    assert len(r["s"]) == 3
