"""Banned-term screening (operators/text.py:keyword_hits /
filter_keyword_clean): join-based multi-term matching vs a plain-Python
mirror, word-boundary and normalization semantics.
"""

from __future__ import annotations

import re

import pytest

from ballista_spark.operators.text import filter_keyword_clean, keyword_hits

DOCS = [
    (0, "Totally clean text here."),
    (1, "Get FREE  money!! now"),
    (2, "freemoney is one word"),
    (3, "spam spam spam"),
    (4, "Buy free money and more free money."),
    (5, ""),
    (6, "Spam? free... MONEY"),  # both terms, punctuation-separated
]
TERMS = ["Free Money", "spam"]


def _mirror(docs, terms):
    """Independent n-gram scan in plain Python."""
    norm_terms = {
        " ".join(re.findall(r"[^\W_]+", t.lower(), re.UNICODE)) for t in terms
    } - {""}
    out = {}
    for key, text in docs:
        words = re.findall(r"[^\W_]+", text.lower(), re.UNICODE)
        for t in norm_terms:
            n = len(t.split(" "))
            c = sum(
                1
                for i in range(len(words) - n + 1)
                if " ".join(words[i : i + n]) == t
            )
            if c:
                out[(key, t)] = c
    return out


def test_hits_match_python_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["key"], r["term"]): r["n_occurrences"]
        for r in keyword_hits(df, TERMS).collect()
    }
    assert got == _mirror(DOCS, TERMS)


def test_word_boundaries_and_normalization(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["key"], r["term"]) for r in keyword_hits(df, TERMS).collect()
    }
    assert (1, "free money") in got  # case + double space + punctuation
    assert (6, "free money") in got  # phrase across '...' separators
    assert all(k != 2 for k, _t in got)  # never inside "freemoney"


def test_filter_clean_and_tolerance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    clean = sorted(
        r["doc_id"] for r in filter_keyword_clean(df, TERMS).collect()
    )
    assert clean == [0, 2, 5]
    tolerant = sorted(
        r["doc_id"]
        for r in filter_keyword_clean(df, TERMS, max_hits=2).collect()
    )
    # only 3 ("spam" x3) exceeds; 4 and 6 total exactly 2 hits each
    assert tolerant == [0, 1, 2, 4, 5, 6]


def test_terms_as_dataframe_and_empty_terms(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    tdf = spark.createDataFrame([(t,) for t in TERMS], "banned string")
    via_df = {
        (r["key"], r["term"]): r["n_occurrences"]
        for r in keyword_hits(df, tdf).collect()
    }
    assert via_df == _mirror(DOCS, TERMS)
    assert keyword_hits(df, []).count() == 0
    assert filter_keyword_clean(df, ["", "  !! "]).count() == len(DOCS)


def test_broadcast_join_plan(spark):
    """The term join must be a broadcast equi-join — no shuffle of the
    corpus-sized gram table onto the dimension side, no cartesian."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = keyword_hits(df, TERMS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
