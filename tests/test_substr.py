"""Exact substring dedup (operators/substr.py): brute-force parity,
window-construction equivalence, stride semantics, strip edge cases,
and scale plan gates."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.substr import (
    _with_window_strings,
    duplicated_window_spans,
    strip_duplicated_spans,
    window_occurrences,
)

BOILER = "this license text is repeated verbatim in many documents exactly"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = [
        (1, "alpha beta gamma " + BOILER + " delta epsilon zeta eta theta"),
        (2, "one two three four " + BOILER + " five six seven eight nine ten"),
        (3, "unique prose with no repeats whatsoever in this entire doc body"),
        (4, BOILER + " " + BOILER),  # self-repeat within one doc
        (5, "short doc"),  # below every window width
        (6, "tail " + BOILER),  # duplicated span flush at end-of-doc
    ]
    return docs, spark.createDataFrame(docs, ["doc_id", "text"])


def _brute_spans(docs, w, min_count=2, stride=1):
    occ = []
    for k, t in docs:
        toks = t.strip().split(" ")
        for i in range(0, len(toks) - w + 1, stride):
            occ.append((k, i + 1, " ".join(toks[i : i + w])))
    cnt = collections.Counter(g for _, _, g in occ)
    canon = {}
    for k, p, g in sorted(occ):
        canon.setdefault(g, (k, p))
    rem = sorted(
        (k, p) for k, p, g in occ if cnt[g] >= min_count and canon[g] != (k, p)
    )
    spans = {}
    for k, p in rem:
        sp = spans.setdefault(k, [])
        if sp and p - sp[-1][0][-1] <= w:  # break when gap > w (start-to-start)
            sp[-1][0].append(p)
        else:
            sp.append([[p]])
    out = []
    for k, islands in spans.items():
        for isl in islands:
            ps = isl[0]
            out.append((k, ps[0], ps[-1] + w - 1, len(ps)))
    return sorted(out)


@pytest.mark.parametrize("w", [3, 5, 10])
def test_spans_match_brute_force(spark, corpus, w):
    docs, df = corpus
    got = sorted(tuple(r) for r in duplicated_window_spans(df, w=w).collect())
    assert got == _brute_spans(docs, w)


def test_strip_matches_brute_force(spark, corpus):
    w = 5
    docs, df = corpus
    spans = {}
    for k, s, e, _ in _brute_spans(docs, w):
        spans.setdefault(k, []).append((s, e))
    stripped = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens_removed"])
        for r in strip_duplicated_spans(df, w=w).collect()
    }
    for k, t in docs:
        toks = t.strip().split(" ")
        cover = set()
        for s, e in spans.get(k, []):
            cover.update(range(s, e + 1))
        expect = " ".join(tok for i, tok in enumerate(toks, 1) if i not in cover)
        assert stripped[k] == (expect, len(cover)), k
    # the canonical copy survives: doc 1 (globally-first boiler) unchanged
    assert stripped[1][1] == 0
    # the self-repeating doc 4 is fully removable (doc 1 holds the canon)
    assert stripped[4][0] == ""


def test_whole_passage_guarantee(spark, corpus):
    """A duplicated passage of length L >= w is covered end-to-end: doc 2's
    boiler occupies tokens 5..14 and the span is exactly that range."""
    _, df = corpus
    rows = {
        r["key"]: (r["span_start"], r["span_end"])
        for r in duplicated_window_spans(df, w=5).collect()
    }
    assert rows[2] == (5, 14)
    # doc 6: boiler at tokens 2..11, flush against end-of-doc
    assert rows[6] == (2, 11)


@pytest.mark.parametrize("w", [1, 2, 3, 5, 8, 13, 50])
def test_window_strings_doubling_equals_naive(spark, w):
    """The O(log w) doubling construction equals per-position joins for
    every decomposition shape (powers of two, w-1 forms, primes, the
    production default 50)."""
    text = " ".join(f"t{i}" for i in range(61))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    [got] = (
        _with_window_strings(df, "text", "doc_id", w, "ws").select("ws").collect()
    )
    toklist = text.split(" ")
    expect = [
        " ".join(toklist[i : i + w]) for i in range(len(toklist) - w + 1)
    ]
    assert got["ws"] == expect


def test_stride_samples_by_content_not_position(spark):
    """stride=s keeps windows by CONTENT hash (≡ 0 mod s), so both
    occurrences of a duplicated passage keep identical window subsets —
    including when their start offsets disagree mod s (the case a
    positional grid provably misses)."""
    long_dup = " ".join(f"d{i}" for i in range(20))
    docs = [
        (1, "x1 x2 x3 " + long_dup + " y1 y2"),  # passage starts at token 4
        (2, "z1 " + long_dup + " z2 z3 z4 z5"),  # ...and at token 2: offsets
    ]                                            # differ mod 2
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    full = window_occurrences(df, w=8)
    sampled = window_occurrences(df, w=8, stride=2)
    n_full, n_sampled = full.count(), sampled.count()
    assert 0 < n_sampled < n_full  # genuine thinning
    # content-consistent selection: the set of KEPT passage-window hashes
    # is identical across the two occurrences
    kept = sampled.groupBy("gh").count().where("count >= 2")
    assert kept.count() > 0
    spans = duplicated_window_spans(df, w=8, stride=2).collect()
    assert any(r["key"] == 2 for r in spans)  # misaligned copy still caught


def test_short_docs_pass_through(spark, corpus):
    _, df = corpus
    out = strip_duplicated_spans(df, w=50)  # longer than every doc
    assert out.where(F.col("n_tokens_removed") != 0).count() == 0
    assert out.where(F.col("text_dedup") != F.col("text")).count() == 0


def test_min_count_threshold(spark):
    """min_count=3 ignores windows occurring only twice."""
    docs = [(1, "a b c d e f"), (2, "a b c d e f"), (3, "p q r s t u")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert duplicated_window_spans(df, w=4, min_count=3).count() == 0
    # and with a third copy the later two become removable
    df3 = spark.createDataFrame(docs + [(4, "a b c d e f")], ["doc_id", "text"])
    got = sorted(r["key"] for r in duplicated_window_spans(df3, w=4, min_count=3).collect())
    assert got == [2, 4]


def test_substr_plan_is_scale_safe(spark, corpus):
    """No cartesian, no broadcast-nested-loop, and no corpus-side broadcast
    anywhere in the strip plan — every stage is a keyed shuffle."""
    _, df = corpus
    plan = strip_duplicated_spans(df, w=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spans_no_window_over_hash_and_shared_exchange(spark, corpus):
    """The per-hash count/canonical must NOT be a Window.partitionBy(gh)
    (WindowExec buffers its whole partition — a corpus-wide boilerplate
    hash becomes an unbounded single-task memory hot spot) but a
    groupBy + join-back whose two consumers share ONE exchange of the
    occurrence stream (AQE ReusedExchange), so the tokenize+md5 window
    hashing and the corpus-token-sized shuffle each execute once."""
    _, df = corpus
    spans = duplicated_window_spans(df, w=5)
    spans.collect()  # AQE reuse is only visible in the final plan
    plan = spans._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the only Windows allowed are the per-doc island merge (key-keyed)
    for line in final.splitlines():
        if "Window [" in line:
            assert "[key#" in line.split("windowspecdefinition")[-1] or "[key#" in line, line
            assert "gh#" not in line
    assert "ReusedExchange" in final


def test_stride_bridge_merges_sampled_gaps(spark):
    """With stride sampling, consecutive sampled windows of one passage
    have gaps ~stride; the bridge tolerance keeps them in one span
    instead of splitting the passage (bridge=0 reproduces the split)."""
    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(5000)}" for _ in range(400)]
    passage = " ".join(words[:120])
    docs = [
        (1, passage + " " + " ".join(f"a{i}" for i in range(60))),
        (2, " ".join(f"b{i}" for i in range(60)) + " " + passage),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    stride = 4
    bridged = duplicated_window_spans(df, w=10, stride=stride).collect()
    split = duplicated_window_spans(df, w=10, stride=stride, bridge=0).collect()
    # same removable windows, fewer-or-equal islands with bridging
    assert sum(r["n_windows"] for r in bridged) == sum(r["n_windows"] for r in split)
    assert len(bridged) <= len(split)
    # doc 2's duplicated passage must be detected at all (content sampling)
    assert any(r["key"] == 2 for r in bridged)
