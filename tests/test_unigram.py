"""Unigram-LM tokenizer (Kudo 2018): the lattice math is verified
against brute-force enumeration over ALL segmentations (driver-free),
then the Spark-side fit/encode path gets behavioral, determinism,
persistence and plan checks."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.unigram import (
    UNK_LOGP,
    _expected_counts,
    _viterbi,
    unigram_encode,
    unigram_fit,
)


# ---- brute-force reference: enumerate every segmentation of a word ----

def _all_segmentations(word, logp, max_len, unk):
    """Yield (pieces, score, known_flags) for every full segmentation,
    where unknown single chars are allowed at `unk` and flagged False."""
    n = len(word)
    out = []

    def rec(i, pieces, score, flags):
        if i == n:
            out.append((tuple(pieces), score, tuple(flags)))
            return
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = word[i:j]
            if p in logp:
                rec(j, pieces + [p], score + logp[p], flags + [True])
            elif j == i + 1 and word[i] not in logp:
                rec(j, pieces + [p], score + unk, flags + [False])

    rec(0, [], 0.0, [])
    return out


def _brute_expected(word, weight, logp, max_len, unk):
    segs = _all_segmentations(word, logp, max_len, unk)
    if not segs:
        return {}
    m = max(s for _, s, _ in segs)
    zs = [math.exp(s - m) for _, s, _ in segs]
    total = sum(zs)
    exp: dict = {}
    for (pieces, _, flags), z in zip(segs, zs):
        for p, known in zip(pieces, flags):
            if known:
                exp[p] = exp.get(p, 0.0) + weight * z / total
    return exp


def _random_logp(seed, alphabet="abc", max_len=3):
    rng = random.Random(seed)
    pieces = {c for c in alphabet}
    for _ in range(rng.randint(2, 10)):
        pieces.add(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(2, max_len)))
        )
    # drop a random single char sometimes -> exercises the unk path
    if rng.random() < 0.4:
        pieces.discard(rng.choice(alphabet))
    return {p: rng.uniform(-5.0, -0.5) for p in pieces}


def test_expected_counts_match_brute_force_enumeration():
    """Forward-backward posteriors == enumeration over all segmentations
    (the E-step is exact math; any lattice indexing bug shows here)."""
    for seed in range(30):
        rng = random.Random(seed)
        logp = _random_logp(seed)
        word = "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
        got = _expected_counts(word, 2.5, logp, 3, UNK_LOGP)
        want = _brute_expected(word, 2.5, logp, 3, UNK_LOGP)
        assert set(got) == set(want), (seed, word)
        for p in want:
            assert got[p] == pytest.approx(want[p], rel=1e-9), (seed, word, p)


def test_viterbi_is_argmax_over_enumeration():
    """Viterbi == the enumeration's best segmentation under the exact
    tie-break (max score, then fewest pieces, then lexicographic)."""
    for seed in range(30):
        rng = random.Random(100 + seed)
        logp = _random_logp(seed)
        word = "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
        segs = _all_segmentations(word, logp, 3, UNK_LOGP)
        want = min(segs, key=lambda s: (-s[1], len(s[0]), s[0]))[0]
        assert tuple(_viterbi(word, logp, 3, UNK_LOGP)) == want, (seed, word)


def test_viterbi_prefers_probable_multichar_pieces():
    logp = {"a": -3.0, "b": -3.0, "ab": -1.0, "abab": -1.5}
    assert _viterbi("abab", logp, 4, UNK_LOGP) == ["abab"]
    assert _viterbi("ababa", logp, 4, UNK_LOGP) == ["abab", "a"]


# ------------------------- Spark-side behavior -------------------------

def _corpus(spark):
    texts = [
        "internationalization international nation nationally",
        "the nation listens to international news",
        "nationally the internationalization goes international",
    ] * 5
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_fit_learns_frequent_substrings_and_compresses(spark):
    df = _corpus(spark)
    model = unigram_fit(df, vocab_size=60, min_count=1)
    pieces = {r["piece"] for r in model.pieces.collect()}
    assert "nation" in pieces  # the corpus's dominant morpheme
    out = unigram_encode(df, model).select("text", "unigram_tokens").collect()
    for r in out:
        joined = "".join(r["unigram_tokens"])
        assert joined == r["text"].lower().replace(" ", "")
        # compresses well below character-level
        assert len(r["unigram_tokens"]) < len(joined) / 2


def test_fit_is_deterministic_across_partitionings(spark):
    df = _corpus(spark)
    a = unigram_fit(df, vocab_size=40, min_count=1).pieces.collect()
    b = unigram_fit(
        df.repartition(7), vocab_size=40, min_count=1
    ).pieces.collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_vocab_size_respected_and_chars_kept(spark):
    df = _corpus(spark)
    model = unigram_fit(df, vocab_size=30, min_count=1)
    rows = model.pieces.collect()
    assert len(rows) <= 30 + 5  # chars always kept even if budget is tight
    chars = {r["piece"] for r in rows if len(r["piece"]) == 1}
    corpus_chars = set("".join(t for _, t in _corpus(spark).collect()).lower())
    corpus_chars -= {" "}
    assert corpus_chars <= chars


def test_null_and_oov(spark):
    df = spark.createDataFrame(
        [(0, "nation"), (1, None), (2, "ΩΩ nation")],
        "doc_id long, text string",
    )
    model = unigram_fit(
        df.where(F.col("text").isNotNull()), vocab_size=30, min_count=1
    )
    out = {
        r["doc_id"]: r["unigram_tokens"]
        for r in unigram_encode(df, model).collect()
    }
    assert out[1] is None
    assert "".join(out[2]) == "ωωnation"  # unk chars survive as singles


def test_model_io_roundtrip(spark, tmp_path):
    from ballista_spark.operators.model_io import load_model, save_model

    df = _corpus(spark)
    model = unigram_fit(df, vocab_size=40, min_count=1)
    path = str(tmp_path / "unigram_model")
    save_model(model, path)
    loaded = load_model(spark, path)
    assert loaded.unk_logp == model.unk_logp
    a = unigram_encode(df, model).select("doc_id", "unigram_tokens").collect()
    b = unigram_encode(df, loaded).select("doc_id", "unigram_tokens").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_encode_plan_is_map_only(spark):
    df = _corpus(spark)
    model = unigram_fit(df, vocab_size=40, min_count=1)
    plan = (
        unigram_encode(df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_encode_ids_deterministic_and_oov(spark):
    from ballista_spark.operators.unigram import unigram_encode_ids

    df = _corpus(spark)
    model = unigram_fit(df, vocab_size=40, min_count=1)
    n_vocab = model.pieces.count()
    out = unigram_encode_ids(df, model).collect()
    ids = [i for r in out for i in r["token_ids"]]
    assert ids and all(0 <= i < n_vocab for i in ids)
    oov = spark.createDataFrame([(0, "ΩΩ")], ["doc_id", "text"])
    assert unigram_encode_ids(oov, model).collect()[0]["token_ids"] == [-1, -1]
