"""WordPiece trainer vs a naive recount-from-scratch mirror on seeded
randomized corpora (the BPE-test style), BERT known-answer encoding,
greedy longest-match properties, and plan/NULL gates."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.wordpiece import (
    CONT,
    _merge_symbol,
    _wp_symbols,
    wordpiece_encode,
    wordpiece_fit,
    wordpiece_tokenize_word,
)


def naive_wp_merges(word_counts, num_merges, min_pair_count):
    """Recount every pair and symbol from scratch each merge — the
    obviously-correct O(table) reference for the incremental trainer."""
    words = [( _wp_symbols(w), c) for w, c in word_counts if w]
    products = []
    for _ in range(num_merges):
        pc, sc = Counter(), Counter()
        for syms, c in words:
            for s in syms:
                sc[s] += c
            for p in zip(syms, syms[1:]):
                pc[p] += c
        best = None
        for p, c in pc.items():
            if c < min_pair_count:
                continue
            if best is None:
                best = p
                continue
            lhs = c * sc[best[0]] * sc[best[1]]
            rhs = pc[best] * sc[p[0]] * sc[p[1]]
            if lhs > rhs or (lhs == rhs and p < best):
                best = p
        if best is None:
            break
        new = _merge_symbol(*best)
        products.append(new)
        nxt = []
        for syms, c in words:
            merged, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    merged.append(new)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            nxt.append((merged, c))
        words = nxt
    return products


def random_word_table(seed, n_words=40):
    rng = random.Random(seed)
    alpha = "abcde"
    table = {}
    for _ in range(n_words):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
        table[w] = table.get(w, 0) + rng.randint(1, 50)
    return sorted(table.items(), key=lambda kv: (-kv[1], kv[0]))


def test_incremental_trainer_matches_naive_recount():
    from ballista_spark.operators.wordpiece import _wp_merge_loop

    for seed in range(8):
        table = random_word_table(seed)
        for min_pc in (1, 2, 5):
            got = _wp_merge_loop(list(table), 30, min_pc)
            want = naive_wp_merges(list(table), 30, min_pc)
            assert got == want, f"seed={seed} min_pair_count={min_pc}"


def test_fit_on_spark_corpus_matches_naive(spark):
    rng = random.Random(4)
    vocab_words = ["data", "database", "dataset", "spark", "sparse", "par"]
    docs = [
        (i, " ".join(rng.choice(vocab_words) for _ in range(20)))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    model = wordpiece_fit(df, num_merges=15, min_count=1, min_pair_count=1)
    wc = Counter(w for _, t in docs for w in t.split())
    table = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    want_products = naive_wp_merges(table, 15, 1)
    got_tokens = [r.token for r in model.vocab.orderBy("token_id").collect()]
    assert got_tokens[0] == "[UNK]"
    assert got_tokens[-len(want_products):] == want_products


def test_known_answer_bert_style(spark):
    """The canonical BERT docstring example: un ##aff ##able."""
    vocab = {"un", "##aff", "##able", "[UNK]", "a"}
    assert wordpiece_tokenize_word("unaffable", vocab, "[UNK]", 100) == [
        "un", "##aff", "##able",
    ]
    # dead end mid-word -> [UNK] for the whole word
    assert wordpiece_tokenize_word("unaffordable", vocab, "[UNK]", 100) == ["[UNK]"]
    # over-length guard
    assert wordpiece_tokenize_word("a" * 101, vocab, "[UNK]", 100) == ["[UNK]"]


def test_greedy_longest_match_prefers_longer_prefix():
    vocab = {"d", "da", "dat", "##a", "##t", "##ta", "[UNK]"}
    assert wordpiece_tokenize_word("data", vocab, "[UNK]", 100) == ["dat", "##a"]


def test_encode_round_trip_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, "data data dataset spark"), (1, None), (2, "")],
        "doc_id long, text string",
    )
    model = wordpiece_fit(df, num_merges=10, min_count=1, min_pair_count=1)
    out = {r.doc_id: r.wp_tokens for r in wordpiece_encode(df, model).collect()}
    assert out[1] is None and out[2] == []
    # no [UNK] on in-vocab text; pieces reassemble to the words
    toks = out[0]
    assert "[UNK]" not in toks
    rebuilt = "".join(
        (t[len(CONT):] if t.startswith(CONT) else " " + t) for t in toks
    ).strip()
    assert rebuilt == "data data dataset spark"


def test_unseen_char_is_unk(spark):
    df = spark.createDataFrame([(0, "data")], "doc_id long, text string")
    model = wordpiece_fit(df, num_merges=5, min_count=1, min_pair_count=1)
    df2 = spark.createDataFrame([(0, "daXa qq")], "doc_id long, text string")
    [r] = wordpiece_encode(df2, model).collect()
    assert r.wp_tokens == ["[UNK]", "[UNK]"]


def test_encode_plan_is_arrow_map_only(spark):
    df = spark.createDataFrame([(0, "data")], "doc_id long, text string")
    model = wordpiece_fit(df, num_merges=5, min_count=1, min_pair_count=1)
    plan = (
        wordpiece_encode(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_model_roundtrip(spark, tmp_path):
    from ballista_spark.operators.model_io import load_model, save_model

    df = spark.createDataFrame(
        [(0, "data dataset spark sparse")], "doc_id long, text string"
    )
    model = wordpiece_fit(df, num_merges=8, min_count=1, min_pair_count=1)
    path = str(tmp_path / "wp_model")
    save_model(model, path)
    loaded = load_model(spark, path)
    assert (loaded.unk, loaded.lowercase, loaded.pattern,
            loaded.max_chars_per_word) == (
        model.unk, model.lowercase, model.pattern, model.max_chars_per_word)
    a = wordpiece_encode(df, model).collect()[0].wp_tokens
    b = wordpiece_encode(df, loaded).collect()[0].wp_tokens
    assert a == b
