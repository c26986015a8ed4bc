"""BPE trainer/encoder: mirror-exact vs an independent plain-Python
Sennrich implementation, known-answer merges on the classic example,
encode/decode roundtrip, determinism, persistence, and the map-only
plan gate for encode."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.bpe import (
    EOW,
    bpe_decode,
    bpe_encode,
    bpe_encode_ids,
    bpe_fit,
)
from ballista_spark.operators.text import BPE_TOKEN_PATTERN


# --- independent reference implementation (recount-from-scratch each
# iteration — deliberately the naive textbook form, NOT the incremental
# index the engine uses, so a bookkeeping bug in either cannot hide) ---

def _ref_merges(word_counts: dict[str, int], num_merges: int,
                min_pair_count: int = 2) -> list[tuple[str, str]]:
    vocab = {tuple(w) + (EOW,): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        best = None
        for p, c in pairs.items():
            if c < min_pair_count:
                continue
            if best is None or c > pairs[best] or (c == pairs[best] and p < best):
                best = p
        if best is None:
            break
        merges.append(best)
        new = best[0] + best[1]
        nv = {}
        for syms, c in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(new)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def _corpus(spark):
    texts = [
        "the lower river flows lower and lower still",
        "newest widest lowest newest",
        "low low low low low lower newest",
        "the widest river is the newest river",
        "Numbers 123 123 and punctuation!! stay, separate 123",
    ] * 3
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 ["doc_id", "text"])


def _ref_word_counts(texts, lowercase=True):
    rx = re.compile(BPE_TOKEN_PATTERN)
    c: Counter = Counter()
    for t in texts:
        c.update(rx.findall(t.lower() if lowercase else t))
    return dict(c)


def test_fit_matches_independent_reference(spark):
    df = _corpus(spark)
    model = bpe_fit(df, num_merges=60, min_count=1)
    got = [(r["left"], r["right"])
           for r in model.merges.orderBy("rank").collect()]
    texts = [r["text"] for r in df.collect()]
    want = _ref_merges(_ref_word_counts(texts), 60, min_pair_count=2)
    assert got == want
    assert len(got) > 10  # the corpus genuinely supports many merges


def test_known_answer_classic_example(spark):
    """Sennrich's canonical word table: first merges must pick the
    highest-frequency pairs with the lexicographic tie-break."""
    rows = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(i, w) for i, w in enumerate(rows)],
                               ["doc_id", "text"])
    model = bpe_fit(df, num_merges=4, min_count=1)
    got = [(r["left"], r["right"])
           for r in model.merges.orderBy("rank").collect()]
    # e+s (freq 9) first, then es+t (9), then est+</w> (9), then l+o (7)
    assert got == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]


def test_encode_roundtrip_and_word_boundaries(spark):
    df = _corpus(spark)
    model = bpe_fit(df, num_merges=40, min_count=1)
    rows = bpe_encode(df, model).select("text", "bpe_tokens").collect()
    rx = re.compile(BPE_TOKEN_PATTERN)
    for r in rows:
        toks = r["bpe_tokens"]
        # every word ends at an EOW boundary and decodes back exactly
        assert bpe_decode(toks) == " ".join(rx.findall(r["text"].lower()))
        assert "".join(toks).count(EOW) == len(rx.findall(r["text"].lower()))


def test_encode_ids_cover_vocab_and_oov(spark):
    df = _corpus(spark)
    model = bpe_fit(df, num_merges=30, min_count=1)
    out = bpe_encode_ids(df, model).collect()
    n_vocab = model.vocab.count()
    ids = [i for r in out for i in r["token_ids"]]
    assert ids and all(0 <= i < n_vocab for i in ids)
    # a character never seen in training -> oov id
    oov_df = spark.createDataFrame([(0, "zebra ZEBRA ΩΩΩ")], ["doc_id", "text"])
    oov = bpe_encode_ids(oov_df, model).collect()[0]["token_ids"]
    assert -1 in oov


def test_null_text_preserved(spark):
    df = spark.createDataFrame([(0, "low low"), (1, None)],
                               "doc_id long, text string")
    model = bpe_fit(df.where(F.col("text").isNotNull()), num_merges=5,
                    min_count=1)
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, model).collect()}
    assert out[1] is None and out[0] is not None


def test_fit_is_deterministic_across_partitionings(spark):
    df = _corpus(spark)
    m1 = bpe_fit(df, num_merges=50, min_count=1)
    m2 = bpe_fit(df.repartition(7), num_merges=50, min_count=1)
    assert m1.merges.orderBy("rank").collect() == m2.merges.orderBy("rank").collect()
    assert m1.vocab.orderBy("token_id").collect() == m2.vocab.orderBy("token_id").collect()


def test_min_count_and_cap_bound_the_driver_table(spark):
    df = _corpus(spark)
    # min_count high enough to drop the singleton words
    model = bpe_fit(df, num_merges=50, min_count=3, max_word_vocab=5)
    # with only the 5 most frequent words, the alphabet shrinks
    assert model.vocab.count() <= 60


def test_model_io_roundtrip(spark, tmp_path):
    from ballista_spark.operators.model_io import load_model, save_model

    df = _corpus(spark)
    model = bpe_fit(df, num_merges=25, min_count=1)
    path = str(tmp_path / "bpe_model")
    save_model(model, path)
    loaded = load_model(spark, path)
    assert loaded.eow == model.eow and loaded.pattern == model.pattern
    a = bpe_encode(df, model).select("doc_id", "bpe_tokens").collect()
    b = bpe_encode(df, loaded).select("doc_id", "bpe_tokens").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_encode_plan_is_map_only(spark):
    """bpe_encode must add zero shuffles: scan -> ArrowEvalPython ->
    project, nothing else."""
    df = _corpus(spark)
    model = bpe_fit(df, num_merges=10, min_count=1)
    plan = (
        bpe_encode(df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_merge_loop_matches_reference_on_random_tables():
    """Driver-free randomized equivalence (fixed seeds): the engine's
    incremental-pair-index merge loop vs the naive recount reference on
    word tables it was not tuned on — the incremental bookkeeping
    (stale pair removal, overlap-safe in-word merging, index updates)
    is the riskiest code in the module."""
    import random

    from ballista_spark.operators.bpe import _merge_loop

    alphabet = "abcde"
    for seed in range(25):
        rng = random.Random(seed)
        wc = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))):
                rng.randint(1, 30)
            for _ in range(rng.randint(3, 40))
        }
        for num_merges in (1, 7, 100):
            got = _merge_loop(list(wc.items()), num_merges, 2, EOW)
            want = _ref_merges(wc, num_merges, 2)
            assert got == want, (seed, num_merges)


def test_apply_merges_consistent_with_trainer_on_random_tables():
    """Encoding each training word with the learned ranks must reproduce
    the trainer's final symbolization (lowest-rank-first replay ==
    sequential merge replay) — including repeated-character words where
    overlapping pair occurrences are the classic off-by-one trap."""
    import random

    from ballista_spark.operators.bpe import _apply_merges, _merge_loop

    alphabet = "aab"  # heavy repeats on purpose
    for seed in range(15):
        rng = random.Random(1000 + seed)
        wc = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10))):
                rng.randint(1, 9)
            for _ in range(rng.randint(2, 20))
        }
        merges = _merge_loop(list(wc.items()), 50, 2, EOW)
        ranks = {p: i for i, p in enumerate(merges)}
        # replay the trainer's merge sequence over each word
        for w in wc:
            syms = list(w) + [EOW]
            for l, r in merges:
                out, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                        out.append(l + r)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = out
            assert _apply_merges(w, ranks, EOW) == syms, (seed, w)


def test_fit_distributed_stage_is_one_aggregation(spark):
    """The corpus-sized part of bpe_fit is exactly one groupBy(word):
    partial_count -> exchange -> final count, with no join and no second
    corpus shuffle (the orderBy/limit runs over the already-aggregated
    word table)."""
    from ballista_spark.operators.bpe import _word_counts

    df = _corpus(spark)
    plan = (
        _word_counts(df, "text", True, BPE_TOKEN_PATTERN)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "partial_count" in plan or "partial count" in plan.lower()
