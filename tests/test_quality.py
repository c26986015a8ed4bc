"""Hashed n-gram quality classifier: feature hashing determinism, in-engine
logistic-regression training on a separable synthetic corpus, scoring."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.quality import (
    LogRegModel,
    hashed_ngram_features,
    logreg_fit,
    quality_classifier_score,
)

CLEAN = [
    "the quick brown fox jumps over the lazy dog near the quiet river",
    "a clear morning with soft light over the green valley and the hills",
    "she read the letter slowly and smiled at the familiar handwriting",
    "the committee approved the proposal after a careful public review",
    "fresh bread and coffee filled the small kitchen with a warm smell",
    "the train left the station on time under a pale winter sky",
    "he planted tomatoes along the fence and watered them every evening",
    "the library stayed open late during the final week of exams",
]
GARBAGE = [
    "zxq vvv kkk qqq jjj xxx zzz www qpz kfj vnb mmm zxq vvv",
    "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa",
    "qwer asdf zxcv qwer asdf zxcv qwer asdf zxcv qwer asdf zxcv",
    "lorem zpx ipsum qqv dolor kxk sit jjz amet vvq elit zzk",
    "111 222 333 444 555 666 777 888 999 000 111 222 333 444",
    "bzz kpp wqq jxx vnn mzz bpp kqq wxx jnn vzz bqq kxx wnn",
    "xoxo yoyo zozo xoxo yoyo zozo xoxo yoyo zozo xoxo yoyo zozo",
    "glorp snee vrax plonk zibber quang flerm drozz glorp snee vrax plonk",
]


def _corpus(spark):
    rows = [(i, t, 1) for i, t in enumerate(CLEAN)] + [
        (100 + i, t, 0) for i, t in enumerate(GARBAGE)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_hashed_features_deterministic_and_normalized(spark):
    """Buckets reproduce the md5 formula; per-doc x sums to exactly 1."""
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    rows = hashed_ngram_features(df, n_features=1 << 18).collect()
    # grams: a, b, a, 'a b', 'b a'  -> 5 grams, 'a' twice
    got = {r["bucket"]: r["x"] for r in rows}
    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % (1 << 18)
    assert got[bucket("a")] == pytest.approx(2 / 5)
    for g in ("b", "a b", "b a"):
        assert got[bucket(g)] == pytest.approx(1 / 5)
    assert sum(got.values()) == pytest.approx(1.0)


def test_logreg_separates_clean_from_garbage(spark):
    """Train on half the corpus, score the held-out half: every held-out
    clean doc outscores every held-out garbage doc, and train accuracy at
    the 0.5 threshold is perfect (the fixture is linearly separable)."""
    df = _corpus(spark)
    train = df.where((F.col("doc_id") % 2) == 0)
    feats = hashed_ngram_features(train)
    model = logreg_fit(feats, train.select("doc_id", "label"), key_col="doc_id")
    scored = quality_classifier_score(df, model)
    rows = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    train_ids = {r["doc_id"] for r in train.collect()}
    # perfect train separation at 0.5
    for i, _ in enumerate(CLEAN):
        if i in train_ids:
            assert rows[i] > 0.5, (i, rows[i])
    for i, _ in enumerate(GARBAGE):
        if 100 + i in train_ids:
            assert rows[100 + i] < 0.5, (100 + i, rows[100 + i])
    # held-out ranking: min clean > max garbage (unigram vocab disjointness
    # generalizes even with per-doc unseen bigrams)
    held_clean = [rows[i] for i in range(len(CLEAN)) if i not in train_ids]
    held_garb = [rows[100 + i] for i in range(len(GARBAGE)) if 100 + i not in train_ids]
    assert min(held_clean) > max(held_garb), (held_clean, held_garb)


def test_score_plan_is_broadcast_join_no_python(spark):
    """The scoring plan broadcasts the weight table and contains no Python
    evaluation — the hot path stays JVM-side."""
    df = _corpus(spark)
    feats = hashed_ngram_features(df)
    model = logreg_fit(
        feats, df.select("doc_id", "label"), key_col="doc_id", n_iters=2
    )
    plan = (
        quality_classifier_score(df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan


def test_model_carries_hashing_config(spark):
    """A model trained under NON-default hashing scores correctly because
    n_features/ngrams ride on the model (regression: scoring used to
    re-hash with the defaults, silently missing every bucket)."""
    df = _corpus(spark)
    feats = hashed_ngram_features(df, n_features=1024, ngrams=(1,))
    model = logreg_fit(
        feats, df.select("doc_id", "label"), key_col="doc_id",
        n_iters=10, n_features=1024, ngrams=(1,),
    )
    assert model.n_features == 1024 and model.ngrams == (1,)
    rows = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_classifier_score(df, model).collect()
    }
    clean = [rows[i] for i in range(len(CLEAN))]
    garb = [rows[100 + i] for i in range(len(GARBAGE))]
    assert min(clean) > max(garb), (clean, garb)


def test_empty_doc_scores_bias(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    model = LogRegModel(
        spark.createDataFrame([(0, 1.0)], "bucket long, w double"), 0.0
    )
    [r] = quality_classifier_score(df, model).collect()
    assert r["quality_prob"] == pytest.approx(0.5)
