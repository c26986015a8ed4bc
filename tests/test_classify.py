"""Softmax classifier / trained langid vs a full numpy training mirror:
identical char-n-gram hashing (md5_long twin), identical batch-GD
updates — per-doc probabilities must agree to float-summation noise.
Plus held-out accuracy on a synthetic 3-language corpus and invariants."""

from __future__ import annotations

import random

import numpy as np
import pytest

from ballista_spark.operators.classify import (
    char_ngram_features,
    langid_fit,
    langid_predict,
    softmax_fit,
    softmax_predict,
    softmax_probs,
)
from ballista_spark.operators.hashing import md5_long_py

# --- synthetic 3-language corpus: distinct alphabets per language -----------

ALPHABETS = {
    "lat": "abcdefghij ",
    "grc": "αβγδεζηθικ ",
    "cyr": "абвгдежзик ",
}


def make_corpus(n_per_lang: int, seed: int):
    rng = random.Random(seed)
    rows, did = [], 0
    for lang, alpha in sorted(ALPHABETS.items()):
        for _ in range(n_per_lang):
            text = "".join(rng.choice(alpha) for _ in range(60)).strip()
            rows.append((did, text, lang))
            did += 1
    return rows


# --- numpy mirror ------------------------------------------------------------


def py_features(text: str, n_features: int, ngrams=(1, 2, 3)):
    """Mirror of char_ngram_features: lowercase, per-order sliding grams,
    md5_long bucket, L1 normalization."""
    s = text.lower()
    grams = []
    for n in ngrams:
        if len(s) >= n:
            grams += [s[i : i + n] for i in range(len(s) - n + 1)]
    if not grams:
        return {}
    out: dict[int, float] = {}
    for g in grams:
        b = md5_long_py(g) % n_features
        out[b] = out.get(b, 0.0) + 1.0
    return {b: c / len(grams) for b, c in out.items()}


def numpy_softmax_fit(rows, n_features, ngrams, n_iters, lr):
    classes = sorted({lang for _, _, lang in rows})
    cidx = {c: i for i, c in enumerate(classes)}
    feats = [py_features(t, n_features, ngrams) for _, t, _ in rows]
    buckets = sorted({b for f in feats for b in f})
    bidx = {b: i for i, b in enumerate(buckets)}
    X = np.zeros((len(rows), len(buckets)))
    for i, f in enumerate(feats):
        for b, v in f.items():
            X[i, bidx[b]] = v
    Y = np.zeros((len(rows), len(classes)))
    for i, (_, _, lang) in enumerate(rows):
        Y[i, cidx[lang]] = 1.0
    W = np.zeros((len(buckets), len(classes)))
    b = np.zeros(len(classes))
    n = len(rows)
    for _ in range(n_iters):
        M = X @ W + b
        E = np.exp(M - M.max(axis=1, keepdims=True))
        P = E / E.sum(axis=1, keepdims=True)
        G = P - Y
        W -= lr * (X.T @ G) / n
        b -= lr * G.sum(axis=0) / n
    return classes, bidx, W, b


def numpy_probs(text, classes, bidx, W, b, n_features, ngrams):
    f = py_features(text, n_features, ngrams)
    m = b.copy()
    for bk, v in f.items():
        if bk in bidx:
            m = m + W[bidx[bk]] * v
    e = np.exp(m - m.max())
    return dict(zip(classes, e / e.sum()))


# --- tests -------------------------------------------------------------------

N_FEAT = 2**12
NGRAMS = (1, 2)
N_ITERS = 15
LR = 5.0


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(12, seed=33)


@pytest.fixture(scope="module")
def spark_model(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    return langid_fit(
        df, n_features=N_FEAT, ngrams=NGRAMS, n_iters=N_ITERS, lr=LR
    )


def test_features_match_python_mirror(spark, corpus):
    df = spark.createDataFrame(corpus[:6], "doc_id long, text string, lang string")
    got = {}
    for r in char_ngram_features(df, n_features=N_FEAT, ngrams=NGRAMS).collect():
        got.setdefault(r.key, {})[r.bucket] = r.x
    for did, text, _ in corpus[:6]:
        want = py_features(text, N_FEAT, NGRAMS)
        assert set(got[did]) == set(want)
        for b in want:
            assert got[did][b] == pytest.approx(want[b], abs=1e-12)


def test_training_matches_numpy_mirror(spark, corpus, spark_model):
    classes, bidx, W, b = numpy_softmax_fit(corpus, N_FEAT, NGRAMS, N_ITERS, LR)
    # biases agree
    for i, c in enumerate(classes):
        assert spark_model.biases[c] == pytest.approx(b[i], abs=1e-8)
    # per-doc probabilities agree on fresh unseen texts
    test_rows = make_corpus(3, seed=77)
    df = spark.createDataFrame(test_rows, "doc_id long, text string, lang string")
    got = {}
    for r in softmax_probs(df, spark_model).collect():
        got.setdefault(r.key, {})[r.y] = r.p
    for did, text, _ in test_rows:
        want = numpy_probs(text, classes, bidx, W, b, N_FEAT, NGRAMS)
        for c in classes:
            assert got[did][c] == pytest.approx(want[c], abs=1e-7), (did, c)


def test_heldout_accuracy(spark, spark_model):
    held = make_corpus(10, seed=99)
    df = spark.createDataFrame(held, "doc_id long, text string, lang string")
    pred = langid_predict(df, spark_model)
    rows = pred.collect()
    acc = sum(1 for r in rows if r.lang_pred == r.lang) / len(rows)
    assert acc == 1.0  # alphabets are disjoint — anything less is a bug
    for r in rows:
        assert 1 / 3 < r.lang_prob <= 1.0


def test_probs_sum_to_one(spark, corpus, spark_model):
    df = spark.createDataFrame(corpus[:5], "doc_id long, text string, lang string")
    probs = softmax_probs(df, spark_model)
    import pyspark.sql.functions as F

    sums = probs.groupBy("key").agg(F.sum("p").alias("s")).collect()
    for r in sums:
        assert r.s == pytest.approx(1.0, abs=1e-12)


def test_empty_text_scores_bias_softmax(spark, spark_model):
    df = spark.createDataFrame([(0, ""), (1, None)], "doc_id long, text string")
    rows = softmax_predict(df, spark_model).collect()
    for r in rows:
        assert r.pred is not None  # bias-only argmax, never NULL
    got = {r.doc_id: r.pred for r in rows}
    assert got[0] == got[1]


def test_single_class_rejected(spark):
    df = spark.createDataFrame([(0, "aaa", "en"), (1, "bbb", "en")],
                               "doc_id long, text string, lang string")
    feats = char_ngram_features(df, n_features=N_FEAT, ngrams=NGRAMS)
    with pytest.raises(ValueError, match="classes"):
        softmax_fit(feats, df.select("doc_id", "lang"), label_col="lang",
                    key_col="doc_id", n_iters=1)


def test_short_text_below_ngram_order(spark, spark_model):
    """Text shorter than the max n-gram order still features (lower
    orders fire) and predicts without error."""
    df = spark.createDataFrame([(0, "α")], "doc_id long, text string")
    [r] = langid_predict(df, spark_model).collect()
    assert r.lang_pred == "grc"


def test_model_roundtrip(spark, spark_model, tmp_path):
    """SoftmaxModel persists through model_io and scores identically."""
    from ballista_spark.operators.model_io import load_model, save_model

    path = str(tmp_path / "langid_model")
    save_model(spark_model, path)
    loaded = load_model(spark, path)
    assert loaded.biases == spark_model.biases
    assert loaded.n_features == spark_model.n_features
    assert loaded.ngrams == spark_model.ngrams
    held = make_corpus(2, seed=5)
    df = spark.createDataFrame(held, "doc_id long, text string, lang string")
    a = {(r.doc_id, r.lang_pred, round(r.lang_prob, 12))
         for r in langid_predict(df, spark_model).collect()}
    b = {(r.doc_id, r.lang_pred, round(r.lang_prob, 12))
         for r in langid_predict(df, loaded).collect()}
    assert a == b


def test_local_predict_matches_distributed(spark, spark_model):
    """The map-only serving path equals the join/window path."""
    from ballista_spark.operators.classify import softmax_predict_local

    held = make_corpus(5, seed=21) + [(999, "", "lat")]
    df = spark.createDataFrame(held, "doc_id long, text string, lang string")
    a = {
        r.doc_id: (r.pred, r.prob)
        for r in softmax_predict(df, spark_model).collect()
    }
    b = {
        r.doc_id: (r.pred, r.prob)
        for r in softmax_predict_local(df, spark_model).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0], k
        assert a[k][1] == pytest.approx(b[k][1], abs=1e-9), k


def test_local_predict_plan_is_map_only(spark, spark_model):
    from ballista_spark.operators.classify import softmax_predict_local

    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    plan = (
        softmax_predict_local(df, spark_model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_local_predict_streaming_admissible(spark, spark_model, tmp_path):
    """The map-only path runs under readStream (stateless map)."""
    from ballista_spark.operators.classify import softmax_predict_local

    src = str(tmp_path / "stream_src")
    rows = make_corpus(2, seed=3)
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string"
    ).parquet(src)
    out = softmax_predict_local(stream, spark_model)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("langid_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.pred
        for r in spark.sql("select * from langid_stream_test").collect()
    }
    want = {r[0]: r[2] for r in rows}  # alphabets disjoint -> label == pred
    assert got == want


def test_features_astral_fallback_matches_mirror(spark):
    """The regex gram fast path advances by UTF-16 code UNIT in Java, so
    astral (non-BMP) codepoints would spawn spurious low-surrogate grams;
    char_ngram_features routes such rows to the codepoint-exact substr
    path.  Plant astral chars to pin both branches against the mirror."""
    rows = [
        (1, "h\U0001F600llo wörld"),            # astral mid-string
        (2, "\U0001F600\U0001F601x"),                # leading astral pair
        (3, "plain bmp text, fast path"),            # BMP-only (regex path)
        (4, "tail astral \U0001F680"),               # astral at end
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in char_ngram_features(df, n_features=N_FEAT, ngrams=NGRAMS).collect():
        got.setdefault(r.key, {})[r.bucket] = r.x
    for did, text in rows:
        want = py_features(text, N_FEAT, NGRAMS)
        assert set(got[did]) == set(want), f"doc {did}: bucket set diverged"
        for b in want:
            assert got[did][b] == pytest.approx(want[b], abs=1e-12)
