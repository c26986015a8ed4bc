"""Randomized-input equivalence tests (fixed seeds): the dedup and
similarity operators must agree with brute-force references on data they
were not tuned on — guards against constants overfit to the driver's
testdata."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from ballista_spark.operators.similarity import cosine_topk

VOCAB = [f"w{i}" for i in range(50)]


def _random_docs(seed: int, n: int = 60, dup_frac: float = 0.25):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        length = rng.randint(20, 80)
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(length))))
    # plant near-duplicates: copy a doc and perturb a few tokens
    n_dups = int(n * dup_frac)
    for j in range(n_dups):
        src_id, text = docs[rng.randrange(n)]
        toks = text.split(" ")
        for _ in range(max(1, len(toks) // 20)):
            toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
        docs.append((n + j, " ".join(toks)))
    return docs


def _exact_jaccard_pairs(docs, threshold):
    def shingles(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {i: shingles(t) for i, t in docs}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                if j >= threshold:
                    out[(a, b)] = j
    return out


@pytest.mark.parametrize("seed", [7, 99, 1234])
def test_minhash_lsh_equals_brute_force_on_random_docs(spark, seed):
    docs = _random_docs(seed)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["key_a"], r["key_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, threshold=0.8).collect()
    }
    expected = _exact_jaccard_pairs(docs, 0.8)
    assert set(got) == set(expected), (
        f"seed={seed}: LSH pairs {set(got) ^ set(expected)} differ"
    )
    for k, v in expected.items():
        assert math.isclose(got[k], v, rel_tol=1e-12)


@pytest.mark.parametrize("seed", [3, 42])
def test_ngram_jaccard_equals_brute_force(spark, seed):
    docs = _random_docs(seed, n=40)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["key_a"], r["key_b"]) for r in ngram_jaccard_pairs(df, threshold=0.3).collect()
    }
    assert got == set(_exact_jaccard_pairs(docs, 0.3))


def test_cosine_topk_equals_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {}
    for r in cosine_topk(df, df.where(F.col("vec_id") < 5), k=3).collect():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])

    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    for q in range(5):
        sims = (v64 @ v64[q]) / (norms * norms[q])
        sims[q] = -np.inf
        order = sorted(range(len(vecs)), key=lambda i: (-sims[i], i))[:3]
        assert got[q] == order, f"query {q}: {got[q]} != {order}"


@pytest.mark.parametrize("seed", [3, 41, 777])
@pytest.mark.parametrize("n", [2, 3])
def test_dup_ngram_fraction_equals_python_reference(spark, seed, n):
    """Repetition filter vs a direct Python recomputation on random docs
    (including degenerate repeats and sub-n-token documents)."""
    from ballista_spark.operators.text import dup_ngram_fraction

    rng = random.Random(seed)
    docs = []
    for i in range(40):
        length = rng.randint(1, 60)
        vocab = VOCAB[: rng.randint(2, 12)]  # small vocab → real repetition
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(length))))
    docs += [(100, "x"), (101, "spam spam spam"), (102, "a b")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id", dup_ngram_fraction("text", n).alias("rep")
        ).collect()
    }

    def ref(text):
        toks = text.strip().split(" ")
        m = len(toks) - (n - 1)
        if m < 1:
            return 0.0
        grams = [" ".join(toks[i : i + n]) for i in range(m)]
        return (len(grams) - len(set(grams))) / m

    for doc_id, text in docs:
        assert got[doc_id] == pytest.approx(ref(text), abs=1e-12), (doc_id, text)


@pytest.mark.parametrize("seed", [11, 222])
def test_int8_quantization_properties_random_vectors(spark, seed):
    """Quantization invariants on random vectors: codes stay in [-127, 127],
    the reconstruction error bound holds, quantization is scale-invariant
    (q(c*v) == q(v) for c > 0), and zero vectors map to zero codes."""
    from ballista_spark.operators.similarity import dequantize_int8, quantize_int8

    rng = np.random.default_rng(seed)
    vecs = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(30)]
    vecs.append((100, [0.0] * 16))
    vecs.append((101, [float(x) * 1e-6 for x in rng.normal(0, 1, 16)]))
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    scaled = df.withColumn(
        "embedding2", F.transform("embedding", lambda x: x * 3.5)
    )
    rows = scaled.select(
        "vec_id",
        "embedding",
        quantize_int8("embedding").alias("qs"),
        quantize_int8("embedding2").alias("qs2"),
        dequantize_int8(quantize_int8("embedding")).alias("dq"),
    ).collect()
    for r in rows:
        codes = list(r["qs"]["q"])
        assert all(-127 <= c <= 127 for c in codes), r["vec_id"]
        assert list(r["qs2"]["q"]) == codes, ("scale invariance", r["vec_id"])
        scale = r["qs"]["scale"]
        for orig, rec in zip(r["embedding"], r["dq"]):
            assert abs(orig - rec) <= scale / 2 + 1e-15, r["vec_id"]
        if r["vec_id"] == 100:
            assert codes == [0] * 16 and scale == 0.0


@pytest.mark.parametrize("seed,w", [(7, 4), (31, 6)])
def test_substring_spans_random_corpora(spark, seed, w):
    """Exact substring dedup agrees with a brute-force reference on random
    corpora with planted repeated passages (cross-doc, self-repeats, and
    passages flush at doc boundaries)."""
    import collections

    from ballista_spark.operators.substr import duplicated_window_spans

    rng = random.Random(seed)
    passages = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(w, 3 * w)))
        for _ in range(4)
    ]
    docs = []
    for i in range(40):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(5, 40))]
        # plant 0-2 passages at random offsets (sometimes at the ends)
        for _ in range(rng.randint(0, 2)):
            p = rng.choice(passages).split(" ")
            at = rng.randint(0, len(toks))
            toks[at:at] = p
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    occ = []
    for k, t in docs:
        toks = t.strip().split(" ")
        for i in range(len(toks) - w + 1):
            occ.append((k, i + 1, " ".join(toks[i : i + w])))
    cnt = collections.Counter(g for _, _, g in occ)
    canon = {}
    for k, p, g in sorted(occ):
        canon.setdefault(g, (k, p))
    rem = sorted((k, p) for k, p, g in occ if cnt[g] >= 2 and canon[g] != (k, p))
    expect = []
    cur = None
    for k, p in rem:
        if cur is not None and cur[0] == k and p - cur[2] <= w:
            cur = (k, cur[1], p, cur[3] + 1)
        else:
            if cur is not None:
                expect.append((cur[0], cur[1], cur[2] + w - 1, cur[3]))
            cur = (k, p, p, 1)
    if cur is not None:
        expect.append((cur[0], cur[1], cur[2] + w - 1, cur[3]))

    got = sorted(tuple(r) for r in duplicated_window_spans(df, w=w).collect())
    assert got == sorted(expect)
