"""Product quantization (PQ) operators: codebook training, encoding,
ADC top-k — Python-reference exactness + recall gates + plan shape.

PQ has no reference analog (Ballista has no vector ops) and no SQL oracle
(k-means training is iterative), so the checks here mirror the kmeans/IVF
test strategy: a faithful plain-Python mirror for the deterministic parts
and a recall gate against the exact scan for the approximate part."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.similarity import (
    cosine_topk,
    pq_adc_topk,
    pq_encode,
    pq_fit,
)
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE

_M = 8
_KSUB = 8


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def books(spark, emb):
    return pq_fit(emb, _M, ksub=_KSUB, max_iters=3)


def test_pq_fit_shapes(books, emb):
    dim = len(emb.select("embedding").first()["embedding"])
    assert len(books) == _M
    assert all(len(b) == _KSUB for b in books)
    assert all(len(c) == dim // _M for b in books for c in b)


def test_pq_fit_validates(spark, emb):
    with pytest.raises(ValueError):
        pq_fit(emb, 7)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        pq_fit(emb, 8, ksub=300)


def _encode_reference(vec, books):
    """Plain-Python mirror of pq_encode: per-subspace argmin by L2 with the
    same left-fold accumulation order, ties to the lower code."""
    m, dsub = len(books), len(books[0][0])
    out = []
    for j in range(m):
        sub = vec[j * dsub : (j + 1) * dsub]
        best = None
        for code, cent in enumerate(books[j]):
            d = 0.0
            for a, b in zip(sub, cent):
                d += (float(a) - b) * (float(a) - b)
            if best is None or (d, code) < best:
                best = (d, code)
        out.append(best[1])
    return out


def test_pq_encode_matches_python_reference(emb, books):
    rows = emb.limit(50).collect()
    got = {
        r.vec_id: list(r.pq_code)
        for r in pq_encode(emb.limit(50), books).select("vec_id", "pq_code").collect()
    }
    for r in rows:
        assert got[r.vec_id] == _encode_reference(list(r.embedding), books), r.vec_id


def test_pq_encode_partitioning_invariant(emb, books):
    a = {
        r.vec_id: (tuple(r.pq_code), r.vec_norm)
        for r in pq_encode(emb, books).select("vec_id", "pq_code", "vec_norm").collect()
    }
    b = {
        r.vec_id: (tuple(r.pq_code), r.vec_norm)
        for r in pq_encode(emb.repartition(11), books)
        .select("vec_id", "pq_code", "vec_norm")
        .collect()
    }
    assert a == b


def test_pq_adc_rerank_recall_vs_brute_force(spark, emb, books):
    """The production contract (ADC shortlist + exact re-rank).  These
    synthetic embeddings are near-random — close to incompressible, the
    worst case for raw ADC ranking — so the gate is on the reranked path;
    raw ADC gets a weaker shortlist-containment check below."""
    queries = emb.limit(10)
    codes = pq_encode(emb, books)
    ex = cosine_topk(emb, queries, k=5).collect()
    exact = {(r.query_id, r.neighbor_id) for r in ex}
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in ex}
    got = pq_adc_topk(codes, queries, books, k=5, rerank=50).collect()
    approx = {(r.query_id, r.neighbor_id) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.55, f"PQ rerank recall too low: {recall:.2f}"
    # reranked scores are EXACT cosines — equal to the brute-force values
    for r in got:
        key = (r.query_id, r.neighbor_id)
        if key in exact_cos:
            assert abs(r.cosine - exact_cos[key]) < 1e-12, key


def test_pq_adc_raw_shortlist_contains_true_neighbors(spark, emb, books):
    queries = emb.limit(10)
    codes = pq_encode(emb, books)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    short = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(codes, queries, books, k=50).collect()
    }
    contain = len(exact & short) / len(exact)
    assert contain >= 0.4, f"ADC top-50 containment too low: {contain:.2f}"
    vals = [r.cosine for r in pq_adc_topk(codes, queries, books, k=5).collect()]
    assert all(-1.5 <= v <= 1.5 for v in vals)


def test_pq_adc_plan_stays_jvm_side(emb, books):
    codes = pq_encode(emb, books)
    plan = (
        pq_adc_topk(codes, emb.limit(5), books, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # the corpus-side scan must join against a broadcast query table, not shuffle it
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


# --- IVFPQ (IVF row-pruning x PQ byte-compression, residual-encoded) --------

from ballista_spark.operators.similarity import (  # noqa: E402
    ivfpq_ann_topk,
    ivfpq_encode,
    ivfpq_residuals,
    kmeans_fit,
)

_NCELLS = 4


@pytest.fixture(scope="module")
def coarse(emb):
    return kmeans_fit(emb, _NCELLS, max_iters=5, spherical=True)


@pytest.fixture(scope="module")
def rbooks(emb, coarse):
    """PQ codebooks trained on the coarse residuals (the IVFADC contract)."""
    return pq_fit(ivfpq_residuals(emb, coarse), _M, ksub=_KSUB, max_iters=3)


def test_ivfpq_encode_shape_and_norm(emb, coarse, rbooks):
    import math

    enc = ivfpq_encode(emb, coarse, rbooks)
    assert set(enc.columns) == {"vec_id", "cell", "pq_code", "vec_norm"}
    row = enc.first()
    assert len(row["pq_code"]) == _M
    assert 0 <= row["cell"] < _NCELLS
    # vec_norm is the ORIGINAL vector's norm, not the residual's
    v = dict(emb.select("vec_id", "embedding").collect())[row["vec_id"]]
    assert row["vec_norm"] == pytest.approx(
        math.sqrt(sum(float(x) ** 2 for x in v)), rel=1e-9
    )


def test_ivfpq_adc_exact_when_residuals_in_codebook(spark):
    """Corpus constructed as coarse_centroid + codebook_residual: PQ
    reconstruction is lossless, so the q.c + LUT(q.r) decomposition must
    reproduce exact cosine — pins the ADC math, the residual encoding,
    and the cell/probe plumbing in one check."""
    import itertools

    coarse = [[2.0, 0.0, 0.0, 0.0], [0.0, 2.0, 0.0, 0.0]]
    books = [
        [[0.1, -0.2], [0.3, 0.05]],  # subspace 0 (dims 1-2)
        [[0.0, 0.4], [-0.3, 0.2]],   # subspace 1 (dims 3-4)
    ]
    rows, vid = [], 0
    for c in coarse:
        for c0, c1 in itertools.product(range(2), range(2)):
            r = books[0][c0] + books[1][c1]
            rows.append((vid, [c[d] + r[d] for d in range(4)]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc = ivfpq_encode(corpus, coarse, books)
    queries = corpus.limit(3)
    got = ivfpq_ann_topk(enc, queries, coarse, books, k=3, n_probe=2).collect()
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(corpus, queries, k=3).collect()
    }
    assert {(r.query_id, r.neighbor_id) for r in got} == set(exact)
    for r in got:
        assert r.cosine == pytest.approx(exact[(r.query_id, r.neighbor_id)], abs=1e-9)


def test_ivfpq_rerank_recall_vs_brute_force(emb, coarse, rbooks):
    """Rerank path on the near-random embeddings (PQ's worst case);
    n_probe covers every cell so this isolates the residual-PQ + rerank
    quality — cell pruning itself is pinned exactly above."""
    queries = emb.limit(10)
    enc = ivfpq_encode(emb, coarse, rbooks)
    ex = cosine_topk(emb, queries, k=5).collect()
    exact = {(r.query_id, r.neighbor_id) for r in ex}
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in ex}
    got = ivfpq_ann_topk(
        enc, queries, coarse, rbooks, k=5, n_probe=_NCELLS, rerank=100, corpus=emb
    ).collect()
    recall = len(exact & {(r.query_id, r.neighbor_id) for r in got}) / len(exact)
    # near-random vectors cluster meaninglessly, so residuals are as
    # incompressible as the raw vectors — the knob that restores recall is
    # the shortlist depth, hence rerank=100 here (real text embeddings
    # concentrate on a manifold and quantize far better; see pq_adc_topk)
    assert recall >= 0.55, f"IVFPQ rerank recall too low: {recall:.2f}"
    for r in got:  # reranked scores are exact cosines
        key = (r.query_id, r.neighbor_id)
        if key in exact_cos:
            assert abs(r.cosine - exact_cos[key]) < 1e-12, key


def test_ivfpq_plan_gates(emb, coarse, rbooks):
    enc = ivfpq_encode(emb, coarse, rbooks)
    plan = (
        ivfpq_ann_topk(enc, emb.limit(5), coarse, rbooks, k=3, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # corpus side: ONE broadcast cell equi-join, never a corpus shuffle-for-pairs
    assert "BroadcastExchange" in plan, plan


def test_ivfpq_rerank_requires_corpus(emb, coarse, rbooks):
    enc = ivfpq_encode(emb, coarse, rbooks)
    with pytest.raises(ValueError, match="rerank"):
        ivfpq_ann_topk(enc, emb.limit(2), coarse, rbooks, k=3, rerank=10)
