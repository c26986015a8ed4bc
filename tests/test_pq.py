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
