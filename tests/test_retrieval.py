"""BM25 retrieval: DuckDB twin over the real documents table, a
hand-computed formula pin, ranking behavior, and plan gates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.retrieval import bm25_index, bm25_topk
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE

_TWIN = r"""
WITH toks AS (
  SELECT doc_id,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'), x -> LEN(x) > 0) AS l
  FROM smoke.documents
), dl AS (
  SELECT doc_id, LEN(l) AS dl FROM toks
), post AS (
  SELECT l[i] AS term, doc_id, COUNT(*) AS tf
  FROM toks, UNNEST(GENERATE_SERIES(1, LEN(l))) g(i)
  GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl
), qtoks AS (
  SELECT doc_id AS query_id,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'), x -> LEN(x) > 0) AS l
  FROM smoke.documents WHERE doc_id < {nq}
), qrows AS (
  SELECT query_id, l[i] AS term
  FROM qtoks, UNNEST(GENERATE_SERIES(1, LEN(l))) g(i)
), scored AS (
  SELECT qrows.query_id, post.doc_id,
         SUM(LN(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * post.tf * (1.2 + 1.0)
             / (post.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM qrows
  JOIN dfreq USING (term)
  JOIN post USING (term)
  JOIN dl ON post.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
FROM scored QUALIFY rank <= {k}
"""


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


@pytest.fixture(scope="module")
def index(docs):
    return bm25_index(docs)


def test_bm25_matches_duckdb_twin(spark, duck, docs, index):
    """Same queries, same corpus, independent engines: identical top-k
    sets and scores to summation-order rounding."""
    nq, k = 5, 10
    got = bm25_topk(
        index, docs.where(F.col("doc_id") < nq), k=k, key_col="doc_id"
    ).collect()
    want = duck.execute(_TWIN.format(nq=nq, k=k)).fetchall()
    w = {(q, d): (s, r) for q, d, s, r in want}
    assert {(r["query_id"], r["doc_id"]) for r in got} == set(w)
    for r in got:
        s, rank = w[(r["query_id"], r["doc_id"])]
        assert r["score"] == pytest.approx(s, rel=1e-12)
        assert r["rank"] == rank


def test_bm25_formula_hand_computed(spark):
    """Two docs, one-term query: the full Okapi expression pinned by hand,
    and the self-match ranks first (query 0 IS doc 0)."""
    rows = [(0, "apple banana"), (1, "apple apple apple cherry")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = bm25_index(docs)
    assert idx.n_docs == 2 and idx.avgdl == 3.0
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(
            idx, spark.createDataFrame([(9, "apple")], "doc_id long, text string"),
            k=5, key_col="doc_id",
        ).collect()
    }

    def bm25(tf, df, dl):
        idf = math.log(1 + (2 - df + 0.5) / (df + 0.5))
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

    assert got[(9, 0)] == pytest.approx(bm25(1, 2, 2), rel=1e-12)
    assert got[(9, 1)] == pytest.approx(bm25(3, 2, 4), rel=1e-12)
    # tf saturation still ranks the tf=3 doc above the tf=1 doc here
    assert got[(9, 1)] > got[(9, 0)]


def test_bm25_oov_query_returns_nothing(spark, index):
    q = spark.createDataFrame([(1, "zzzz qqqq")], "query_id long, text string")
    assert bm25_topk(index, q, k=5, key_col="query_id").count() == 0


def test_bm25_plan_gates(docs, index):
    plan = (
        bm25_topk(index, docs.limit(3), k=5, key_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan, plan


def test_rrf_fusion_hand_computed(spark):
    """Two rankings, hand-pinned reciprocal-rank fusion: agreement on doc
    20 at mid ranks beats a single first place (the property RRF exists
    for), contributions sum with weights, absent docs contribute nothing."""
    from ballista_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 3, 30)], "query_id long, rank long, doc_id long"
    )
    r2 = spark.createDataFrame(
        [(1, 1, 20), (1, 2, 40)], "query_id long, rank long, doc_id long"
    )
    got = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in rrf_fuse([r1, r2], k=10, rrf_k=60).collect()
    }
    exp = {
        10: 1 / 61,
        20: 1 / 62 + 1 / 61,
        30: 1 / 63,
        40: 1 / 62,
    }
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert got[d][1] == pytest.approx(s, rel=1e-12)
    assert got[20][0] == 1 and got[10][0] == 2  # consensus outranks one #1
    # weights scale per-ranking contributions
    wgot = {
        r["doc_id"]: r["score"]
        for r in rrf_fuse([r1, r2], weights=[2.0, 0.5], rrf_k=60).collect()
    }
    assert wgot[20] == pytest.approx(2.0 / 62 + 0.5 / 61, rel=1e-12)


def test_rrf_validates(spark):
    from ballista_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    r = spark.createDataFrame([(1, 1, 10)], "query_id long, rank long, doc_id long")
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([r], weights=[1.0, 2.0])


def test_mine_hard_negatives_excludes_positives(spark, docs, index):
    from ballista_spark.operators.retrieval import mine_hard_negatives

    queries = docs.limit(5).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    k = 8
    base = {
        (r.query_id, r.doc_id): r
        for r in bm25_topk(index, queries, k=k + 3, key_col="query_id").collect()
    }
    # label each query's OWN document + its top-1 hit as positives
    top1 = (
        bm25_topk(index, queries, k=1, key_col="query_id")
        .select("query_id", "doc_id")
    )
    own = queries.select("query_id", F.col("query_id").alias("doc_id"))
    positives = top1.unionAll(own).distinct()
    pos_set = {(r.query_id, r.doc_id) for r in positives.collect()}
    mined = mine_hard_negatives(index, queries, positives, k=k).collect()
    by_q = {}
    for r in mined:
        assert (r.query_id, r.doc_id) not in pos_set
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for q, rows in by_q.items():
        ranks = sorted(r for r, _, _ in rows)
        assert ranks == list(range(1, len(rows) + 1))  # dense 1..k
        assert len(rows) <= k
        # equals the positives-filtered full ranking re-ranked
        want = sorted(
            (
                (v.score, v.doc_id)
                for (qq, d), v in base.items()
                if qq == q and (qq, d) not in pos_set
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        got = [(s, d) for _, d, s in sorted(rows)]
        assert got == [(s, d) for s, d in want]
