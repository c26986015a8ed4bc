"""BM25 full-text retrieval over a document corpus — the classic sparse
retrieval every training-data pipeline keeps next to its dense (ANN)
path: eval-set leakage hunting beyond exact n-grams, hard-negative
mining, corpus search.  Public formula: Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond" (Okapi BM25 with the
standard k1/b parametrization and the +0.5 smoothed idf).

Distributed shape — an inverted-index join, NOT a pairwise scan:

- corpus side: one tokenize/explode pass -> per-(doc, term) tf rows and
  per-doc lengths; document frequencies are one term-keyed aggregate.
  At production scale these are computed once and persisted as the
  "index" (:func:`bm25_index`).
- query side: per-(query, term) rows, joined to the index ON TERM — the
  shuffle is keyed by term and touches only postings for query terms
  (the sliver), never the full corpus row space.  Scoring is one
  (query, doc) aggregate; top-k is the per-query window everything else
  in this package uses.
- the only broadcast is the df/idf side of the query terms and the two
  scalars (N, avgdl); the corpus/posting side is never broadcast.

Everything is JVM expressions over exact integer tf/df counts plus
double arithmetic, so a SQL oracle reproduces the scores to
summation-order rounding (`tests/test_retrieval.py` runs a DuckDB twin
over the real documents table at rel=1e-12).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_spark.operators.lm import _tokens


class BM25Index(NamedTuple):
    """Materialized sparse index.

    ``postings``: (term, doc_id, tf) — one row per distinct (doc, term);
    ``doclens``: (doc_id, dl) whitespace token counts;
    ``docfreq``: (term, df) distinct-document frequencies;
    ``n_docs``: corpus size; ``avgdl``: mean document length.
    """

    postings: DataFrame
    doclens: DataFrame
    docfreq: DataFrame
    n_docs: int
    avgdl: float


def _term_rows(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    return df.select(
        F.col(key_col).alias("doc_id"), _tokens(text_col).alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    )


def bm25_index(
    docs: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> BM25Index:
    """Build the sparse index: one explode + two aggregates over the
    corpus.  Empty documents carry no postings (they can never match) but
    still count toward N and avgdl via the length table."""
    rows = _term_rows(docs, text_col, key_col)
    postings = rows.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    doclens = docs.select(
        F.col(key_col).alias("doc_id"), F.size(_tokens(text_col)).alias("dl")
    )
    docfreq = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    stats = doclens.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return BM25Index(
        postings, doclens, docfreq, int(stats["n"]), float(stats["avgdl"] or 0.0)
    )


def bm25_topk(
    index: BM25Index,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    key_col: str = "query_id",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — Okapi BM25 top-k per query.

    score(q, d) = sum over shared terms of
    ``idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))`` with
    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive).
    Repeated query terms weight a term once per occurrence, the standard
    bag-of-words query treatment.  Ties break toward the lower doc id.

    ``max_df_frac`` enables stopword pruning — query terms with
    ``df > max_df_frac * N`` are dropped *before* the posting join.
    This is the term-sliver scale lever: on Zipfian text a handful of
    stopwords sit in nearly every document, so their posting lists are
    corpus-sized while their idf (≈ ln(1 + ε)) contributes noise-level
    score; pruning them caps the posting mass any query can touch at
    ``max_df_frac × N × n_query_terms`` without measurably moving
    rankings.  The classic Lucene/Terrier stopword heuristic expressed
    as a df filter.  Default None = exact scoring over every term.
    """
    q_terms = _term_rows(queries, text_col, key_col).withColumnRenamed(
        "doc_id", "query_id"
    ).select("query_id", "term")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(index.n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    docfreq = index.docfreq
    if max_df_frac is not None:
        docfreq = docfreq.where(F.col("df") <= max_df_frac * index.n_docs)
    weighted = q_terms.join(docfreq, "term").withColumn("idf", idf)
    hits = (
        weighted.join(index.postings, "term")
        .join(index.doclens, "doc_id")
        .withColumn(
            "__s",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.lit(index.avgdl)
                )
            ),
        )
    )
    scored = hits.groupBy("query_id", "doc_id").agg(F.sum("__s").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    weights: "list[float] | None" = None,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists — the standard sparse+dense
    hybrid (Cormack, Clarke & Buettcher 2009: fused score(d) =
    sum over rankings of ``w_r / (rrf_k + rank_r(d))``; rank-based, so no
    score normalization across heterogeneous retrievers is needed).

    Each input frame must carry (``query_col``, ``rank``, ``id_col``) —
    the contract :func:`bm25_topk` and the ANN top-k operators share
    (rename ``neighbor_id`` to the common id first).  A document absent
    from a ranking simply contributes nothing for it.  One union + one
    (query, doc) aggregate + the per-query window — candidate-sized work,
    nothing corpus-sized.  Ties break toward the lower doc id.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    ws = weights if weights is not None else [1.0] * len(rankings)
    if len(ws) != len(rankings):
        raise ValueError("weights must match rankings")
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(float(w)) / (F.lit(float(rrf_k)) + F.col("rank"))).alias("__c"),
        )
        for r, w in zip(rankings, ws)
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionAll(p)
    fused = allp.groupBy("query_id", "doc_id").agg(F.sum("__c").alias("score"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def mine_hard_negatives(
    index: BM25Index,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 10,
    text_col: str = "text",
    key_col: str = "query_id",
    doc_col: str = "doc_id",
    **bm25_kwargs,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — the top-``k`` BM25 hits per
    query EXCLUDING its labeled positives: hard-negative mining, the
    standard recipe for contrastive retriever / reranker training data
    (in-batch random negatives are too easy; the top lexically-similar
    non-answers are the gradient-bearing ones — public method, e.g. the
    DPR / sentence-transformers mining pipelines).

    ``positives``: (query_id, doc_id) labeled relevant pairs.  One
    NULL-safe left-anti join on (query_id, doc_id) after scoring;
    ranks are re-assigned AFTER the exclusion so the output is a dense
    1..k per query.  Over-fetch happens inside the score ranking
    (k + per-query positive count is unknowable cheaply, so this scores
    top ``k + max_positives`` where ``max_positives`` is the observed
    per-query maximum — one tiny aggregate).

    Scale shape: identical to :func:`bm25_topk` (term-keyed posting
    join) plus one anti-join against the label set, which is
    training-data-sized (≪ corpus) by construction.
    """
    from pyspark.sql.window import Window

    pos = positives.select(
        F.col(key_col).alias("query_id"), F.col(doc_col).alias("doc_id")
    )
    [row] = pos.groupBy("query_id").agg(F.count("*").alias("c")).agg(
        F.coalesce(F.max("c"), F.lit(0)).alias("m")
    ).collect()
    fetch = k + int(row["m"])
    hits = bm25_topk(
        index, queries, k=fetch, text_col=text_col, key_col=key_col,
        **bm25_kwargs,
    )
    survivors = hits.join(pos, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
