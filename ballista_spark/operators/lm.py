"""In-engine n-gram language model for perplexity-based quality
filtering — the CCNet-style LM filter (public method: Wenzek et al. 2020
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"), with stupid-backoff smoothing (Brants et al. 2007 "Large Language
Models in Machine Translation"), which exists precisely because it is the
smoothing that distributes: probabilities are count ratios, no
discount-mass bookkeeping, so both training and scoring are plain
count/join/aggregate DataFrame plans.

- :func:`ngram_lm_fit` — count all 1..n-grams in ONE explode + ONE
  groupBy, then a single self-join (order-k gram against its order-(k-1)
  context) turns counts into conditional log-probs.  The model is a
  DataFrame, never collected or broadcast by construction: on a 100 TB
  corpus the gram table is itself huge and flows through shuffle joins
  (Catalyst still auto-broadcasts when it happens to be small).
- :func:`ngram_lm_score` — per token position, the candidate grams of
  every order melt into rows, hit the model in ONE shuffle join, and the
  highest matched order wins with ln(alpha) per backoff step; one
  map-side-combining aggregate recovers per-position best, one more the
  per-document mean log-prob and perplexity.
- :func:`perplexity_filter` — threshold convenience (keep ppl <= max).

Reference parity: the reference engine has no LM operator — this is a
100 TB training-data-pipeline component (SURVEY §2 beyond-reference
inventory), where perplexity filtering is a standard corpus-quality
stage.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stupid-backoff discount per order step (Brants et al. 2007 use 0.4)
ALPHA = 0.4


class NgramLM(NamedTuple):
    """Trained stupid-backoff model.

    ``table``: (order, gram, logp) DataFrame — ln conditional probability
    of the gram's last token given its first order-1 tokens.
    ``n``: highest order; ``alpha``: backoff discount; ``oov_logp``:
    log-prob assigned when even the unigram is unseen (defaults to
    ln(1 / (train_tokens + 1))).
    """

    table: DataFrame
    n: int
    alpha: float
    oov_logp: float


def _tokens(text) -> F.Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(col), "\\s+"), lambda t: F.length(t) > 0)


def _gram_orders(toks: F.Column, orders: tuple[int, ...]) -> list[F.Column]:
    """Whole-array n-gram arrays, one per requested order.

    ``toks`` MUST be a materialized column reference (not the
    split/filter expression itself): a lambda that captures an expression
    subtree re-evaluates it per array element in Spark's interpreted
    higher-order-function path — per-position ``slice(tokenize(text)...)``
    measured ~90x slower than these O(len) whole-array slices + zip_with
    (500 docs: 92 s -> ~1 s; same pathology text.py's
    dup_ngram_fraction already avoids)."""
    sz = F.size(toks)
    arrs = {1: toks}
    for k in range(2, max(orders) + 1):
        length = F.greatest(sz - (k - 1), F.lit(0))
        arrs[k] = F.zip_with(
            F.slice(arrs[k - 1], 1, length),
            F.slice(toks, k, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return [arrs[k] for k in orders]


def _candidate_grams(toks: F.Column, n: int) -> F.Column:
    """array<struct<i,k,gram>> — for each 1-based position i, the grams of
    order k = 1..min(n, i) ending at i.  ``toks`` must be a materialized
    column reference (see :func:`_gram_orders`)."""

    def structs(k: int, arr: F.Column) -> F.Column:
        # order-k array element idx (0-based) ends at position i = idx + k
        return F.transform(
            arr,
            lambda g, idx: F.struct(
                (idx + F.lit(k)).cast("int").alias("i"),
                F.lit(k).alias("k"),
                g.alias("gram"),
            ),
        )

    arrs = _gram_orders(toks, tuple(range(1, n + 1)))
    return F.flatten(F.array(*[structs(k + 1, a) for k, a in enumerate(arrs)]))


def ngram_lm_fit(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    alpha: float = ALPHA,
) -> NgramLM:
    """Train a stupid-backoff n-gram LM on ``docs``.

    One explode + one (order, gram) count shuffle for every order at
    once; conditional probabilities come from a single shuffle self-join
    of order-k grams against their order-(k-1) context counts
    (``substring_index(gram, ' ', k-1)`` — exact because tokens contain
    no spaces).  Unigrams divide by the total token count (one scalar).

    The returned table is ``localCheckpoint``-materialized (executor
    memory/disk) so repeated scoring doesn't recount the corpus.  At
    production corpus scale the gram table is itself huge: write
    ``model.table`` to parquet once and reconstruct the
    :class:`NgramLM` from the saved table + metadata instead of keeping
    the checkpoint alive.
    """
    counts = (
        docs.select(_tokens(text_col).alias("__toks"))
        .select(F.explode(_candidate_grams(F.col("__toks"), n)).alias("c"))
        .groupBy(F.col("c.k").alias("order"), F.col("c.gram").alias("gram"))
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    try:
        total = counts.where(F.col("order") == 1).agg(F.sum("cnt")).collect()[0][0] or 0
        uni = counts.where(F.col("order") == 1).select(
            "order", "gram", F.log(F.col("cnt") / F.lit(float(total))).alias("logp")
        )
        ctx = counts.select(
            (F.col("order") + 1).alias("order"),
            F.col("gram").alias("ctx"),
            F.col("cnt").alias("ctx_cnt"),
        )
        higher = (
            counts.where(F.col("order") > 1)
            .withColumn("ctx", F.expr("substring_index(gram, ' ', order - 1)"))
            .join(ctx, ["order", "ctx"])
            .select(
                "order", "gram", F.log(F.col("cnt") / F.col("ctx_cnt")).alias("logp")
            )
        )
        table = uni.unionByName(higher).localCheckpoint(eager=True)
    finally:
        counts.unpersist()
    return NgramLM(table, n, alpha, -math.log(total + 1.0))


def ngram_lm_score(
    docs: DataFrame,
    model: NgramLM,
    text_col: str = "text",
    key_col: str = "doc_id",
    ppl_col: str = "ppl",
) -> DataFrame:
    """(key, n_tokens, avg_logp, ppl) per document with >= 1 token.

    Per position the melt emits <= n candidate rows which hit the model
    table in ONE join (shuffle or auto-broadcast — Catalyst's call);
    stupid backoff takes the highest matched order k with
    ``(k_max - k) * ln(alpha)`` discount, where k_max = min(n, i) is the
    order the position could have matched.  A position whose unigram is
    unseen scores ``(k_max - 1) * ln(alpha) + oov_logp``.  Perplexity is
    ``exp(-avg_logp)``.
    """
    ln_a = math.log(model.alpha)
    cand = (
        docs.select(F.col(key_col).alias("key"), _tokens(text_col).alias("__toks"))
        .select("key", F.explode(_candidate_grams(F.col("__toks"), model.n)).alias("c"))
        .select("key", F.col("c.i").alias("i"), F.col("c.k").alias("k"), F.col("c.gram").alias("gram"))
    )
    hits = cand.join(
        model.table.withColumnRenamed("order", "k"), ["k", "gram"], "left"
    )
    pos = hits.groupBy("key", "i").agg(
        F.max("k").alias("k_max"),
        F.max(
            F.when(F.col("logp").isNotNull(), F.struct("k", "logp"))
        ).alias("best"),
    )
    pos_logp = F.when(
        F.col("best").isNull(),
        (F.col("k_max") - 1) * F.lit(ln_a) + F.lit(model.oov_logp),
    ).otherwise(
        (F.col("k_max") - F.col("best.k")) * F.lit(ln_a) + F.col("best.logp")
    )
    return (
        pos.select("key", pos_logp.alias("logp"))
        .groupBy("key")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("logp").alias("avg_logp"),
        )
        .select(
            F.col("key").alias(key_col),
            "n_tokens",
            "avg_logp",
            F.exp(-F.col("avg_logp")).alias(ppl_col),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    model: NgramLM,
    n_buckets: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """CCNet's actual output shape: annotate every document with ``ppl``
    and a quantile ``ppl_bucket`` in 1..n_buckets (1 = lowest perplexity
    — CCNet's "head"; 3 buckets gives head/middle/tail).  Downstream
    pipelines keep the head, or sample buckets at different rates.

    Scale shape: thresholds come from ONE ``percentile_approx``
    aggregate (n_buckets-1 scalars to the driver) and bucketing is a
    map-only comparison — NOT a global ntile/window, which would
    serialize the corpus through a single partition.  Documents with no
    tokens carry NULL ppl and NULL bucket.
    """
    scored = ngram_lm_score(docs, model, text_col, key_col)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = scored.agg(
        F.percentile_approx("ppl", qs, 10000).alias("ts")
    ).collect()[0]
    thresholds = [float(t) for t in (row["ts"] or [])]
    bucket = F.lit(1)
    for t in thresholds:
        bucket = bucket + (F.col("ppl") > F.lit(t)).cast("int")
    return docs.join(
        scored.select(key_col, "ppl"), key_col, "left"
    ).withColumn(
        "ppl_bucket", F.when(F.col("ppl").isNotNull(), bucket)
    )


def perplexity_filter(
    docs: DataFrame,
    model: NgramLM,
    max_ppl: float,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose model perplexity is <= ``max_ppl``.

    Documents with no tokens carry no perplexity evidence and are
    dropped (the standard pipeline treats empty docs as garbage).
    """
    scores = ngram_lm_score(docs, model, text_col, key_col)
    return docs.join(
        scores.where(F.col("ppl") <= F.lit(max_ppl)).select(key_col), key_col, "inner"
    )
