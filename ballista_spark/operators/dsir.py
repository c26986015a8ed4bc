"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling", NeurIPS).

Given a small *target* corpus (the distribution you want — e.g. curated
wiki/books) and a huge *raw* corpus (the web crawl), DSIR estimates bag-of-
hashed-n-grams unigram distributions p (target) and q (raw), scores every
raw document with the log importance weight

    log w(doc) = Σ_grams  [ log p(bucket(gram)) − log q(bucket(gram)) ]

and resamples the raw corpus with probability ∝ w via the Gumbel-top-k
trick.  This is the published method behind targeted pre-training data
selection at web scale; everything here is its Spark-first re-expression:

- :func:`dsir_fit` — two bucket-count aggregates (one per corpus, each a
  single explode + groupBy shuffle) full-outer-joined into a ≤
  ``n_features``-row log-ratio table.  Laplace (add-``alpha``) smoothing
  keeps unseen buckets finite; the model stays a DataFrame (never
  collected — only the two scalar gram totals hit the driver).
- :func:`dsir_log_weights` — per-doc raw hashed-gram counts
  (quality.hashed_ngram_features with ``normalize=False``) joined against
  the **broadcast** log-ratio table (bounded by ``n_features`` — the
  hashing trick exists precisely to cap the model at broadcastable size),
  then one per-doc sum.  Map-side after the feature shuffle; the corpus
  is never broadcast or collected.
- :func:`dsir_resample` — deterministic Gumbel-top-k: the md5 lottery
  (operators/sampling.py) supplies u ∈ (0,1), g = −ln(−ln u), and the
  top-``k`` docs by ``log_w + g`` are selected with probability
  proportional to their importance weight.  ``orderBy().limit(k)``
  compiles to TakeOrderedAndProject — per-partition partial top-k, only
  k rows per partition ever shuffle, so selection from 100 TB moves
  k·n_partitions rows, not the corpus.

Cross-engine determinism: buckets come from the 60-bit md5 hash
(operators/hashing.py) and the lottery from the md5 hex prefix, both of
which DuckDB reproduces bit-for-bit; log/exp are IEEE libm calls whose
cross-engine agreement is within the 1e-4-rounded-sum discipline the
graded corpus already uses for LM/quality scores.

Reference parity: the reference engine ships no data-selection operator —
this exists for the 100 TB training-data pipeline (SURVEY §2 "beyond the
reference" inventory), where targeted selection is a first-class stage.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballista_spark.operators.quality import N_FEATURES, hashed_ngram_features
from ballista_spark.operators.sampling import _LOTTERY_SPACE_F, lottery_long


class DSIRModel(NamedTuple):
    """Fitted importance model: per-bucket log p/q ratios plus the
    smoothing floor for buckets seen in neither corpus, and the hashing
    config the ratios were computed under (scoring MUST re-hash with the
    same ``n_features``/``ngrams`` — same reason LogRegModel carries
    them)."""

    log_ratio: DataFrame  # (bucket, lr)
    default_lr: float
    n_features: int = N_FEATURES
    ngrams: "tuple[int, ...]" = (1, 2)


def _bucket_counts(
    df: DataFrame, text_col: str, key_col: str, n_features: int, ngrams: Sequence[int]
) -> DataFrame:
    """(bucket, c) — corpus-wide hashed-gram counts, one shuffle."""
    feats = hashed_ngram_features(
        df, text_col, key_col, n_features=n_features, ngrams=ngrams, normalize=False
    )
    return feats.groupBy("bucket").agg(F.sum("x").cast("double").alias("c"))


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_features: int = N_FEATURES,
    ngrams: Sequence[int] = (1, 2),
    alpha: float = 1.0,
) -> DSIRModel:
    """Estimate the per-bucket log importance ratio log p_target − log q_raw.

    Smoothed probability of bucket b in a corpus with gram total T:
    ``(c_b + alpha) / (T + alpha·n_features)`` — exactly Laplace smoothing
    over the ``n_features``-way categorical, so every bucket (even unseen)
    has positive mass and the ratio is finite.

    Two aggregate shuffles (one per corpus) + one ≤ n_features-row join;
    only the two scalar totals are collected.  The ratio table is eagerly
    localCheckpoint-ed: it is joined once per scoring pass and per
    resample, and re-deriving the double aggregate each time would redo
    both corpus scans.
    """
    ng = tuple(ngrams)
    tc = _bucket_counts(target, text_col, key_col, n_features, ng)
    rc = _bucket_counts(raw, text_col, key_col, n_features, ng)
    tot_t = tc.agg(F.sum("c")).collect()[0][0] or 0.0
    tot_r = rc.agg(F.sum("c")).collect()[0][0] or 0.0
    denom_t = tot_t + alpha * n_features
    denom_r = tot_r + alpha * n_features
    lr = (
        tc.withColumnRenamed("c", "ct")
        .join(rc.withColumnRenamed("c", "cr"), "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log((F.coalesce("ct", F.lit(0.0)) + alpha) / denom_t)
                - F.log((F.coalesce("cr", F.lit(0.0)) + alpha) / denom_r)
            ).alias("lr"),
        )
        .localCheckpoint(eager=True)
    )
    default_lr = math.log(alpha / denom_t) - math.log(alpha / denom_r)
    return DSIRModel(lr, default_lr, n_features, ng)


def dsir_log_weights(
    df: DataFrame,
    model: DSIRModel,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, n_grams, log_w) — the log importance weight per document.

    Feature rows join the broadcast ratio table (left — buckets absent
    from both corpora coalesce to the smoothing floor), then one per-doc
    reduce.  Documents with no grams (empty text) are kept with
    ``log_w = 0`` (weight 1) via the final left join — dropping them
    silently would make resampling rates corpus-dependent.
    """
    feats = hashed_ngram_features(
        df,
        text_col,
        key_col,
        n_features=model.n_features,
        ngrams=model.ngrams,
        normalize=False,
    )
    scored = (
        feats.join(F.broadcast(model.log_ratio), "bucket", "left")
        .groupBy("key")
        .agg(
            F.sum("x").cast("long").alias("n_grams"),
            F.sum(F.col("x") * F.coalesce("lr", F.lit(model.default_lr))).alias("log_w"),
        )
    )
    return (
        df.select(F.col(key_col).alias("key"))
        .join(scored, "key", "left")
        .select(
            "key",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def gumbel_column(key_cols: Sequence[str], seed: str = "dsir") -> F.Column:
    """Deterministic standard-Gumbel draw per row: g = −ln(−ln u) with
    u = (lottery + 0.5) / 2^60 ∈ (0, 1) from the md5 lottery — same row,
    same seed → same draw on any cluster, any partitioning, any engine
    with md5 (DuckDB mirror uses the identical hex-prefix construction)."""
    u = (lottery_long(key_cols, seed).cast("double") + F.lit(0.5)) / F.lit(
        _LOTTERY_SPACE_F
    )
    return -F.log(-F.log(u))


def dsir_resample(
    df: DataFrame,
    model: DSIRModel,
    k: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    seed: str = "dsir",
) -> DataFrame:
    """Select ``k`` documents with probability ∝ exp(log_w) — the
    Gumbel-top-k trick: argtop-k of (log_w + Gumbel) is a weighted sample
    without replacement, with no normalizing constant and no RNG state.

    Deterministic (content-hash Gumbel; ties broken by key) and
    scale-right: the sort is TakeOrderedAndProject, so each partition
    contributes at most k rows to the final selection shuffle.
    Returns the original rows plus ``log_w`` and the selection ``score``.
    """
    lw = dsir_log_weights(df, model, text_col, key_col).withColumnRenamed(
        "key", key_col
    )
    scored = df.join(lw, key_col).withColumn(
        "score", F.col("log_w") + gumbel_column([key_col], seed)
    )
    return scored.orderBy(F.desc("score"), F.col(key_col)).limit(k)
