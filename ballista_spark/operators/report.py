"""Corpus data-card report: one-pass per-group statistics over a
document corpus — the summary table a training-data pipeline publishes
alongside a dataset release (doc/token volumes, length distribution,
duplication rate, language mix, quality band, optional contamination).

Composition operator over :mod:`.text` / :mod:`.decontam` column
expressions; reference parity: the reference engine ships nothing like
it (pure relational surface) — this exists because a 100 TB corpus
needs its data card computed *in-engine*, not by a driver-side sample.

Scale shape: ONE aggregation shuffle keyed by the group column.  Every
per-document metric (token count, length, quality, repetition, lang id,
content hash) is a map-side column expression; the aggregate layer is
count/sum/avg/max plus exact ``percentile`` and ``count_distinct`` —
all map-combining JVM aggregates (count_distinct is two-phase).  The
optional contamination join adds the benchmark-broadcast shingle pass
from :func:`decontam.contamination_stats` (benchmark eval-set-sized).
No corpus-sized broadcast, no self-join, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballista_spark.operators.decontam import contamination_stats
from ballista_spark.operators.lm import _tokens as _ws_tokens
from ballista_spark.operators.text import (
    LANG_STOPWORDS,
    dup_ngram_fraction,
    lang_id,
    quality_score,
)


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    group_col: str = "source",
    benchmark: DataFrame | None = None,
    contamination_threshold: float = 0.2,
) -> DataFrame:
    """One row per ``group_col`` value with the corpus data-card metrics:

    - ``n_docs``, ``n_tokens``, ``n_chars`` — volumes (exact).
    - ``tokens_p50`` / ``tokens_p95`` / ``tokens_max`` — exact length
      percentiles (Spark ``percentile``, not the approx sketch: the
      per-group state is the group's token-count multiset, fine for
      data-card cardinalities; swap to ``percentile_approx`` for
      billions of docs per group).
    - ``exact_dup_frac`` — 1 - distinct(md5(text))/n: mass of byte-dup
      copies (exact two-phase count_distinct).
    - ``lang_<l>_frac`` for each language in :data:`text.LANG_STOPWORDS`
      — language mix by the n-gram/stopword classifier.
    - ``quality_mean``, ``rep2_mean`` — quality score and Gopher
      duplicate-bigram repetition averages.
    - with ``benchmark``: ``contaminated_frac`` — docs whose n-gram
      overlap exceeds ``contamination_threshold`` (docs shorter than the
      shingle width count as clean, matching ``decontaminate``).
    """
    g = F.col(group_col)
    per_doc = docs.select(
        g.alias("grp"),
        F.col(key_col).alias("key"),
        # token accounting uses the whitespace-RUN tokenizer (lm._tokens),
        # not text.token_count's oracle-facing single-space split — a
        # tab/newline-separated doc must not report ~1 token on its card
        # (the same pitfall curate_corpus documents for its token band)
        F.size(_ws_tokens(text_col)).cast("bigint").alias("nt"),
        F.length(text_col).cast("bigint").alias("nc"),
        F.md5(F.col(text_col)).alias("ch"),
        lang_id(text_col).alias("lang"),
        quality_score(text_col).alias("q"),
        dup_ngram_fraction(text_col, 2).alias("rep2"),
    )
    if benchmark is not None:
        stats = contamination_stats(docs, benchmark, text_col, key_col)
        per_doc = per_doc.join(
            stats.select(
                "key",
                (F.col("contamination") > contamination_threshold).alias("bad"),
            ),
            "key",
            "left",
        ).withColumn("bad", F.coalesce(F.col("bad"), F.lit(False)))
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.sum("nc").alias("n_chars"),
        F.expr("percentile(nt, 0.5)").alias("tokens_p50"),
        F.expr("percentile(nt, 0.95)").alias("tokens_p95"),
        F.max("nt").alias("tokens_max"),
        (1.0 - F.countDistinct("ch") / F.count("*")).alias("exact_dup_frac"),
        *[
            (F.sum((F.col("lang") == lng).cast("long")) / F.count("*")).alias(
                f"lang_{lng}_frac"
            )
            for lng in LANG_STOPWORDS
        ],
        F.avg("q").alias("quality_mean"),
        F.avg("rep2").alias("rep2_mean"),
    ]
    if benchmark is not None:
        aggs.append(
            (F.sum(F.col("bad").cast("long")) / F.count("*")).alias(
                "contaminated_frac"
            )
        )
    return per_doc.groupBy(F.col("grp").alias(group_col)).agg(*aggs).orderBy(group_col)


def tokenizer_report(
    docs: DataFrame,
    tokens_col: str,
    text_col: str = "text",
    group_col: str = "source",
    include_vocab: bool = False,
) -> DataFrame:
    """Per-group tokenizer-quality metrics over an already-tokenized
    corpus (compose downstream of ``bpe_encode`` / ``unigram_encode``):
    doc/token volumes, **fertility** (tokens per whitespace word — the
    standard cross-lingual tokenizer-quality number) and **bytes per
    token** (compression).  With ``include_vocab`` adds the exact
    distinct-token count per group.

    Scale shape: ONE aggregation shuffle keyed by the group column (all
    inputs are map-side column expressions); ``include_vocab`` adds one
    explode + a two-phase exact count_distinct — the same discipline as
    :func:`corpus_report`'s duplication metric.  NULL token arrays count
    as zero tokens, never poisoning the sums.
    """
    toks = F.when(F.col(tokens_col).isNull(), F.lit(0)).otherwise(
        F.size(tokens_col)
    )
    words = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(_ws_tokens(text_col))
    )
    tbytes = F.coalesce(F.octet_length(text_col), F.lit(0))
    base = (
        docs.groupBy(F.col(group_col))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(toks).alias("total_tokens"),
            F.sum(words).alias("total_words"),
            F.sum(tbytes).alias("total_bytes"),
        )
        .withColumn(
            "fertility", F.col("total_tokens") / F.col("total_words")
        )
        .withColumn(
            "bytes_per_token", F.col("total_bytes") / F.col("total_tokens")
        )
    )
    if not include_vocab:
        return base.orderBy(group_col)
    vocab = (
        docs.select(group_col, F.explode_outer(tokens_col).alias("__tok"))
        .groupBy(group_col)
        .agg(F.count_distinct("__tok").alias("vocab_used"))
    )
    return base.join(vocab, group_col, "left").orderBy(group_col)
