"""Benchmark decontamination: flag training documents that overlap a
held-out evaluation set by word n-grams.

The standard contamination check for LLM training corpora: a document is
contaminated when a large fraction of its n-grams also appear anywhere in
the benchmark (eval prompts/answers).  Expressed entirely as DataFrame
ops over the shingle machinery shared with :mod:`.dedup` — no Python UDFs.

Scale shape (100 TB corpus, bounded benchmark):

- The benchmark n-gram set is *eval-set-sized* (thousands of documents →
  at most a few hundred MB of distinct n-grams), bounded by construction,
  not corpus-sized — the one side of this problem that is legitimately
  broadcastable.  ``broadcast_benchmark=False`` switches to a shuffle join
  for unusually large benchmark suites.
- The corpus side is a map-side shingle explode followed by one groupBy on
  the document key: a single shuffle whose width is the corpus's shingle
  count, with map-side partial aggregation.  No self-join, no pair space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballista_spark.operators.dedup import shingle_sets


def benchmark_ngrams(
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """The distinct word ``n``-grams of the eval set (one column ``s``)."""
    return (
        shingle_sets(benchmark, text_col, key_col, n)
        .select(F.col("shingle").alias("s"))
        .distinct()
    )


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document n-gram overlap against the benchmark.

    Returns ``(key, n_ngrams, n_hits, contamination)`` — ``contamination``
    is the fraction of the document's distinct n-grams found in the
    benchmark (``n_hits / n_ngrams``, IEEE double, cross-engine exact).
    Documents shorter than ``n`` tokens have no n-grams and are omitted
    (they cannot be contaminated *by this measure*; callers keep them).
    """
    doc_sh = shingle_sets(docs, text_col, key_col, n)
    bench = benchmark_ngrams(benchmark, text_col, key_col, n)
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    hits = doc_sh.join(bench, doc_sh["shingle"] == bench["s"], "left")
    return (
        hits.groupBy("key")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("s").alias("n_hits"),
        )
        .withColumn("contamination", F.col("n_hits") / F.col("n_ngrams"))
    )


def contamination_matrix(
    docs: DataFrame,
    benchmarks: DataFrame,
    suite_col: str = "suite",
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document, per-eval-suite n-gram overlap in ONE corpus pass —
    production decontamination screens against dozens of suites at once
    and needs per-suite attribution (which benchmark leaked, not just
    whether something did).

    ``benchmarks``: one DataFrame of all suites' documents with a
    ``suite_col`` label.  Returns the long-format matrix
    ``(key, suite, n_ngrams, n_hits, contamination)`` — one row per
    (document, suite) with at least one shared n-gram, plus the
    document's total n-gram count on every row (so any row alone yields
    the fraction).  Documents overlapping no suite are omitted (their
    contamination is 0 against every suite).

    Scale shape: the corpus is shingled ONCE (the expensive map+explode);
    the benchmark side is (suite, gram) distinct pairs — still
    eval-set-sized, broadcast by default — and the per-(key, suite)
    aggregation is one shuffle.  N separate :func:`contamination_stats`
    calls would scan and shingle the corpus N times.
    """
    doc_sh = shingle_sets(docs, text_col, key_col, n)
    bench = (
        shingle_sets(benchmarks, text_col, key_col, n)
        .join(
            benchmarks.select(
                F.col(key_col).alias("key"), F.col(suite_col).alias("suite")
            ),
            "key",
        )
        .select("suite", F.col("shingle").alias("s"))
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    sizes = doc_sh.groupBy("key").agg(F.count("*").alias("n_ngrams"))
    hits = (
        doc_sh.join(bench, doc_sh["shingle"] == bench["s"])
        .groupBy("key", "suite")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        hits.join(sizes, "key")
        .withColumn("contamination", F.col("n_hits") / F.col("n_ngrams"))
        .select("key", "suite", "n_ngrams", "n_hits", "contamination")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    max_contamination: float = 0.2,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    broadcast_benchmark: bool = True,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Drop documents whose benchmark n-gram overlap exceeds
    ``max_contamination``; documents with fewer than ``n`` tokens are kept
    (no n-grams → no evidence of contamination).

    Pass a precomputed :func:`contamination_stats` frame via ``stats`` when
    the caller also needs the per-document numbers — the corpus-wide
    tokenize/shingle/explode is the expensive shuffle here, and recomputing
    it inside this call would double it.
    """
    if stats is None:
        stats = contamination_stats(
            docs, benchmark, text_col, key_col, n, broadcast_benchmark
        )
    flagged = stats.where(F.col("contamination") > max_contamination).select(
        F.col("key").alias(key_col)
    )
    return docs.join(flagged, on=key_col, how="left_anti")


def fuzzy_contaminated_keys(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    n_hashes: int | None = None,
    n_bands: int | None = None,
) -> DataFrame:
    """Corpus keys (as strings) near-duplicating SOME benchmark document
    at shingle jaccard >= ``threshold`` — the fuzzy contamination test:
    a lightly-paraphrased eval prompt shares almost no exact n-gram run
    with its source but keeps a high jaccard.

    One row per contaminated doc with its best-matching benchmark doc:
    ``(key, seen_key, jaccard)``, max-jaccard (ties: max seen_key —
    the struct-max ordering, deterministic either way).
    Scale shape is :func:`dedup.neardup_against`'s: the benchmark rides
    the corpus's MinHash pass as extra rows (eval-set-sized), candidate
    verification is bucket-pruned — never corpus × benchmark.  Banding
    adapts to ``threshold`` (``dedup.banding_for_threshold``) so recall
    holds at low thresholds too, not just the dedup-tuned j ≥ 0.8.
    """
    from ballista_spark.operators.dedup import neardup_against

    pairs = neardup_against(
        docs, benchmark, text_col, key_col, n=n, threshold=threshold,
        n_hashes=n_hashes, n_bands=n_bands,
    )
    return pairs.groupBy("key").agg(
        F.max(F.struct("jaccard", F.col("seen_key"))).alias("m")
    ).select(
        "key", F.col("m.seen_key").alias("seen_key"), F.col("m.jaccard").alias("jaccard")
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    flagged: DataFrame | None = None,
) -> DataFrame:
    """Drop documents whose near-duplicate jaccard against any benchmark
    document reaches ``threshold`` (fuzzy complement of
    :func:`decontaminate` — run both: exact n-gram overlap catches
    verbatim quoting at low thresholds, the fuzzy pass catches whole-doc
    paraphrase the overlap fraction misses when the doc is long).

    Pass a precomputed :func:`fuzzy_contaminated_keys` frame via
    ``flagged`` to reuse the MinHash pass.  The anti-join compares keys
    through CAST(key AS STRING) (the fuzzy pass's tagged key space).
    """
    if flagged is None:
        flagged = fuzzy_contaminated_keys(
            docs, benchmark, threshold, text_col, key_col, n
        )
    # alias the join key: an unqualified "key" is ambiguous whenever the
    # corpus itself carries a column of that name (several operators here
    # emit one)
    fk = flagged.select(F.col("key").alias("__fz_key"))
    return docs.join(
        fk, docs[key_col].cast("string") == fk["__fz_key"], "left_anti"
    )
