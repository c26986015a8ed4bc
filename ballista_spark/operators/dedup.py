"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All operators are pure DataFrame compositions (no Python UDFs): hashing uses
Spark's JVM-side ``xxhash64``/``md5``, shingling uses higher-order array
functions, and every aggregation is a single-shuffle groupBy — the plans
whole-stage-codegen end to end.

Scale design (100 TB / 1000 executors):

- *exact*: one hash-groupBy shuffle on the content hash; map-side partial
  aggregation shrinks the shuffle to ~one row per distinct document.
- *MinHash+LSH*: signatures are 128 ``min()`` aggregates over exploded
  shingles (one shuffle keyed by doc); banding emits 32 rows/doc and the
  band-bucket self-join touches only same-bucket docs — never the n² pair
  space.  Candidate verification joins the (small) candidate set back to
  shingle sets with a broadcast.
- *SimHash*: 60-bit signatures from token-hash bit voting (60 conditional
  sums, one shuffle); Hamming-≤k candidate generation uses the pigeonhole
  chunk trick (k+1 chunks, join per equal chunk) — again no n² blowup.
- *n-gram Jaccard* (exact): shingle-equality self-join computes pairwise
  intersections directly; exact but shuffle-heavy — at scale prefer the
  LSH path and keep this as the verifier/oracle.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: MinHash defaults: 128 permutations as 32 bands × 4 rows — P(miss) for
#: jaccard j is (1-j^4)^32: < 5e-8 at j=0.8, so LSH+verify is exact w.h.p.
#: at the 0.8 threshold.
N_HASHES = 128
N_BANDS = 32
ROWS_PER_BAND = N_HASHES // N_BANDS

#: SimHash width: 60 bits keeps every chunk/shift in positive signed-long
#: territory (no sign-bit edge cases in either engine).
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4  # hamming <= SIMHASH_CHUNKS-1 guaranteed caught


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Exact dedup: canonical row = min(key) per content hash.

    Returns the input plus ``content_hash`` and ``is_canonical``.
    """
    h = F.md5(F.col(text_col)).alias("content_hash")
    withh = df.withColumn("content_hash", h)
    canon = withh.groupBy("content_hash").agg(F.min(key_col).alias("__keep"))
    return (
        withh.join(F.broadcast(canon), "content_hash")
        .withColumn("is_canonical", F.col(key_col) == F.col("__keep"))
        .drop("__keep")
    )


def _tokens(text_col: str) -> F.Column:
    return F.split(F.trim(F.col(text_col)), " ")


def shingle_sets(df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """(key, shingle) rows — distinct word n-grams per document."""
    toks = _tokens(text_col)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )
    return (
        df.where(F.size(toks) >= n)
        .select(F.col(key_col).alias("key"), F.explode(shingles).alias("shingle"))
    )


def _minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """One row per key with h0..h{n-1} minhash columns (single shuffle)."""
    aggs = [
        F.min(F.xxhash64(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("key").agg(*aggs)


def _exact_jaccard(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Annotate candidate (key_a, key_b) pairs with exact shingle jaccard."""
    sizes = sh.groupBy("key").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("key").alias("key_a"), "shingle")
    sb = sh.select(F.col("key").alias("key_b"), "shingle")
    inter = (
        F.broadcast(pairs)
        .join(sa, "key_a")
        .join(sb, ["key_b", "shingle"])
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"key": "key_a", "n": "na"}), "key_a")
        .join(sizes.withColumnsRenamed({"key": "key_b", "n": "nb"}), "key_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-jaccard verification.

    Returns (key_a, key_b, jaccard) with key_a < key_b and jaccard >= threshold.
    The exact verification makes the output equal to the brute-force answer
    whenever banding recall holds (P(miss) < 5e-8 at j=0.8 with 32×4).
    """
    rows = n_hashes // n_bands
    sh = shingle_sets(df, text_col, key_col, n)
    sig = _minhash_signatures(sh, n_hashes)
    band_hashes = F.array(
        *[
            F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)])
            for b in range(n_bands)
        ]
    )
    banded = sig.select("key", F.posexplode(band_hashes).alias("band", "bucket"))
    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .distinct()
    )
    return (
        _exact_jaccard(cands, sh)
        .where(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via shingle-equality self-join.

    Exact (no LSH); the shingle join bounds work to docs sharing at least one
    shingle.  At 100 TB prefer :func:`minhash_lsh_pairs`; this is the
    ground-truth verifier.
    """
    sh = shingle_sets(df, text_col, key_col, n)
    sizes = sh.groupBy("key").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .groupBy(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"key": "key_a", "n": "na"}), "key_a")
        .join(sizes.withColumnsRenamed({"key": "key_b", "n": "nb"}), "key_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """60-bit SimHash per document from token-hash bit voting.

    One shuffle: explode tokens, then ``bits`` conditional sums; the
    signature is assembled with shifts/ORs — all JVM expressions.
    """
    toks = df.select(
        F.col(key_col).alias("key"),
        F.explode(_tokens(text_col)).alias("tok"),
    ).withColumn("th", F.xxhash64("tok"))
    votes = toks.groupBy("key").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    sim = functools.reduce(
        lambda acc, j: acc + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(0),
        range(bits),
        F.lit(0).cast("long"),
    )
    return votes.select("key", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = SIMHASH_CHUNKS - 1,
) -> DataFrame:
    """Near-duplicate pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole banding: split 60 bits into 4 chunks; any pair within
    Hamming 3 shares >= 1 exact chunk, so the candidate join is on
    (chunk_idx, chunk_value), then verified with bit_count(xor).
    """
    sig = simhash_signatures(df, text_col, key_col)
    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << chunk_bits) - 1
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(F.lit(mask))
            for c in range(SIMHASH_CHUNKS)
        ]
    )
    banded = sig.select(
        "key", "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk_val")
    )
    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("key_a", "key_b", "hamming")
    )
