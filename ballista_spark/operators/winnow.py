"""Winnowing document fingerprints — the MOSS algorithm (Schleimer,
Wilkerson & Aiken, *Winnowing: Local Algorithms for Document
Fingerprinting*, SIGMOD 2003) — plus shared-fingerprint overlap
detection.

:func:`text.fingerprint` gives ONE rolling hash per document (whole-doc
identity); winnowing selects a position-robust *set* of k-gram hashes per
document, chosen so that any sufficiently long shared passage between two
documents is guaranteed to share a fingerprint:

- hash every ``k``-token window (k-grams);
- slide a window of ``w`` consecutive k-gram hashes over each document;
- in each window keep the minimum hash (rightmost on ties — "robust
  winnowing", which makes the selected set depend only on content, not on
  how far a shared passage sits from the document start);
- the fingerprint set is the distinct selected (hash, position) pairs.

Guarantees (paper §3): every shared token run of length ≥ ``w + k - 1``
contributes at least one shared fingerprint, and the expected density of
selected positions is ``2 / (w + 1)`` — a tunable sketch that, unlike
MinHash, localizes *where* the overlap is and detects partial overlap
(one shared section in otherwise-different documents), which is the
plagiarism/mirror-page case MinHash's whole-document Jaccard dilutes.

The reference engine has no fingerprinting operator (pure relational
surface, ``rust/core/proto/ballista.proto``); this exists because a
100 TB training-data pipeline needs partial-overlap detection between
crawl snapshots and mirror sites.

Scale design (100 TB / 1000 executors):

1. k-gram hashing reuses :func:`substr._with_window_strings`'s O(log k)
   whole-array doubling (the measured interpreted-HOF discipline) — one
   map-only pass, no shuffle.
2. winnow selection is ONE per-document window pass (partitionBy(key)):
   the 40-bit hash and the position tie-break are packed into a single
   60-bit integer so the whole rightmost-min rule is ``min()`` over a
   ``ROWS BETWEEN CURRENT AND w-1 FOLLOWING`` frame — exactly
   reproducible in any engine with the same packing arithmetic.
   Per-document partitions are document-sized, never corpus-sized.
3. overlap pairing is the same capped-bucket discipline as MinHash LSH:
   fingerprints with document-frequency > ``max_df`` (corpus boilerplate
   — MOSS likewise drops over-common fingerprints) are pruned via a
   groupBy + join-back (NOT a Window over the hash — the substr.py
   hot-hash lesson), so pair expansion per hash is bounded by
   ``max_df²`` and the join streams; nothing corpus-sized is broadcast
   or collected.

Positions are packed into ``POS_BITS`` = 20 bits: documents beyond 2^20
k-gram positions (~1M tokens) still fingerprint correctly — the min-hash
selection only saturates the reported tie-break *position* at 2^20-1 —
but chunk monster documents first (operators/text.py ``chunk_tokens``)
if exact positions matter.  The 40-bit hash space means ~1e-6 collision
probability per pair of distinct grams at corpus scale — the same
trade-off MOSS makes with 32-bit hashes, fine for overlap *detection*
(verify exact spans with operators/substr.py if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_spark.operators.hashing import hex15_long
from ballista_spark.operators.substr import window_occurrences

#: tie-break position bits packed below the hash (documents are assumed
#: < 2^20 k-gram positions; beyond that the reported position saturates)
POS_BITS = 20
POS_SPACE = 1 << POS_BITS
#: fingerprint hash width — 40 bits keeps hash*2^20 inside signed-64
HASH_BITS = 40
HASH_SPACE = 1 << HASH_BITS

#: MOSS-ish defaults: 5-token grams, guarantee threshold t = w + k - 1 = 12
DEFAULT_K = 5
DEFAULT_W = 8


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(key, fp_hash, fp_pos) — robust-winnowing selected fingerprints.

    ``fp_hash`` is the 40-bit truncation of the md5-derived k-gram hash
    (cross-engine reproducible, operators/hashing.py); ``fp_pos`` is the
    1-based token index where the selected k-gram starts.  Documents
    with fewer than ``k`` tokens yield no fingerprints; documents with
    fewer than ``w`` k-grams are winnowed as a single window (their
    global min survives — short docs still fingerprint).

    One map-only hashing pass + one per-document window pass; the only
    shuffle is the hash-partition by ``key``.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    occ = window_occurrences(df, text_col, key_col, w=k)
    h40 = hex15_long("gh") % F.lit(HASH_SPACE)
    # pack (hash, rightmost-pos tie-break) into one orderable integer:
    # min(enc) = min hash, then max pos among equal hashes
    enc = h40 * F.lit(POS_SPACE) + (
        F.lit(POS_SPACE - 1) - F.least(F.col("pos"), F.lit(POS_SPACE - 1))
    )
    per_doc = Window.partitionBy("key")
    frame = (
        Window.partitionBy("key")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    staged = (
        occ.withColumn("__enc", enc)
        .withColumn("__n", F.count("*").over(per_doc))
        .withColumn("__sel", F.min("__enc").over(frame))
    )
    # full windows start at pos 1 .. n-w+1; a doc with n < w k-grams is
    # one (short) window anchored at pos 1
    starts = staged.where(
        F.col("pos") <= F.greatest(F.col("__n") - F.lit(w - 1), F.lit(1))
    )
    return (
        starts.select("key", F.col("__sel").alias("__e"))
        .distinct()
        .select(
            "key",
            # integer div, NOT `/` (double division loses bits past 2^53)
            F.expr(f"__e div {POS_SPACE}").alias("fp_hash"),
            (
                F.lit(POS_SPACE - 1) - F.col("__e") % F.lit(POS_SPACE)
            ).cast("int").alias("fp_pos"),
        )
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    max_df: int = 1000,
    min_shared: int = 2,
    min_overlap: float = 0.0,
) -> DataFrame:
    """(key_a, key_b, shared, m_a, m_b, overlap) — document pairs ranked
    by shared winnowing fingerprints, ``overlap = shared /
    min(m_a, m_b)`` (containment — a small doc fully mirrored inside a
    big one scores 1.0, the MOSS report semantics).

    ``max_df`` prunes fingerprints appearing in more than that many
    documents (corpus boilerplate: license headers, navigation chrome)
    BEFORE pairing — both the standard MOSS move and the scale bound:
    per-hash pair expansion is ≤ ``max_df²`` and the equi-join on
    ``fp_hash`` streams.  ``m_a``/``m_b`` count each document's
    fingerprints *after* the prune, so ``overlap`` is computed over the
    same universe as ``shared`` (a doc that is pure boilerplate has
    m = 0 and simply produces no pairs).

    Scale shape: groupBy(fp_hash) + join-back for the prune (skew-safe —
    a boilerplate hash streams through a hash-aggregate instead of
    pinning one Window partition), one self-equi-join on ``fp_hash``
    with ``key_a < key_b``, one pair-keyed count, two doc-count-sized
    shuffle joins for the denominators.  No broadcast of anything
    corpus-sized, no cartesian.

    The output is edge-shaped (``key_a``/``key_b``) — feed it straight
    to ``dedup.resolve_duplicates`` for cluster resolution and survivor
    selection, exactly like the MinHash pair emitters.
    """
    fps = (
        winnow_fingerprints(df, text_col, key_col, k, w)
        .select("key", "fp_hash")
        .distinct()
    )
    dfreq = fps.groupBy("fp_hash").agg(F.count("*").alias("__df"))
    kept = fps.join(
        dfreq.where(F.col("__df") <= max_df).select("fp_hash"), "fp_hash"
    )
    sizes = kept.groupBy("key").agg(F.count("*").alias("__m"))
    a = kept.select(F.col("key").alias("key_a"), "fp_hash")
    b = kept.select(F.col("key").alias("key_b"), "fp_hash")
    shared = (
        a.join(b, "fp_hash")
        .where(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return (
        shared.join(
            sizes.select(F.col("key").alias("key_a"), F.col("__m").alias("m_a")),
            "key_a",
        )
        .join(
            sizes.select(F.col("key").alias("key_b"), F.col("__m").alias("m_b")),
            "key_b",
        )
        .withColumn(
            "overlap",
            F.col("shared") / F.least(F.col("m_a"), F.col("m_b")),
        )
        .where(F.col("overlap") >= min_overlap)
        .select("key_a", "key_b", "shared", "m_a", "m_b", "overlap")
    )
