"""Streaming corpus curation: the continuous-ingestion face of
``operators.curate.curate_corpus`` — the gates a crawl-ingest pipeline
applies to documents AS THEY ARRIVE, before anything lands in the raw
corpus store.

Streaming changes which operators are admissible: only *map-only* and
*bounded-state* stages can run on an unbounded stream.  This recipe
therefore composes

- map-only gates (token band, Gopher repetition fraction, language
  filter, heuristic quality band, zlib compression band, PII redaction)
  — pure column expressions / vectorized UDFs, identical semantics to
  the batch chain;
- URL blocklist as per-label-count stream-static LEFT ANTI equi-joins
  (``url.filter_blocked_domains_stream`` — the batch suffix-explode
  re-join is a stream self-join and inadmissible);
- exact dedup as ``dropDuplicatesWithinWatermark`` on the content hash —
  state bounded by the watermark horizon (a duplicate arriving later
  than the horizon is the batch compactor's job, the standard
  lambda-architecture split);
- exact-member decontamination as a stream-static LEFT ANTI join on the
  content hash against the (eval-set-sized, broadcast) benchmark.

What deliberately does NOT run here: MinHash/substring dedup and
fraction-based contamination (corpus-wide shuffles over all history),
and the trained-classifier gate (its feature build is a per-doc
aggregation; the heuristic ``text.quality_score`` is the map-only
stand-in).  Those stay in the periodic batch ``curate_corpus`` pass
over the accumulated store — this stream is the cheap front gate, the
batch chain the exact rear one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballista_spark.operators.lm import _tokens as _ws_tokens
from ballista_spark.operators.text import (
    dup_ngram_fraction,
    lang_id,
    quality_score,
    redact_pii,
)


def curate_documents_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    url_blocklist: DataFrame | Sequence[str] | None = None,
    url_col: str = "url",
    compression_band: tuple[float, float] | None = None,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    max_dup_ngram_fraction: float | None = None,
    languages: Sequence[str] | None = None,
    min_quality: float | None = None,
    redact: bool = False,
    benchmark: DataFrame | None = None,
    ts_col: str | None = None,
    dedup_watermark: str = "30 minutes",
) -> DataFrame:
    """Apply the streaming-admissible curation gates to a document stream.

    ``docs`` is a streaming DataFrame (``spark.readStream...``); the
    result is a streaming DataFrame for the caller's ``writeStream``.
    A ``content_hash`` column is always attached.  With ``ts_col`` the
    exact dedup runs ``dropDuplicatesWithinWatermark`` (bounded state);
    without, plain ``dropDuplicates`` on the hash — exact forever but
    state grows with distinct-doc count, acceptable for bounded backfills
    only (the docstring split above).  ``benchmark`` must be a *static*
    DataFrame with ``text_col``.
    """
    kept = docs
    # URL gate first (cheapest): per-label-count stream-static LEFT ANTI
    # equi-joins — the streaming-admissible decomposition of the batch
    # suffix-explode join (operators/url.py docstring)
    if url_blocklist is not None:
        from ballista_spark.operators.url import filter_blocked_domains_stream

        kept = filter_blocked_domains_stream(kept, url_col, url_blocklist)
    if compression_band is not None:
        from ballista_spark.operators.quality import compression_ratio

        lo_cr, hi_cr = compression_band
        cr = compression_ratio(text_col)
        kept = kept.where(cr.isNull() | ((cr >= lo_cr) & (cr <= hi_cr)))
    nt = F.size(_ws_tokens(text_col))
    if min_tokens is not None:
        kept = kept.where(nt >= min_tokens)
    if max_tokens is not None:
        kept = kept.where(nt <= max_tokens)
    if max_dup_ngram_fraction is not None:
        kept = kept.where(dup_ngram_fraction(text_col) <= max_dup_ngram_fraction)
    if languages is not None:
        kept = kept.where(lang_id(text_col).isin(list(languages)))
    if min_quality is not None:
        kept = kept.where(quality_score(text_col) >= min_quality)
    if redact:
        kept = kept.withColumn(text_col, redact_pii(text_col))
    # hash AFTER redaction: two docs differing only in redacted PII are
    # the same training document and must dedup together
    kept = kept.withColumn("content_hash", F.md5(F.col(text_col)))
    if ts_col is not None:
        kept = kept.withWatermark(ts_col, dedup_watermark)
        kept = kept.dropDuplicatesWithinWatermark(["content_hash"])
    else:
        kept = kept.dropDuplicates(["content_hash"])
    if benchmark is not None:
        # benchmark members must be hashed through the SAME text pipeline
        # as the stream — with redact=True a benchmark doc containing
        # PII-pattern text would otherwise hash differently on the two
        # sides and leak straight through the anti-join
        bench_text = redact_pii(text_col) if redact else F.col(text_col)
        bench_hashes = F.broadcast(
            benchmark.select(F.md5(bench_text).alias("content_hash")).distinct()
        )
        kept = kept.join(bench_hashes, "content_hash", "left_anti")
    return kept


def near_dup_gate_stream(
    docs: DataFrame,
    ts_col: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    watermark: str = "30 minutes",
    window: str = "10 minutes",
    n: int = 3,
    n_hashes: int | None = None,
    n_bands: int | None = None,
) -> DataFrame:
    """Streaming MinHash NEAR-dup gate — the in-stream approximation of
    the batch ``minhash_lsh_pairs`` pass that the module docstring's
    lambda split used to defer entirely to batch.

    Mechanism: each document's LSH band keys are computed MAP-ONLY
    (``dedup.with_minhash_band_keys`` — bit-identical to the batch
    signature), exploded to (band_id, band_hash) rows, and run through
    ``dropDuplicatesWithinWatermark`` on the band bucket; a per-document
    windowed count of SURVIVING bands then classifies:

    - ``admit``   — every band bucket was unseen within the horizon:
      w.h.p. not a near-dup of anything recent; safe to land.
    - ``suspect`` — ≥1 band collided with an earlier (or same-batch)
      document: possibly a near-dup; route to the periodic batch
      verifier (``minhash_lsh_pairs`` + exact jaccard), which both
      confirms true near-dups and re-admits banding false positives.

    Guarantees (quantified in tests/test_streaming.py): a true near-dup
    pair within the horizon NEVER sees both members admitted — band
    state keeps one row per bucket, so whichever member loses a shared
    bucket is flagged; the gate never silently drops (output carries
    the verdict, not a filtered stream).  Short documents (< ``n``
    tokens — no shingles) are ``admit`` with 0 bands: they are exact
    dedup's domain (``curate_documents_stream``), not near-dup's.

    State: band buckets + per-(window, key) counts, both
    watermark-bounded (two chained stateful operators, append mode —
    results emit when the window closes past the watermark; the gate
    trades ~watermark latency for bounded state, the standard
    streaming-dedup contract).

    Returns (key, window_start, n_bands, n_fresh, verdict).
    """
    from ballista_spark.operators.dedup import (
        N_BANDS,
        N_HASHES,
        with_minhash_band_keys,
    )

    nh = n_hashes or N_HASHES
    nb = n_bands or N_BANDS
    keyed = with_minhash_band_keys(docs, text_col, "__bands", n, nh, nb)
    # one undroppable PRESENCE row per document rides along with the band
    # rows (band_id −1, bucket unique per (key, ts)) — without it a full
    # duplicate would lose every band row to the dedup state and vanish
    # from the output with no verdict at all
    presence = F.array(
        F.struct(
            F.lit(-1).cast("int").alias("band_id"),
            F.xxhash64(F.col(key_col), F.col(ts_col)).alias("band_hash"),
        )
    )
    bands = (
        keyed.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("__ts"),
            F.size("__bands").alias("__nb"),
            F.explode(F.concat(F.col("__bands"), presence)).alias("b"),
        )
        .select(
            "key",
            "__ts",
            "__nb",
            F.col("b.band_id").alias("band_id"),
            F.col("b.band_hash").alias("band_hash"),
        )
        .withWatermark("__ts", watermark)
    )
    fresh = bands.dropDuplicatesWithinWatermark(["band_id", "band_hash"])
    counts = fresh.groupBy(
        F.window("__ts", window).alias("w"), F.col("key"), F.col("__nb")
    ).agg(F.sum((F.col("band_id") >= 0).cast("int")).alias("n_fresh"))
    return counts.select(
        "key",
        F.col("w.start").alias("window_start"),
        F.col("__nb").alias("n_bands"),
        "n_fresh",
        F.when(F.col("n_fresh") == F.col("__nb"), F.lit("admit"))
        .otherwise(F.lit("suspect"))
        .alias("verdict"),
    )


def media_neardup_gate_stream(
    hashes: DataFrame,
    ts_col: str,
    key_col: str = "media_id",
    hash_col: str = "dhash",
    watermark: str = "30 minutes",
    window: str = "10 minutes",
    max_hamming: int = 4,
) -> DataFrame:
    """Streaming perceptual near-dup gate for media — the in-stream face
    of the batch ``multimodal.image_neardup_pairs`` (images, audio and
    video all pair through their 64-bit dHashes, so one gate serves all
    three).  Input is a streaming (key, hash, ts) frame — compute hashes
    upstream with ``dhash_images``/``dhash_audio`` (``mapInPandas`` is
    streaming-admissible).

    Mechanism mirrors :func:`near_dup_gate_stream`, with a STRONGER
    guarantee: the hash splits into ``max_hamming + 1`` pigeonhole
    chunks (``multimodal.hash_pigeonhole_chunks`` — the exact batch
    banding), so any pair within the Hamming budget shares ≥1 chunk
    DETERMINISTICALLY, not w.h.p.; chunk buckets run through
    ``dropDuplicatesWithinWatermark`` and a windowed count of surviving
    chunks classifies:

    - ``admit``   — every chunk bucket unseen within the horizon: NOT
      within ``max_hamming`` of any recent item (pigeonhole — exact).
    - ``suspect`` — ≥1 chunk collided: possibly a near-dup (chunk
      collisions can be coincidental); route to the batch verifier
      (``image_neardup_pairs``'s ``bit_count(xor)``), which re-admits
      false positives.

    A presence row (chunk −1, bucket unique per (key, ts)) keeps full
    duplicates visible in the output with a verdict.  State: chunk
    buckets + per-(window, key) counts, both watermark-bounded, append
    mode.  Returns (key, window_start, n_chunks, n_fresh, verdict).
    """
    from ballista_spark.operators.multimodal import hash_pigeonhole_chunks

    n_chunks = max_hamming + 1
    presence = F.array(
        F.struct(
            F.lit(-1).cast("int").alias("ci"),
            F.xxhash64(F.col(key_col), F.col(ts_col)).alias("cv"),
        )
    )
    rows = (
        hashes.where(F.col(hash_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("__ts"),
            F.explode(
                F.concat(
                    hash_pigeonhole_chunks(F.col(hash_col), max_hamming), presence
                )
            ).alias("c"),
        )
        .select(
            "key",
            "__ts",
            F.col("c.ci").alias("chunk_id"),
            F.col("c.cv").alias("chunk_val"),
        )
        .withWatermark("__ts", watermark)
    )
    fresh = rows.dropDuplicatesWithinWatermark(["chunk_id", "chunk_val"])
    counts = fresh.groupBy(
        F.window("__ts", window).alias("w"), F.col("key")
    ).agg(F.sum((F.col("chunk_id") >= 0).cast("int")).alias("n_fresh"))
    return counts.select(
        "key",
        F.col("w.start").alias("window_start"),
        F.lit(n_chunks).alias("n_chunks"),
        "n_fresh",
        F.when(F.col("n_fresh") == n_chunks, F.lit("admit"))
        .otherwise(F.lit("suspect"))
        .alias("verdict"),
    )
