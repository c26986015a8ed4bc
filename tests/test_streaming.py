"""Structured Streaming operators driven to completion via the memory sink,
cross-checked against the equivalent batch computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_spark.sources.registry import load_table
from ballista_spark.streaming import (
    read_events_stream,
    sessionized_activity,
    stateful_user_totals,
    windowed_event_counts,
)
from tests.conftest import SF_SMOKE


def _run_to_memory(df, name: str, output_mode: str):
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_windowed_counts_match_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(windowed_event_counts(stream), "win_counts", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("tv"),
        )
        .collect()
    )
    expected = {(r["w"]["start"], r["event_type"]): (r["n"], r["tv"]) for r in batch}
    assert got == expected
    assert len(got) > 0


def test_sessionization_runs_and_covers_all_users(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(sessionized_activity(stream), "sessions", "complete")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    n_events = sum(r["n_events"] for r in rows)
    assert n_events == load_table(spark, SF_SMOKE, "events").count()
    for r in rows[:50]:
        assert r["session_end"] >= r["session_start"]


def test_stateful_user_totals_match_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(stateful_user_totals(stream), "user_totals", "update")
    # update mode may emit several rows per user across epochs; the final
    # (max-n) row per user is the converged state
    rows = spark.sql(
        """
        SELECT user_id, total, n FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC) rn
          FROM user_totals) WHERE rn = 1
        """
    ).collect()
    got = {r["user_id"]: (round(r["total"], 6), r["n"]) for r in rows}
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("t"), F.count("*").alias("n"))
        .collect()
    )
    expected = {r["user_id"]: (round(r["t"], 6), r["n"]) for r in batch}
    assert got == expected


def test_streaming_dedup_first_event_per_user(spark):
    from ballista_spark.streaming import streaming_dedup

    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(streaming_dedup(stream, ["user_id"]), "dedup_stream", "append")
    rows = spark.sql("SELECT user_id FROM dedup_stream").collect()
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users)), "duplicate users in deduped stream"
    n_users = load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert len(users) == n_users


def test_foreachbatch_parquet_sink_idempotent(spark, tmp_path):
    """foreachBatch parquet sink: rows land once; re-running the same
    stream from a fresh checkpoint overwrites epochs instead of
    duplicating."""
    import os

    from ballista_spark.streaming import write_stream_parquet_exactly_once

    out = os.path.join(str(tmp_path), "out")
    total = load_table(spark, SF_SMOKE, "events").count()
    for attempt in ("cp1", "cp2"):  # second run simulates a full replay
        q = write_stream_parquet_exactly_once(
            read_events_stream(spark, SF_SMOKE),
            out,
            os.path.join(str(tmp_path), attempt),
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == total, attempt
        assert got.select("event_id").distinct().count() == total


def test_streaming_windowed_counts_match_duckdb_oracle(spark, duck):
    """Cross-ENGINE streaming check: the streamed windowed aggregation must
    equal an independent DuckDB computation over the same parquet — the
    strongest oracle available for a streaming operator (the batch-equality
    test above shares Spark's execution; this one does not)."""
    stream = read_events_stream(spark, SF_SMOKE)
    _run_to_memory(windowed_event_counts(stream), "win_oracle", "complete")
    got = sorted(
        (r["window_start"], r["event_type"], r["n"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM win_oracle").collect()
    )
    duck.execute("SET schema 'smoke'")
    want = sorted(
        (w, et, n, round(tv, 6))
        for w, et, n, tv in duck.sql(
            """
            SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS w, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS tv
            FROM events GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want


def test_stream_static_enrichment_matches_batch(spark):
    """Stream-static join: every streamed event picks up its user's nation
    from a static dim; totals match the batch join, and the static side
    is broadcast (no per-microbatch stream shuffle)."""
    from ballista_spark.streaming.events import enrich_stream

    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
    )
    stream = read_events_stream(spark, SF_SMOKE)
    enriched = enrich_stream(stream, dim, "user_id").groupBy("c_nationkey").agg(
        F.count("*").alias("n")
    )
    _run_to_memory(enriched, "enriched", "complete")
    got = {
        r["c_nationkey"]: r["n"]
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    batch = {
        r["c_nationkey"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .join(dim, "user_id", "left")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == batch and len(got) > 0
    plan = enriched._jdf.queryExecution().analyzed().toString()
    # broadcast hint survives analysis on the static side
    assert "broadcast" in plan.lower()


def test_streaming_curation_gates_match_batch(spark, tmp_path):
    """The streaming front gate (token band + repetition + language +
    quality + redaction + exact dedup + benchmark-member anti-join)
    admits exactly the documents the equivalent batch expressions admit."""
    from ballista_spark.operators.lm import _tokens as _ws_tokens
    from ballista_spark.operators.text import (
        dup_ngram_fraction,
        lang_id,
        quality_score,
        redact_pii,
    )
    from ballista_spark.streaming import curate_documents_stream

    bench_text = "the capital of france is paris and the capital of spain is madrid"
    rows = [
        (0, "the cat sat on the mat and looked around the warm quiet room today"),
        (1, "the cat sat on the mat and looked around the warm quiet room today"),
        (2, "tiny"),
        (3, " ".join(["dup words"] * 30)),
        (4, bench_text),
        (5, "mail me at a.b@example.com for the document and the details of it"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "stream_src")
    batch.repartition(2).write.parquet(src)
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")

    stream = spark.readStream.schema(batch.schema).parquet(src)
    curated = curate_documents_stream(
        stream,
        min_tokens=5,
        max_dup_ngram_fraction=0.5,
        languages=["en"],
        min_quality=0.3,
        redact=True,
        benchmark=bench,
    )
    _run_to_memory(curated, "curated_stream", "append")
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM curated_stream").collect()}

    # batch mirror with the same expressions
    nt = F.size(_ws_tokens("text"))
    mirror = (
        batch.where(nt >= 5)
        .where(dup_ngram_fraction("text") <= 0.5)
        .where(lang_id("text") == "en")
        .where(quality_score("text") >= 0.3)
        .withColumn("text", redact_pii("text"))
        .withColumn("content_hash", F.md5("text"))
    )
    mirror_ids = {r["doc_id"] for r in mirror.collect()}
    bench_hash = bench.select(F.md5("text")).collect()[0][0]
    survivors = set()
    seen_hashes = set()
    for r in sorted(mirror.collect(), key=lambda r: r["doc_id"]):
        if r["content_hash"] == bench_hash or r["content_hash"] in seen_hashes:
            continue
        seen_hashes.add(r["content_hash"])
        survivors.add(r["doc_id"])
    # doc 2 (short), 3 (repetitive), 4 (benchmark member) gone; exactly one
    # of the 0/1 duplicates survives; 5 survives with PII redacted
    assert 2 not in got and 3 not in got and 4 not in got
    assert len({0, 1} & set(got)) == 1
    assert set(got) == survivors or (set(got) - {0, 1}) == (survivors - {0, 1})
    assert "@" not in got[5]["text"]
    assert all("content_hash" in r.asDict() for r in got.values())


def test_streaming_url_and_compression_gates(spark, tmp_path):
    """The late-round stream gates: blocklist anti-joins + compression
    band run on an unbounded stream (append mode, no state)."""
    from ballista_spark.streaming import curate_documents_stream

    rows = [
        (0, "https://good.org/a", "a clear morning with soft light over the valley"),
        (1, "https://ads.example.com/b", "an article from a blocked ad domain"),
        (2, "https://ok.org/c", "buy now " * 50),
        (3, "https://sub.ads.example.com/d", "deep subdomain of the blocked one"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, url string, text string")
    src = str(tmp_path / "url_stream_src")
    batch.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    curated = curate_documents_stream(
        stream,
        url_blocklist=["example.com"],
        compression_band=(0.3, 2.0),
    )
    _run_to_memory(curated, "url_gated_stream", "append")
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM url_gated_stream").collect()}
    assert got == {0}


def test_band_keys_map_only_matches_batch_signatures(spark):
    """with_minhash_band_keys (map-only, streaming-admissible) must be
    bit-identical to the batch shingle→groupBy→signature path: same
    signature fold, same band hashes."""
    from ballista_spark.operators.dedup import (
        N_BANDS,
        N_HASHES,
        ROWS_PER_BAND,
        _minhash_signatures,
        shingle_sets,
        with_minhash_band_keys,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    batch_sig = _minhash_signatures(shingle_sets(docs))
    batch_bands = batch_sig.select(
        "key",
        F.transform(
            F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
            lambda b: F.xxhash64(
                F.slice(F.col("sig"), b * F.lit(ROWS_PER_BAND) + F.lit(1),
                        ROWS_PER_BAND)
            ),
        ).alias("bh"),
    )
    want = {r["key"]: list(r["bh"]) for r in batch_bands.collect()}
    got_rows = with_minhash_band_keys(docs).select("doc_id", "band_keys").collect()
    got = {
        r["doc_id"]: [b["band_hash"] for b in r["band_keys"]]
        for r in got_rows
        if r["band_keys"]
    }
    # batch path only emits docs with >= n tokens; map-only gives those
    # docs identical band hashes and empty arrays to the rest
    assert set(want) == set(got)
    for k in want:
        assert want[k] == got[k], k
    empties = {r["doc_id"] for r in got_rows if not r["band_keys"]}
    assert empties == {r["doc_id"] for r in docs.collect()} - set(want)


def test_streaming_near_dup_gate_catches_planted_pairs(spark, tmp_path):
    """Stream-vs-batch admission: every batch-confirmed near-dup pair
    must have at least one member flagged 'suspect' in-stream (recall
    1.0 on pair coverage); unrelated docs admit; short docs admit with
    zero bands; an exact duplicate pair is never double-admitted."""
    import datetime as dt

    from ballista_spark.operators.dedup import minhash_lsh_pairs
    from ballista_spark.streaming.curate import near_dup_gate_stream

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = []

    def words(seed, n=40):
        return " ".join(f"w{seed}x{j}" for j in range(n))

    # originals 0..4 with near-dups 10..14 (one token changed)
    for i in range(5):
        orig = words(i)
        near = orig.replace(f"w{i}x20", "CHANGED", 1)
        rows.append((i, orig, base))
        rows.append((10 + i, near, base + dt.timedelta(minutes=1)))
    # unrelated 20..24
    for i in range(5):
        rows.append((20 + i, words(100 + i), base + dt.timedelta(minutes=2)))
    # exact duplicate of doc 0, and a short doc
    rows.append((30, words(0), base + dt.timedelta(minutes=3)))
    rows.append((31, "tiny doc", base + dt.timedelta(minutes=4)))
    # flusher far past watermark+window so the planted window closes
    rows.append((99, words(999), base + dt.timedelta(hours=3)))

    batch = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    src = str(tmp_path / "neardup_src")
    batch.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    gated = near_dup_gate_stream(
        stream, "ts", watermark="30 minutes", window="10 minutes"
    )
    _run_to_memory(gated, "neardup_gate", "append")
    got = {
        r["key"]: r
        for r in spark.sql("SELECT * FROM neardup_gate").collect()
    }
    planted = {r[0] for r in rows if r[0] != 99}
    assert planted <= set(got), sorted(planted - set(got))  # no silent drops

    # batch ground truth on the same docs
    pairs = [
        (r["key_a"], r["key_b"])
        for r in minhash_lsh_pairs(
            batch.where(F.col("doc_id") != 99), threshold=0.8
        ).collect()
    ]
    assert len(pairs) >= 6  # 5 near-dup pairs + the exact-dup pair
    caught = sum(
        1
        for a, b in pairs
        if got[a]["verdict"] == "suspect" or got[b]["verdict"] == "suspect"
    )
    assert caught == len(pairs)  # stream recall 1.0 on pair coverage

    for i in range(20, 25):
        assert got[i]["verdict"] == "admit", i
    assert got[31]["verdict"] == "admit" and got[31]["n_bands"] == 0
    # exact duplicate pair: never both admitted
    assert not (got[0]["verdict"] == "admit" and got[30]["verdict"] == "admit")


def test_streaming_media_neardup_gate(spark, tmp_path):
    """Perceptual in-stream gate: a hamming<=4 pair must never see both
    members admitted (pigeonhole is exact, not probabilistic); distant
    hashes admit; an exact hash duplicate stays visible with a verdict."""
    import datetime as dt

    from ballista_spark.streaming.curate import media_neardup_gate_stream

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    h0 = 0x1234_5678_9ABC_DEF0
    near = h0 ^ 0b1011  # hamming 3 within chunk 0
    sign_near = h0 ^ (1 << 63) ^ (1 << 20)  # hamming 2, sign bit flipped
    far = 0x0F0F_0F0F_F0F0_A5A5

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [
        (1, signed(h0), base),
        (2, signed(near), base + dt.timedelta(minutes=1)),
        (3, signed(far), base + dt.timedelta(minutes=2)),
        (4, signed(h0), base + dt.timedelta(minutes=3)),        # exact dup
        (5, signed(sign_near), base + dt.timedelta(minutes=4)),  # sign-bit case
        (99, 42, base + dt.timedelta(hours=3)),                  # flusher
    ]
    batch = spark.createDataFrame(rows, "media_id long, dhash long, ts timestamp")
    src = str(tmp_path / "media_gate_src")
    batch.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    gated = media_neardup_gate_stream(
        stream, "ts", watermark="30 minutes", window="10 minutes", max_hamming=4
    )
    _run_to_memory(gated, "media_gate", "append")
    got = {r["key"]: r for r in spark.sql("SELECT * FROM media_gate").collect()}
    assert {1, 2, 3, 4, 5} <= set(got)  # no silent drops (presence row)
    # near-dup pair: at least one member flagged
    assert got[2]["verdict"] == "suspect" or got[1]["verdict"] == "suspect"
    assert got[3]["verdict"] == "admit"
    # exact duplicate: never both admitted
    assert not (got[1]["verdict"] == "admit" and got[4]["verdict"] == "admit")
    # the ADVICE-high regression shape: sign-bit-differing near pair is caught
    assert got[5]["verdict"] == "suspect"
    assert all(r["n_chunks"] == 5 for r in got.values())
