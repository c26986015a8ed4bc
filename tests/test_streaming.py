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
