"""Structured Streaming operators over the ``events`` table.

The reference engine is pure batch — no watermarks, windows, or stateful
operators anywhere (SURVEY.md §2.10) — so this module is a beyond-parity
extension built the idiomatic Spark way: ``readStream`` → declarative
transforms → ``writeStream``, watermarks for late data, ``session_window``
for gap sessionization, ``applyInPandasWithState`` for custom state.

Scale notes: event-time windows + watermark bound state size; the groupBy
keys (window, event_type) and (user_id) hash-partition state across
executors; a production deployment swaps the file source for Kafka and the
memory sink for a transactional ``foreachBatch`` writer without touching the
transforms.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ballista_spark.sources.registry import normalize_events_ts


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (smoke path; Kafka in prod).

    The physical ``ts`` encoding has varied across testdata generations
    (TIMESTAMP(NANOS), µs-NTZ, µs-UTC), so probe the footer with a batch
    read and stream with that exact schema, then normalize like the batch
    loader does.
    """
    path = os.path.join(sf_dir, "events.parquet")
    # nanosAsLong only affects TIMESTAMP(NANOS) files.  Probe under the
    # flag, then RESTORE it unless the file actually is a nanos generation:
    # for µs files the flag is irrelevant and leaving it set would silently
    # turn every later batch read of a TIMESTAMP(NANOS) parquet in this
    # session into LongType columns.  For a genuine nanos file the flag
    # must stay on for the lifetime of the stream's microbatch reads (it is
    # a session conf, not a per-read option) — a documented session-wide
    # side effect of streaming that generation.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    raw_schema = spark.read.parquet(path).schema
    from pyspark.sql import types as T

    if not isinstance(raw_schema["ts"].dataType, T.LongType):
        spark.conf.set(key, prev)
    # the file source requires a directory; glob-filter to the events file
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_events_ts(raw)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + value sums per type."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized_activity(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user gap-based sessions (``session_window``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.min("ts").alias("first_ts"),
             F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


_STATE_SCHEMA = "total double, n long"
_OUT_SCHEMA = "user_id long, total double, n long"


def _running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: running (sum, count) per user."""
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame({"user_id": [key[0]], "total": [total], "n": [n]})


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful per-user running totals via
    ``applyInPandasWithState`` — the custom-stateful-operator escape hatch
    the reference never had."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming deduplication — the streaming face of the batch dedup
    operators: keep the first event per key, with the watermark bounding
    how long state is retained (`dropDuplicatesWithinWatermark`, so a
    duplicate arriving after the watermark horizon cannot grow state
    forever at 100 TB/day event rates)."""
    keys = key_cols or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    stream (user profile, experiment arm, geo table).

    The static side is broadcast by default — the planner then rebuilds
    only the broadcast variable per microbatch instead of shuffling the
    stream, which is the only sane shape at production event rates (a
    shuffled stream-static join repartitions every microbatch).  Pass
    ``broadcast_dim=False`` for dimension tables too large to broadcast;
    Spark then plans a per-microbatch shuffled join."""
    right = F.broadcast(dim) if broadcast_dim else dim
    return events.join(right, on, how)
