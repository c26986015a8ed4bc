from ballista_spark.streaming.events import (
    read_events_stream,
    sessionized_activity,
    stateful_user_totals,
    windowed_event_counts,
)

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "sessionized_activity",
    "stateful_user_totals",
]
from ballista_spark.streaming.events import streaming_dedup  # noqa: E402

__all__.append("streaming_dedup")
from ballista_spark.streaming.sinks import (  # noqa: E402
    write_stream_delta_exactly_once,
    write_stream_delta_upsert,
    write_stream_iceberg_exactly_once,
    write_stream_iceberg_upsert,
    write_stream_parquet_exactly_once,
)

__all__ += [
    "write_stream_parquet_exactly_once",
    "write_stream_delta_exactly_once",
    "write_stream_iceberg_exactly_once",
    "write_stream_delta_upsert",
    "write_stream_iceberg_upsert",
]
from ballista_spark.streaming.curate import (  # noqa: E402
    curate_documents_stream,
    media_neardup_gate_stream,
    near_dup_gate_stream,
)

__all__ += [
    "curate_documents_stream",
    "near_dup_gate_stream",
    "media_neardup_gate_stream",
]
