"""Streaming sinks: exactly-once-style parquet writing via ``foreachBatch``.

The built-in file sink is append-only with its own log; ``foreachBatch``
is the production pattern for transactional/idempotent sinks (MERGE into a
lakehouse table, JDBC upsert, …).  Here each micro-batch lands in an
``epoch=N`` partition directory with dynamic partition overwrite — replaying
a batch after a failure overwrites the same directory instead of
duplicating rows (idempotent per epoch, the foreachBatch contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet_exactly_once(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Start a foreachBatch parquet writer with per-epoch idempotency."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .partitionBy("epoch")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_delta_exactly_once(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    app_id: str,
    partition_by: list[str] | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Stream into a Delta-protocol table with TRUE exactly-once appends.

    Where the parquet sink above gets idempotence from epoch-named
    directories, this one gets it from the table's transaction log: each
    micro-batch commits with a ``txn`` action ``(app_id, epoch_id)``, and
    a replayed batch (foreachBatch redelivery after a failure) is
    detected in the log and skipped before any file is added — the
    Delta streaming-sink protocol.  Appends are atomic (exclusive-create
    commit), so a concurrent batch reader of the same table never sees a
    torn batch; data files staged by a skipped replay are orphans that
    ``vacuum_delta_table`` reaps.
    """
    from ballista_spark.sources.deltalog import write_delta_table

    def sink(batch: DataFrame, epoch_id: int) -> None:
        write_delta_table(
            batch,
            table_path,
            mode="append",
            partition_by=partition_by,
            txn_app_id=app_id,
            txn_version=int(epoch_id),
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_iceberg_exactly_once(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    app_id: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Stream into an Iceberg v1 table with TRUE exactly-once appends —
    the Iceberg twin of :func:`write_stream_delta_exactly_once`.

    Each micro-batch commits a snapshot whose summary records
    ``(txn-app-id, txn-version=epoch_id)``; a replayed batch is detected
    in the snapshot history and skipped BEFORE any file is staged
    (`sources.iceberg.write_iceberg_table`'s txn contract), so a
    foreachBatch redelivery never duplicates rows and never leaves
    orphan data files.  Commits are atomic (exclusive metadata-version
    create), so concurrent batch readers never see a torn epoch.
    """
    from ballista_spark.sources.iceberg import write_iceberg_table

    def sink(batch: DataFrame, epoch_id: int) -> None:
        write_iceberg_table(
            batch,
            table_path,
            mode="append",
            txn_app_id=app_id,
            txn_version=int(epoch_id),
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
