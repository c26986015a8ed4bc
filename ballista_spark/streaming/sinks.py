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


def _cdc_terminal(
    batch: DataFrame,
    on: list[str],
    op_col: str | None,
    order_col: str | None,
):
    """Collapse a CDC micro-batch to ONE terminal state per key and
    split it into (upserts, delete_keys).

    ``order_col`` (e.g. the source LSN / updated_at) picks the LAST
    event per key — without it ties break arbitrarily, so CDC feeds
    should always carry one.  ``op_col`` holds I/U/D markers (Debezium
    convention, case-insensitive; anything not 'd' is an upsert); both
    columns are dropped before the merge, so they need not exist in the
    table schema."""
    from pyspark.sql import Window

    keyed = batch
    if order_col is not None:
        w = Window.partitionBy(*on).orderBy(F.col(order_col).desc())
        keyed = (
            keyed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        keyed = keyed.dropDuplicates(on)
    drop = [c for c in (op_col, order_col) if c is not None]
    if op_col is not None:
        # NULL op is an UPSERT (the docstring contract: anything not
        # 'd'); a bare equality would leave NULL-op rows in NEITHER leg
        is_del = F.coalesce(
            F.lower(F.col(op_col)) == F.lit("d"), F.lit(False)
        )
        deletes = keyed.where(is_del).select(*on).distinct()
        upserts = keyed.where(~is_del).drop(*drop)
        return upserts, deletes
    return (keyed.drop(*drop) if drop else keyed), None


def write_stream_delta_upsert(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    app_id: str,
    on: list[str],
    op_col: str | None = None,
    order_col: str | None = None,
    partition_by: list[str] | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Stream a CDC feed INTO a Delta table with exactly-once MERGE
    semantics — the upsert face of
    :func:`write_stream_delta_exactly_once`.

    Each micro-batch collapses to one terminal state per ``on`` key
    (latest by ``order_col``), then applies as a touch-only MERGE:
    upserts update-or-insert, ``op_col`` = 'd' rows delete.  Replayed
    epochs are detected through the Delta ``txn`` action and skipped
    before any file is staged; the upsert and delete legs carry
    separate app ids (``app_id#ups`` / ``app_id#del``) so each is
    idempotent on its own.  A first epoch against a not-yet-existing
    table bootstraps it.
    """
    import os as _os

    from ballista_spark.sources.deltalog import (
        merge_delta_table,
        write_delta_table,
    )

    def sink(batch: DataFrame, epoch_id: int) -> None:
        upserts, deletes = _cdc_terminal(batch, list(on), op_col, order_col)
        exists = _os.path.isdir(_os.path.join(table_path, "_delta_log"))
        if not exists:
            write_delta_table(
                upserts,
                table_path,
                mode="append",
                partition_by=partition_by,
                txn_app_id=f"{app_id}#ups",
                txn_version=int(epoch_id),
            )
        else:
            merge_delta_table(
                batch.sparkSession,
                table_path,
                upserts,
                on=list(on),
                when_matched="update",
                insert_not_matched=True,
                txn_app_id=f"{app_id}#ups",
                txn_version=int(epoch_id),
            )
        if deletes is not None and exists:
            merge_delta_table(
                batch.sparkSession,
                table_path,
                deletes,
                on=list(on),
                when_matched="delete",
                insert_not_matched=False,
                txn_app_id=f"{app_id}#del",
                txn_version=int(epoch_id),
            )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_iceberg_upsert(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    app_id: str,
    on: list[str],
    op_col: str | None = None,
    order_col: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """CDC upsert stream into an Iceberg table — the Iceberg twin of
    :func:`write_stream_delta_upsert` (replay detection through the
    snapshot summary txn keys; the empty-table first epoch inserts
    through the MERGE's CDC-bootstrap path)."""
    import os as _os

    from ballista_spark.sources.iceberg import (
        merge_iceberg_table,
        write_iceberg_table,
    )

    def sink(batch: DataFrame, epoch_id: int) -> None:
        upserts, deletes = _cdc_terminal(batch, list(on), op_col, order_col)
        exists = _os.path.isdir(_os.path.join(table_path, "metadata"))
        if not exists:
            write_iceberg_table(
                upserts,
                table_path,
                mode="append",
                txn_app_id=f"{app_id}#ups",
                txn_version=int(epoch_id),
            )
            return  # deletes against a just-born table are no-ops
        merge_iceberg_table(
            batch.sparkSession,
            table_path,
            upserts,
            on=list(on),
            when_matched="update",
            insert_not_matched=True,
            txn_app_id=f"{app_id}#ups",
            txn_version=int(epoch_id),
        )
        if deletes is not None:
            merge_iceberg_table(
                batch.sparkSession,
                table_path,
                deletes,
                on=list(on),
                when_matched="delete",
                insert_not_matched=False,
                txn_app_id=f"{app_id}#del",
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
