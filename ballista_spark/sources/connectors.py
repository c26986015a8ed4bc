"""Optional connectors (Delta / Iceberg / Hudi / Kafka / JDBC).

The lakehouse formats and Kafka need jars that are not on this
environment's classpath, so each helper import-probes and raises a clear,
actionable error instead of a py4j class-not-found stack.  JDBC ships with
Spark and works as-is.  The reference's connector surface was CSV/Parquet
(+ a declared-but-unfinished NdJson) — ballista.proto:244-248; everything
here is beyond-parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """Raised when a format's jars are not on the session classpath."""


def _probe_format(spark: SparkSession, fmt: str, probe_class: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(probe_class)  # type: ignore[union-attr]
    except Exception as exc:  # noqa: BLE001 - any JVM error means absent
        raise ConnectorUnavailable(
            f"{fmt} support requires its jars on the Spark classpath "
            f"(missing {probe_class}). Add the package via "
            f"spark.jars.packages and restart the session."
        ) from exc


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _probe_format(spark, "delta", "org.apache.spark.sql.delta.DeltaLog")
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _probe_format(spark, "iceberg", "org.apache.iceberg.Table")
    return spark.read.format("iceberg").load(table)


def read_hudi(spark: SparkSession, path: str) -> DataFrame:
    """Hudi through the runtime jars when present; otherwise the pure
    COW reader (`sources/hudi.py`) — same jar-free fallback stance as
    the Delta/Iceberg sources."""
    try:
        _probe_format(spark, "hudi", "org.apache.hudi.DataSourceReadOptions")
    except ConnectorUnavailable:
        from ballista_spark.sources.hudi import read_hudi_table

        return read_hudi_table(spark, path)
    return spark.read.format("hudi").load(path)


def read_kafka_stream(
    spark: SparkSession, brokers: str, topic: str, starting: str = "earliest"
) -> DataFrame:
    _probe_format(
        spark, "kafka", "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .load()
    )


def read_jdbc(
    spark: SparkSession, url: str, table: str, **options: str
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
