from ballista_spark.sources.registry import load_table, register_tables, TABLES
from ballista_spark.sources.avroio import read_avro, write_avro
from ballista_spark.sources.hudi import (
    hudi_snapshot_files,
    read_hudi_changes,
    read_hudi_table,
)
from ballista_spark.sources.iceberg import (
    compact_iceberg_table,
    delete_from_iceberg_table,
    expire_iceberg_snapshots,
    merge_iceberg_table,
    read_iceberg_snapshot,
    read_iceberg_table,
    write_iceberg_table,
)
from ballista_spark.sources.pyds import register_data_sources
from ballista_spark.sources.deltalog import (
    compact_delta_table,
    merge_delta_table,
    vacuum_delta_table,
    read_delta_snapshot,
    read_delta_changes,
    read_delta_table,
    write_delta_table,
)

__all__ = [
    "load_table",
    "register_tables",
    "TABLES",
    "read_avro",
    "write_avro",
    "register_data_sources",
    "read_iceberg_table",
    "read_iceberg_snapshot",
    "write_iceberg_table",
    "compact_iceberg_table",
    "delete_from_iceberg_table",
    "expire_iceberg_snapshots",
    "merge_iceberg_table",
    "read_hudi_table",
    "read_hudi_changes",
    "hudi_snapshot_files",
    "read_delta_table",
    "read_delta_snapshot",
    "read_delta_changes",
    "write_delta_table",
    "compact_delta_table",
    "merge_delta_table",
    "vacuum_delta_table",
]
