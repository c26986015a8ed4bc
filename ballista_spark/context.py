"""BallistaContext — session management, table registry, SQL entry point.

Reference surface: ``rust/client/src/context.rs:87-143`` (read_csv,
read_parquet, register_table, sql) and the Python bindings
``python/src/context.rs:18-139`` (``BallistaContext(host, port, **settings)``,
``read_csv(path, schema, has_header, delimiter, file_extension,
schema_infer_max_records)``, ``register_parquet``, …).

On Spark there is no remote scheduler to dial — ``SparkSession`` *is* the
scheduler — so the constructor takes session options instead of host/port.
NdJson, declared but unfinished in the reference (``ballista.proto:244-248``),
is fully supported via ``spark.read.json``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ballista_spark.dataframe import BallistaDataFrame
from ballista_spark.session import get_spark, tune_session
from ballista_spark.types import schema as _schema


class BallistaContext:
    """Entry point mirroring ``BallistaContext`` (client + python bindings)."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        master: str | None = None,
        **settings: str,
    ):
        if spark is not None:
            self.spark = tune_session(spark)
        else:
            self.spark = get_spark(master=master, extra_conf=dict(settings) or None)
        self._tables: dict[str, DataFrame] = {}

    # -- readers (python/src/context.rs:48-83) --------------------------------

    def read_parquet(self, path: str) -> BallistaDataFrame:
        return BallistaDataFrame(self.spark.read.parquet(path))

    def read_csv(
        self,
        path: str,
        schema: T.StructType | Mapping[str, str] | None = None,
        has_header: bool = False,
        delimiter: str = ",",
        file_extension: str = ".csv",
        schema_infer_max_records: int = 1000,
    ) -> BallistaDataFrame:
        """CSV scan with the reference's option names
        (python/src/context.rs:84-139). ``file_extension`` supports the
        TPC-H ``.tbl`` pipe-delimited variant
        (rust/benchmarks/tpch/src/main.rs:130-139) via path glob."""
        reader = self.spark.read.option("header", has_header).option("delimiter", delimiter)
        if schema is not None:
            if isinstance(schema, Mapping):
                schema = _schema(schema)
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True).option(
                "samplingRatio", 1.0
            )  # schema_infer_max_records analog: Spark samples; keep exact
        if file_extension and file_extension != ".csv":
            path = path.rstrip("/") + f"/*{file_extension}" if "*" not in path and not path.endswith(file_extension) else path
        return BallistaDataFrame(reader.csv(path))

    def read_json(self, path: str, schema: T.StructType | Mapping[str, str] | None = None) -> BallistaDataFrame:
        """NdJson scan (declared in reference FileType enum, never finished)."""
        reader = self.spark.read
        if schema is not None:
            if isinstance(schema, Mapping):
                schema = _schema(schema)
            reader = reader.schema(schema)
        return BallistaDataFrame(reader.json(path))

    # -- registry (rust/client/src/context.rs:112-128) ------------------------

    def register_table(self, name: str, df: BallistaDataFrame | DataFrame) -> None:
        sdf = df.df if isinstance(df, BallistaDataFrame) else df
        self._tables[name] = sdf
        sdf.createOrReplaceTempView(name)

    def register_parquet(self, name: str, path: str) -> None:
        self.register_table(name, self.spark.read.parquet(path))

    def register_csv(self, name: str, path: str, **options) -> None:
        self.register_table(name, self.read_csv(path, **options))

    def register_json(self, name: str, path: str, **options) -> None:
        self.register_table(name, self.read_json(path, **options))

    def tables(self) -> list[str]:
        return sorted(self._tables)

    def table(self, name: str) -> BallistaDataFrame:
        return BallistaDataFrame(self.spark.table(name))

    # -- SQL (rust/client/src/context.rs:131-143) -----------------------------

    def sql(self, query: str) -> BallistaDataFrame:
        """Run SQL over the registered tables. The reference parsed with
        DataFusion's frontend; Spark SQL parses the same TPC-H dialect
        (date literals, intervals, EXISTS/IN subqueries, substring FROM/FOR —
        SURVEY.md §7.3.4)."""
        return BallistaDataFrame(self.spark.sql(query))

    # -- DDL: CREATE EXTERNAL TABLE (ballista.proto:236-248) ------------------

    def create_external_table(
        self, name: str, path: str, file_type: str = "parquet",
        schema: T.StructType | Mapping[str, str] | None = None, **options,
    ) -> None:
        ft = file_type.lower()
        if ft in ("parquet",):
            self.register_parquet(name, path)
        elif ft in ("csv", "tbl"):
            self.register_csv(name, path, schema=schema, **options)
        elif ft in ("json", "ndjson"):
            self.register_json(name, path, schema=schema, **options)
        else:
            raise ValueError(f"unsupported file type: {file_type}")

    # -- convenience for the driver's test data -------------------------------

    def register_sf_dir(self, sf_dir: str) -> None:
        """Register every parquet table in a TESTDATA.md scale-factor dir."""
        import glob
        import os

        for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            self.register_parquet(os.path.splitext(os.path.basename(p))[0], p)
