"""BallistaDataFrame — the reference's DataFrame operator surface on PySpark.

Reference surface (``python/src/dataframe.rs:24-123``,
``rust/client/src/context.rs:241-314``): ``select_columns, select, filter,
aggregate, limit, sort, repartition, schema, explain, collect`` plus
``write_csv/write_parquet`` (``rust/benchmarks/tpch/src/main.rs:231-253``)
and ``join`` (declared on the wire — inner/left/right,
``ballista.proto:266-270`` — but left TODO in the reference client; we
implement it, and extend to Spark's full join taxonomy).

Everything is a thin delegation to the underlying ``pyspark.sql.DataFrame``
so the plan stays declarative and Catalyst/AQE pick physical strategies
(the reference hand-built its stage DAG; Spark does this natively —
SURVEY.md §3/§4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BallistaDataFrame:
    """Lazy DataFrame with Ballista's client API (built on a Spark plan)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- interop -------------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        """The underlying Spark DataFrame (escape hatch)."""
        return self._df

    def __getattr__(self, name: str):
        # Unknown attributes fall through to the Spark DataFrame, wrapping
        # DataFrame results back — gives the full Spark surface "for free"
        # while keeping the Ballista methods canonical.
        attr = getattr(self._df, name)
        if callable(attr):
            def _wrapped(*args, **kwargs):
                out = attr(*args, **kwargs)
                return BallistaDataFrame(out) if isinstance(out, DataFrame) else out

            return _wrapped
        return attr

    # -- reference surface ---------------------------------------------------

    def select_columns(self, *names: str) -> "BallistaDataFrame":
        """Projection by column name (python/src/dataframe.rs:29-34)."""
        return BallistaDataFrame(self._df.select(*names))

    def select(self, *exprs) -> "BallistaDataFrame":
        """Projection by expression list (ballista.proto:204-207)."""
        return BallistaDataFrame(self._df.select(*exprs))

    def filter(self, predicate) -> "BallistaDataFrame":
        """Selection — single boolean predicate (ballista.proto:209-212)."""
        return BallistaDataFrame(self._df.filter(predicate))

    where = filter

    def aggregate(self, group_by: Sequence, aggs: Sequence) -> "BallistaDataFrame":
        """groupBy(group_expr).agg(aggr_expr) (ballista.proto:260-264).

        Spark plans the two-phase partial/final hash aggregation the
        reference serialized explicitly (ballista.proto:370-384) automatically.
        """
        grouped = self._df.groupBy(*group_by)
        return BallistaDataFrame(grouped.agg(*aggs))

    def join(
        self,
        right: "BallistaDataFrame | DataFrame",
        on=None,
        how: str = "inner",
    ) -> "BallistaDataFrame":
        """Equi-join. Wire enum allowed INNER/LEFT/RIGHT
        (ballista.proto:266-270); we accept Spark's full taxonomy
        (full/semi/anti/cross) as a strict upgrade (SURVEY.md §2.7)."""
        rdf = right.df if isinstance(right, BallistaDataFrame) else right
        return BallistaDataFrame(self._df.join(rdf, on=on, how=how))

    def limit(self, n: int) -> "BallistaDataFrame":
        """Global limit (ballista.proto:280-283); Spark plans
        LocalLimit+GlobalLimit, and fuses sort+limit into
        TakeOrderedAndProject when preceded by sort."""
        return BallistaDataFrame(self._df.limit(n))

    def sort(self, *keys) -> "BallistaDataFrame":
        """Multi-key sort. Pass Columns with explicit
        ``asc_nulls_first()``-style ordering — the reference carries
        (asc, nulls_first) per key (ballista.proto:157-161) and Spark's
        defaults differ, so callers should always be explicit."""
        return BallistaDataFrame(self._df.orderBy(*keys))

    def repartition(self, num_partitions: int, *exprs) -> "BallistaDataFrame":
        """RoundRobin(n) without exprs, Hash(exprs, n) with
        (ballista.proto:219-230)."""
        if exprs:
            return BallistaDataFrame(self._df.repartition(num_partitions, *exprs))
        return BallistaDataFrame(self._df.repartition(num_partitions))

    def schema(self):
        return self._df.schema

    def explain(self, verbose: bool | str = False) -> None:
        """EXPLAIN [VERBOSE] (ballista.proto:250-253). Accepts Spark's
        extended modes ('formatted', 'cost', …) as an upgrade."""
        if isinstance(verbose, str):
            self._df.explain(mode=verbose)
        else:
            self._df.explain(extended=bool(verbose))

    def collect(self):
        """Execute and gather all partitions (reference: submit job, poll,
        Flight-fetch — rust/client/src/context.rs:149-239; here: one action)."""
        return self._df.collect()

    def to_arrow(self):
        """Collect as a pyarrow.Table — the reference returns Arrow
        RecordBatches (python/src/dataframe.rs:107-176)."""
        return self._df.toArrow()

    def count(self) -> int:
        return self._df.count()

    def show(self, n: int = 20, truncate: bool = True) -> None:
        self._df.show(n, truncate)

    # -- sinks (SURVEY.md §2.9) ----------------------------------------------

    def write_csv(self, path: str, header: bool = True, mode: str = "overwrite",
                  compression: str | None = None) -> None:
        w = self._df.write.mode(mode).option("header", header)
        if compression:
            w = w.option("compression", compression)
        w.csv(path)

    def write_parquet(self, path: str, mode: str = "overwrite",
                      compression: str = "snappy",
                      partition_by: Sequence[str] | None = None) -> None:
        w = self._df.write.mode(mode).option("compression", compression)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def write_json(self, path: str, mode: str = "overwrite") -> None:
        """NdJson sink — declared in the reference FileType enum
        (ballista.proto:244-248) but never finished there."""
        self._df.write.mode(mode).json(path)

    def write_orc(self, path: str, mode: str = "overwrite",
                  compression: str = "zstd",
                  partition_by: Sequence[str] | None = None) -> None:
        """ORC sink (native columnar alternative to parquet)."""
        w = self._df.write.mode(mode).option("compression", compression)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.orc(path)

    # -- niceties ------------------------------------------------------------

    def union(self, other: "BallistaDataFrame | DataFrame") -> "BallistaDataFrame":
        odf = other.df if isinstance(other, BallistaDataFrame) else other
        return BallistaDataFrame(self._df.unionByName(odf))

    def distinct(self) -> "BallistaDataFrame":
        return BallistaDataFrame(self._df.distinct())

    def with_column(self, name: str, expr: Column) -> "BallistaDataFrame":
        return BallistaDataFrame(self._df.withColumn(name, expr))

    def __repr__(self) -> str:  # pragma: no cover
        return f"BallistaDataFrame({self._df.schema.simpleString()})"
