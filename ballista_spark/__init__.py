"""ballista_spark — a PySpark-native analytics engine with the query surface of
ballista-compute/ballista.

The reference (``/root/reference``) is a distributed Arrow-native SQL engine:
DataFusion query semantics + a Spark-shaped scheduler/executor runtime
(see SURVEY.md).  Spark already *is* that runtime, so this package is a thin,
well-typed PySpark layer exposing Ballista's API surface:

- :class:`BallistaContext` — session + table registry + SQL entry point
  (reference: ``rust/client/src/context.rs``, ``python/src/context.rs``)
- :class:`BallistaDataFrame` — the DataFrame operator surface
  (reference: ``python/src/dataframe.rs``, ``rust/client/src/context.rs:241-314``)
- :mod:`ballista_spark.functions` — expression/function namespace
  (reference: ``python/src/functions.rs``, ``ballista.proto:80-127``)
- :mod:`ballista_spark.types` — Arrow↔Spark type mapping
  (reference: ``python/src/datatypes.rs``, ``ballista.proto:750-785``)

Beyond reference parity it adds large-scale training-data-pipeline operators
(``ballista_spark.operators``: dedup, similarity search, text analysis,
multimodal plumbing) and Structured Streaming helpers
(``ballista_spark.streaming``) — all designed for a 1000-executor / 100 TB
deployment even though tests run on ``local[*]``.
"""

from ballista_spark.context import BallistaContext
from ballista_spark.dataframe import BallistaDataFrame
from ballista_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["BallistaContext", "BallistaDataFrame", "get_spark", "__version__"]
