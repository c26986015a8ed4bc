"""Arrow Flight data plane: serve registered tables / SQL results as
Arrow record-batch streams.

The reference's executors expose their results over Arrow Flight
(``rust/executor/src/flight_service.rs:90-133``: a ``do_get`` whose
ticket carries the query/partition to execute, answered as a schema
message plus record batches; the JVM JDBC driver consumes the same
protocol, ``jvm/jdbc/src/main/java/org/ballistacompute/jdbc/
FlightConnection.java``).  Spark already owns the *internal* data plane
(shuffle), so this engine's Flight face serves the reference's
*external* role: a wire protocol for fetching query results and
registered tables into any Arrow-speaking client — alongside the
HiveServer2 Thrift endpoint (``server.py``) that covers the JDBC/SQL
role.

Ticket format (JSON, utf-8):

- ``{"table": "<name>"}``  — stream a table registered in the session
  catalog (``createOrReplaceTempView`` / ``CREATE EXTERNAL TABLE``);
- ``{"sql": "SELECT ..."}`` — execute and stream any SQL statement.

``get_flight_info``/``get_schema`` answer the same descriptors, so
standard clients can discover schemas before fetching; ``list_flights``
enumerates the catalog's temp views.

Scale note: results stream as record batches (``DataFrame.toArrow`` —
Arrow IPC out of the JVM, the same boundary ``mapInPandas`` uses), so
this endpoint is for RESULT-sized data — exactly the reference's usage,
where Flight ships completed partitions, not raw corpus scans.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import SparkSession

try:  # gate: pyarrow.flight is optional in minimal pyarrow builds
    import pyarrow.flight as _flight

    _FLIGHT_AVAILABLE = True
except ImportError:  # pragma: no cover - present in this environment
    _flight = None
    _FLIGHT_AVAILABLE = False


def _df_for(spark: SparkSession, request: dict):
    if "sql" in request:
        return spark.sql(request["sql"])
    if "table" in request:
        return spark.table(request["table"])
    raise ValueError(f"ticket must carry 'sql' or 'table': {request}")


if _FLIGHT_AVAILABLE:

    class BallistaFlightServer(_flight.FlightServerBase):
        """Flight face over a SparkSession (see module docstring)."""

        def __init__(self, spark: SparkSession, location: str = "grpc://0.0.0.0:0"):
            super().__init__(location)
            self._spark = spark
            self._location = location

        # -- reads ----------------------------------------------------
        def do_get(self, context, ticket):
            request = json.loads(ticket.ticket.decode("utf-8"))
            table = _df_for(self._spark, request).toArrow()
            return _flight.RecordBatchStream(table)

        def _descriptor_request(self, descriptor) -> dict:
            if descriptor.descriptor_type == _flight.DescriptorType.PATH:
                return {"table": descriptor.path[0].decode("utf-8")}
            return json.loads(descriptor.command.decode("utf-8"))

        def get_flight_info(self, context, descriptor):
            request = self._descriptor_request(descriptor)
            df = _df_for(self._spark, request)
            # schema without executing: Spark's analyzed schema → Arrow
            schema = df.limit(0).toArrow().schema
            ticket = _flight.Ticket(json.dumps(request).encode("utf-8"))
            endpoint = _flight.FlightEndpoint(ticket, [])
            return _flight.FlightInfo(schema, descriptor, [endpoint], -1, -1)

        def get_schema(self, context, descriptor):
            request = self._descriptor_request(descriptor)
            schema = _df_for(self._spark, request).limit(0).toArrow().schema
            return _flight.SchemaResult(schema)

        def list_flights(self, context, criteria):
            for row in self._spark.sql("SHOW VIEWS").collect():
                name = row["viewName"]
                descriptor = _flight.FlightDescriptor.for_path(name)
                yield self.get_flight_info(context, descriptor)


def start_flight_server(
    spark: SparkSession, location: str = "grpc://0.0.0.0:0"
):
    """Start a :class:`BallistaFlightServer` on a daemon thread; returns
    the server (``.port`` carries the bound port; call ``.shutdown()``
    to stop).  Raises ImportError when pyarrow lacks the flight module —
    the Thrift endpoint (``server.py``) remains the wire protocol then.
    """
    if not _FLIGHT_AVAILABLE:  # pragma: no cover
        raise ImportError("pyarrow.flight is not available in this build")
    server = BallistaFlightServer(spark, location)
    thread = threading.Thread(target=server.serve, daemon=True)
    thread.start()
    return server
