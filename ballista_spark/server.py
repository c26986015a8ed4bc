"""SQL-over-the-wire entry point — the reference's JDBC surface, Spark-first.

The reference ships a JDBC driver speaking Arrow Flight to the scheduler
(``jvm/jdbc/src/main/java/org/ballistacompute/jdbc/Driver.java``,
``FlightPreparedStatement.java``) and a scheduler-side raw-SQL execution
path (``rust/scheduler/src/lib.rs:226-248``).  On Spark the equivalent
wire protocol is HiveServer2 Thrift: :func:`start_sql_server` boots the
in-process ``HiveThriftServer2`` against this session's catalog, and any
JDBC/ODBC client (beeline, DBeaver, `jdbc:hive2://…`) can run SQL on the
engine — same capability, standard protocol.

Tables published for wire clients are *global* temp views
(``global_temp.<name>``): Thrift opens a new Spark session per connection,
and session-scoped temp views would be invisible there.  (The alternative
is the static conf ``spark.sql.hive.thriftServer.singleSession=true`` at
session build time — pass it via ``get_spark(extra_conf=…)`` when a shared
session is preferred.)

Scale note: the Thrift frontend adds no execution machinery — queries plan
and run exactly like :meth:`BallistaContext.sql`, so every pushdown /
broadcast / AQE property holds for wire clients too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ballista_spark.sources.registry import TABLES, load_table

_STARTED_PORTS: set[int] = set()


def publish_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Expose the canonical tables to wire clients as ``global_temp.<name>``."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceGlobalTempView(name)


def start_sql_server(
    spark: SparkSession, port: int = 10000, publish_sf_dir: str | None = None
) -> str:
    """Start the JDBC/Thrift endpoint on ``port``; returns the JDBC URL.

    Idempotent per port within a process (the JVM hosts one server per
    port).  With ``publish_sf_dir``, the canonical test tables are published
    first so a client can immediately ``SELECT … FROM global_temp.lineitem``.
    """
    if publish_sf_dir:
        publish_tables(spark, publish_sf_dir)
    if port not in _STARTED_PORTS:
        sqlc = spark._jsparkSession.sqlContext()
        sqlc.setConf("hive.server2.thrift.port", str(port))
        spark._jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
            sqlc
        )
        _STARTED_PORTS.add(port)
    return f"jdbc:hive2://localhost:{port}"


def beeline_path() -> str | None:
    """Path of the bundled beeline JDBC client, if the distribution has it."""
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "beeline")
    return p if os.path.exists(p) else None
