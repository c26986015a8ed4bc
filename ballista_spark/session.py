"""SparkSession construction tuned for the engine.

The reference's runtime knobs (executor ``concurrent_tasks``, batch size
32768, etcd/standalone scheduler — ``rust/executor/executor_config_spec.toml``,
``rust/benchmarks/tpch/src/main.rs:57-59``) all map onto Spark conf.  The
defaults here are chosen for correctness *and* for surviving a 100 TB /
1000-executor deployment:

- AQE on (runtime partition coalescing, skew-join splitting) — replaces the
  reference's static stage planner (``rust/scheduler/src/planner.rs``).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  AQE's coalescing makes a high initial value safe.
- Arrow enabled at the Python boundary, mirroring the reference's
  Arrow-everywhere contract (``rust/executor/src/flight_service.rs``).
- Session timezone pinned to UTC so timestamp semantics are deterministic and
  oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied when *we* build the session.  When the driver hands us an
#: existing session (``__spark_entry__.queries``), only the runtime-settable
#: subset (RUNTIME_CONF) is applied.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet pushdown is on by default; pin it so a misconfigured parent
    # session can't silently disable the scan-level filters the plans rely on.
    "spark.sql.parquet.filterPushdown": "true",
    # keep wide plans (60-column SimHash bit votes, wide coverage selects)
    # inside whole-stage codegen; the default cutoff is 100 fields
    "spark.sql.codegen.maxFields": "256",
    "spark.sql.ui.explainMode": "formatted",
    # PySpark 4's per-call origin capture wraps every DataFrame API call
    # with getActiveSession + a conf read + PySparkCurrentOrigin set/clear
    # (~4 extra py4j round-trips per call, pyspark/errors/utils.py): it
    # only enriches error messages with user-code line numbers, at a
    # measured ~10% of driver-side plan-construction time on
    # expression-heavy builds.  Off in production; re-enable when
    # debugging a failing query.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}

#: Conf safe to set on a live session (no SparkContext restart needed).
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.codegen.maxFields": "256",
    # best-effort on a handed session: pyspark caches this flag at the
    # first wrapped DataFrame call, so it only takes effect if set
    # before any DataFrame work ran in this Python process
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    master: str | None = None,
    app_name: str = "ballista_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Mirrors ``BallistaContext::remote(host, port, settings)``
    (``python/src/context.rs:18-46``): *settings* kwargs become Spark conf.
    """
    par = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{par}]")
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or par)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable conf to a session we didn't build."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be locked down
            pass
    return spark
