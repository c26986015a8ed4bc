"""Benchmark harness — the BENCH gate (BASELINE.md).

Port of the reference benchmark loop (``rust/benchmarks/tpch/src/main.rs:
117-183``: register tables, run each query, report per-query seconds) onto
the engine.  Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing is end-to-end per query: plan build + execution + a full
``collect()`` round-trip of the result set, matching how the reference
timed queries.  A ``count()`` action would let Catalyst prune every
unreferenced aggregate column and drop the ORDER BY entirely (verified on
q1: only the two group keys survive), understating real cost — collect
executes the un-pruned plan.

Each query runs ``$SPARK_GRAFT_BENCH_ITERS`` times (default 2) and the
reported number is the *minimum* (steady-state).  Spark pays a one-time
whole-stage-codegen compile per unique plan — a JVM JIT cost with no
analog in the reference's interpreted Rust operators and one that is
amortized to noise over a 100 TB run, where the same generated code
executes across thousands of tasks.  First-run (cold) numbers go to
stderr and are tabulated in BASELINE.md; the JSON records the iteration
count.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    # the reference's integration set (rust/benchmarks/tpch/run.sh:6)
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q12",
    # heavier shapes: subqueries + wide joins
    "tpch_q2",
    "tpch_q9",
    "tpch_q18",
    "tpch_q21",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ballista_spark.queries.tpch import TPCH_QUERIES
    from ballista_spark.session import get_spark

    queries = dict(TPCH_QUERIES)
    try:
        from ballista_spark.queries.pipeline import PIPELINE_QUERIES

        queries.update(PIPELINE_QUERIES)
        headline = HEADLINE + ["dedup_minhash_lsh", "ann_cosine_topk", "text_stats"]
    except ImportError:
        headline = list(HEADLINE)

    spark = get_spark(app_name="ballista_spark_bench")
    # warm the JVM and pre-register the tables so q1 doesn't pay one-time
    # session costs — the reference benchmark likewise registered all
    # tables before its timed loop (rust/benchmarks/tpch/src/main.rs:117-139).
    from ballista_spark.sources.registry import register_tables

    register_tables(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    from ballista_spark.queries.base import spec_dialect

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2")))
    timings: dict[str, float] = {}
    for name in headline:
        q = queries[name]
        runs: list[float] = []
        for _ in range(iters):
            t0 = time.perf_counter()
            if q.sql is not None:
                # benchmark the TPC-H *spec* arithmetic (plain SUM/AVG — what
                # the reference's q1.sql runs); the decimal-cast variants exist
                # only for the cross-engine value-hash gate (~5× dearer)
                df = spark.sql(spec_dialect(q.sql))
            else:
                df = q.run(spark, sf_dir)
            n = len(df.collect())
            runs.append(round(time.perf_counter() - t0, 4))
        timings[name] = min(runs)
        print(f"# {name}: {timings[name]:.3f}s rows={n} runs={runs}", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "tpch_headline_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "iterations": iters,
        "timing": "steady-state (min of iterations; cold runs on stderr)",
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
