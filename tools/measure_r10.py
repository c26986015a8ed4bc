#!/usr/bin/env python
"""Round-10 measurement harness (guide §1: measure first).

For each headline bench entry: capture .explain("formatted") to
plans/r10/<name>_<tag>.txt, and break per-query wall time into
(dataframe build = parse/analyze + any builder-side driver work) vs
(execution = noop-sink write) vs (collect round-trip), plus the Spark
job count per execution.  Timings are steady-state minima of N iters.

Usage: python tools/measure_r10.py [--tag before] [--queries q1,q3,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from ballista_spark.queries.base import spec_dialect
    from ballista_spark.queries.pipeline import PIPELINE_QUERIES
    from ballista_spark.queries.tpch import TPCH_QUERIES
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import register_tables

    queries = dict(TPCH_QUERIES)
    queries.update(PIPELINE_QUERIES)
    headline = [
        "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q12",
        "tpch_q2", "tpch_q9", "tpch_q18", "tpch_q21",
        "dedup_minhash_lsh", "ann_cosine_topk", "text_stats",
    ]
    if args.queries:
        headline = args.queries.split(",")

    spark = get_spark(app_name="measure_r10")
    sc = spark.sparkContext
    register_tables(spark, args.sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    plans_dir = os.path.join(REPO, "plans", "r10")
    os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in headline:
        q = queries[name]
        sc.setJobDescription(f"measure:{name}")

        def build():
            if q.sql is not None:
                return spark.sql(spec_dialect(q.sql))
            return q.run(spark, args.sf_dir)

        # one warm pass (codegen compile, broadcast warm)
        df = build()
        df.collect()

        # capture the formatted plan once
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(plan)

        t_build = t_noop = t_collect = float("inf")
        jobs_noop = 0
        for _ in range(args.iters):
            t0 = time.perf_counter()
            df = build()
            t1 = time.perf_counter()
            all0 = sc._jsc.sc().dagScheduler().nextJobId()
            df.write.format("noop").mode("overwrite").save()
            all1 = sc._jsc.sc().dagScheduler().nextJobId()
            t2 = time.perf_counter()
            rows = len(build().collect())
            t3 = time.perf_counter()
            t_build = min(t_build, t1 - t0)
            t_noop = min(t_noop, t2 - t1)
            t_collect = min(t_collect, t3 - t2)
            jobs_noop = all1 - all0
        results[name] = {
            "build_s": round(t_build, 4),
            "noop_exec_s": round(t_noop, 4),
            "build_plus_collect_s": round(t_collect, 4),
            "jobs_per_noop_exec": jobs_noop,
            "rows": rows,
        }
        print(f"{name}: build={t_build:.3f}s noop={t_noop:.3f}s "
              f"build+collect={t_collect:.3f}s jobs={jobs_noop} rows={rows}",
              file=sys.stderr)
        sc.setJobDescription(None)

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
