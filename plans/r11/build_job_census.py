#!/usr/bin/env python
"""Warm-build driver-job census over all 50 declared entries (r11,
VERDICT r10 item 6): builds each entry's DataFrame twice and reports the
Spark jobs triggered during the SECOND (warm) build — a query builder
should run zero jobs outside documented checkpoint materializations.

Usage: python plans/r11/build_job_census.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import __spark_entry__ as entry  # noqa: E402
from ballista_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="build_job_census")
    spark.sql("SELECT 1").collect()
    qs = entry.queries()
    out = {}
    for name, q in qs.items():
        q(spark, sf_dir)  # cold build (warms caches)
        # job ids are monotonically increasing; nextJobId is the counter
        jsc = spark.sparkContext._jsc.sc()
        next_before = jsc.dagScheduler().nextJobId()
        t0 = time.perf_counter()
        q(spark, sf_dir)  # warm build
        dt = time.perf_counter() - t0
        next_after = jsc.dagScheduler().nextJobId()
        out[name] = {"warm_build_jobs": next_after - next_before,
                     "warm_build_s": round(dt, 3)}
        print(f"{name:28s} jobs={next_after - next_before:3d} "
              f"build={dt:6.2f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
