#!/usr/bin/env python
"""Time any declared entry (build / noop-exec / collect split) at a given
SF dir — the gate-scale companion of tools/measure_r10.py, which only
knows the headline set.  Cold = first pass, warm = min of later passes.

Usage: python tools/time_entry.py cov_sketch_sampling [--sf-dir ...]
       [--iters 3] [--tag sess2]
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
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as e
    from ballista_spark.session import get_spark

    qs = e.queries()
    spark = get_spark(app_name="time_entry")
    spark.sql("SELECT 1").collect()

    results = {}
    for name in args.entries:
        run = qs[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        rec = {"cold": None, "warm_build": float("inf"), "warm_noop": float("inf"),
               "warm_total": float("inf")}
        for i in range(args.iters):
            t0 = time.perf_counter()
            df = run(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if i == 0:
                rec["cold"] = round(t2 - t0, 3)
                rec["cold_build"] = round(t1 - t0, 3)
            else:
                rec["warm_build"] = min(rec["warm_build"], t1 - t0)
                rec["warm_noop"] = min(rec["warm_noop"], t2 - t1)
                rec["warm_total"] = min(rec["warm_total"], t2 - t0)
        for k in ("warm_build", "warm_noop", "warm_total"):
            rec[k] = round(rec[k], 3) if rec[k] != float("inf") else None
        results[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
