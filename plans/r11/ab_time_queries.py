#!/usr/bin/env python
"""Time named declared queries in THIS repo tree (cwd) — one JSON line out.

Used by the r11 interleaved A/B (VERDICT r10 item 1: settle the
driver-measured tpch_q9/tpch_q2 regressions HEAD-vs-r9).  Methodology
matches the bench: build once per iteration, collect-timed, min over
iterations; cold run reported separately on stderr.

Usage: python plans/r11/ab_time_queries.py q1,q2 <iters>
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import __spark_entry__ as entry  # noqa: E402
from ballista_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    qs = entry.queries()
    out = {}
    for name in names:
        q = qs[name]
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        cold = time.perf_counter() - t0
        best = []
        for _ in range(iters):
            t0 = time.perf_counter()
            q(spark, sf_dir).collect()
            best.append(time.perf_counter() - t0)
        out[name] = {
            "cold": round(cold, 4),
            "min": round(min(best), 4),
            "median": round(sorted(best)[len(best) // 2], 4),
            "all": [round(b, 4) for b in best],
        }
        print(f"# {name}: cold={cold:.3f} min={min(best):.3f}", file=sys.stderr)
    print(json.dumps({"tree": os.getcwd(), "queries": out}))


if __name__ == "__main__":
    main()
