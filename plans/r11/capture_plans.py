#!/usr/bin/env python
"""Capture .explain("formatted") for named declared queries into
plans/r11/<name>_<tag>.txt (run from the tree to capture: cwd decides
which code builds the plan).

Usage: python plans/r11/capture_plans.py <tag> <name>[,<name>...] [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.getcwd())

import __spark_entry__ as entry  # noqa: E402
from ballista_spark.session import get_spark  # noqa: E402

OUT_DIR = "/root/repo/plans/r11"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark()
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{path}: {len(plan.splitlines())} lines")


if __name__ == "__main__":
    main()
