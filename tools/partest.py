#!/usr/bin/env python
"""Shard the pytest suite across N worker processes — the round-10
answer to suite wall-time (35 min serial and growing; it was the
iteration bottleneck and the cause of every loaded bench window).

pytest-xdist is not available in this environment, so this is plain
process-level sharding: each worker gets a disjoint set of test FILES
(the session-scoped SparkSession fixture keeps one JVM per worker) and
its own slice of the CPUs (``SPARK_GRAFT_CPUS = cpus // n``).

Scheduling is greedy longest-first over per-file durations measured on
the PREVIOUS run (persisted to ``tools/.partest_times.json`` from each
worker's junit XML) — the first run balances by file size, every later
run by real times.  Identical coverage to ``pytest tests/``: same
files, same default markers/skips, combined exit status.

Usage:
    python tools/partest.py            # all of tests/, 4 workers
    python tools/partest.py -n 6      # more workers
    python tools/partest.py -- -k foo  # extra pytest args after --
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
TIMES_PATH = os.path.join(REPO, "tools", ".partest_times.json")
LOG_DIR = os.path.join(REPO, "tools", ".partest_logs")


def _load_times() -> dict:
    try:
        with open(TIMES_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _estimate(path: str, times: dict) -> float:
    rel = os.path.basename(path)
    if rel in times:
        return float(times[rel])
    # first run: file size is a weak but monotone proxy
    return os.path.getsize(path) / 2000.0


def _partition(files: list[str], n: int, times: dict) -> list[list[str]]:
    """Greedy longest-processing-time: heaviest file to the lightest
    bin."""
    bins: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for path in sorted(files, key=lambda p: -_estimate(p, times)):
        i = loads.index(min(loads))
        bins[i].append(path)
        loads[i] += _estimate(path, times)
    return [sorted(b) for b in bins if b]


def _collect_file_times(xml_path: str) -> dict:
    """Sum junit testcase times per test file."""
    out: dict[str, float] = {}
    try:
        root = ET.parse(xml_path).getroot()
    except (OSError, ET.ParseError):
        return out
    for case in root.iter("testcase"):
        fname = os.path.basename(case.get("file") or "")
        if not fname:
            # classname is dotted: tests.test_foo / test_foo
            cls = (case.get("classname") or "").split(".")
            fname = next(
                (c + ".py" for c in cls if c.startswith("test_")), ""
            )
        if fname:
            out[fname] = out.get(fname, 0.0) + float(case.get("time") or 0.0)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-n", "--workers", type=int, default=4)
    ap.add_argument(
        "pytest_args",
        nargs="*",
        help="extra pytest args (put them after --)",
    )
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(TESTS, "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    times = _load_times()
    bins = _partition(files, max(1, args.workers), times)
    os.makedirs(LOG_DIR, exist_ok=True)

    cpus = os.cpu_count() or 8
    per_worker = max(2, cpus // len(bins))
    procs = []
    t0 = time.time()
    for i, bucket in enumerate(bins):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(per_worker)
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
        xml = os.path.join(LOG_DIR, f"worker{i}.xml")
        log = open(os.path.join(LOG_DIR, f"worker{i}.log"), "w")
        cmd = (
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             f"--junitxml={xml}"]
            + args.pytest_args
            + bucket
        )
        procs.append(
            (
                i,
                xml,
                log,
                subprocess.Popen(
                    cmd, cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT
                ),
            )
        )
        est = sum(_estimate(p, times) for p in bucket)
        print(
            f"worker {i}: {len(bucket)} files, est {est:.0f}s "
            f"(local[{per_worker}])"
        )

    failed = False
    new_times = dict(times)
    for i, xml, log, proc in procs:
        rc = proc.wait()
        log.close()
        new_times.update(_collect_file_times(xml))
        with open(os.path.join(LOG_DIR, f"worker{i}.log")) as f:
            tail = f.read().strip().rsplit("\n", 1)[-1]
        # rc 5 = "no tests collected": normal when -k/-m filter args
        # leave a shard empty (files are sharded before filtering)
        ok = rc == 0 or (rc == 5 and args.pytest_args)
        status = "ok" if ok else f"FAILED rc={rc}"
        print(f"worker {i}: {status} — {tail}")
        if not ok:
            failed = True

    with open(TIMES_PATH, "w") as f:
        json.dump(dict(sorted(new_times.items())), f, indent=0)
    print(
        f"total wall {time.time() - t0:.0f}s across {len(bins)} workers "
        f"(logs: {os.path.relpath(LOG_DIR, REPO)}/)"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
