"""bench.py emits exactly one valid JSON line on stdout (the driver's
BENCH_r{N}.json contract)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected one JSON line, got: {lines}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload) == {"metric", "value", "unit", "queries", "sf"}
    assert len(payload["queries"]) >= 10
    assert all(v >= 0 for v in payload["queries"].values())
