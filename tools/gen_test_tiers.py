#!/usr/bin/env python
"""Regenerate tools/test_tiers.json — the slow-test list that conftest.py
defers to the BS_TEST_FULL tier (r11, VERDICT r10 item 2).

The driver's verify window runs ``pytest tests/`` serially and was
truncating at ~67% of the full suite (~51 min healthy serial, growing):
``tests_ok`` came back false by TIMEOUT with zero failures.  The fix is
the tier split the r10 verdict prescribed: the default run keeps every
test under the duration threshold (the broad fast coverage), and the
slow tail — scale sweeps, lakehouse lifecycle suites, iterative-fit
mirrors — runs under ``BS_TEST_FULL=1`` exactly like the sf0.01 graded
gate already does.  Durations come from the most recent
``tools/partest.py`` run's junit XMLs (tools/.partest_logs/*.xml).

Usage:
    python tools/partest.py -n 8      # produces fresh junit XMLs
    python tools/gen_test_tiers.py    # regenerates tools/test_tiers.json
"""

from __future__ import annotations

import glob
import json
import os
import sys
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG_DIR = os.path.join(REPO, "tools", ".partest_logs")
OUT = os.path.join(REPO, "tools", "test_tiers.json")

#: seconds (as measured by the sharded runner) above which a test is
#: deferred to the BS_TEST_FULL tier.  At 10 s the default tier keeps
#: ~83% of tests and ~16% of wall time (r11 measurement: 1176 tests,
#: 199 over threshold carrying 84% of the 10530 s sharded total).
THRESHOLD_S = 10.0


def main() -> int:
    slow: dict[str, float] = {}
    n_total = 0
    for x in sorted(glob.glob(os.path.join(LOG_DIR, "*.xml"))):
        try:
            root = ET.parse(x).getroot()
        except (OSError, ET.ParseError):
            continue
        for case in root.iter("testcase"):
            n_total += 1
            t = float(case.get("time") or 0.0)
            cls = case.get("classname") or ""
            fname = os.path.basename(case.get("file") or "") or next(
                (p + ".py" for p in cls.split(".") if p.startswith("test_")), cls
            )
            if t > THRESHOLD_S and fname:
                nodeid = f"{fname}::{case.get('name')}"
                slow[nodeid] = max(slow.get(nodeid, 0.0), round(t, 1))
    if not slow:
        print("no junit XMLs found — run tools/partest.py first", file=sys.stderr)
        return 2
    with open(OUT, "w") as f:
        json.dump(
            {
                "threshold_s": THRESHOLD_S,
                "n_total_seen": n_total,
                "slow": dict(sorted(slow.items())),
            },
            f,
            indent=0,
        )
    print(
        f"{len(slow)}/{n_total} tests over {THRESHOLD_S:.0f}s -> {OUT} "
        f"({sum(slow.values()):.0f}s deferred to BS_TEST_FULL)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
