"""Constrained-memory spill evidence (SURVEY §4.2's "Spark spills —
strict upgrade" claim, demonstrated rather than asserted).

Runs the heavy graded shapes at the 10× stress scale under a
deliberately small heap and reports, per query: wall time, completion,
and the execution-memory spill totals (memory/disk bytes spilled)
pulled from the local Spark UI REST API — the ground truth the claim
needs.  The reference engine's hash aggregate / sort operators abort
when their memory budget is exhausted; Spark's spill to disk and
finish, so a 100 TB shuffle that misestimates partition sizes degrades
to slower-but-done instead of dead.

Usage (quiet box; heap via the session's env knob):

    SPARK_GRAFT_DRIVER_MEM=4g python tools/spill_check.py

Results recorded in BASELINE.md (round 6).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

#: 10× stress data (tools/stress.py's DST)
SF_DIR = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/bs_stress_sf1")
QUERIES = ["tpch_q18", "tpch_q21", "dedup_minhash_lsh", "curation_chain"]


def spill_totals(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all completed
    stages of THIS app, via its own UI REST endpoint (uiWebUrl — not a
    fixed port: a concurrent session may hold 4040 and its idle stages
    would read as zero spill)."""
    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10))
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def run_query(spark, name: str):
    from ballista_spark.operators.dedup import clear_minhash_cache
    from ballista_spark.queries.base import spec_dialect
    from ballista_spark.queries.pipeline import PIPELINE_QUERIES
    from ballista_spark.queries.tpch import TPCH_QUERIES

    clear_minhash_cache()
    if name == "curation_chain":
        import tools.stress as stress

        return stress._curation_chain(spark, SF_DIR)
    q = TPCH_QUERIES.get(name) or PIPELINE_QUERIES[name]
    if q.sql is not None:
        return spark.sql(spec_dialect(q.sql))
    return q.run(spark, SF_DIR)


def force_sort_probe(spark) -> None:
    """Graceful-spill demonstration: a 60M-row global sort whose
    working set deliberately exceeds the execution-memory pool (row ~40
    bytes × 60M ≈ 2.4 GB vs ~700 MB at a 1.5g heap) — the shape a
    100 TB shuffle hits when partition sizing misestimates.  Spark
    spills and finishes; the reference's sort aborts on budget
    exhaustion.  Run: SPARK_GRAFT_DRIVER_MEM=1500m SPARK_GRAFT_CPUS=8
    python tools/spill_check.py --force-sort"""
    df = spark.range(60_000_000).select(
        F.col("id"),
        F.xxhash64("id").alias("h"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("p"),
    )
    t0 = time.time()
    df.orderBy("h").write.format("noop").mode("overwrite").save()
    mem, disk = spill_totals(spark)
    print(
        f"# force_sort: {time.time() - t0:.1f}s ok "
        f"spill_mem={mem / 2**20:.0f}MB spill_disk={disk / 2**20:.0f}MB"
    )
    assert disk > 0, "probe sized to spill — zero means metrics plumbing broke"


def main() -> None:
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import register_tables

    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(app_name="ballista_spark_spill_check")
    if "--force-sort" in sys.argv:
        print(f"# heap={heap} force-sort probe")
        force_sort_probe(spark)
        return
    register_tables(spark, SF_DIR)
    print(f"# heap={heap} sf_dir={SF_DIR}")
    prev_mem = prev_disk = 0
    for name in QUERIES:
        t0 = time.time()
        status = "ok"
        rows = -1
        try:
            rows = len(run_query(spark, name).collect())
        except Exception as exc:  # noqa: BLE001 — OOM IS the finding
            status = f"FAILED: {type(exc).__name__}: {str(exc)[:120]}"
        dt = time.time() - t0
        try:
            mem, disk = spill_totals(spark)
        except Exception:
            mem, disk = -1, -1
        dmem, ddisk = mem - prev_mem, disk - prev_disk
        prev_mem, prev_disk = mem, disk
        print(
            f"# {name}: {dt:.1f}s rows={rows} {status} "
            f"spill_mem={dmem / 2**20:.0f}MB spill_disk={ddisk / 2**20:.0f}MB"
        )
    print("# done")


if __name__ == "__main__":
    main()
