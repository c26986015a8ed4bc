"""Lakehouse lifecycle demo: the transactional table layer a 100 TB
training-data pipeline publishes into — end-to-end on the Delta-protocol
source, finishing with an Iceberg read of the same data.

1. ``write_delta_table``      — curated documents land as an ACID table
                                (atomic commit, per-file column stats)
2. streaming exactly-once     — a "late batch" appends through the txn
                                action; a replay of the same epoch is
                                detected in the log and skipped
3. ``read_delta_changes``     — the downstream tokenizer consumes ONLY
                                the new commits (no table rescan)
4. ``compact_delta_table``    — clustered rewrite: interleaved appends
                                become range-sorted files whose stats
                                actually prune
5. ``read_delta_table``       — time travel + stats-skipped scan
6. ``vacuum_delta_table``     — physical cleanup past the retention
                                horizon
7. ``read_iceberg_table``     — the same rows through the OTHER open
                                table format (fixture built with the
                                in-repo Avro codec)

Usage::

    python examples/lakehouse_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from ballista_spark.session import get_spark
    from ballista_spark.sources.deltalog import (
        compact_delta_table,
        merge_delta_table,
        read_delta_changes,
        read_delta_snapshot,
        read_delta_table,
        vacuum_delta_table,
        write_delta_table,
    )
    from ballista_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="lakehouse_demo")
    root = tempfile.mkdtemp(prefix="lakehouse_demo_")
    table = os.path.join(root, "docs")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("n_chars")
    )

    # 1. publish the curated corpus as an ACID table
    v0 = write_delta_table(docs, table, partition_by=["source"])
    print(f"[1] published v{v0}: "
          f"{read_delta_snapshot(table).num_files} files")

    # 2. exactly-once appends: same (app, epoch) twice -> one commit
    late = docs.limit(50).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    v1 = write_delta_table(late, table, txn_app_id="crawler", txn_version=0)
    replay = write_delta_table(late, table, txn_app_id="crawler", txn_version=0)
    print(f"[2] late batch committed as v{v1}; replay -> {replay} (skipped)")

    # 3. incremental consumption: only the new commit's rows
    changes = read_delta_changes(spark, table, from_version=v0)
    print(f"[3] change feed since v{v0}: {changes.count()} rows "
          f"(versions {sorted(set(r['_commit_version'] for r in changes.select('_commit_version').distinct().collect()))})")

    # 4. clustered compaction -> stats become selective
    vc = compact_delta_table(
        spark, table, target_file_bytes=64 * 1024 * 1024,
        cluster_by=["doc_id"],
    )
    snap = read_delta_snapshot(table)
    print(f"[4] compacted at v{vc}: {snap.num_files} files")

    # 5. time travel + stats-skipped read
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    pruned = read_delta_table(
        spark, table, filters=[("doc_id", ">", hi)]
    ).where(F.col("doc_id") > hi)
    print(f"[5] v0 had {read_delta_table(spark, table, version=v0).count()} "
          f"rows; latest has {read_delta_table(spark, table).count()}; "
          f"stats-skipped late-batch scan: {pruned.count()} rows")

    # 5b. MERGE a correction batch (touch-only rewrite)
    fix = docs.limit(20).withColumn("n_chars", F.lit(-1))
    vm = merge_delta_table(spark, table, fix, on=["doc_id"])
    fixed = read_delta_table(spark, table).where("n_chars = -1").count()
    print(f"[5b] merged corrections at v{vm}: {fixed} rows updated")

    # 6. vacuum past a zero-retention horizon (demo only; production
    # keeps the time-travel window)
    deleted = vacuum_delta_table(table, retention_ms=-1)
    print(f"[6] vacuum reaped {len(deleted)} unreferenced files")

    # 7. the same rows through Iceberg (fixture via the Avro codec)
    from tests.test_iceberg import _commit_snapshot, _write_data_file

    ice = os.path.join(root, "ice")
    rows = [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    entry = _write_data_file(ice, "f1.parquet", rows)
    _commit_snapshot(ice, 1, [entry], version=1)
    from ballista_spark.sources.iceberg import read_iceberg_table

    print(f"[7] iceberg read: {read_iceberg_table(spark, ice).count()} rows")

    shutil.rmtree(root, ignore_errors=True)
    print("lakehouse demo complete")


if __name__ == "__main__":
    main()
