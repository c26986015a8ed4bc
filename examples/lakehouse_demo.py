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

    # 7. the same rows through Iceberg — the round-7 WRITER this time:
    # real v1 snapshots with Appendix-D column bounds, then a
    # bound-pruned read back
    from ballista_spark.sources.iceberg import (
        read_iceberg_table,
        write_iceberg_table,
    )

    ice = os.path.join(root, "ice")
    s1 = write_iceberg_table(docs, ice)
    pruned_ice = read_iceberg_table(
        spark, ice, filters=[("doc_id", ">", hi)]
    ).where(F.col("doc_id") > hi)
    print(
        f"[7] iceberg snapshot {s1}: "
        f"{read_iceberg_table(spark, ice).count()} rows; "
        f"bound-pruned late scan: {pruned_ice.count()} rows"
    )

    # 8. Iceberg in → Iceberg out, exactly-once: the ballista_iceberg
    # STREAMING source consumes new append snapshots, the txn-summary
    # sink commits each epoch idempotently
    import ballista_spark.streaming as bss
    from ballista_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    ice_out = os.path.join(root, "ice_out")
    write_iceberg_table(late, ice, txn_app_id="upstream", txn_version=0)
    q = bss.write_stream_iceberg_exactly_once(
        spark.readStream.format("ballista_iceberg")
        .option("path", ice)
        .option("startingOrdinal", "0")
        .load(),
        ice_out,
        os.path.join(root, "ckpt_ice"),
        app_id="mirror",
    )
    q.awaitTermination(120)
    print(
        f"[8] iceberg->iceberg stream mirrored "
        f"{read_iceberg_table(spark, ice_out).count()} rows exactly-once"
    )

    # 9. the THIRD open format: a Hudi COW table read jar-free
    import json as _json
    import uuid as _uuid

    from ballista_spark.sources.hudi import read_hudi_table

    hudi = os.path.join(root, "hudi")
    os.makedirs(os.path.join(hudi, ".hoodie"))
    with open(os.path.join(hudi, ".hoodie", "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=docs\nhoodie.table.type=COPY_ON_WRITE\n")
    docs.limit(100).toPandas().to_parquet(
        os.path.join(hudi, f"{_uuid.uuid4()}-0_0-1-0_20240101000000.parquet")
    )
    with open(
        os.path.join(hudi, ".hoodie", "20240101000000.commit"), "w"
    ) as f:
        _json.dump({}, f)
    print(f"[9] hudi read: {read_hudi_table(spark, hudi).count()} rows "
          "(all three open lakehouse formats, zero jars)")

    # 10. SQL DML surface + exact CDC out: mutate through ctx.sql, then
    # hand downstream consumers the precise row-level deltas
    from ballista_spark.context import BallistaContext
    from ballista_spark.sources.deltalog import read_delta_cdf

    ctx = BallistaContext(spark=spark)
    ctx.register_delta("docs_tbl", table)
    pre = read_delta_snapshot(table).version
    ctx.sql("UPDATE docs_tbl SET n_chars = 0 WHERE n_chars = -1")
    ctx.sql(f"DELETE FROM docs_tbl WHERE doc_id > {int(hi)}")
    cdf = read_delta_cdf(spark, table, from_version=pre)
    kinds = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    print(f"[10] SQL UPDATE+DELETE -> exact CDF since v{pre}: {kinds} "
          "(carried rows cancelled; only real changes surface)")

    shutil.rmtree(root, ignore_errors=True)
    print("lakehouse demo complete")


if __name__ == "__main__":
    main()
