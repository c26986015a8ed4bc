"""Python DataSource faces (Spark 4 API): batch + streaming Delta,
batch Avro — format-by-name reads with Catalyst-pushed filter pruning.
"""

from __future__ import annotations


import pytest

from ballista_spark.sources.deltalog import write_delta_table
from ballista_spark.sources.pyds import register_data_sources


def _df(spark, rows, schema="id long, cat string, v double"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def registered(spark):
    register_data_sources(spark)
    return spark


def test_batch_read_partitioned(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    df = _df(
        spark,
        [(i, "even" if i % 2 == 0 else "odd", float(i)) for i in range(20)],
    )
    write_delta_table(df, path, partition_by=["cat"])
    out = spark.read.format("ballista_delta").option("path", path).load()
    assert out.schema.simpleString() == df.schema.simpleString()
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))


def test_batch_read_version_option(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0)]), path)
    write_delta_table(_df(spark, [(2, "b", 2.0)]), path)
    v0 = (
        spark.read.format("ballista_delta")
        .option("path", path)
        .option("version", "0")
        .load()
    )
    assert v0.count() == 1


def test_catalyst_filters_prune_files(registered, tmp_path):
    """With pushdown=true the query's own .where() drives file
    skipping through pushFilters — no advisory filters argument.
    Proof: with disjoint per-file key ranges, the filtered scan plans
    exactly ONE input partition (file)."""
    spark = registered
    path = str(tmp_path / "t")
    for lo in (0, 100, 200):
        write_delta_table(
            _df(spark, [(lo + i, "c", float(i)) for i in range(10)]).coalesce(1),
            path,
        )

    def load():
        return (
            spark.read.format("ballista_delta")
            .option("path", path)
            .option("pushdown", "true")
            .load()
        )

    out = load().where("id >= 200")
    assert out.rdd.getNumPartitions() == 1  # 2 of 3 files skipped
    assert out.count() == 10
    # row-level correctness is exact even though pruning is file-level
    assert load().where("id = 105").count() == 1
    assert load().count() == 30


def test_default_scan_is_reuse_safe(registered, tmp_path):
    """Spark 4.1 re-plans a Python scan only when the next query has
    pushable filters; a filterless query on the same loaded DataFrame
    reuses the cached (read func, partitions).  The default (no
    pushdown option) therefore plans a filter-INDEPENDENT scan — this
    is the regression shape that returned 10 instead of 30 when
    pruning was unconditional."""
    spark = registered
    path = str(tmp_path / "t")
    for lo in (0, 100, 200):
        write_delta_table(
            _df(spark, [(lo + i, "c", float(i)) for i in range(10)]).coalesce(1),
            path,
        )
    src = spark.read.format("ballista_delta").option("path", path).load()
    assert src.where("id >= 200").count() == 10  # exact rows, no pruning
    assert src.count() == 30  # reused scan still sees every file


def test_streaming_delta_source_consumes_new_commits(registered, tmp_path):
    """Default startingVersion = latest at QUERY START (initialOffset
    is called on the first trigger, not at load()): the pre-existing
    seed commit is never replayed; each later commit flows through the
    next trigger via the checkpointed offset."""
    spark = registered
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_trigger():
        q = (
            spark.readStream.format("ballista_delta")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_delta_table(_df(spark, [(0, "seed", 0.0)]), path)  # pre-stream
    run_trigger()  # initialOffset = current version → nothing to consume
    # (the sink may still write an EMPTY batch-0 file — assert rows)
    assert (
        spark.read.parquet(out_dir).count() == 0
    ), "the seed commit (pre-start) must not be replayed"

    # commits after query start flow through the checkpointed offset
    write_delta_table(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), path)
    run_trigger()
    got = sorted(r["id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2]

    write_delta_table(_df(spark, [(3, "c", 3.0)]), path)
    run_trigger()
    got = sorted(r["id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 3]


def test_streaming_starting_version_zero(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0)]), path)
    write_delta_table(_df(spark, [(2, "b", 2.0)]), path)
    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.format("ballista_delta")
        .option("path", path)
        .option("startingVersion", "0")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["id"] for r in spark.read.parquet(out_dir).collect()) == [1, 2]


def test_avro_format_read(registered, tmp_path):
    spark = registered
    from ballista_spark.sources.avroio import write_avro

    df = _df(spark, [(i, f"s{i}", float(i)) for i in range(100)])
    out = str(tmp_path / "av")
    write_avro(df, out)
    got = spark.read.format("ballista_avro").option("path", out).load()
    assert got.schema.simpleString() == df.schema.simpleString()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# ballista_iceberg face


def test_iceberg_format_read_and_version(registered, tmp_path):
    from ballista_spark.sources.iceberg import write_iceberg_table

    spark = registered
    path = str(tmp_path / "t")
    df = _df(spark, [(i, f"c{i % 3}", float(i)) for i in range(30)])
    s1 = write_iceberg_table(df, path)
    write_iceberg_table(_df(spark, [(99, "z", 9.0)]), path)
    got = spark.read.format("ballista_iceberg").option("path", path).load()
    assert got.schema.simpleString() == df.schema.simpleString()
    assert got.count() == 31
    v1 = (
        spark.read.format("ballista_iceberg")
        .option("path", path)
        .option("version", str(s1))
        .load()
    )
    assert v1.count() == 30  # snapshot time travel by id


def test_iceberg_catalyst_bound_pruning(registered, tmp_path):
    from ballista_spark.sources.iceberg import write_iceberg_table

    spark = registered
    path = str(tmp_path / "t")
    for lo in (0, 100, 200):
        write_iceberg_table(
            _df(spark, [(lo + i, "c", float(i)) for i in range(10)]).coalesce(1),
            path,
        )

    def load():
        return (
            spark.read.format("ballista_iceberg")
            .option("path", path)
            .option("pushdown", "true")
            .load()
        )

    out = load().where("id >= 200")
    assert out.rdd.getNumPartitions() == 1  # 2 of 3 files skipped
    assert out.count() == 10
    assert load().count() == 30

    # default (no pushdown option) stays reuse-safe — the _DeltaReader
    # regression shape
    src = spark.read.format("ballista_iceberg").option("path", path).load()
    assert src.where("id >= 200").count() == 10
    assert src.count() == 30


def test_iceberg_streaming_consumes_new_snapshots(registered, tmp_path):
    from ballista_spark.sources.iceberg import write_iceberg_table

    spark = registered
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_trigger():
        q = (
            spark.readStream.format("ballista_iceberg")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_iceberg_table(_df(spark, [(0, "seed", 0.0)]), path)
    run_trigger()  # initialOffset = current log length → nothing
    assert spark.read.parquet(out_dir).count() == 0

    write_iceberg_table(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), path)
    run_trigger()
    got = sorted(r["id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2]

    write_iceberg_table(_df(spark, [(3, "c", 3.0)]), path)
    run_trigger()
    got = sorted(r["id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 3]


def test_iceberg_streaming_starting_ordinal_zero(registered, tmp_path):
    from ballista_spark.sources.iceberg import write_iceberg_table

    spark = registered
    path = str(tmp_path / "t")
    write_iceberg_table(_df(spark, [(1, "a", 1.0)]), path)
    write_iceberg_table(_df(spark, [(2, "b", 2.0)]), path)
    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.format("ballista_iceberg")
        .option("path", path)
        .option("startingOrdinal", "0")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["id"] for r in spark.read.parquet(out_dir).collect()) == [1, 2]


def test_iceberg_streaming_skips_compaction_snapshots(registered, tmp_path):
    """A replace (compaction) snapshot adds no rows — the stream must
    skip it silently, the Delta dataChange:false analogue."""
    from ballista_spark.sources.iceberg import (
        compact_iceberg_table,
        write_iceberg_table,
    )

    spark = registered
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_trigger():
        q = (
            spark.readStream.format("ballista_iceberg")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_iceberg_table(_df(spark, [(0, "seed", 0.0)]), path)
    run_trigger()  # consume nothing (default start = now)
    write_iceberg_table(_df(spark, [(1, "a", 1.0)]), path)
    write_iceberg_table(_df(spark, [(2, "b", 2.0)]), path)
    assert compact_iceberg_table(spark, path, target_file_bytes=1 << 30)
    write_iceberg_table(_df(spark, [(3, "c", 3.0)]), path)
    run_trigger()
    got = sorted(r["id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 3]  # compaction invisible, no replays


def test_delta_streaming_refuses_overwrite_commits(registered, tmp_path):
    """An overwrite commit retracts rows — delivering its adds as
    appends would duplicate everything already streamed; the source
    must refuse, like Delta's own."""
    spark = registered
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_trigger():
        q = (
            spark.readStream.format("ballista_delta")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_delta_table(_df(spark, [(0, "seed", 0.0)]), path)
    run_trigger()
    write_delta_table(_df(spark, [(1, "a", 1.0)]), path)
    write_delta_table(_df(spark, [(9, "z", 9.0)]), path, mode="overwrite")
    with pytest.raises(Exception, match="retraction"):
        run_trigger()


def test_iceberg_streaming_offsets_survive_expiry(registered, tmp_path):
    """Offsets are (timestamp, snapshot-id), not log positions: expiring
    already-consumed snapshots between triggers must not skip or replay
    anything."""
    from ballista_spark.sources.iceberg import (
        expire_iceberg_snapshots,
        write_iceberg_table,
    )

    spark = registered
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_trigger():
        q = (
            spark.readStream.format("ballista_iceberg")
            .option("path", path)
            .option("startingOrdinal", "0")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for i in range(3):
        write_iceberg_table(_df(spark, [(i, "a", float(i))]), path)
    run_trigger()
    assert sorted(r["id"] for r in spark.read.parquet(out_dir).collect()) == [0, 1, 2]
    # expire everything but the newest CONSUMED snapshot, then append
    expire_iceberg_snapshots(path, retention_ms=-1)
    write_iceberg_table(_df(spark, [(3, "b", 3.0)]), path)
    write_iceberg_table(_df(spark, [(4, "b", 4.0)]), path)
    run_trigger()
    got = sorted(r["id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [0, 1, 2, 3, 4]  # nothing lost, nothing replayed


def test_delta_streaming_skips_compaction_commits(registered, tmp_path):
    """compact_delta_table writes dataChange:false adds+removes — the
    stream must pass over them silently (no refusal, no replays)."""
    from ballista_spark.sources.deltalog import compact_delta_table

    spark = registered
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_trigger():
        q = (
            spark.readStream.format("ballista_delta")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_delta_table(_df(spark, [(0, "seed", 0.0)]), path)
    run_trigger()
    write_delta_table(_df(spark, [(1, "a", 1.0)]).coalesce(1), path)
    write_delta_table(_df(spark, [(2, "b", 2.0)]).coalesce(1), path)
    assert compact_delta_table(spark, path, target_file_bytes=1 << 30)
    write_delta_table(_df(spark, [(3, "c", 3.0)]), path)
    run_trigger()
    got = sorted(r["id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 3]
