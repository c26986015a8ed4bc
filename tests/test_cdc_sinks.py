"""Streaming CDC upsert sinks (streaming/sinks.py): terminal-state
collapse per key, I/U/D application through exactly-once MERGE, replay
idempotence via the txn markers, and table bootstrap on the first
epoch — for both Delta and Iceberg targets.
"""

from __future__ import annotations

import pytest

from ballista_spark.sources.deltalog import merge_delta_table, read_delta_table
from ballista_spark.sources.iceberg import merge_iceberg_table, read_iceberg_table
from ballista_spark.streaming.sinks import _cdc_terminal


CDC_SCHEMA = "id long, cat string, v double, op string, seq long"


def _cdc(spark, rows):
    return spark.createDataFrame(rows, CDC_SCHEMA)


def test_cdc_terminal_latest_wins_and_split(spark):
    batch = _cdc(
        spark,
        [
            (1, "a", 1.0, "i", 10),
            (1, "a", 2.0, "u", 20),  # latest for key 1: upsert v=2
            (2, "b", 5.0, "u", 10),
            (2, "b", 0.0, "D", 30),  # latest for key 2: DELETE
            (3, "c", 7.0, "i", 5),
        ],
    )
    ups, dels = _cdc_terminal(batch, ["id"], "op", "seq")
    got = {r["id"]: r["v"] for r in ups.collect()}
    assert got == {1: 2.0, 3: 7.0}
    assert [f.name for f in ups.schema.fields] == ["id", "cat", "v"]
    assert sorted(r["id"] for r in dels.collect()) == [2]


def test_cdc_terminal_null_op_is_upsert(spark):
    """A NULL op marker is an upsert (review finding: NULL landed in
    NEITHER leg and the event vanished)."""
    batch = _cdc(spark, [(1, "a", 1.0, None, 1), (2, "b", 2.0, "d", 1)])
    ups, dels = _cdc_terminal(batch, ["id"], "op", "seq")
    assert [r["id"] for r in ups.collect()] == [1]
    assert [r["id"] for r in dels.collect()] == [2]


def test_cdc_terminal_no_opcol(spark):
    batch = _cdc(spark, [(1, "a", 1.0, "i", 1), (1, "a", 9.0, "i", 2)])
    ups, dels = _cdc_terminal(batch, ["id"], None, "seq")
    assert dels is None
    assert ups.collect()[0]["v"] == 9.0
    assert "seq" not in ups.columns  # only the declared columns drop


def _run_cdc_stream(spark, tmp_path, fmt, leg):
    """Write a CDC parquet source, stream it into a fresh table, return
    the read-back rows."""
    import ballista_spark.streaming as bss

    src = str(tmp_path / f"src_{leg}")
    _cdc(
        spark,
        [
            (1, "a", 1.0, "i", 1),
            (2, "b", 2.0, "i", 1),
            (3, "c", 3.0, "i", 1),
        ],
    ).write.parquet(src)
    stream = spark.readStream.schema(CDC_SCHEMA).parquet(src)
    table = str(tmp_path / f"t_{leg}")
    fn = (
        bss.write_stream_delta_upsert
        if fmt == "delta"
        else bss.write_stream_iceberg_upsert
    )
    q = fn(
        stream,
        table,
        str(tmp_path / f"ckpt_{leg}"),
        app_id="cdc-1",
        on=["id"],
        op_col="op",
        order_col="seq",
    )
    q.awaitTermination(180)
    return table


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_cdc_stream_bootstrap_apply_and_replay(spark, tmp_path, fmt):
    table = _run_cdc_stream(spark, tmp_path, fmt, fmt)
    read = read_delta_table if fmt == "delta" else read_iceberg_table
    out = {r["id"]: r["v"] for r in read(spark, table).collect()}
    assert out == {1: 1.0, 2: 2.0, 3: 3.0}  # bootstrap epoch inserted

    # second epoch applied MANUALLY through the same merge ops (the
    # sink's body): update 1, delete 2, insert 9
    merge = merge_delta_table if fmt == "delta" else merge_iceberg_table
    ups = spark.createDataFrame(
        [(1, "a", 100.0), (9, "z", 9.0)], "id long, cat string, v double"
    )
    dels = spark.createDataFrame([(2,)], "id long")
    merge(spark, table, ups, on=["id"], txn_app_id="cdc-1#ups", txn_version=1)
    merge(
        spark, table, dels, on=["id"], when_matched="delete",
        insert_not_matched=False, txn_app_id="cdc-1#del", txn_version=1,
    )
    out = {r["id"]: r["v"] for r in read(spark, table).collect()}
    assert out == {1: 100.0, 3: 3.0, 9: 9.0}

    # replay of epoch 1 (redelivery): both legs must skip — no change,
    # even with DIFFERENT (stale) payloads
    stale = spark.createDataFrame(
        [(1, "a", -1.0)], "id long, cat string, v double"
    )
    assert merge(
        spark, table, stale, on=["id"], txn_app_id="cdc-1#ups", txn_version=1
    ) is None
    assert merge(
        spark, table, spark.createDataFrame([(3,)], "id long"), on=["id"],
        when_matched="delete", insert_not_matched=False,
        txn_app_id="cdc-1#del", txn_version=1,
    ) is None
    out = {r["id"]: r["v"] for r in read(spark, table).collect()}
    assert out == {1: 100.0, 3: 3.0, 9: 9.0}


def test_iceberg_merge_bootstrap_into_empty_table(spark, tmp_path):
    """MERGE against a table with metadata but no snapshot inserts the
    source (the CDC first-epoch case) instead of silently dropping it."""
    from ballista_spark.sources.iceberg import write_iceberg_table

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, cat string, v double")
    write_iceberg_table(df, path)
    # delete the only row -> table exists, snapshot has zero files
    from ballista_spark.sources.iceberg import delete_from_iceberg_table

    delete_from_iceberg_table(spark, path, [("id", "=", 1)])
    assert read_iceberg_table(spark, path).count() == 0
    sid = merge_iceberg_table(spark, path, df, on=["id"])
    assert sid is not None
    assert read_iceberg_table(spark, path).count() == 1
