"""Iceberg v2 position-delete WRITES (round-10 ask #3): the
zero-rewrite DELETE twin of Delta's deletion-vector DELETE.
``delete_from_iceberg_table(use_position_deletes=True)`` writes sorted
(file_path, pos) parquet tombstones with the spec's reserved field ids
(2147483546/2147483545), referenced from a ``content=1`` DELETE
manifest, upgrading the table to format-version 2 — no data bytes
rewritten.  Lifecycle: delete -> MOR read -> compact purges tombstones.
Reference behavior per the Apache Iceberg table spec "Position Delete
Files" + "Sequencing"; the reference repo itself has no lakehouse layer
(this is a beyond-parity mandate component).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from ballista_spark.sources.avroio import read_avro_bytes
from ballista_spark.sources.iceberg import (
    IcebergFeatureError,
    compact_iceberg_table,
    delete_from_iceberg_table,
    expire_iceberg_snapshots,
    merge_iceberg_table,
    read_iceberg_snapshot,
    read_iceberg_table,
    set_iceberg_table_properties,
    update_iceberg_table,
    write_iceberg_table,
)


def _read_meta(path):
    with open(os.path.join(path, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(path, "metadata", f"v{v}.metadata.json")) as f:
        return json.load(f)


def _table(spark, tmp_path, name="t", n=20):
    t = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, f"c{i % 4}", float(i)) for i in range(n)],
        "id long, cat string, v double",
    )
    write_iceberg_table(df.where("id % 2 = 0").repartition(2), t)
    write_iceberg_table(df.where("id % 2 = 1").repartition(2), t, mode="append")
    return t


def _data_files(t):
    return sorted(glob.glob(os.path.join(t, "data", "*.parquet")))


def test_position_delete_lifecycle(spark, tmp_path):
    t = _table(spark, tmp_path)
    files_before = _data_files(t)
    pre_delete_snap = read_iceberg_snapshot(t).snapshot_id

    sid = delete_from_iceberg_table(
        spark, t, [("id", "<", 5)], use_position_deletes=True
    )
    assert sid is not None
    # zero data bytes rewritten: same data files plus ONE tombstone file
    files_after = _data_files(t)
    assert set(files_before) <= set(files_after)
    new = [p for p in files_after if p not in files_before]
    assert len(new) == 1

    # the tombstone file is spec-shaped: sorted (file_path, pos) with
    # the reserved field ids stamped into the parquet schema
    sch = pq.read_schema(new[0])
    assert [f.name for f in sch] == ["file_path", "pos"]
    assert (sch.field("file_path").metadata or {})[b"PARQUET:field_id"] == (
        b"2147483546"
    )
    assert (sch.field("pos").metadata or {})[b"PARQUET:field_id"] == (
        b"2147483545"
    )
    tomb = pq.read_table(new[0]).to_pydict()
    pairs = list(zip(tomb["file_path"], tomb["pos"]))
    assert pairs == sorted(pairs)
    assert len(pairs) == 5

    # snapshot resolution sees them as v2 position deletes; MOR read
    snap = read_iceberg_snapshot(t)
    assert snap.delete_files == [new[0]]
    got = sorted(r["id"] for r in read_iceberg_table(spark, t).collect())
    assert got == list(range(5, 20))

    # metadata upgraded to v2 with a sequence number
    md = _read_meta(t)
    assert md["format-version"] == 2
    assert md["last-sequence-number"] == 1
    assert md["snapshots"][-1]["sequence-number"] == 1
    assert md["snapshots"][-1]["summary"]["operation"] == "delete"
    assert md["snapshots"][-1]["summary"]["added-position-deletes"] == "5"

    # second delete ACCUMULATES (both tombstone sets apply)
    delete_from_iceberg_table(
        spark, t, [("id", ">=", 18)], use_position_deletes=True
    )
    got = sorted(r["id"] for r in read_iceberg_table(spark, t).collect())
    assert got == list(range(5, 18))
    assert _read_meta(t)["last-sequence-number"] == 2

    # append after delete: tombstones survive (positions of old files
    # unchanged), new rows visible, format-version NOT downgraded
    write_iceberg_table(
        spark.createDataFrame([(100, "z", 1.0)], "id long, cat string, v double"),
        t,
        mode="append",
    )
    got = sorted(r["id"] for r in read_iceberg_table(spark, t).collect())
    assert got == list(range(5, 18)) + [100]
    md = _read_meta(t)
    assert md["format-version"] == 2
    assert md["last-sequence-number"] == 3

    # time travel: pre-delete snapshot still shows every original row
    tt = read_iceberg_table(spark, t, snapshot_id=pre_delete_snap)
    assert tt.count() == 20

    # compact purges: the replace snapshot carries no delete entries
    assert compact_iceberg_table(spark, t, target_file_bytes=1 << 30)
    snap = read_iceberg_snapshot(t)
    assert not snap.delete_files and not snap.eq_deletes
    got = sorted(r["id"] for r in read_iceberg_table(spark, t).collect())
    assert got == list(range(5, 18)) + [100]


def test_repeat_delete_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert delete_from_iceberg_table(
        spark, t, [("cat", "=", "c1")], use_position_deletes=True
    ) is not None
    v_before = _read_meta(t)["snapshots"]
    # bounds still admit the files, but every match is already
    # tombstoned — the executor-side anti-join must yield a no-op
    assert delete_from_iceberg_table(
        spark, t, [("cat", "=", "c1")], use_position_deletes=True
    ) is None
    assert _read_meta(t)["snapshots"] == v_before
    got = sorted(r["id"] for r in read_iceberg_table(spark, t).collect())
    assert got == [i for i in range(20) if i % 4 != 1]


def test_no_bounds_match_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert delete_from_iceberg_table(
        spark, t, [("id", ">", 10_000)], use_position_deletes=True
    ) is None


def test_cow_mutations_refuse_on_tombstoned_table(spark, tmp_path):
    t = _table(spark, tmp_path)
    delete_from_iceberg_table(
        spark, t, [("id", "=", 3)], use_position_deletes=True
    )
    with pytest.raises(IcebergFeatureError, match="delete files"):
        delete_from_iceberg_table(spark, t, [("id", "=", 4)])
    with pytest.raises(IcebergFeatureError, match="delete files"):
        update_iceberg_table(spark, t, {"v": "v + 1"}, [("id", "=", 4)])
    with pytest.raises(IcebergFeatureError, match="delete files"):
        merge_iceberg_table(
            spark,
            t,
            spark.createDataFrame([(4, "x", 0.0)], "id long, cat string, v double"),
            on=["id"],
        )
    # but MORE position deletes are fine
    assert delete_from_iceberg_table(
        spark, t, [("id", "=", 4)], use_position_deletes=True
    ) is not None
    got = sorted(r["id"] for r in read_iceberg_table(spark, t).collect())
    assert got == [i for i in range(20) if i not in (3, 4)]


def test_sql_delete_mode_property(spark, tmp_path):
    """``write.delete.mode=merge-on-read`` (the Iceberg spec property)
    routes SQL DELETE through position-delete writes; the default stays
    copy-on-write."""
    from ballista_spark.context import BallistaContext

    ctx = BallistaContext(spark)
    t = _table(spark, tmp_path, name="sqlmor")
    files_before = _data_files(t)
    set_iceberg_table_properties(
        t, {"write.delete.mode": "merge-on-read"}
    )
    ctx.sql(
        f"CREATE EXTERNAL TABLE sqlmor STORED AS ICEBERG LOCATION '{t}'"
    )
    ctx.sql("DELETE FROM sqlmor WHERE id < 3").collect()
    assert set(files_before) <= set(_data_files(t))  # no rewrites
    assert read_iceberg_snapshot(t).delete_files
    out = ctx.sql("SELECT id FROM sqlmor ORDER BY id").collect()
    assert [r["id"] for r in out] == list(range(3, 20))

    # default table: SQL DELETE stays copy-on-write (rewrites, no
    # delete files)
    t2 = _table(spark, tmp_path, name="sqlcow")
    ctx.sql(
        f"CREATE EXTERNAL TABLE sqlcow STORED AS ICEBERG LOCATION '{t2}'"
    )
    ctx.sql("DELETE FROM sqlcow WHERE id < 3").collect()
    assert not read_iceberg_snapshot(t2).delete_files
    assert _read_meta(t2)["format-version"] == 1


def test_expire_protects_then_reaps_tombstones(spark, tmp_path):
    t = _table(spark, tmp_path)
    delete_from_iceberg_table(
        spark, t, [("id", "<", 5)], use_position_deletes=True
    )
    tomb = read_iceberg_snapshot(t).delete_files[0]
    # expiring the pre-delete snapshots must NOT reap the tombstone
    # (still referenced by the current snapshot)
    deleted = expire_iceberg_snapshots(t, retention_ms=0, keep_last=1)
    assert not any(p.endswith(os.path.basename(tomb)) for p in deleted)
    assert os.path.exists(tomb)
    got = sorted(r["id"] for r in read_iceberg_table(spark, t).collect())
    assert got == list(range(5, 20))
    # after compaction the tombstone leaves the live set; expiry reaps it
    compact_iceberg_table(spark, t, target_file_bytes=1 << 30)
    expire_iceberg_snapshots(t, retention_ms=0, keep_last=1)
    assert not os.path.exists(tomb)
    got = sorted(r["id"] for r in read_iceberg_table(spark, t).collect())
    assert got == list(range(5, 20))


def test_changelog_across_position_delete(spark, tmp_path):
    from ballista_spark.sources.iceberg import read_iceberg_changelog

    t = _table(spark, tmp_path)
    delete_from_iceberg_table(
        spark, t, [("id", "=", 7)], use_position_deletes=True
    )
    # window is (from_ordinal, to_ordinal]: start one BEFORE the
    # delete snapshot's ordinal
    log_len = len(_read_meta(t)["snapshot-log"])
    cdf = read_iceberg_changelog(spark, t, log_len - 2)
    rows = {(r["id"], r["_change_type"]) for r in cdf.collect()}
    assert rows == {(7, "delete")}


def test_pyds_face_refuses_tombstoned_table(spark, tmp_path):
    from ballista_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    t = _table(spark, tmp_path)
    delete_from_iceberg_table(
        spark, t, [("id", "=", 1)], use_position_deletes=True
    )
    with pytest.raises(Exception, match="delete files"):
        spark.read.format("ballista_iceberg").option("path", t).load().collect()


def test_manifest_list_marks_delete_manifest(spark, tmp_path):
    """Spec shape on disk: the delete manifest is announced with
    content=1 + a sequence number in the manifest list; data manifests
    carry content 0/null."""
    t = _table(spark, tmp_path)
    delete_from_iceberg_table(
        spark, t, [("id", "<", 2)], use_position_deletes=True
    )
    md = _read_meta(t)
    mlist = md["snapshots"][-1]["manifest-list"]
    records, _ = read_avro_bytes(open(mlist, "rb").read())
    dels = [m for m in records if (m.get("content") or 0) == 1]
    assert len(dels) == 1
    assert dels[0]["sequence_number"] == 1
    # and the delete manifest's entries carry content=1 data_files
    entries, _ = read_avro_bytes(open(dels[0]["manifest_path"], "rb").read())
    assert all(e["data_file"]["content"] == 1 for e in entries)
    assert all(
        e["data_file"]["file_format"] == "PARQUET" for e in entries
    )


def test_renamed_table_position_delete_binds_by_id(spark, tmp_path):
    """Tombstones are (file, pos) pairs — name-independent — and the
    matched scan binds by field id, so position deletes keyed on the
    RENAMED column work on pre-rename files."""
    from ballista_spark.sources.iceberg import rename_iceberg_column

    t = _table(spark, tmp_path)
    rename_iceberg_column(t, "cat", "label", spark=spark)
    assert delete_from_iceberg_table(
        spark, t, [("label", "=", "c1")], use_position_deletes=True
    ) is not None
    got = {
        r["id"]: r["label"] for r in read_iceberg_table(spark, t).collect()
    }
    assert got == {i: f"c{i % 4}" for i in range(20) if i % 4 != 1}
