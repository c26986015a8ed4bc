"""Delta column mapping (modes name/id) READ support: tables written by
modern delta-spark store PHYSICAL parquet column names (col-<uuid>) with
the logical schema carried in field metadata — reading one by logical
names used to be impossible (all-NULL columns).  Fixtures are hand-built
to the public protocol shapes: physical data files + schemaString field
metadata + physically-keyed stats/partitionValues.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ballista_spark.sources.deltalog import (
    DeltaProtocolError,
    read_delta_snapshot,
    read_delta_table,
    update_delta_table,
)

PHYS = {"id": "col-1a2b", "cat": "col-3c4d", "part": "col-5e6f"}


def _schema_string(with_part=False):
    fields = [
        {
            "name": "id",
            "type": "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": PHYS["id"],
            },
        },
        {
            "name": "cat",
            "type": "string",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": PHYS["cat"],
            },
        },
    ]
    if with_part:
        fields.append(
            {
                "name": "part",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 3,
                    "delta.columnMapping.physicalName": PHYS["part"],
                },
            }
        )
    return json.dumps({"type": "struct", "fields": fields})


def _write_phys_file(table, rel, ids, cats):
    path = os.path.join(table, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                PHYS["id"]: pa.array(ids, pa.int64()),
                PHYS["cat"]: pa.array(cats, pa.string()),
            }
        ),
        path,
    )
    return {
        "path": rel,
        "size": os.path.getsize(path),
        "modificationTime": 0,
        "dataChange": True,
        "stats": json.dumps(
            {
                "numRecords": len(ids),
                "minValues": {PHYS["id"]: min(ids)},
                "maxValues": {PHYS["id"]: max(ids)},
                "nullCount": {PHYS["id"]: 0},
            }
        ),
        "partitionValues": {},
    }


def _commit(table, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, "00000000000000000000.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _mapped_table(tmp_path, mode="name", protocol=None, with_part=False):
    table = str(tmp_path / "t")
    adds = []
    if with_part:
        for pv, ids in (("x", [1, 2]), ("y", [100, 200])):
            rel = f"{PHYS['part']}={pv}/f_{pv}.parquet"
            a = _write_phys_file(table, rel, ids, ["a"] * len(ids))
            a["partitionValues"] = {PHYS["part"]: pv}
            adds.append(a)
    else:
        adds.append(_write_phys_file(table, "f1.parquet", [1, 2, 3], ["a", "b", "c"]))
        adds.append(_write_phys_file(table, "f2.parquet", [100, 200], ["x", "y"]))
    _commit(
        table,
        [
            {"protocol": protocol or {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _schema_string(with_part),
                    "partitionColumns": ["part"] if with_part else [],
                    "configuration": {"delta.columnMapping.mode": mode},
                    "createdTime": 0,
                }
            },
        ]
        + [{"add": a} for a in adds],
    )
    return table


@pytest.mark.parametrize("mode", ["name", "id"])
def test_mapped_read_logical_names_and_values(spark, tmp_path, mode):
    table = _mapped_table(tmp_path, mode=mode)
    df = read_delta_table(spark, table)
    assert df.columns == ["id", "cat"]
    got = {r["id"]: r["cat"] for r in df.collect()}
    assert got == {1: "a", 2: "b", 3: "c", 100: "x", 200: "y"}


def test_mapped_stats_pruning_by_logical_name(spark, tmp_path):
    table = _mapped_table(tmp_path)
    snap = read_delta_snapshot(table)
    assert snap.column_mapping == {"id": PHYS["id"], "cat": PHYS["cat"]}
    # stats were physically keyed on disk; pruning speaks logical
    df = read_delta_table(spark, table, filters=[("id", ">=", 100)])
    assert sorted(r["id"] for r in df.collect()) == [100, 200]
    pruned = read_delta_snapshot(table)
    from ballista_spark.sources.deltalog import _prune_files

    assert _prune_files(pruned, [("id", ">=", 100)]).files_pruned == 1


def test_mapped_partitioned_hive_physical_dirs(spark, tmp_path):
    table = _mapped_table(tmp_path, with_part=True)
    df = read_delta_table(spark, table)
    assert sorted(df.columns) == ["cat", "id", "part"]
    got = {r["id"]: r["part"] for r in df.collect()}
    assert got == {1: "x", 2: "x", 100: "y", 200: "y"}
    # partition pruning by LOGICAL partition column
    assert read_delta_table(
        spark, table, filters=[("part", "=", "y")]
    ).count() == 2


def test_reader_v3_feature_gate(spark, tmp_path):
    ok = _mapped_table(
        tmp_path,
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["columnMapping"],
            "writerFeatures": ["columnMapping"],
        },
    )
    assert read_delta_table(spark, ok).count() == 5
    # deletionVectors is now a SUPPORTED reader feature (round 8):
    # columnMapping + deletionVectors tables read; unknown features
    # still refuse loudly
    both = _mapped_table(
        tmp_path / "dv",
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["columnMapping", "deletionVectors"],
        },
    )
    assert read_delta_table(spark, both).count() == 5
    with pytest.raises(DeltaProtocolError, match="readerFeatures"):
        bad = _mapped_table(
            tmp_path / "v2cp",
            protocol={
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["columnMapping", "v2Checkpoint"],
            },
        )
        read_delta_snapshot(bad)


def test_mapped_pyds_face_reads_logical(spark, tmp_path):
    """The ballista_delta DataSource face resolves physical parquet
    names through the mapping too (it reads files directly, bypassing
    _scan_snapshot)."""
    from ballista_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    table = _mapped_table(tmp_path)
    df = spark.read.format("ballista_delta").option("path", table).load()
    assert df.columns == ["id", "cat"]
    got = {r["id"]: r["cat"] for r in df.collect()}
    assert got == {1: "a", 2: "b", 3: "c", 100: "x", 200: "y"}


def test_mapped_writes_refused(spark, tmp_path):
    from ballista_spark.sources.deltalog import (
        alter_delta_table,
        compact_delta_table,
        delete_from_delta_table,
        merge_delta_table,
        write_delta_table,
    )

    table = _mapped_table(tmp_path)
    src = spark.createDataFrame([(1, "z")], "id long, cat string")
    for op, call in {
        "WRITE": lambda: write_delta_table(src, table),
        "MERGE": lambda: merge_delta_table(spark, table, src, on=["id"]),
        "DELETE": lambda: delete_from_delta_table(spark, table, [("id", "=", 1)]),
        "UPDATE": lambda: update_delta_table(spark, table, {"cat": "'z'"}),
        "ALTER": lambda: alter_delta_table(table, add_columns={"x": "long"}),
        "OPTIMIZE": lambda: compact_delta_table(spark, table),
    }.items():
        with pytest.raises(DeltaProtocolError, match="column-mapped"):
            call()


def _append_commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def test_mapped_change_feeds_read_real_values(spark, tmp_path):
    """read_delta_changes / read_delta_cdf on a column-mapped table must
    scan under PHYSICAL parquet names (review finding: ad-hoc snapshots
    dropped column_mapping → every data column came back NULL)."""
    from ballista_spark.sources.deltalog import (
        read_delta_cdf,
        read_delta_changes,
    )

    table = _mapped_table(tmp_path)
    a = _write_phys_file(table, "f3.parquet", [300], ["zz"])
    _append_commit(table, 1, [{"add": a}])

    inc = read_delta_changes(spark, table, from_version=0).collect()
    assert [(r["id"], r["cat"], r["_commit_version"]) for r in inc] == [
        (300, "zz", 1)
    ]

    cdf = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["cat"])
        for r in read_delta_cdf(spark, table, from_version=-1).collect()
    )
    assert cdf == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (0, "insert", 3, "c"),
        (0, "insert", 100, "x"),
        (0, "insert", 200, "y"),
        (1, "insert", 300, "zz"),
    ]
    # no silently-NULL data columns anywhere in the window
    assert all(r[3] is not None for r in cdf)


def test_mapped_changes_partition_values_remap_to_logical(spark, tmp_path):
    """Commit-JSON partitionValues are PHYSICALLY keyed on a mapped
    table; read_delta_changes must remap them before scanning."""
    from ballista_spark.sources.deltalog import read_delta_changes

    table = _mapped_table(tmp_path, with_part=True)
    rel = f"{PHYS['part']}=z/f_z.parquet"
    a = _write_phys_file(table, rel, [300], ["q"])
    a["partitionValues"] = {PHYS["part"]: "z"}
    _append_commit(table, 1, [{"add": a}])

    inc = read_delta_changes(spark, table, from_version=0).collect()
    assert [(r["id"], r["cat"], r["part"]) for r in inc] == [(300, "q", "z")]
