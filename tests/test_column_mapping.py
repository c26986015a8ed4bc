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


def test_mapped_mutations_stage_physical_names(spark, tmp_path):
    """Round 9: the full mutation matrix works on column-mapped tables
    — staged files carry PHYSICAL parquet column names, partition dirs
    and stats keys are physical, and every read keeps resolving
    logically (replaces the round-5..8 refusal pins)."""
    import glob as _glob

    from ballista_spark.sources.deltalog import (
        alter_delta_table,
        compact_delta_table,
        delete_from_delta_table,
        merge_delta_table,
        write_delta_table,
    )

    table = _mapped_table(tmp_path)

    # WRITE append: the new file's parquet schema is physically named
    before = set(_glob.glob(os.path.join(table, "*.parquet")))
    write_delta_table(
        spark.createDataFrame([(7, "z")], "id long, cat string"), table
    )
    (new_file,) = set(_glob.glob(os.path.join(table, "*.parquet"))) - before
    assert set(pq.read_schema(new_file).names) == {PHYS["id"], PHYS["cat"]}
    got = {r["id"]: r["cat"] for r in read_delta_table(spark, table).collect()}
    assert got[7] == "z" and len(got) == 6

    # stats on the appended file are physically keyed and still prune
    snap = read_delta_snapshot(table)
    appended = [f for f in snap.files if f.path == os.path.basename(new_file)]
    assert appended and appended[0].stats["minValues"]["id"] == 7

    # UPDATE / DELETE / MERGE through the same rewrite machinery
    update_delta_table(spark, table, {"cat": "'upd'"}, [("id", "=", 2)])
    delete_from_delta_table(spark, table, [("id", "=", 100)])
    merge_delta_table(
        spark,
        table,
        spark.createDataFrame([(3, "m3"), (999, "new")], "id long, cat string"),
        on=["id"],
    )
    got = {r["id"]: r["cat"] for r in read_delta_table(spark, table).collect()}
    assert got == {
        1: "a", 2: "upd", 3: "m3", 200: "y", 7: "z", 999: "new"
    }

    # OPTIMIZE rewrites physically too and stays logically identical
    compact_delta_table(spark, table, target_file_bytes=1 << 30)
    got2 = {r["id"]: r["cat"] for r in read_delta_table(spark, table).collect()}
    assert got2 == got
    for f in read_delta_snapshot(table).files:
        names = set(
            pq.read_schema(os.path.join(table, f.path)).names
        )
        assert names == {PHYS["id"], PHYS["cat"]}

    # ALTER add assigns a fresh id + col-<uuid> physical name
    alter_delta_table(table, add_columns={"score": "double"})
    snap = read_delta_snapshot(table)
    fld = {f.name: f for f in snap.schema.fields}["score"]
    assert fld.metadata["delta.columnMapping.id"] == 3
    assert fld.metadata["delta.columnMapping.physicalName"].startswith("col-")
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "3"
    rows = read_delta_table(spark, table).collect()
    assert all(r["score"] is None for r in rows)  # old files: NULL

    # mapped DROP then RE-ADD is safe (fresh physical name, no
    # resurrection) — the unmapped path retires the name instead
    alter_delta_table(table, drop_columns=["score"])
    alter_delta_table(table, add_columns={"score": "long"})
    assert all(
        r["score"] is None for r in read_delta_table(spark, table).collect()
    )


def test_mapped_partitioned_mutation_physical_dirs(spark, tmp_path):
    """Rewrites of a PARTITIONED mapped table keep physical dir names
    and physically-keyed partitionValues."""
    from ballista_spark.sources.deltalog import update_delta_table as upd

    table = _mapped_table(tmp_path, with_part=True)
    upd(spark, table, {"cat": "'X'"}, [("part", "=", "x")])
    got = sorted(
        (r["id"], r["cat"], r["part"])
        for r in read_delta_table(spark, table).collect()
    )
    assert got == [
        (1, "X", "x"), (2, "X", "x"), (100, "a", "y"), (200, "a", "y")
    ]
    snap = read_delta_snapshot(table)
    for f in snap.files:
        # hive dirs under the PHYSICAL partition column name
        assert f.path.startswith(f"{PHYS['part']}=")
        # partition values were normalized back to logical on read
        assert set(f.partition_values) == {"part"}


def test_rename_column_mapped_metadata_only(spark, tmp_path):
    """RENAME COLUMN on an already-mapped table: one metadata commit,
    zero data I/O, time travel sees the old name."""
    import glob as _glob

    from ballista_spark.sources.deltalog import rename_delta_column

    table = _mapped_table(tmp_path)
    files_before = sorted(_glob.glob(os.path.join(table, "*.parquet")))
    v = rename_delta_column(table, "cat", "category")
    assert v == 1
    assert sorted(_glob.glob(os.path.join(table, "*.parquet"))) == files_before
    df = read_delta_table(spark, table)
    assert df.columns == ["id", "category"]
    assert {r["id"]: r["category"] for r in df.collect()} == {
        1: "a", 2: "b", 3: "c", 100: "x", 200: "y"
    }
    # time travel replays the pre-rename metaData
    old = read_delta_table(spark, table, version=0)
    assert old.columns == ["id", "cat"]
    with pytest.raises(ValueError, match="does not exist"):
        rename_delta_column(table, "cat", "nope")
    with pytest.raises(ValueError, match="already exists"):
        rename_delta_column(table, "id", "category")


def test_rename_column_auto_enables_mapping(spark, tmp_path):
    """RENAME on an UNMAPPED table auto-enables column mapping first
    (existing columns keep their names as physical names, so every old
    file still resolves), then renames logically; mutations keep
    working afterwards."""
    import glob as _glob

    from ballista_spark.sources.deltalog import (
        delete_from_delta_table,
        rename_delta_column,
        write_delta_table,
    )

    table = str(tmp_path / "plain")
    write_delta_table(
        spark.createDataFrame(
            [(i, f"c{i}") for i in range(6)], "id long, cat string"
        ),
        table,
    )
    files_before = sorted(_glob.glob(os.path.join(table, "*.parquet")))
    rename_delta_column(table, "cat", "label")
    assert sorted(_glob.glob(os.path.join(table, "*.parquet"))) == files_before
    snap = read_delta_snapshot(table)
    assert snap.configuration["delta.columnMapping.mode"] == "name"
    assert snap.column_mapping == {"id": "id", "label": "cat"}
    assert int(snap.protocol["minReaderVersion"]) >= 2
    assert int(snap.protocol["minWriterVersion"]) >= 5
    df = read_delta_table(spark, table)
    assert df.columns == ["id", "label"]
    assert {r["id"]: r["label"] for r in df.collect()} == {
        i: f"c{i}" for i in range(6)
    }
    # post-rename mutations stage under the OLD physical name
    write_delta_table(
        spark.createDataFrame([(10, "new")], "id long, label string"), table
    )
    delete_from_delta_table(spark, table, [("id", "=", 0)])
    got = {r["id"]: r["label"] for r in read_delta_table(spark, table).collect()}
    assert got == {1: "c1", 2: "c2", 3: "c3", 4: "c4", 5: "c5", 10: "new"}
    newest = [
        f for f in read_delta_snapshot(table).files
        if "part-" in f.path and f.stats and f.stats["minValues"].get("id") == 10
    ]
    assert newest, "appended file missing"
    phys = set(
        pq.read_schema(os.path.join(table, newest[0].path)).names
    )
    assert phys == {"id", "cat"}  # the PHYSICAL name, not 'label'


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


def test_checkpoint_and_dv_adds_stay_physical_on_mapped_tables(spark, tmp_path):
    """Review finding (round 9): re-emitting snapshot state verbatim
    wrote LOGICAL-keyed stats/partitionValues into checkpoints and
    DV-DELETE re-adds on mapped tables — after RENAME + re-ADD of the
    old name, the physical->logical remap then mis-attributes bounds
    between columns and pruning can skip live rows.  Both sites must
    invert the mapping back to PHYSICAL keys."""
    from ballista_spark.sources.deltalog import (
        _write_checkpoint,
        alter_delta_table,
        delete_from_delta_table,
        rename_delta_column,
        write_delta_table,
    )

    table = str(tmp_path / "t")
    write_delta_table(
        spark.createDataFrame(
            [(i, i * 10) for i in range(8)], "a long, b long"
        ),
        table,
    )
    rename_delta_column(table, "a", "renamed")  # logical renamed, physical a
    alter_delta_table(table, add_columns={"a": "long"})  # fresh col-<uuid>
    write_delta_table(
        spark.createDataFrame(
            [(100, 1000, 77), (101, 1010, 78)],
            "renamed long, b long, a long",
        ).coalesce(1),
        table,
    )
    snap = read_delta_snapshot(table)
    phys_of = snap.column_mapping  # {'renamed': 'a', 'b': 'b', 'a': 'col-..'}
    assert phys_of["renamed"] == "a" and phys_of["a"].startswith("col-")

    # DV DELETE re-adds the touched file: its commit stats must be
    # PHYSICALLY keyed
    delete_from_delta_table(
        spark, table, [("renamed", "=", 100)], use_deletion_vectors=True
    )
    ver = read_delta_snapshot(table).version
    commit = os.path.join(table, "_delta_log", f"{ver:020d}.json")
    dv_adds = [
        json.loads(line)["add"]
        for line in open(commit)
        if '"add"' in line
    ]
    assert dv_adds
    for a in dv_adds:
        keys = set(json.loads(a["stats"])["minValues"])
        assert "renamed" not in keys  # logical name must NOT leak
        assert keys <= set(phys_of.values())

    # checkpoint: same contract
    _write_checkpoint(table, ver)
    import glob as _glob

    ckpt = _glob.glob(
        os.path.join(table, "_delta_log", "*.checkpoint.parquet")
    )[0]
    tbl = pq.read_table(ckpt)
    for stats in tbl.column("add").combine_chunks().field("stats").to_pylist():
        if stats:
            keys = set(json.loads(stats).get("minValues") or {})
            assert "renamed" not in keys
            assert keys <= set(phys_of.values())

    # and the table still reads correctly (snapshot now starts at the
    # checkpoint): no swapped/mis-attributed columns
    got = {
        r["renamed"]: (r["b"], r["a"])
        for r in read_delta_table(spark, table).collect()
    }
    expect = {i: (i * 10, None) for i in range(8)}
    expect[101] = (1010, 78)  # the DV survivor of the post-rename file
    assert got == expect
    # stats pruning on the RENAMED column still proves correctly
    assert (
        read_delta_table(
            spark, table, filters=[("renamed", "=", 3)]
        ).where("renamed = 3").count() == 1
    )


def test_metadata_commits_keep_stable_table_id(spark, tmp_path):
    """metaData.id is the table's STABLE identity per the Delta
    protocol — SET TBLPROPERTIES / ALTER / RENAME / overwrite /
    checkpoint must re-emit it unchanged; external readers (delta-spark
    streaming sources) treat an id change as table replacement and
    abort (round-9 advice)."""
    import glob as _glob

    from ballista_spark.sources.deltalog import (
        _write_checkpoint,
        alter_delta_table,
        enable_column_mapping,
        rename_delta_column,
        set_delta_table_properties,
        write_delta_table,
    )

    table = str(tmp_path / "stableid")

    def _meta_ids():
        ids = []
        for p in sorted(
            _glob.glob(os.path.join(table, "_delta_log", "*.json"))
        ):
            for line in open(p):
                a = json.loads(line)
                if "metaData" in a:
                    ids.append(a["metaData"]["id"])
        return ids

    write_delta_table(
        spark.createDataFrame(
            [(i, f"c{i}") for i in range(4)], "id long, cat string"
        ),
        table,
    )
    created = _meta_ids()
    assert len(created) == 1 and created[0]

    set_delta_table_properties(table, {"foo.bar": "1"})
    enable_column_mapping(table)
    alter_delta_table(table, add_columns={"extra": "int"})
    rename_delta_column(table, "cat", "label")
    # overwrite with a schema change on an UNMAPPED twin keeps id too
    assert set(_meta_ids()) == {created[0]}

    _write_checkpoint(table, read_delta_snapshot(table).version)
    assert read_delta_snapshot(table).table_id == created[0]

    table2 = str(tmp_path / "stableid2")
    write_delta_table(
        spark.createDataFrame([(1, "a")], "id long, cat string"), table2
    )
    id2 = read_delta_snapshot(table2).table_id
    assert id2 and id2 != created[0]  # fresh uuid only at creation
    write_delta_table(
        spark.createDataFrame([(1.5,)], "x double"), table2, mode="overwrite"
    )
    assert read_delta_snapshot(table2).table_id == id2
