"""Iceberg reader: spec-shaped fixtures (metadata JSON + Avro manifest
list + Avro manifests + parquet data files, all field names and
encodings from the public Iceberg table spec) built with the engine's
own Avro codec, then read back through read_iceberg_table.

No iceberg library exists in this environment to cross-check against,
so fidelity rests on (a) the fixture following the spec's field names,
file layout and Appendix-D single-value bound encodings exactly, and
(b) byte-level pins for the bound codec below.
"""

from __future__ import annotations

import json
import os
import struct
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ballista_spark.sources.avroio import write_avro_bytes
from ballista_spark.sources.iceberg import (
    IcebergFeatureError,
    decode_bound,
    read_iceberg_snapshot,
    read_iceberg_table,
)

_KV = {
    "type": "record",
    "name": "k126_v127",
    "fields": [
        {"name": "key", "type": "int"},
        {"name": "value", "type": "bytes"},
    ],
}
_DATA_FILE = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "content", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
        {"name": "lower_bounds", "type": ["null", {"type": "array", "items": _KV}]},
        {
            "name": "upper_bounds",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {**_KV, "name": "k128_v129"},
                },
            ],
        },
    ],
}
MANIFEST_ENTRY = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": _DATA_FILE},
    ],
}
MANIFEST_FILE = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

SCHEMA_JSON = {
    "schema-id": 0,
    "type": "struct",
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "cat", "required": False, "type": "string"},
        {"id": 3, "name": "v", "required": False, "type": "double"},
    ],
}


def _bound_long(x):
    return struct.pack("<q", x)


def _bound_double(x):
    return struct.pack("<d", x)


def _write_data_file(table, name, rows):
    """rows: list[(id, cat, v)] → parquet file + manifest entry dict."""
    path = os.path.join(table, "data", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "cat": pa.array([r[1] for r in rows], pa.string()),
            "v": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, path)
    ids = [r[0] for r in rows]
    vs = [r[2] for r in rows]
    return {
        "status": 1,
        "snapshot_id": None,
        "data_file": {
            "content": 0,
            "file_path": os.path.relpath(path, table),
            "file_format": "PARQUET",
            "record_count": len(rows),
            "file_size_in_bytes": os.path.getsize(path),
            "lower_bounds": [
                {"key": 1, "value": _bound_long(min(ids))},
                {"key": 3, "value": _bound_double(min(vs))},
            ],
            "upper_bounds": [
                {"key": 1, "value": _bound_long(max(ids))},
                {"key": 3, "value": _bound_double(max(vs))},
            ],
        },
    }


def _commit_snapshot(
    table, snapshot_id, entries, version, prev_snapshots=(), entry_schema=None
):
    meta_dir = os.path.join(table, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    manifest_rel = f"metadata/manifest-{snapshot_id}.avro"
    with open(os.path.join(table, manifest_rel), "wb") as f:
        f.write(write_avro_bytes(entries, entry_schema or MANIFEST_ENTRY))
    mlist_rel = f"metadata/snap-{snapshot_id}.avro"
    with open(os.path.join(table, mlist_rel), "wb") as f:
        f.write(
            write_avro_bytes(
                [
                    {
                        "manifest_path": manifest_rel,
                        "manifest_length": os.path.getsize(
                            os.path.join(table, manifest_rel)
                        ),
                        "partition_spec_id": 0,
                        "added_snapshot_id": snapshot_id,
                    }
                ],
                MANIFEST_FILE,
            )
        )
    snapshots = list(prev_snapshots) + [
        {"snapshot-id": snapshot_id, "manifest-list": mlist_rel}
    ]
    md = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": table,
        "schemas": [SCHEMA_JSON],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "snapshots": snapshots,
        "current-snapshot-id": snapshot_id,
    }
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as f:
        json.dump(md, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))
    return snapshots


def _fixture_table(tmp_path):
    table = str(tmp_path / "ice")
    e1 = _write_data_file(table, "f1.parquet",
                          [(i, "a", float(i)) for i in range(10)])
    e2 = _write_data_file(table, "f2.parquet",
                          [(100 + i, "b", float(100 + i)) for i in range(10)])
    snaps = _commit_snapshot(table, 1001, [e1, e2], version=1)
    e3 = _write_data_file(table, "f3.parquet",
                          [(200 + i, "c", float(200 + i)) for i in range(5)])
    _commit_snapshot(table, 1002, [e1, e2, e3], version=2,
                     prev_snapshots=snaps)
    return table


def test_bound_codec_spec_pins():
    """Appendix D single-value serialization: little-endian fixed
    widths, UTF-8 strings — hand-computed bytes."""
    assert decode_bound(b"\x07\x00\x00\x00", "int") == 7
    assert decode_bound(b"\xff\xff\xff\xff", "int") == -1
    assert decode_bound(struct.pack("<q", 2**40), "long") == 2**40
    assert decode_bound(struct.pack("<d", -0.5), "double") == -0.5
    assert decode_bound("héllo".encode(), "string") == "héllo"
    assert decode_bound(b"\x01", "boolean") is True
    assert decode_bound(b"\xaa\xbb", "binary") is None  # no trusted order
    assert decode_bound(b"\x00", "long") is None  # wrong width: no prune


def test_read_current_and_named_snapshot(spark, tmp_path):
    table = _fixture_table(tmp_path)
    cur = read_iceberg_table(spark, table)
    assert cur.count() == 25
    assert dict(cur.dtypes) == {"id": "bigint", "cat": "string", "v": "double"}
    old = read_iceberg_table(spark, table, snapshot_id=1001)
    assert old.count() == 20
    assert old.where("cat = 'c'").count() == 0


def test_bounds_file_skipping(spark, tmp_path):
    table = _fixture_table(tmp_path)
    snap = read_iceberg_snapshot(table)
    assert snap.num_files == 3
    out = read_iceberg_table(spark, table, filters=[("id", ">=", 200)])
    assert out.count() == 5
    # prune accounting: only f3 survives
    snap2 = read_iceberg_snapshot(table)
    from ballista_spark.sources.iceberg import _bounds_may_match

    kept = [
        f for f in snap2.files
        if _bounds_may_match(f[2], "id", ">=", 200)
    ]
    assert len(kept) == 1
    # equality inside a hole between files: every file provably excluded
    assert (
        read_iceberg_table(spark, table, filters=[("id", "=", 50)]).count()
        == 0
    )
    # proof-based: unknown column never prunes
    assert (
        read_iceberg_table(spark, table, filters=[("nosuch", "=", 1)]).count()
        == 25
    )


def test_single_scan_plan_with_pushdown(spark, tmp_path):
    table = _fixture_table(tmp_path)
    out = read_iceberg_table(spark, table).where("id > 5").select("id", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "PushedFilters: [" in plan and "GreaterThan(id,5)" in plan


def _write_pos_delete_file(table, name, tombstones):
    """tombstones: list[(data_file_abs_path, pos)] → spec position-delete
    parquet (columns file_path, pos) + its manifest entry (content=1)."""
    path = os.path.join(table, "data", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pa.table(
        {
            "file_path": pa.array([p for p, _ in tombstones], pa.string()),
            "pos": pa.array([p for _, p in tombstones], pa.int64()),
        }
    )
    pq.write_table(t, path)
    return {
        "status": 1,
        "snapshot_id": None,
        "data_file": {
            "content": 1,  # POSITION_DELETES
            "file_path": os.path.relpath(path, table),
            "file_format": "PARQUET",
            "record_count": len(tombstones),
            "file_size_in_bytes": os.path.getsize(path),
            "lower_bounds": None,
            "upper_bounds": None,
        },
    }


def _fixture_entries(table):
    """The three data entries of _fixture_table, re-derived (same rows
    → identical files) so a new snapshot's manifest can carry them."""
    e1 = _write_data_file(
        table, "f1.parquet", [(i, "a", float(i)) for i in range(10)]
    )
    e2 = _write_data_file(
        table, "f2.parquet", [(100 + i, "b", float(100 + i)) for i in range(10)]
    )
    e3 = _write_data_file(
        table, "f3.parquet", [(200 + i, "c", float(200 + i)) for i in range(5)]
    )
    return [e1, e2, e3]


def test_positional_deletes_applied_exactly(spark, tmp_path):
    """v2 merge-on-read POSITION deletes: the (file, pos) tombstones
    drop exactly those rows via the _metadata anti-join; every other
    row — including same-valued rows at other positions — survives."""
    table = _fixture_table(tmp_path)
    snap0 = read_iceberg_snapshot(table)
    f1 = next(p for p, _n, _b in snap0.files if p.endswith("f1.parquet"))
    before = {
        tuple(r) for r in read_iceberg_table(spark, table).collect()
    }
    rows_f1 = [tuple(r) for r in spark.read.parquet(f1).collect()]
    e = _write_pos_delete_file(table, "d1.parquet", [(f1, 0), (f1, 2)])
    _commit_snapshot(table, 1003, _fixture_entries(table) + [e], version=3)
    snap = read_iceberg_snapshot(table)
    assert len(snap.delete_files) == 1
    got = {tuple(r) for r in read_iceberg_table(spark, table).collect()}
    assert got == before - {rows_f1[0], rows_f1[2]}
    # bound-based file skipping still composes with MOR reads
    lo = min(r[0] for r in got)
    assert read_iceberg_table(
        spark, table, filters=[("id", "=", lo)]
    ).where(f"id = {lo}").count() == sum(1 for r in got if r[0] == lo)


def test_positional_delete_file_uri_normalization(spark, tmp_path):
    """Delete files written with file:// URIs still match _metadata
    paths (both sides normalize to scheme-less absolute form)."""
    table = _fixture_table(tmp_path)
    snap0 = read_iceberg_snapshot(table)
    f1 = next(p for p, _n, _b in snap0.files if p.endswith("f1.parquet"))
    n_before = read_iceberg_table(spark, table).count()
    e = _write_pos_delete_file(table, "d2.parquet", [(f"file://{f1}", 1)])
    _commit_snapshot(table, 1004, _fixture_entries(table) + [e], version=3)
    assert read_iceberg_table(spark, table).count() == n_before - 1


def test_equality_delete_without_ids_raises(spark, tmp_path):
    """An equality-delete entry naming no equality_ids is malformed —
    loud refusal, not silent over-deletion."""
    table = _fixture_table(tmp_path)
    e = _write_data_file(table, "f4.parquet", [(900, "d", 9.0)])
    e["data_file"]["content"] = 2  # EQUALITY_DELETES
    _commit_snapshot(table, 1003, [e], version=3)
    with pytest.raises(IcebergFeatureError, match="equality_ids"):
        read_iceberg_snapshot(table)


# -- v2 EQUALITY deletes (sequence-scoped) ----------------------------------

_SEQ_DATA_FILE = {
    **_DATA_FILE,
    "name": "r2seq",
    "fields": _DATA_FILE["fields"]
    + [
        {
            "name": "equality_ids",
            "type": ["null", {"type": "array", "items": "int"}],
        }
    ],
}
SEQ_MANIFEST_ENTRY = {
    "type": "record",
    "name": "manifest_entry_seq",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": _SEQ_DATA_FILE},
    ],
}


def _seq_entry(entry, seq, equality_ids=None):
    """Wrap a plain fixture entry into the sequence-numbered v2 shape."""
    return {
        "status": entry["status"],
        "snapshot_id": entry.get("snapshot_id"),
        "sequence_number": seq,
        "data_file": {**entry["data_file"], "equality_ids": equality_ids},
    }


def _write_eq_delete_file(table, name, cols: dict, equality_ids, seq):
    """cols: {colname: [values]} → spec equality-delete parquet + its
    sequence-numbered manifest entry (content=2)."""
    path = os.path.join(table, "data", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    typ = {"id": pa.int64(), "cat": pa.string(), "v": pa.float64()}
    t = pa.table({c: pa.array(v, typ[c]) for c, v in cols.items()})
    pq.write_table(t, path)
    n = len(next(iter(cols.values())))
    return _seq_entry(
        {
            "status": 1,
            "snapshot_id": None,
            "data_file": {
                "content": 2,
                "file_path": os.path.relpath(path, table),
                "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(path),
                "lower_bounds": None,
                "upper_bounds": None,
            },
        },
        seq,
        equality_ids=equality_ids,
    )


def _commit_seq_snapshot(table, snapshot_id, entries, version):
    """Like _commit_snapshot but with the sequence-numbered entry
    schema (format-version 2 with real data sequence numbers)."""
    return _commit_snapshot(
        table, snapshot_id, entries, version, entry_schema=SEQ_MANIFEST_ENTRY
    )


def test_equality_deletes_applied_with_sequence_scoping(spark, tmp_path):
    """The spec contract end-to-end: an equality delete at sequence s
    kills matching rows only in data files with sequence < s — a later
    re-insert of the same key SURVIVES."""
    table = str(tmp_path / "ice")
    e1 = _write_data_file(table, "f1.parquet", [(i, "a", float(i)) for i in range(5)])
    # delete ids 0 and 3 at sequence 2 (data was written at sequence 1)
    d = _write_eq_delete_file(
        table, "eq1.parquet", {"id": [0, 3]}, equality_ids=[1], seq=2
    )
    # re-insert id 0 at sequence 3 — AFTER the delete: must survive
    e2 = _write_data_file(table, "f2.parquet", [(0, "reborn", 99.0)])
    _commit_seq_snapshot(
        table,
        2001,
        [_seq_entry(e1, 1, None), d, _seq_entry(e2, 3, None)],
        version=1,
    )
    snap = read_iceberg_snapshot(table)
    assert snap.eq_deletes == [
        (os.path.join(table, "data/eq1.parquet"), 2, ("id",))
    ]
    got = sorted(map(tuple, read_iceberg_table(spark, table).collect()))
    assert got == [
        (0, "reborn", 99.0),  # re-insert survives (seq 3 > delete seq 2)
        (1, "a", 1.0),
        (2, "a", 2.0),
        (4, "a", 4.0),
    ]


def test_equality_deletes_multicol_and_null_safe(spark, tmp_path):
    """Multi-column equality_ids match with NULL-safe compares: a
    delete row with cat=NULL kills exactly the NULL-cat data row."""
    table = str(tmp_path / "ice")
    e1 = _write_data_file(table, "f1.parquet", [(1, "a", 1.0), (2, "a", 2.0)])
    # write a NULL-cat row manually (the helper's bounds math needs non-null)
    path = os.path.join(table, "data", "f2.parquet")
    t = pa.table(
        {
            "id": pa.array([3, 1], pa.int64()),
            "cat": pa.array([None, "b"], pa.string()),
            "v": pa.array([3.0, 9.0], pa.float64()),
        }
    )
    pq.write_table(t, path)
    e2 = {
        "status": 1,
        "snapshot_id": None,
        "data_file": {
            "content": 0,
            "file_path": "data/f2.parquet",
            "file_format": "PARQUET",
            "record_count": 2,
            "file_size_in_bytes": os.path.getsize(path),
            "lower_bounds": None,
            "upper_bounds": None,
        },
    }
    d = _write_eq_delete_file(
        table,
        "eq1.parquet",
        {"id": [3, 1], "cat": [None, "a"]},
        equality_ids=[1, 2],
        seq=5,
    )
    _commit_seq_snapshot(
        table, 2002, [_seq_entry(e1, 1, None), _seq_entry(e2, 2, None), d],
        version=1,
    )
    got = sorted(
        map(tuple, read_iceberg_table(spark, table).collect())
    )
    # (1,'a') killed; (3,NULL) killed null-safely; (2,'a') and (1,'b') live
    assert got == [(1, "b", 9.0), (2, "a", 2.0)]


def test_equality_deletes_compose_with_positional_and_compact(spark, tmp_path):
    """Equality + positional tombstones in one snapshot apply together,
    and compaction materializes them away (plain table afterwards)."""
    table = str(tmp_path / "ice")
    e1 = _write_data_file(table, "f1.parquet", [(i, "a", float(i)) for i in range(6)])
    f1_abs = os.path.join(table, "data", "f1.parquet")
    pos = _write_pos_delete_file(table, "pos1.parquet", [(f1_abs, 5)])
    eq = _write_eq_delete_file(
        table, "eq1.parquet", {"id": [0]}, equality_ids=[1], seq=2
    )
    _commit_seq_snapshot(
        table,
        2003,
        [_seq_entry(e1, 1, None), _seq_entry(pos, 2, None), eq],
        version=1,
    )
    got = sorted(r["id"] for r in read_iceberg_table(spark, table).collect())
    assert got == [1, 2, 3, 4]  # id 0 (equality) and id 5 (position) gone
    from ballista_spark.sources.iceberg import compact_iceberg_table

    assert compact_iceberg_table(spark, table) is not None
    snap = read_iceberg_snapshot(table)
    assert snap.delete_files == [] and snap.eq_deletes == []
    got2 = sorted(r["id"] for r in read_iceberg_table(spark, table).collect())
    assert got2 == got


def test_equality_deletes_apply_on_relative_table_path(spark, tmp_path):
    """A RELATIVE table_path must not silently disable equality deletes
    (review finding: the sequence join keys stayed relative while
    _metadata paths are absolute, so the join missed and deleted rows
    resurfaced)."""
    import os as _os

    table = str(tmp_path / "ice")
    e1 = _write_data_file(table, "f1.parquet", [(1, "a", 1.0), (2, "a", 2.0)])
    d = _write_eq_delete_file(
        table, "eq1.parquet", {"id": [1]}, equality_ids=[1], seq=2
    )
    _commit_seq_snapshot(table, 2005, [_seq_entry(e1, 1, None), d], version=1)
    rel = _os.path.relpath(table)
    assert not _os.path.isabs(rel)
    got = sorted(r["id"] for r in read_iceberg_table(spark, rel).collect())
    assert got == [2]


def test_equality_delete_on_dropped_field_refuses(spark, tmp_path):
    table = str(tmp_path / "ice")
    e1 = _write_data_file(table, "f1.parquet", [(1, "a", 1.0)])
    d = _write_eq_delete_file(
        table, "eq1.parquet", {"id": [1]}, equality_ids=[99], seq=2
    )
    _commit_seq_snapshot(table, 2004, [_seq_entry(e1, 1, None), d], version=1)
    with pytest.raises(IcebergFeatureError, match="field ids \\[99\\]"):
        read_iceberg_snapshot(table)


def test_pyds_face_refuses_mor_tables(spark, tmp_path):
    """The per-file DataSource face cannot apply tombstones — it must
    refuse rather than return deleted rows."""
    from ballista_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    table = _fixture_table(tmp_path)
    snap0 = read_iceberg_snapshot(table)
    f1 = next(p for p, _n, _b in snap0.files if p.endswith("f1.parquet"))
    e = _write_pos_delete_file(table, "d1.parquet", [(f1, 0)])
    _commit_snapshot(table, 1003, _fixture_entries(table) + [e], version=3)
    src = spark.read.format("ballista_iceberg").option("path", table).load()
    with pytest.raises(Exception, match="delete"):
        src.count()


def test_future_format_version_raises(tmp_path):
    """v3 READS are supported since round 9 (deletion vectors); the
    refusal line moved to format-version 4."""
    table = str(tmp_path / "ice")
    meta = os.path.join(table, "metadata")
    os.makedirs(meta)
    with open(os.path.join(meta, "v1.metadata.json"), "w") as f:
        json.dump({"format-version": 4, "schemas": []}, f)
    with open(os.path.join(meta, "version-hint.text"), "w") as f:
        f.write("1")
    with pytest.raises(IcebergFeatureError, match="format-version"):
        read_iceberg_snapshot(table)


def test_v1_inline_manifests(spark, tmp_path):
    """Format v1: `schema` singular + snapshot `manifests` array, no
    manifest list."""
    table = str(tmp_path / "ice1")
    e = _write_data_file(table, "f1.parquet", [(1, "a", 1.0), (2, "b", 2.0)])
    manifest_rel = "metadata/manifest-1.avro"
    os.makedirs(os.path.join(table, "metadata"), exist_ok=True)
    with open(os.path.join(table, manifest_rel), "wb") as f:
        f.write(write_avro_bytes([e], MANIFEST_ENTRY))
    md = {
        "format-version": 1,
        "location": table,
        "schema": SCHEMA_JSON,
        "partition-spec": [],
        "snapshots": [{"snapshot-id": 7, "manifests": [manifest_rel]}],
        "current-snapshot-id": 7,
    }
    with open(os.path.join(table, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(md, f)
    out = read_iceberg_table(spark, table)
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_rename_refuses_on_equality_deletes(spark, tmp_path):
    """Round-10 review finding: rename on a table with equality-delete
    files (readable here when written by foreign engines) would WEDGE
    it — every post-rename read refuses (name-bound delete files),
    including the compaction that could repair it.  Rename must refuse
    first, pointing at compaction."""
    from ballista_spark.sources.iceberg import rename_iceberg_column

    table = str(tmp_path / "ice")
    e1 = _write_data_file(
        table, "f1.parquet", [(i, "a", float(i)) for i in range(5)]
    )
    d = _write_eq_delete_file(
        table, "eq1.parquet", {"id": [0]}, equality_ids=[1], seq=2
    )
    _commit_seq_snapshot(
        table, 2001, [_seq_entry(e1, 1, None), d], version=1
    )
    with pytest.raises(IcebergFeatureError, match="equality-delete"):
        rename_iceberg_column(table, "cat", "label", spark=spark)
