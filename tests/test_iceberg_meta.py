"""Round-10 Iceberg metadata-plane behavior: lazy per-entry bounds
decode (a filter-less read pays zero decode_bound calls), whole-manifest
pruning from manifest-list partition summaries, and the compact
scan-row cache agreeing with the full-entry decode.

Fixtures are spec-shaped (field names/encodings from the public Iceberg
table spec) built with the engine's own Avro codec, like
``test_iceberg.py``.
"""

from __future__ import annotations

import json
import os
import struct
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ballista_spark.sources import iceberg
from ballista_spark.sources.avroio import write_avro_bytes
from ballista_spark.sources.iceberg import (
    _bounds_may_match,
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
                {"type": "array", "items": {**_KV, "name": "k128_v129"}},
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
_FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean"},
        {"name": "lower_bound", "type": ["null", "bytes"]},
        {"name": "upper_bound", "type": ["null", "bytes"]},
    ],
}
MANIFEST_FILE = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
        {
            "name": "partitions",
            "type": ["null", {"type": "array", "items": _FIELD_SUMMARY}],
        },
    ],
}

SCHEMA_JSON = {
    "schema-id": 0,
    "type": "struct",
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"},
    ],
}


def _lb(x):
    return struct.pack("<q", x)


def _data_entry(table, name, ids):
    path = os.path.join(table, "data", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "v": pa.array([float(i) for i in ids], pa.float64()),
            }
        ),
        path,
    )
    return {
        "status": 1,
        "snapshot_id": None,
        "data_file": {
            "content": 0,
            "file_path": os.path.relpath(path, table),
            "file_format": "PARQUET",
            "record_count": len(ids),
            "file_size_in_bytes": os.path.getsize(path),
            "lower_bounds": [{"key": 1, "value": _lb(min(ids))}],
            "upper_bounds": [{"key": 1, "value": _lb(max(ids))}],
        },
    }


def _summarized_table(tmp_path, *, identity=True):
    """Two DATA manifests under one manifest list, each carrying an
    identity-partition field summary over ``id``: manifest A covers
    ids 0..99, manifest B covers 1000..1099."""
    table = str(tmp_path / "icepart")
    meta_dir = os.path.join(table, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    mrecs = []
    for tag, lo_ids, hi_ids in (
        ("a", list(range(0, 50)), list(range(50, 100))),
        ("b", list(range(1000, 1050)), list(range(1050, 1100))),
    ):
        entries = [
            _data_entry(table, f"f{tag}1.parquet", lo_ids),
            _data_entry(table, f"f{tag}2.parquet", hi_ids),
        ]
        man_rel = f"metadata/manifest-{tag}.avro"
        with open(os.path.join(table, man_rel), "wb") as f:
            f.write(write_avro_bytes(entries, MANIFEST_ENTRY))
        mrecs.append(
            {
                "manifest_path": man_rel,
                "manifest_length": os.path.getsize(
                    os.path.join(table, man_rel)
                ),
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": 7001,
                "partitions": [
                    {
                        "contains_null": False,
                        "lower_bound": _lb(min(lo_ids)),
                        "upper_bound": _lb(max(hi_ids)),
                    }
                ],
            }
        )
    mlist_rel = "metadata/snap-7001.avro"
    with open(os.path.join(table, mlist_rel), "wb") as f:
        f.write(write_avro_bytes(mrecs, MANIFEST_FILE))
    md = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": table,
        "schemas": [SCHEMA_JSON],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": 1,
                        "field-id": 1000,
                        "transform": "identity" if identity else "bucket[4]",
                        "name": "id_part",
                    }
                ],
            }
        ],
        "default-spec-id": 0,
        "snapshots": [{"snapshot-id": 7001, "manifest-list": mlist_rel}],
        "current-snapshot-id": 7001,
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(md, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    return table


def test_manifest_summary_prunes_whole_manifests(spark, tmp_path):
    table = _summarized_table(tmp_path)
    # filter provably inside manifest A's range only → B pruned
    snap = read_iceberg_snapshot(table, filters=[("id", "<", 100)])
    assert snap.manifests_pruned == 1
    assert snap.num_files == 2  # manifest A's two files
    # and the DataFrame result is still exactly right
    got = sorted(
        r["id"]
        for r in read_iceberg_table(
            spark, table, filters=[("id", "<", 100)]
        ).where("id < 100").collect()
    )
    assert got == list(range(100))
    # a filter spanning both ranges keeps both manifests
    snap2 = read_iceberg_snapshot(table, filters=[("id", ">=", 50)])
    assert snap2.manifests_pruned == 0
    assert snap2.num_files == 4
    # no filters → no manifest pruning at all
    assert read_iceberg_snapshot(table).manifests_pruned == 0


def test_manifest_summary_nonidentity_never_prunes(spark, tmp_path):
    """A non-identity transform's summary bounds are TRANSFORMED
    values — pruning on them against source-column filters would be
    wrong, so the manifest is kept."""
    table = _summarized_table(tmp_path, identity=False)
    snap = read_iceberg_snapshot(table, filters=[("id", "<", 100)])
    assert snap.manifests_pruned == 0
    assert snap.num_files == 4


def test_filterless_read_decodes_zero_bounds(tmp_path, monkeypatch):
    """The lazy-bounds contract itself: snapshot resolution without
    filters never calls decode_bound; a single-column predicate
    decodes only that column (round-10 ask #1)."""
    table = _summarized_table(tmp_path)
    calls = []
    real = iceberg.decode_bound

    def counting(raw, t):
        calls.append(t)
        return real(raw, t)

    monkeypatch.setattr(iceberg, "decode_bound", counting)
    iceberg._MANIFEST_CACHE.clear()
    snap = read_iceberg_snapshot(table)
    assert snap.num_files == 4
    assert calls == []  # resolution decoded nothing
    kept = [
        f for f in snap.files if _bounds_may_match(f[2], "id", "<", 100)
    ]
    assert len(kept) == 2
    # 4 files × (lo + hi) for the ONE touched column
    assert len(calls) == 8
    # memoized: re-checking the same column decodes nothing new
    [_bounds_may_match(f[2], "id", "<", 100) for f in snap.files]
    assert len(calls) == 8


def test_lazy_bounds_mapping_face(tmp_path):
    """items()/get()/in/len/bool/== — the faces existing callers and
    tests use — agree with the eagerly-decoded dict."""
    table = _summarized_table(tmp_path)
    snap = read_iceberg_snapshot(table)
    f = next(x for x in snap.files if x[0].endswith("fa1.parquet"))
    b = f[2]
    assert "id" in b and "v" not in b
    assert b["id"] == (0, 49)
    assert b.get("id") == (0, 49) and b.get("v") is None
    assert dict(b.items()) == {"id": (0, 49)}
    assert list(b) == ["id"] and len(b) == 1 and bool(b)
    assert b == {"id": (0, 49)}
    with pytest.raises(KeyError):
        b["v"]


def test_scan_rows_match_full_entries(tmp_path):
    """The compact scan-row cache and the write path's full-entry
    decode describe the same manifest."""
    from ballista_spark.sources.iceberg import (
        _manifest_scan_rows,
        _read_manifest,
        _SR_PATH,
        _SR_RC,
        _SR_LO,
        _SR_STATUS,
    )

    table = _summarized_table(tmp_path)
    man = os.path.join(table, "metadata", "manifest-a.avro")
    rows = _manifest_scan_rows(man)
    full = _read_manifest(man)
    assert len(rows) == len(full) == 2
    for row, entry in zip(rows, full):
        assert row[_SR_STATUS] == entry["status"]
        assert row[_SR_PATH] == entry["data_file"]["file_path"]
        assert row[_SR_RC] == entry["data_file"]["record_count"]
        assert row[_SR_LO] == entry["data_file"]["lower_bounds"]
