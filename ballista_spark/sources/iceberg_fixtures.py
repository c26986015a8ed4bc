"""Spec-shaped Iceberg FORMAT-VERSION 3 fixture builder.

This engine READS v3 deletion vectors (Puffin ``deletion-vector-v1``
blobs referenced from delete manifests) but deliberately refuses v3
WRITES (row-lineage bookkeeping it does not produce) — so exercising
the v3 read plane against an oracle needs tables built to the public
spec shapes directly: Apache Iceberg table spec ("Deletion vectors",
"Manifests") + Puffin spec.  The builder lives in the library (not
tests/) because the graded coverage corpus uses it too
(`queries/graded.py` 'ice3' branch: a v3 DV read verified against the
base-parquet oracle through the driver gate).

Nothing here is a write path for user data: every artifact is stamped
from caller-supplied rows, deterministic, and byte-pinned by
`tests/test_iceberg_v3_dv.py`.
"""

from __future__ import annotations

import json
import os
import uuid

from ballista_spark.sources.avroio import write_avro_bytes
from ballista_spark.sources.dvbitmap import (
    pack_iceberg_dv_blob,
    pack_puffin_file,
)

#: Avro shapes for a v3 manifest (delete entries carry the DV reference
#: triplet) — field names per the spec's manifest_entry/data_file
_KV_SCHEMA = {
    "type": "record",
    "name": "k126_v127",
    "fields": [
        {"name": "key", "type": "int"},
        {"name": "value", "type": "bytes"},
    ],
}
V3_DATA_FILE_SCHEMA = {
    "type": "record",
    "name": "r2v3",
    "fields": [
        {"name": "content", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
        {
            "name": "lower_bounds",
            "type": ["null", {"type": "array", "items": _KV_SCHEMA}],
        },
        {
            "name": "upper_bounds",
            "type": [
                "null",
                {"type": "array", "items": {**_KV_SCHEMA, "name": "k128_v129"}},
            ],
        },
        {"name": "referenced_data_file", "type": ["null", "string"]},
        {"name": "content_offset", "type": ["null", "long"]},
        {"name": "content_size_in_bytes", "type": ["null", "long"]},
    ],
}
V3_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": V3_DATA_FILE_SCHEMA},
    ],
}
V3_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

_SNAPSHOT_ID = 7001


def _column_bounds(arrow_table, schema_json: dict) -> tuple[list, list]:
    """Appendix-D lower/upper bound kv-lists for every primitive field
    the codec can encode — real bounds so file-skip pruning exercises
    on the fixture exactly like on written tables."""
    import pyarrow.compute as pc

    from ballista_spark.sources.iceberg import encode_bound

    lowers, uppers = [], []
    for f in schema_json.get("fields", []):
        ftype = f.get("type")
        if not isinstance(ftype, str):  # nested — no bounds
            continue
        name = f["name"]
        if name not in arrow_table.column_names:
            continue
        col = arrow_table[name]
        if col.null_count == len(col):
            continue
        mm = pc.min_max(col)
        lo = encode_bound(mm["min"].as_py(), ftype)
        hi = encode_bound(mm["max"].as_py(), ftype)
        if lo is not None and hi is not None:
            lowers.append({"key": int(f["id"]), "value": lo})
            uppers.append({"key": int(f["id"]), "value": hi})
    return lowers, uppers


def build_v3_dv_table(
    table_path: str,
    data_files: dict,
    dv_by_file: dict,
    schema_json: dict,
) -> str:
    """Materialize a format-version 3 Iceberg table at ``table_path``:
    ``data_files`` maps file name -> ``pyarrow.Table`` (written verbatim
    under ``data/``), ``dv_by_file`` maps file name -> deleted row
    positions (packed as deletion-vector-v1 blobs into ONE shared
    Puffin file, referenced from a delete manifest entry each).
    ``schema_json`` is the Iceberg struct schema (``schema-id`` added
    if absent).  Returns ``table_path``.
    """
    import pyarrow.parquet as pq

    if "schema-id" not in schema_json:
        schema_json = {"schema-id": 0, **schema_json}
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    entries = []
    for name, tbl in data_files.items():
        path = os.path.join(table_path, "data", name)
        pq.write_table(tbl, path)
        lowers, uppers = _column_bounds(tbl, schema_json)
        entries.append(
            {
                "status": 1,
                "snapshot_id": None,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.relpath(path, table_path),
                    "file_format": "PARQUET",
                    "record_count": tbl.num_rows,
                    "file_size_in_bytes": os.path.getsize(path),
                    "lower_bounds": lowers or None,
                    "upper_bounds": uppers or None,
                    "referenced_data_file": None,
                    "content_offset": None,
                    "content_size_in_bytes": None,
                },
            }
        )

    dv_entries = []
    if dv_by_file:
        unknown = sorted(set(dv_by_file) - set(data_files))
        if unknown:
            raise ValueError(f"dv_by_file names unknown data files: {unknown}")
        pairs = [
            (
                os.path.join(table_path, "data", fname),
                sorted(set(int(p) for p in positions)),
            )
            for fname, positions in dv_by_file.items()
        ]
        blob_bytes, descs = pack_puffin_file(
            [
                (
                    pack_iceberg_dv_blob(positions),
                    {
                        "referenced-data-file": ref,
                        "cardinality": str(len(positions)),
                    },
                )
                for ref, positions in pairs
            ]
        )
        puffin_rel = "data/deletes.puffin"
        with open(os.path.join(table_path, puffin_rel), "wb") as f:
            f.write(blob_bytes)
        for d, (ref, positions) in zip(descs, pairs):
            dv_entries.append(
                {
                    "status": 1,
                    "snapshot_id": None,
                    "data_file": {
                        "content": 1,
                        "file_path": puffin_rel,
                        "file_format": "PUFFIN",
                        "record_count": len(positions),
                        "file_size_in_bytes": len(blob_bytes),
                        "lower_bounds": None,
                        "upper_bounds": None,
                        "referenced_data_file": ref,
                        "content_offset": d["offset"],
                        "content_size_in_bytes": d["length"],
                    },
                }
            )

    meta_dir = os.path.join(table_path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    manifest_rel = "metadata/manifest-1.avro"
    with open(os.path.join(table_path, manifest_rel), "wb") as f:
        f.write(
            write_avro_bytes(entries + dv_entries, V3_MANIFEST_ENTRY_SCHEMA)
        )
    mlist_rel = f"metadata/snap-{_SNAPSHOT_ID}.avro"
    with open(os.path.join(table_path, mlist_rel), "wb") as f:
        f.write(
            write_avro_bytes(
                [
                    {
                        "manifest_path": manifest_rel,
                        "manifest_length": os.path.getsize(
                            os.path.join(table_path, manifest_rel)
                        ),
                        "partition_spec_id": 0,
                        "added_snapshot_id": _SNAPSHOT_ID,
                    }
                ],
                V3_MANIFEST_FILE_SCHEMA,
            )
        )
    md = {
        "format-version": 3,
        "table-uuid": str(uuid.uuid4()),
        "location": table_path,
        "last-sequence-number": 1,
        "next-row-id": sum(t.num_rows for t in data_files.values()),
        "schemas": [schema_json],
        "current-schema-id": schema_json.get("schema-id", 0),
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "snapshots": [
            {"snapshot-id": _SNAPSHOT_ID, "manifest-list": mlist_rel}
        ],
        "current-snapshot-id": _SNAPSHOT_ID,
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(md, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    return table_path
