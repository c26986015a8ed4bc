"""Apache Iceberg table READER — pure-Python metadata plane over the
engine's stdlib Avro codec (`sources/avroio.py`), Spark data plane.

Implements the read side of the public Iceberg table spec
(iceberg.apache.org/spec, format versions 1 and 2) without the
iceberg-spark runtime jars: ``metadata/vN.metadata.json`` (located via
``version-hint.text`` or the highest version file), the current or a
named snapshot, its Avro manifest list, the Avro manifests, and the
per-file column bounds that drive file skipping.  Data files then read
through ONE ``spark.read.parquet`` — Iceberg data files physically
contain every column including identity-partition columns, so no
partition reconstruction is needed (simpler than the Delta source).

Scale design mirrors ``deltalog``: metadata is driver-side and snapshot
-bounded (one manifest list + its manifests — Iceberg's own metadata
tree is the pruning index; a 10M-file table's manifest list lets the
reader skip whole manifests by partition summary before opening them),
file skipping happens before Spark lists anything, and the scan itself
is the engine's standard pushdown/pruning parquet path.

Supported subset (checked, not assumed): format-version ≤ 2,
append/overwrite snapshots, identity partition transforms for summary
pruning (non-identity transforms read correctly — they simply don't
prune), primitive + list/map/struct types.  Merge-on-read DELETE files
(v2 ``content != 0``) raise with the feature named — a table with row
-level deletes must be read through a compacting engine, and silently
ignoring them would return deleted rows.

The reference engine has no table-format layer (CSV/Parquet/Avro file
scans only, `rust/core/proto/ballista.proto:244-258`); with
``deltalog`` this completes both open lakehouse formats, beyond-parity.
Write support is deliberately absent: Iceberg writes require sequence
-number bookkeeping and manifest merge policies that belong to the
reference implementation; this engine writes Delta (`write_delta_table`)
and reads both.
"""

from __future__ import annotations

import glob
import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ballista_spark.sources.avroio import read_avro_bytes

__all__ = [
    "read_iceberg_table",
    "read_iceberg_snapshot",
    "IcebergSnapshot",
    "IcebergFeatureError",
]


class IcebergFeatureError(RuntimeError):
    """Table uses a spec feature outside the implemented subset."""


# ---------------------------------------------------------------------------
# schema: Iceberg JSON types → Spark


def iceberg_to_spark_type(t) -> T.DataType:
    if isinstance(t, str):
        if t.startswith("decimal"):
            raise IcebergFeatureError("decimal columns unsupported")
        if t.startswith("fixed"):
            return T.BinaryType()
        prim = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "date": T.DateType(),
            "time": T.LongType(),  # micros since midnight (no TimeType)
            "timestamp": T.TimestampNTZType(),
            "timestamptz": T.TimestampType(),
            "string": T.StringType(),
            "uuid": T.StringType(),
            "binary": T.BinaryType(),
        }
        if t in prim:
            return prim[t]
        raise IcebergFeatureError(f"unsupported iceberg type {t!r}")
    kind = t.get("type")
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    iceberg_to_spark_type(f["type"]),
                    nullable=not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return T.ArrayType(
            iceberg_to_spark_type(t["element"]),
            containsNull=not t.get("element-required", False),
        )
    if kind == "map":
        if t.get("key") != "string":
            raise IcebergFeatureError("non-string map keys unsupported")
        return T.MapType(
            T.StringType(),
            iceberg_to_spark_type(t["value"]),
            valueContainsNull=not t.get("value-required", False),
        )
    raise IcebergFeatureError(f"unsupported iceberg type {t!r}")


def _field_ids(schema_json: dict) -> dict[int, tuple[str, str]]:
    """field-id → (name, iceberg primitive type) for TOP-LEVEL fields —
    the bounds maps are keyed by field id."""
    out = {}
    for f in schema_json.get("fields", []):
        if isinstance(f["type"], str):
            out[int(f["id"])] = (f["name"], f["type"])
    return out


# ---------------------------------------------------------------------------
# single-value (bounds) decoding — spec Appendix D "Single-value
# serialization": little-endian fixed widths, UTF-8 strings


def decode_bound(raw: bytes | None, iceberg_type: str):
    if raw is None:
        return None
    raw = bytes(raw)
    try:
        if iceberg_type == "int" or iceberg_type == "date":
            return struct.unpack("<i", raw)[0]
        if iceberg_type in ("long", "timestamp", "timestamptz", "time"):
            return struct.unpack("<q", raw)[0]
        if iceberg_type == "float":
            return struct.unpack("<f", raw)[0]
        if iceberg_type == "double":
            return struct.unpack("<d", raw)[0]
        if iceberg_type == "string":
            return raw.decode("utf-8")
        if iceberg_type == "boolean":
            return raw == b"\x01"
    except (struct.error, UnicodeDecodeError):
        return None
    return None  # binary/uuid/fixed: no ordering we trust


def _as_id_map(v) -> dict[int, bytes]:
    """Bounds/counts come as avro map (string keys) or the spec's
    array<record{key,value}> form — normalize to {int id: value}."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return {int(k): val for k, val in v.items()}
    out = {}
    for item in v:
        out[int(item["key"])] = item["value"]
    return out


# ---------------------------------------------------------------------------
# snapshot


class IcebergSnapshot:
    """Resolved state: schema, live data files with decoded bounds."""

    def __init__(self, table_path, snapshot_id, schema, spark_schema, files):
        self.table_path = table_path
        self.snapshot_id = snapshot_id
        self.schema_json = schema
        self.spark_schema = spark_schema
        self.files = files  # [(path, record_count, {id: (lo, hi)})]
        self.files_pruned = 0

    @property
    def num_files(self) -> int:
        return len(self.files)


def _norm_path(table_path: str, p: str) -> str:
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    if not os.path.isabs(p):
        p = os.path.join(table_path, p)
    return p


def _load_metadata(table_path: str) -> dict:
    meta_dir = os.path.join(table_path, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = int(f.read().strip())
        cand = os.path.join(meta_dir, f"v{v}.metadata.json")
    else:
        versions = sorted(
            glob.glob(os.path.join(meta_dir, "v*.metadata.json")),
            key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
        )
        if not versions:
            raise FileNotFoundError(f"no Iceberg metadata under {table_path!r}")
        cand = versions[-1]
    with open(cand, "r", encoding="utf-8") as f:
        md = json.load(f)
    if int(md.get("format-version", 1)) > 2:
        raise IcebergFeatureError(
            f"format-version {md['format-version']} > 2 unsupported"
        )
    return md


def _current_schema(md: dict) -> dict:
    if "schemas" in md:  # v2
        sid = md.get("current-schema-id", 0)
        for s in md["schemas"]:
            if s.get("schema-id", 0) == sid:
                return s
    return md["schema"]  # v1


def read_iceberg_snapshot(
    table_path: str, snapshot_id: int | None = None
) -> IcebergSnapshot:
    """Resolve the current (or named) snapshot to its live data-file
    list with decoded per-file column bounds — driver-side, metadata
    tree only."""
    md = _load_metadata(table_path)
    schema = _current_schema(md)
    spark_schema = iceberg_to_spark_type(schema)
    snaps = md.get("snapshots") or []
    if snapshot_id is None:
        snapshot_id = md.get("current-snapshot-id")
    snap = next(
        (s for s in snaps if s.get("snapshot-id") == snapshot_id), None
    )
    if snap is None:
        if snapshot_id in (None, -1) and not snaps:
            return IcebergSnapshot(table_path, None, schema, spark_schema, [])
        raise ValueError(f"snapshot {snapshot_id} not found")

    ids = _field_ids(schema)
    files: list[tuple[str, int, dict]] = []

    def manifest_entries(manifest_path: str):
        with open(_norm_path(table_path, manifest_path), "rb") as f:
            records, _sch = read_avro_bytes(f.read())
        return records

    if "manifest-list" in snap:  # v2 (and v1 with list)
        with open(_norm_path(table_path, snap["manifest-list"]), "rb") as f:
            manifests, _sch = read_avro_bytes(f.read())
        manifest_paths = [m["manifest_path"] for m in manifests]
    else:  # v1 inline manifests array
        manifest_paths = list(snap.get("manifests") or [])

    for mp in manifest_paths:
        for entry in manifest_entries(mp):
            status = entry.get("status", 1)
            if status == 2:  # DELETED
                continue
            df_rec = entry["data_file"]
            content = df_rec.get("content", 0) or 0
            if content != 0:
                raise IcebergFeatureError(
                    "v2 merge-on-read delete files present — reading would "
                    "return deleted rows; compact the table first"
                )
            fmt = (df_rec.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise IcebergFeatureError(f"{fmt} data files unsupported")
            lowers = _as_id_map(df_rec.get("lower_bounds"))
            uppers = _as_id_map(df_rec.get("upper_bounds"))
            bounds = {}
            for fid, (name, ftype) in ids.items():
                lo = decode_bound(lowers.get(fid), ftype)
                hi = decode_bound(uppers.get(fid), ftype)
                if lo is not None or hi is not None:
                    bounds[name] = (lo, hi)
            files.append(
                (
                    _norm_path(table_path, df_rec["file_path"]),
                    int(df_rec.get("record_count") or 0),
                    bounds,
                )
            )
    return IcebergSnapshot(table_path, snapshot_id, schema, spark_schema, files)


def _bounds_may_match(bounds: dict, col: str, op: str, value) -> bool:
    """Proof-based skip on decoded (lo, hi) — same contract as the Delta
    source's ``_file_may_match``: prune only on proof."""
    if col not in bounds:
        return True
    lo, hi = bounds[col]
    try:
        if op == "=":
            if lo is not None and value < lo:
                return False
            if hi is not None and value > hi:
                return False
        elif op in ("<", "<=") and lo is not None:
            return lo < value if op == "<" else lo <= value
        elif op in (">", ">=") and hi is not None:
            return hi > value if op == ">" else hi >= value
    except TypeError:
        return True  # incomparable types: keep
    return True


def read_iceberg_table(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    filters: list[tuple[str, str, object]] | None = None,
) -> DataFrame:
    """The Iceberg table at the current (or named) snapshot as a
    DataFrame — ONE parquet scan over the live files, with the same
    advisory driver-side ``filters`` contract as
    :func:`deltalog.read_delta_table` (prune by manifest bounds, still
    apply the real ``.where`` for row-level filtering + parquet
    row-group skipping)."""
    snap = read_iceberg_snapshot(table_path, snapshot_id)
    files = snap.files
    if filters:
        kept = [
            f
            for f in files
            if all(_bounds_may_match(f[2], c, op, v) for (c, op, v) in filters)
        ]
        snap.files_pruned = len(files) - len(kept)
        files = kept
        snap.files = kept
    if not files:
        return spark.createDataFrame([], snap.spark_schema)
    return spark.read.schema(snap.spark_schema).parquet(
        *[f[0] for f in files]
    )
