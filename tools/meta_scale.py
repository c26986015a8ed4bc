"""Lakehouse metadata-plane scale harness: synthesize an N-file Delta
table (checkpoint parquet via the repo's own writer) and an N-entry
Iceberg manifest, then measure driver-side snapshot resolution, stats
pruning, and RSS deltas.  Round 8 measured N=100k; round 9 extends the
decade to N=1M (the ~17 s extrapolation check).

Run on a QUIET box:  python tools/meta_scale.py [n_files] [workdir]

Synthesis uses the engine's own writers end-to-end (the 0-th commit and
the checkpoint go through _attempt_commit/_write_checkpoint; the Avro
manifest through _write_manifest), so the measured artifact is exactly
what production writes — only the N add actions are generated instead
of committed one by one."""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    """CURRENT RSS (VmRSS), not ru_maxrss: a high-water mark would be
    clamped by whichever earlier phase peaked highest and report 0 for
    everything after it (review finding)."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def build_delta(table: str, n: int) -> None:
    from ballista_spark.sources.deltalog import (
        MAX_WRITER_VERSION,
        _write_checkpoint,
    )

    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {"name": c, "type": t, "nullable": True, "metadata": {}}
            for c, t in (
                ("id", "long"), ("k", "long"), ("cat", "string"),
                ("v", "double"),
            )
        ],
    }
    v0 = os.path.join(table, "_delta_log", f"{0:020d}.json")
    with open(v0, "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": MAX_WRITER_VERSION,
        }}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 0,
        }}) + "\n")
        # stream the N adds — building a list would hold GBs
        for i in range(n):
            lo = i * 1000
            f.write(json.dumps({"add": {
                "path": f"part-{i:07d}-{uuid.uuid4().hex}.parquet",
                "partitionValues": {},
                "size": 128 * 1024 * 1024,
                "modificationTime": 0,
                "dataChange": True,
                "stats": json.dumps({
                    "numRecords": 37500,
                    "minValues": {"id": lo, "k": i % 7, "v": 0.0},
                    "maxValues": {"id": lo + 999, "k": i % 7, "v": 1.0},
                    "nullCount": {"id": 0, "k": 0, "v": 0},
                }),
            }}) + "\n")
    _write_checkpoint(table, 0)


def measure_delta(table: str, n: int) -> None:
    from ballista_spark.sources.deltalog import (
        _prune_files,
        read_delta_snapshot,
    )

    for run in range(3):
        r0, t0 = _rss_mb(), time.perf_counter()
        snap = read_delta_snapshot(table)
        wall, dr = time.perf_counter() - t0, _rss_mb() - r0
        assert snap.num_files == n
        print(f"delta read_snapshot[{run}]: {wall:.2f}s rss+{dr:.0f}MB")
    t0 = time.perf_counter()
    pruned = _prune_files(snap, [("id", ">=", 5000), ("id", "<", 9000)])
    print(
        f"delta _prune_files: {time.perf_counter() - t0:.2f}s "
        f"({pruned.files_pruned}/{n} pruned)"
    )


def build_iceberg(table: str, n: int) -> None:
    import struct

    from ballista_spark.sources.iceberg import (
        _write_manifest,
        _write_manifest_list,
    )

    meta_dir = os.path.join(table, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    schema_json = {
        "type": "struct", "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "double"},
        ],
    }
    # a GENERATOR: materializing n dicts would hold GBs and clamp the
    # RSS deltas measured right after (write_avro_bytes iterates once)
    entries = (
        {
            "status": 1,
            "snapshot_id": 9001,
            "data_file": {
                "file_path": f"{table}/data/d{i:07d}.parquet",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": 37500,
                "file_size_in_bytes": 128 * 1024 * 1024,
                "block_size_in_bytes": 1,
                "null_value_counts": [],
                "lower_bounds": [
                    {"key": 1, "value": struct.pack("<q", i * 1000)}
                ],
                "upper_bounds": [
                    {"key": 1, "value": struct.pack("<q", i * 1000 + 999)}
                ],
            },
        }
        for i in range(n)
    )
    mpath, mlen = _write_manifest(meta_dir, schema_json, entries)
    lpath = _write_manifest_list(meta_dir, 9001, [{
        "manifest_path": mpath,
        "manifest_length": mlen,
        "partition_spec_id": 0,
        "added_snapshot_id": 9001,
        "added_data_files_count": n,
        "existing_data_files_count": 0,
        "deleted_data_files_count": 0,
    }])
    md = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": table,
        "schemas": [schema_json],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "snapshots": [{"snapshot-id": 9001, "manifest-list": lpath}],
        "current-snapshot-id": 9001,
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(md, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")


def measure_iceberg(table: str, n: int) -> None:
    from ballista_spark.sources.iceberg import (
        _bounds_may_match,
        read_iceberg_snapshot,
    )

    for run in range(3):
        r0, t0 = _rss_mb(), time.perf_counter()
        snap = read_iceberg_snapshot(table)
        wall, dr = time.perf_counter() - t0, _rss_mb() - r0
        assert snap.num_files == n
        print(f"iceberg read_snapshot[{run}]: {wall:.2f}s rss+{dr:.0f}MB")
    t0 = time.perf_counter()
    kept = [
        f for f in snap.files
        if _bounds_may_match(f[2], "id", ">=", 5000)
        and _bounds_may_match(f[2], "id", "<", 9000)
    ]
    print(
        f"iceberg bounds prune: {time.perf_counter() - t0:.2f}s "
        f"({n - len(kept)}/{n} pruned)"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/meta_scale_{n}"
    shutil.rmtree(work, ignore_errors=True)
    print(f"n_files={n} workdir={work} loadavg={os.getloadavg()}")

    dt = os.path.join(work, "delta")
    t0 = time.perf_counter()
    build_delta(dt, n)
    ckpt = next(
        f for f in os.listdir(os.path.join(dt, "_delta_log"))
        if f.endswith(".checkpoint.parquet")
    )
    size = os.path.getsize(os.path.join(dt, "_delta_log", ckpt))
    print(
        f"delta build (incl. checkpoint write): "
        f"{time.perf_counter() - t0:.1f}s checkpoint={size / 1e6:.1f}MB"
    )
    measure_delta(dt, n)

    it = os.path.join(work, "iceberg")
    t0 = time.perf_counter()
    build_iceberg(it, n)
    print(f"iceberg build: {time.perf_counter() - t0:.1f}s")
    measure_iceberg(it, n)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
