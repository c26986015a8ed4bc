"""Delta-protocol table source — pure-Python transaction log, Spark data
plane.  Reads and writes a documented SUBSET of the open Delta Lake
protocol (the delta.io PROTOCOL.md spec) without any lakehouse jars:
the `_delta_log/` JSON commits and parquet checkpoints are metadata
(small, driver-side), while every data byte still moves through
``spark.read.parquet`` — the engine's standard scan path with pushdown,
pruning and whole-stage codegen intact.

Why this exists: at 100 TB, data does not arrive as loose parquet
directories — it arrives as *tables* with a transaction log, because a
directory listing of 10M files is (a) slow and (b) racy against
concurrent writers.  The log gives O(1) snapshot listing (one checkpoint
parquet + a few JSON tails), atomic commits, time travel, and per-file
column statistics that let a reader skip files before Spark ever lists
them.  ``connectors.read_delta`` covers deployments that DO have the
delta-spark jars; this module covers the (local, test, air-gapped) ones
that don't, with the same on-disk format.

Scale design:
- **Metadata is driver-side and checkpoint-bounded.**  Snapshot
  reconstruction reads ``_last_checkpoint`` → ONE parquet (the
  compacted action state at version V) → only the JSON commits after V.
  Cost is O(live files + tail commits), never O(all history).
- **File skipping before listing.**  ``filters`` are evaluated against
  the log's per-file min/max stats (and partition values) on the
  driver; a pruned file costs zero Spark work — no footer read, no
  task.  This is the lakehouse analogue of partition pruning, and it
  composes with it.
- **One Spark read for the whole snapshot.**  Delta writers lay
  partitions out hive-style (``col=value/``); when every live file
  matches that layout the snapshot reads as a single
  ``spark.read.option("basePath", root).parquet(*files)`` — partition
  columns derived by Spark, one scan node.  Non-hive layouts fall back
  to a per-partition-value union with literal columns (correct, more
  plan nodes; the fallback logs a warning naming the cost).
- **Commits are put-if-absent.**  ``{version:020d}.json`` is created
  with an exclusive-create open; a losing racer re-reads the snapshot
  and retries on top (optimistic concurrency, the Delta commit
  protocol).
- **Filesystem-agnostic metadata plane** (round 8): every log/staging
  IO site routes through ``sources/fsio.py`` — plain paths keep the
  local ``os`` fast-path, URIs (s3://, hdfs://, + Hadoop spellings
  s3a://…) go through ``pyarrow.fs``.  Exclusive-create degrades to
  check-then-write on object stores (fsio warns; multi-writer S3
  deployments need the spec's LogStore coordination layer — documented,
  loud).  Footer-stat collection for large commits distributes as one
  ``mapInPandas`` pass instead of a serial driver loop
  (``_collect_file_stats``).

Supported protocol subset (checked, not assumed): reader version ≤ 2
plus the columnMapping table feature (reader version 3 tables whose
readerFeatures are exactly that) — column-mapped tables (modes name/id)
READ correctly (physical parquet names resolved to the logical schema,
physically-keyed stats/partitionValues normalized for pruning); writes
to them refuse (this writer stages logical-named files).  No deletion
vectors, no generated columns.  A table demanding more raises with the
feature named rather than silently misreading.

The reference engine's source surface is CSV/Parquet/Avro file scans
(`rust/core/proto/ballista.proto:244-258`) with no table-format layer;
this module is beyond-parity capability for the training-data-pipeline
mandate (SURVEY §2).
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid
from collections.abc import Mapping
from dataclasses import dataclass, field
from urllib.parse import unquote as _unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ballista_spark.sources import fsio
from ballista_spark.sources.decodecache import DecodeCache

__all__ = [
    "DeltaSnapshot",
    "read_delta_table",
    "read_delta_snapshot",
    "read_delta_changes",
    "read_delta_cdf",
    "write_delta_table",
    "compact_delta_table",
    "merge_delta_table",
    "delete_from_delta_table",
    "update_delta_table",
    "alter_delta_table",
    "vacuum_delta_table",
    "plan_compaction_bins",
    "DeltaProtocolError",
    "DeltaConcurrentCommitError",
]

#: max reader/writer protocol versions this module implements
MAX_READER_VERSION = 2
MAX_WRITER_VERSION = 2

#: Delta truncates string stats at 32 chars (appending a tie-breaker on
#: max bounds); a 32-char string bound may be a truncation, so pruning
#: must not trust it as exact
_STRING_STATS_TRUNCATION = 32


class DeltaProtocolError(RuntimeError):
    """Table requires protocol features this subset does not implement."""


class DeltaConcurrentCommitError(RuntimeError):
    """Commit lost the optimistic-concurrency race too many times."""


# ---------------------------------------------------------------------------
# log primitives (driver-side, tiny)


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, "_delta_log")


def _commit_path(table_path: str, version: int) -> str:
    return os.path.join(_log_dir(table_path), f"{version:020d}.json")


def _list_log_versions(table_path: str) -> list[int]:
    """Versions with a JSON commit present, ascending."""
    out = []
    for name in fsio.listdir(_log_dir(table_path)):
        if name.endswith(".json") and len(name) == 25 and name[:20].isdigit():
            out.append(int(name[:20]))
    return sorted(out)


def _read_last_checkpoint(table_path: str) -> dict | None:
    p = os.path.join(_log_dir(table_path), "_last_checkpoint")
    if not fsio.exists(p):
        return None
    return json.loads(fsio.read_text(p))


def _checkpoint_paths(table_path: str, version: int, parts: int | None) -> list[str]:
    d = _log_dir(table_path)
    if not parts:
        return [os.path.join(d, f"{version:020d}.checkpoint.parquet")]
    return [
        os.path.join(
            d, f"{version:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet"
        )
        for i in range(parts)
    ]


def _iter_commit_actions(path: str):
    for line in fsio.read_text(path).splitlines():
        line = line.strip()
        if line:
            yield json.loads(line)


def _map_column_to_dicts(arr) -> list[dict]:
    """MapArray -> list of python dicts via the flat keys/items arrays
    and offsets — ``to_pylist`` on a map column walks scalar-at-a-time
    in Python (~10 µs/row, the 100k-file reconstruction hot spot); the
    flat arrays convert at C speed."""
    if arr.null_count == len(arr):
        return [{} for _ in range(len(arr))]
    offs = arr.offsets.to_pylist()
    keys = arr.keys.to_pylist()
    vals = arr.items.to_pylist()
    out = []
    for i in range(len(arr)):
        lo, hi = offs[i], offs[i + 1]
        out.append(dict(zip(keys[lo:hi], vals[lo:hi])) if hi > lo else {})
    return out


#: Checkpoint part files are IMMUTABLE once written (version-named,
#: exclusive-create commits), so their decoded action lists LRU-cache
#: across snapshot resolutions — the per-query production pattern
#: (the Iceberg twin: iceberg._read_manifest).  Shared implementation:
#: sources/decodecache.py (thread-safe, (path, size, mtime) keys,
#: stat-verified, mtime-less stores never cached).
_CHECKPOINT_CACHE = DecodeCache(max_items=2_000_000)


def _read_checkpoint_actions(paths: list[str]) -> list[dict]:
    """Decoded checkpoint actions, cached.  Callers must treat the
    returned action dicts as READ-ONLY: snapshot construction copies
    the containers it keeps (partitionValues/deletionVector/protocol/
    configuration) and stores only immutable values by reference
    (the raw stats string).  Any future change that stores a MUTABLE
    field by reference must copy it here first."""
    return _CHECKPOINT_CACHE.get_or_decode(
        list(paths), lambda: list(_iter_checkpoint_actions(paths))
    )


def _iter_checkpoint_actions(paths: list[str]):
    """Checkpoint rows are one action per row in struct columns — yield
    them in the same {kind: body} shape as JSON commit lines.

    The ``add`` column (the 100k+-row one) converts COLUMNAR — per-field
    ``struct_field(...).to_pylist()`` plus the offsets-based map decode
    — instead of row-wise ``to_pylist`` (which walks map scalars in
    Python).  Ordering by kind is safe: a checkpoint is a snapshot, so
    inter-kind order carries no semantics (a path is either live or
    tombstoned, never both).  Profiled round 8: 100k-file
    reconstruction 6.2 s -> ~1.5 s."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for p in paths:
        with fsio.open_input(p) as src:
            tbl = pq.read_table(src)
        for kind in ("protocol", "metaData", "remove", "txn"):
            if kind not in tbl.column_names:
                continue
            nn = pc.drop_null(tbl.column(kind).combine_chunks())
            for body in nn.to_pylist():
                yield {kind: body}
        if "add" not in tbl.column_names:
            continue
        col = tbl.column("add").combine_chunks()
        adds = col.filter(pc.is_valid(col))
        if not len(adds):
            continue
        names = {f.name for f in adds.type}

        def _field(name, default=None):
            if name not in names:
                return [default] * len(adds)
            return pc.struct_field(adds, name).to_pylist()

        a_paths = _field("path")
        a_sizes = _field("size", 0)
        a_stats = _field("stats")
        a_dchg = _field("dataChange", True)
        # DV descriptors (external delta-spark checkpoints): small
        # all-scalar struct — row-wise to_pylist is fine here
        a_dvs = _field("deletionVector")
        if "partitionValues" in names:
            a_pvals = _map_column_to_dicts(pc.struct_field(adds, "partitionValues"))
        else:
            a_pvals = [{} for _ in range(len(adds))]
        for i in range(len(adds)):
            yield {
                "add": {
                    "path": a_paths[i],
                    "partitionValues": a_pvals[i],
                    "size": a_sizes[i],
                    "dataChange": a_dchg[i],
                    "stats": a_stats[i],
                    "deletionVector": a_dvs[i],
                }
            }


# ---------------------------------------------------------------------------
# snapshot


class _AddFile:
    """One live data file.  ``stats`` accepts the log's raw JSON string
    and parses LAZILY on first access (round 9: eager ``json.loads`` of
    1M stats strings was ~36% of snapshot resolution; a filter-less
    read never needs them)."""

    __slots__ = ("path", "partition_values", "size", "_stats",
                 "deletion_vector")

    def __init__(
        self,
        path: str,  # RELATIVE to the table root (spec) — stored relative
        partition_values: dict[str, str],
        size: int,
        stats: dict | str | None,
        deletion_vector: dict | None = None,
    ):
        self.path = path
        self.partition_values = partition_values
        self.size = size
        self._stats = stats
        #: deletion-vector descriptor (storageType/pathOrInlineDv/offset/
        #: sizeInBytes/cardinality) or None — the add action's
        #: `deletionVector` field, applied at scan time
        self.deletion_vector = deletion_vector

    @property
    def stats(self) -> dict | None:
        """Parsed stats (numRecords/minValues/maxValues/nullCount)."""
        s = self._stats
        if isinstance(s, str):
            try:
                s = json.loads(s)
            except ValueError:
                s = None
            if not isinstance(s, dict):
                s = None
            self._stats = s
        return self._stats

    @stats.setter
    def stats(self, value: dict | None) -> None:
        self._stats = value

    def stats_json(self) -> str | None:
        """The stats as a JSON string — the raw log bytes pass through
        when they parse to a dict (checkpoint fast path; semantically
        identical to a re-dump), and INVALID strings become None
        exactly like the access path, so checkpoint contents never
        depend on whether a query touched .stats first."""
        s = self._stats
        if isinstance(s, str):
            try:
                parsed = json.loads(s)
            except ValueError:
                return None
            return s if isinstance(parsed, dict) else None
        return json.dumps(s) if s else None

    def __eq__(self, other) -> bool:  # the old dataclass contract
        if not isinstance(other, _AddFile):
            return NotImplemented
        return (
            self.path == other.path
            and self.partition_values == other.partition_values
            and self.size == other.size
            and self.stats == other.stats  # parsed: semantic equality
            and self.deletion_vector == other.deletion_vector
        )

    def __repr__(self) -> str:  # dataclass-style, for test diffs
        return (
            f"_AddFile(path={self.path!r}, "
            f"partition_values={self.partition_values!r}, "
            f"size={self.size!r}, stats={self.stats!r}, "
            f"deletion_vector={self.deletion_vector!r})"
        )


@dataclass
class DeltaSnapshot:
    """The reconstructed live state of a Delta table at one version:
    everything a scan needs, small enough to live on the driver."""

    table_path: str
    version: int
    schema: T.StructType
    partition_columns: list[str]
    #: metaData.id — the table's STABLE unique identifier per the Delta
    #: protocol; every metaData-rewriting commit must re-emit it
    #: unchanged (external readers treat an id change as table
    #: replacement and invalidate), fresh uuid only at table creation
    table_id: str = ""
    files: list[_AddFile] = field(default_factory=list)
    #: populated by filter pruning: how many live files the filters removed
    files_pruned: int = 0
    #: streaming idempotence: appId → highest committed txn version
    #: (the Delta `txn` action — the exactly-once handshake)
    app_versions: dict[str, int] = field(default_factory=dict)
    #: latest metaData `configuration` map (table properties)
    configuration: dict = field(default_factory=dict)
    #: column mapping (mode name/id): LOGICAL field name -> physical
    #: parquet column name; empty = no mapping (plain table)
    column_mapping: dict = field(default_factory=dict)
    #: remove tombstones seen in the replayed log tail: rel path →
    #: deletionTimestamp ms (vacuum's retention input)
    tombstones: dict[str, int] = field(default_factory=dict)
    #: protocol readerFeatures (v3 tables)
    reader_features: set = field(default_factory=set)
    #: the last protocol action VERBATIM — checkpoints must republish
    #: it (writing a default would downgrade a v3 table's requirements)
    protocol: dict = field(default_factory=dict)

    @property
    def num_files(self) -> int:
        return len(self.files)

    def file_paths(self) -> list[str]:
        return [os.path.join(self.table_path, f.path) for f in self.files]

    def with_files(self, files: list["_AddFile"]) -> "DeltaSnapshot":
        """A snapshot restricted to ``files`` that keeps EVERY other
        field — crucially ``column_mapping`` (an ad-hoc reconstruction
        that drops it makes ``_scan_snapshot`` read a column-mapped
        table's parquet under logical names and return all-NULL data)."""
        return dataclasses.replace(self, files=list(files))


def _normalize_rel(table_path: str, p: str) -> str:
    """Spec says add/remove paths are table-root-relative (URL-encoded);
    tolerate absolute paths/URIs some writers emit."""
    if "%" not in p and ":" not in p and p[:1] != "/":
        return p  # plain relative path — the overwhelmingly common case
    if "%" in p:
        p = _unquote(p)
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    if "://" in p:
        # absolute URI under the table root (scheme spellings may
        # differ: s3a vs s3) — strip to the path after the root's tail.
        # A URI that does NOT live under the root refuses loudly: a
        # basename guess could silently read a different file
        # (review finding).
        tail = table_path.partition("://")[2]
        rest = p.partition("://")[2]
        if tail and rest.startswith(tail.rstrip("/") + "/"):
            return rest[len(tail.rstrip("/")) + 1:]
        raise DeltaProtocolError(
            f"add/remove path {p!r} is not under the table root "
            f"{table_path!r} — external-location files are not "
            "supported by this reader"
        )
    if os.path.isabs(p) and fsio.is_local(table_path):
        return os.path.relpath(p, os.path.abspath(table_path))
    return p


def read_delta_snapshot(table_path: str, version: int | None = None) -> DeltaSnapshot:
    """Reconstruct the live file set / schema at ``version`` (default:
    latest).  Checkpoint-bounded: at most one checkpoint parquet plus the
    JSON commits after it are read — never the full history."""
    versions = _list_log_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no Delta log at {table_path!r}")
    target = versions[-1] if version is None else int(version)

    start = 0
    action_streams = []
    cp = _read_last_checkpoint(table_path)
    if cp is not None and cp.get("version", -1) <= target:
        cp_version = int(cp["version"])
        action_streams.append(
            _read_checkpoint_actions(
                _checkpoint_paths(table_path, cp_version, cp.get("parts"))
            )
        )
        start = cp_version + 1
    needed = [v for v in versions if start <= v <= target]
    if version is not None and target not in versions and start == 0:
        raise ValueError(f"version {target} not in log (have {versions})")
    # contiguity check: a gap means an expired/vacuumed log segment
    expect = start if action_streams else (needed[0] if needed else 0)
    for v in needed:
        if v != expect:
            raise ValueError(
                f"Delta log gap at version {expect} (found {v}); cannot "
                "reconstruct the snapshot"
            )
        expect += 1
    for v in needed:
        action_streams.append(_iter_commit_actions(_commit_path(table_path, v)))

    adds: dict[str, _AddFile] = {}
    schema: T.StructType | None = None
    table_id: str = ""
    part_cols: list[str] = []
    configuration: dict = {}
    column_mapping: dict = {}
    app_versions: dict[str, int] = {}
    tombstones: dict[str, int] = {}
    reader_features: set = set()
    protocol_action: dict = {}
    for stream in action_streams:
        for action in stream:
            if "add" in action:
                a = action["add"]
                rel = _normalize_rel(table_path, a["path"])
                stats = a.get("stats")
                dv = a.get("deletionVector")
                adds[rel] = _AddFile(
                    path=rel,
                    partition_values=dict(a.get("partitionValues") or {}),
                    size=int(a.get("size") or 0),
                    # raw string: _AddFile.stats parses lazily on access
                    stats=stats if isinstance(stats, (str, dict)) else None,
                    deletion_vector=dict(dv) if isinstance(dv, dict) else None,
                )
            elif "remove" in action:
                r = action["remove"]
                rel = _normalize_rel(table_path, r["path"])
                adds.pop(rel, None)
                tombstones[rel] = int(r.get("deletionTimestamp") or 0)
            elif "txn" in action:
                t = action["txn"]
                app = t.get("appId")
                if app is not None and t.get("version") is not None:
                    app_versions[app] = max(
                        app_versions.get(app, -1), int(t["version"])
                    )
            elif "metaData" in action:
                md = action["metaData"]
                table_id = md.get("id") or table_id
                schema = T.StructType.fromJson(json.loads(md["schemaString"]))
                part_cols = list(md.get("partitionColumns") or [])
                configuration = dict(md.get("configuration") or {})
                column_mapping = {}
                if configuration.get("delta.columnMapping.mode") in (
                    "name", "id"
                ):
                    # id mode also records physicalName; parquet files
                    # written by delta-spark carry BOTH, and matching by
                    # physical name reads either mode correctly here
                    for fld in schema.fields:
                        phys = (fld.metadata or {}).get(
                            "delta.columnMapping.physicalName"
                        )
                        if phys:
                            column_mapping[fld.name] = phys
            elif "protocol" in action:
                pr = action["protocol"]
                rv = int(pr.get("minReaderVersion", 1))
                feats = set(pr.get("readerFeatures") or [])
                reader_features = feats
                protocol_action = dict(pr)
                # v3 REQUIRES a readerFeatures list; absent/empty means
                # the requirement is unknown -> refuse, don't guess
                if rv > MAX_READER_VERSION and not (
                    rv == 3
                    and feats
                    and feats <= {"columnMapping", "deletionVectors"}
                ):
                    raise DeltaProtocolError(
                        f"table requires minReaderVersion={rv} with "
                        f"readerFeatures={sorted(feats)} (this reader "
                        f"implements ≤ {MAX_READER_VERSION} plus the "
                        "columnMapping and deletionVectors table "
                        "features)"
                    )
    if schema is None:
        raise DeltaProtocolError("log has no metaData action (corrupt table?)")
    if column_mapping:
        # stats and partitionValues are keyed by PHYSICAL names on a
        # column-mapped table — normalize to logical once, so pruning
        # and every downstream consumer stay in logical terms
        to_logical = {p: l for l, p in column_mapping.items()}

        def _remap(d: dict | None) -> dict | None:
            if not isinstance(d, dict):
                return d
            return {to_logical.get(k, k): v for k, v in d.items()}

        for f in adds.values():
            f.partition_values = _remap(f.partition_values) or {}
            if f.stats:
                f.stats = {
                    k: (_remap(v) if k in (
                        "minValues", "maxValues", "nullCount"
                    ) else v)
                    for k, v in f.stats.items()
                }
    return DeltaSnapshot(
        table_path=table_path,
        version=target,
        schema=schema,
        table_id=table_id,
        partition_columns=part_cols,
        files=sorted(adds.values(), key=lambda f: f.path),
        app_versions=app_versions,
        tombstones=tombstones,
        configuration=configuration,
        column_mapping=column_mapping,
        reader_features=reader_features,
        protocol=protocol_action,
    )


# ---------------------------------------------------------------------------
# stats-based file skipping


def _coerce_like(value, bound):
    """Compare filter value against a JSON stats bound with matching
    Python semantics; None means 'cannot compare' (keep the file)."""
    if bound is None:
        return None
    if isinstance(value, bool) or isinstance(bound, bool):
        return bound if isinstance(value, type(bound)) else None
    if isinstance(value, (int, float)) and isinstance(bound, (int, float)):
        return bound
    if isinstance(value, str) and isinstance(bound, str):
        return bound
    return None


def _file_may_match(f: _AddFile, col: str, op: str, value) -> bool:
    """Proof-based skipping: False only when the file's stats (or its
    partition value) PROVE no row can satisfy ``col op value``.  Missing
    stats, unknown columns, type mismatches → True (keep)."""
    # partition columns: the value is exact, not a range
    if col in f.partition_values:
        pv = f.partition_values[col]
        if pv is None or pv == "":
            return op in ("is_null",)
        if op == "is_null":
            return False
        sv = str(value)
        return {
            "=": pv == sv,
            "!=": pv != sv,
            "<": pv < sv,
            "<=": pv <= sv,
            ">": pv > sv,
            ">=": pv >= sv,
        }.get(op, True)
    st = f.stats or {}
    if op == "is_null":
        nulls = (st.get("nullCount") or {}).get(col)
        return nulls is None or int(nulls) > 0
    lo = _coerce_like(value, (st.get("minValues") or {}).get(col))
    hi = _coerce_like(value, (st.get("maxValues") or {}).get(col))
    # a 32-char string max bound may be truncated — can't trust it as an
    # upper proof (Delta appends a tie-breaker char past real data)
    hi_trusted = not (
        isinstance(hi, str) and len(hi) >= _STRING_STATS_TRUNCATION
    )
    if op == "=":
        if lo is not None and value < lo:
            return False
        if hi is not None and hi_trusted and value > hi:
            return False
        return True
    if op in ("<", "<="):
        if lo is None:
            return True
        return lo < value if op == "<" else lo <= value
    if op in (">", ">="):
        if hi is None or not hi_trusted:
            return True
        return hi > value if op == ">" else hi >= value
    return True  # !=, unknown ops: stats can't disprove


def _prune_files(
    snap: DeltaSnapshot, filters: list[tuple[str, str, object]]
) -> DeltaSnapshot:
    kept = [
        f
        for f in snap.files
        if all(_file_may_match(f, c, op, v) for (c, op, v) in filters)
    ]
    snap.files_pruned = len(snap.files) - len(kept)
    snap.files = kept
    return snap


# ---------------------------------------------------------------------------
# reading


#: Reader features implied by each legacy minReaderVersion (upgrading
#: a table to minReaderVersion 3 must enumerate them, exactly like the
#: writer-side table)
_LEGACY_READER_FEATURES = {
    1: frozenset(),
    2: frozenset({"columnMapping"}),
}


def _physical_partition_values(
    pv: Mapping[str, object], cm: Mapping[str, str]
) -> dict:
    """partitionValues as the LOG stores them: physical keys on a
    column-mapped table (the snapshot normalized them to logical)."""
    return {cm.get(k, k): ("" if v is None else v) for k, v in pv.items()}


def _physical_stats_json(f: "_AddFile", cm: Mapping[str, str]) -> str | None:
    """An add action's stats string under the on-disk contract:
    PHYSICAL column keys on a column-mapped table (review finding:
    re-emitting the snapshot's logical-keyed stats mis-attributes
    bounds after a RENAME + re-ADD of the old name, and breaks external
    readers).  Unmapped tables keep the raw-bytes fast path."""
    if not cm:
        return f.stats_json()
    s = f.stats
    if not s:
        return None

    def _remap(d):
        if not isinstance(d, dict):
            return d
        return {cm.get(k, k): v for k, v in d.items()}

    return json.dumps(
        {
            k: (_remap(v) if k in ("minValues", "maxValues", "nullCount")
                else v)
            for k, v in s.items()
        }
    )


#: Writer features implied by each legacy minWriterVersion (Delta
#: table-features spec, "Writer Version Requirements" — upgrading to
#: v7 must ENUMERATE these, and a writer committing at a legacy
#: version must honor them).
_LEGACY_WRITER_FEATURES = {
    1: frozenset(),
    2: frozenset({"appendOnly", "invariants"}),
    3: frozenset({"appendOnly", "invariants", "checkConstraints"}),
    4: frozenset(
        {
            "appendOnly",
            "invariants",
            "checkConstraints",
            "changeDataFeed",
            "generatedColumns",
        }
    ),
    5: frozenset(
        {
            "appendOnly",
            "invariants",
            "checkConstraints",
            "changeDataFeed",
            "generatedColumns",
            "columnMapping",
        }
    ),
    6: frozenset(
        {
            "appendOnly",
            "invariants",
            "checkConstraints",
            "changeDataFeed",
            "generatedColumns",
            "columnMapping",
            "identityColumns",
        }
    ),
}


def _required_writer_features(proto: dict | None) -> tuple[int, set | None]:
    """(minWriterVersion, features this table requires of a writer);
    None features = a version beyond this writer's knowledge."""
    proto = proto or {}
    mwv = int(proto.get("minWriterVersion", 1))
    if mwv == 7:
        return mwv, set(proto.get("writerFeatures") or [])
    legacy = _LEGACY_WRITER_FEATURES.get(mwv)
    return mwv, (set(legacy) if legacy is not None else None)


def _check_writer_protocol(
    snap: DeltaSnapshot,
    op: str,
    *,
    adds_rows: bool = False,
    removes_rows: bool = False,
) -> None:
    """Refuse a commit the table's writer protocol forbids (round-8
    advice: mutations previously ignored writerFeatures entirely).

    ``adds_rows`` = the commit introduces NEW or CHANGED row values
    (append, UPDATE SET, MERGE insert/update) — the shapes column
    invariants / constraints / generated / identity columns constrain.
    ``removes_rows`` = the commit logically deletes or rewrites rows —
    what ``delta.appendOnly`` forbids and Change Data Feed requires cdc
    files for (this writer produces none, so CDF-enabled tables refuse
    row-removing mutations; pure appends and dataChange=false OPTIMIZE
    are derivable from add/remove actions per the CDF spec and pass).
    Feature declarations whose runtime trigger is absent (e.g.
    ``appendOnly`` declared but ``delta.appendOnly`` unset) pass: the
    feature is implemented by honoring its contract.
    """
    mwv, feats = _required_writer_features(snap.protocol)
    if feats is None:
        raise DeltaProtocolError(
            f"{op}: table requires minWriterVersion={mwv}; this writer "
            "knows legacy versions 1-6 and table-features version 7"
        )
    conf = snap.configuration or {}
    field_meta = [(f.name, f.metadata or {}) for f in snap.schema.fields]

    def _bool_conf(key: str) -> bool:
        return str(conf.get(key, "")).lower() == "true"

    for feat in sorted(feats):
        if feat == "appendOnly":
            if removes_rows and _bool_conf("delta.appendOnly"):
                raise DeltaProtocolError(
                    f"{op} removes or rewrites rows in an append-only "
                    "table (delta.appendOnly=true)"
                )
        elif feat == "invariants":
            bad = [n for n, m in field_meta if "delta.invariants" in m]
            if adds_rows and bad:
                raise DeltaProtocolError(
                    f"{op}: columns {bad} declare invariants this "
                    "writer does not enforce"
                )
        elif feat == "checkConstraints":
            cons = sorted(
                k for k in conf if k.startswith("delta.constraints.")
            )
            if adds_rows and cons:
                raise DeltaProtocolError(
                    f"{op}: table declares CHECK constraints {cons} "
                    "this writer does not enforce"
                )
        elif feat == "changeDataFeed":
            if removes_rows and _bool_conf("delta.enableChangeDataFeed"):
                raise DeltaProtocolError(
                    f"{op} on a Change-Data-Feed-enabled table requires "
                    "writing cdc files, which this writer does not "
                    "produce (appends and OPTIMIZE are fine)"
                )
        elif feat == "generatedColumns":
            gen = [
                n for n, m in field_meta if "delta.generationExpression" in m
            ]
            if adds_rows and gen:
                raise DeltaProtocolError(
                    f"{op}: columns {gen} are generated; this writer "
                    "does not compute generation expressions"
                )
        elif feat == "identityColumns":
            ident = [
                n
                for n, m in field_meta
                if any(k.startswith("delta.identity.") for k in m)
            ]
            if adds_rows and ident:
                raise DeltaProtocolError(
                    f"{op}: columns {ident} are identity columns; this "
                    "writer does not assign identity values"
                )
        elif feat in ("columnMapping", "deletionVectors"):
            pass  # implemented: mapped reads/writes, DV read+write+purge
        else:
            raise DeltaProtocolError(
                f"{op}: table declares writer feature {feat!r} this "
                "writer does not implement — mutating it would break "
                "that feature's contract for other writers"
            )


def _purges_deletion_vectors() -> None:
    """Round-8 stance on mutating DV tables: every mutation path reads
    touched files through ``_scan_snapshot`` (DV-applied) and rewrites
    them WITHOUT a descriptor — a touch purges the file's DV while
    untouched files keep theirs (the checkpoint writer carries the
    descriptors and the table's real protocol).  delta-spark calls this
    shape REORG ... APPLY (PURGE), applied incrementally.  DELETE can
    also WRITE deletion vectors on request
    (``delete_from_delta_table(use_deletion_vectors=True)`` — zero data
    bytes rewritten, cost tracks matched rows); the default stays
    copy-on-write."""


def _dv_positions(table_path: str, dv: dict) -> list[int]:
    """Resolve one add action's deletionVector descriptor to its sorted
    deleted-row positions (delta.io PROTOCOL.md "Deletion Vectors"):
    storageType `i` = inline z85 bitmap, `u` = UUID-named file under the
    table root (optional random prefix), `p` = absolute path."""
    import uuid as _u

    from ballista_spark.sources.dvbitmap import (
        decode_rbm_array,
        unpack_dv_blob,
        z85_decode,
    )

    st = dv.get("storageType")
    size = int(dv.get("sizeInBytes") or 0)
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        positions = decode_rbm_array(data[:size] if size else data)
    elif st in ("u", "p"):
        if st == "u":
            enc = dv["pathOrInlineDv"]
            prefix, enc_uuid = enc[:-20], enc[-20:]
            name = f"deletion_vector_{_u.UUID(bytes=z85_decode(enc_uuid))}.bin"
            parts = [table_path.rstrip("/")]
            if prefix.strip("/"):
                parts.append(prefix.strip("/"))
            path = "/".join(parts + [name])
        else:
            path = dv["pathOrInlineDv"]
            if path.startswith("file:"):
                path = path[5:]
                while path.startswith("//"):
                    path = path[1:]
        blob = fsio.read_bytes(path)
        if blob[:1] != b"\x01":
            raise DeltaProtocolError(
                f"DV file {path!r} has format version {blob[:1]!r} "
                "(this reader implements version 1)"
            )
        # PROTOCOL.md marks offset optional; absent means the single
        # vector starts right after the version byte (offset 1)
        positions = unpack_dv_blob(blob, int(dv.get("offset") or 1), size)
    else:
        raise DeltaProtocolError(f"unknown DV storageType {st!r}")
    card = dv.get("cardinality")
    if card is not None and int(card) != len(positions):
        raise DeltaProtocolError(
            f"DV cardinality mismatch: descriptor {card}, "
            f"bitmap {len(positions)}"
        )
    return positions


#: LOCAL tables whose descriptors declare at most this many total
#: deleted positions decode tombstones on the driver (one Arrow batch,
#: no job).  Measured warm on this box (read+count of a 1-DV table):
#: 2k positions 0.46 s driver vs 0.67 s executor; 20k ~equal (0.78 vs
#: 0.83); 100k the executor pass WINS (1.28 vs 1.02 — the pure-Python
#: bitmap decode dominates and parallelizes).  Above the threshold, or
#: on any non-local table, decode runs EXECUTOR-SIDE: the driver ships
#: only the (file, descriptor) list — file-count rows — and one
#: mapInPandas pass decodes each file's bitmap where the anti-join
#: consumes it.  Driver memory never holds decoded positions (the
#: round-8 weak item: a 100 TB table with 1% DV-deleted rows would
#: otherwise materialize billions of int64s on the driver; measured:
#: a 2.5M-position lifecycle adds 27 MB to driver maxrss on DELETE —
#: the compressed per-file segments — and 0 MB on read).
DV_DRIVER_DECODE_MAX = 20_000
#: test hook: force the executor path regardless of size/locality
DV_DECODE_FORCE_EXECUTOR = False

#: positions per yielded Arrow batch in the executor decode (bounds a
#: batch to ~30 MB even for pathological path lengths)
_DV_DECODE_CHUNK = 1 << 18


def _dv_tombstones(spark: SparkSession, snap: DeltaSnapshot):
    """(file path, row position) tombstone DataFrame for every live
    file carrying a deletion vector, or None.  The scan applies it as a
    single anti-join — the Iceberg position-delete pattern, never a
    per-row Python filter.  Decode placement is size-aware (see
    DV_DRIVER_DECODE_MAX): small local vectors decode on the driver,
    everything else decodes executor-side so driver memory stays
    O(file count), not O(deleted rows)."""
    dv_files = [f for f in snap.files if f.deletion_vector]
    if not dv_files:
        return None
    # DECODED spelling on this side (rel paths come unquoted out of
    # _normalize_rel); the scan side url_decodes _metadata.file_path to
    # match.  file: URIs strip before abspath (abspath('file:///x')
    # would prepend the cwd — review finding).
    tp = snap.table_path
    if tp.startswith("file:"):
        tp = tp[5:]
        while tp.startswith("//"):
            tp = tp[1:]
    root = os.path.abspath(tp) if fsio.is_local(tp) else tp.rstrip("/")
    cards = [
        int(f.deletion_vector.get("cardinality") or 0) for f in dv_files
    ]
    # a descriptor WITHOUT cardinality could hide an arbitrarily large
    # vector — unknown sizes always take the executor path (the Iceberg
    # twin applies the same rule)
    cardinality_known = all(c > 0 for c in cards)
    if (
        cardinality_known
        and sum(cards) <= DV_DRIVER_DECODE_MAX
        and fsio.is_local(snap.table_path)
        and not DV_DECODE_FORCE_EXECUTOR
    ):
        import pandas as pd

        frames = []
        for f in dv_files:
            pos = _dv_positions(snap.table_path, f.deletion_vector)
            frames.append(
                pd.DataFrame(
                    {
                        "__dfp": f"{root}/{f.path}",
                        "__pos": pd.Series(pos, dtype="int64"),
                    }
                )
            )
        return spark.createDataFrame(
            pd.concat(frames, ignore_index=True),
            schema="__dfp string, __pos long",
        )

    table_path = snap.table_path
    entries = [
        (f"{root}/{f.path}", json.dumps(f.deletion_vector)) for f in dv_files
    ]

    def _decode(batches):
        import numpy as np
        import pandas as pd

        from ballista_spark.sources.deltalog import _dv_positions

        for pdf in batches:
            for dfp, dvj in zip(pdf["__dfp"], pdf["__dv"]):
                pos = np.asarray(
                    _dv_positions(table_path, json.loads(dvj)), dtype="int64"
                )
                for i in range(0, max(len(pos), 1), _DV_DECODE_CHUNK):
                    chunk = pos[i : i + _DV_DECODE_CHUNK]
                    yield pd.DataFrame(
                        {
                            "__dfp": np.repeat(dfp, len(chunk)),
                            "__pos": chunk,
                        }
                    )

    desc_df = spark.createDataFrame(entries, "__dfp string, __dv string")
    n_part = max(
        1, min(len(entries), spark.sparkContext.defaultParallelism)
    )
    return desc_df.repartition(n_part).mapInPandas(
        _decode, "__dfp string, __pos long"
    )


def _is_hive_layout(snap: DeltaSnapshot) -> bool:
    if not snap.partition_columns:
        return True
    for f in snap.files:
        parts = f.path.split("/")
        for col in snap.partition_columns:
            # column-mapped tables name partition DIRECTORIES physically
            dcol = snap.column_mapping.get(col, col)
            want = (
                f"{dcol}=__HIVE_DEFAULT_PARTITION__"
                if f.partition_values.get(col) in (None, "")
                else None
            )
            if not any(
                p.startswith(f"{dcol}=") and (want is None or p == want)
                for p in parts[:-1]
            ):
                return False
    return True


def read_delta_table(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    filters: list[tuple[str, str, object]] | None = None,
) -> DataFrame:
    """The Delta table at ``version`` as a DataFrame.

    ``filters`` — [(col, op, value)] with op in ``= != < <= > >= is_null``
    — drive DRIVER-SIDE file skipping against the log's per-file
    min/max stats and partition values (proof-based: a file is skipped
    only when its stats prove no row matches).  They are advisory for
    pruning only — apply the real ``.where`` on the result too; Catalyst
    then additionally pushes it into the parquet scan for row-group
    skipping inside the surviving files.
    """
    snap = read_delta_snapshot(table_path, version)
    if filters:
        snap = _prune_files(snap, list(filters))
    return _scan_snapshot(spark, snap)


def _scan_snapshot(
    spark: SparkSession,
    snap: DeltaSnapshot,
    file_col: str | None = None,
    pos_col: str | None = None,
) -> DataFrame:
    """Scan the snapshot; ``file_col`` / ``pos_col`` optionally carry
    each row's source-file URI and physical row position captured AT
    THE SCAN STAGE (``_metadata`` — unlike ``input_file_name()`` they
    survive any shuffle the DV anti-join introduces downstream)."""
    data_fields = [
        fld for fld in snap.schema.fields if fld.name not in snap.partition_columns
    ]
    part_fields = {
        fld.name: fld for fld in snap.schema.fields
        if fld.name in snap.partition_columns
    }
    cm = snap.column_mapping

    def _phys_struct(fields):
        # column-mapped tables store PHYSICAL names in the parquet files;
        # read under those, then alias back to logical below
        return T.StructType(
            [
                T.StructField(cm.get(f.name, f.name), f.dataType, f.nullable)
                for f in fields
            ]
        )

    def _to_logical(df):
        if not cm:
            return df
        # atomic select (see _stage_data_files: sequential renames
        # collide when the two namespaces overlap after RENAME+re-ADD)
        to_logical = {p: l for l, p in cm.items()}
        return df.select(
            *[df[c].alias(to_logical.get(c, c)) for c in df.columns]
        )

    if not snap.files:
        extra = [
            T.StructField(c, t)
            for c, t in ((file_col, T.StringType()), (pos_col, T.LongType()))
            if c
        ]
        return spark.createDataFrame(
            [], T.StructType(list(snap.schema.fields) + extra)
        )

    tomb = _dv_tombstones(spark, snap)

    def _tag(scan_df):
        """Capture the per-row source file / position AT THE SCAN STAGE
        when the caller asked for them (probes, DV-delete): after any
        shuffle downstream, neither input_file_name() nor _metadata
        resolves."""
        if file_col:
            scan_df = scan_df.withColumn(
                file_col, F.col("_metadata.file_path")
            )
        if pos_col:
            scan_df = scan_df.withColumn(
                pos_col, F.col("_metadata.row_index")
            )
        return scan_df

    def _strip_deleted(scan_df):
        """Anti-join DV tombstones on (file, row position) — applied on
        the scan stage while `_metadata` is still resolvable.  The scan
        side DECODES the percent-encoded file URI (literal '+' is
        pre-escaped so url_decode cannot turn it into a space) because
        the tombstone side is built from the log's DECODED relative
        paths."""
        if tomb is None:
            return scan_df
        tagged = scan_df.withColumns(
            {
                "__dfp": F.url_decode(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.col("_metadata.file_path"), "^file:/*", "/"
                        ),
                        r"\+",
                        "%2B",
                    )
                ),
                "__pos": F.col("_metadata.row_index"),
            }
        )
        return tagged.join(tomb, ["__dfp", "__pos"], "left_anti").drop(
            "__dfp", "__pos"
        )

    out_fields = [fld.name for fld in snap.schema.fields] + [
        c for c in (file_col, pos_col) if c
    ]
    if _is_hive_layout(snap):
        reader = spark.read
        if snap.partition_columns:
            reader = reader.option("basePath", snap.table_path)
        df = _strip_deleted(
            _tag(
                _to_logical(
                    reader.schema(_phys_struct(data_fields)).parquet(
                        *snap.file_paths()
                    )
                )
            )
        )
        for col in snap.partition_columns:
            df = df.withColumn(
                col, F.col(col).cast(part_fields[col].dataType)
            )
        return df.select(out_fields)
    # non-hive layout: one read per distinct partition tuple + union —
    # correct but one scan node per partition value; warn at width
    groups: dict[tuple, list[str]] = {}
    for f in snap.files:
        key = tuple(f.partition_values.get(c) for c in snap.partition_columns)
        groups.setdefault(key, []).append(os.path.join(snap.table_path, f.path))
    if len(groups) > 64:
        import warnings

        warnings.warn(
            f"non-hive Delta layout with {len(groups)} partition values "
            "unions one scan per value — rewrite the table hive-style "
            "(compact_delta_table does) for a single-scan plan",
            stacklevel=2,
        )
    out = None
    for key, paths in groups.items():
        part = _strip_deleted(
            _tag(
                _to_logical(
                    spark.read.schema(_phys_struct(data_fields)).parquet(*paths)
                )
            )
        )
        for col, val in zip(snap.partition_columns, key):
            lit = (
                F.lit(None) if val in (None, "")
                else F.lit(val)
            ).cast(part_fields[col].dataType)
            part = part.withColumn(col, lit)
        part = part.select(out_fields)
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# writing


def _file_stats_json(path: str, stat_cols: list[str]) -> tuple[str, int]:
    """(stats JSON, numRecords) from a parquet footer — row-group min/max
    aggregated per column.  Footer-only: no data pages are read.
    Worker-safe (fsio-routed): the distributed stats pass calls this on
    executors."""
    import pyarrow.parquet as pq

    with fsio.open_input(path) as src:
        md = pq.ParquetFile(src).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, int] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if name not in stat_cols:
                continue
            st = c.statistics
            if st is None:
                continue
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + int(st.null_count)
            if st.has_min_max:
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        continue
                if hasattr(mn, "isoformat"):
                    mn, mx = mn.isoformat(), mx.isoformat()
                if not isinstance(mn, (int, float, str, bool)):
                    continue
                mins[name] = mn if name not in mins else min(mins[name], mn)
                maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    stats = {
        "numRecords": md.num_rows,
        "minValues": mins,
        "maxValues": maxs,
        "nullCount": nulls,
    }
    return json.dumps(stats), md.num_rows


def _attempt_commit(table_path: str, version: int, actions: list[dict]) -> None:
    # exclusive create IS the commit: one winner per version (atomic on
    # local FS; check-then-write + documented LogStore caveat on object
    # stores — see fsio.create_exclusive)
    body = "".join(
        json.dumps(a, separators=(",", ":")) + "\n" for a in actions
    )
    fsio.create_exclusive(
        _commit_path(table_path, version), body.encode("utf-8")
    )


def _now_ms() -> int:
    import time

    return int(time.time() * 1000)


#: NON-LOCAL commits staging at least this many files collect footer
#: stats executor-side (one mapInPandas job).  Local paths always use
#: the driver loop: measured on this box, 1,000 local footer reads take
#: 0.15 s serially vs 4.5 s of Spark job overhead — the distributed
#: pass only wins where each footer read is a ~10-100 ms object-store
#: GET (10k files = minutes serial, seconds distributed).
EXECUTOR_STATS_MIN_FILES = 64
#: test hook: force the executor path on local paths too
EXECUTOR_STATS_FORCE = False


def _collect_file_stats(
    spark: SparkSession | None,
    base: str,
    rels: list[str],
    stat_cols: list[str],
) -> dict[str, tuple[str, int]]:
    """rel path -> (stats JSON, numRecords) for every staged file.

    Local/small commits loop on the driver; large object-store commits
    distribute the footer reads as ONE Arrow-batched ``mapInPandas``
    pass over the path list (a 10k-file initial load reads 10k footers
    across the cluster, not serially on the driver — the round-7
    scale-killer)."""
    if (
        spark is None
        or len(rels) < EXECUTOR_STATS_MIN_FILES
        or (fsio.is_local(base) and not EXECUTOR_STATS_FORCE)
    ):
        return {r: _file_stats_json(f"{base}/{r}", stat_cols) for r in rels}

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            recs = [
                (r, *_file_stats_json(f"{base}/{r}", stat_cols))
                for r in pdf["rel"]
            ]
            yield pd.DataFrame(
                recs, columns=["rel", "stats", "num_records"]
            )

    paths_df = spark.createDataFrame(
        [(r,) for r in rels], "rel string"
    ).repartition(min(len(rels), spark.sparkContext.defaultParallelism))
    rows = paths_df.mapInPandas(
        _gen, "rel string, stats string, num_records long"
    ).collect()
    return {r["rel"]: (r["stats"], int(r["num_records"])) for r in rows}


def _stage_data_files(
    df: DataFrame,
    table_path: str,
    partition_by: list[str],
    data_change: bool = True,
    column_mapping: Mapping[str, str] | None = None,
) -> list[dict]:
    """Write ``df`` via Spark into a staging dir, move the parquet files
    into the table root (keeping hive partition subdirs), and return the
    ready-to-commit ``add`` actions with footer-derived stats.  Zero-row
    task outputs are dropped, never added.  IO is fsio-routed (works on
    object storage) and stats collection distributes for large commits
    (``_collect_file_stats``).

    ``column_mapping`` (logical → physical) makes the staged files
    column-mapped-table citizens: parquet columns, hive partition dirs,
    partitionValues keys, and stats keys all carry PHYSICAL names (the
    delta-spark on-disk contract; the snapshot reader remaps them back
    to logical)."""
    from urllib.parse import unquote

    cm = dict(column_mapping or {})
    if cm:
        # ONE atomic select, never sequential renames: after RENAME +
        # re-ADD the logical and physical namespaces overlap (logical
        # 'renamed' -> physical 'a' while logical 'a' -> 'col-xxxx'),
        # and a chain of withColumnRenamed collides midway
        df = df.select(
            *[df[c].alias(cm.get(c, c)) for c in df.columns]
        )
        partition_by = [cm.get(c, c) for c in partition_by]

    staging = f"{table_path.rstrip('/')}/.staging-{uuid.uuid4().hex}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    stat_cols = [
        f.name for f in df.schema.fields if f.name not in set(partition_by)
    ]
    staged = [
        (rel, size)
        for rel, size in fsio.walk_files(staging)
        if rel.endswith(".parquet")
    ]
    stats_by_rel = _collect_file_stats(
        df.sparkSession, staging, [r for r, _ in staged], stat_cols
    )
    adds: list[dict] = []
    for rel, size in staged:
        stats, n_records = stats_by_rel[rel]
        if n_records == 0:
            continue  # empty task output — never added, swept with staging
        part_values = {}
        for seg in rel.split("/")[:-1]:
            k, _, v = seg.partition("=")
            part_values[k] = (
                None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
            )
        fsio.move(f"{staging}/{rel}", f"{table_path.rstrip('/')}/{rel}")
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {
                        k: ("" if v is None else v)
                        for k, v in part_values.items()
                    },
                    "size": size,
                    "modificationTime": _now_ms(),
                    "dataChange": data_change,
                    "stats": stats,
                }
            }
        )
    fsio.remove_dir(staging)
    return adds


def write_delta_table(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    checkpoint_interval: int = 10,
    max_retries: int = 10,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int | None:
    """Write ``df`` as a Delta commit; returns the committed version.

    Data files are written by Spark (full parallelism, hive-style
    partition dirs) into a staging dir, moved into the table, then the
    commit JSON is published with exclusive-create — readers see either
    the old snapshot or the new one, never a torn state.  ``mode``:
    ``append`` adds files; ``overwrite`` also removes the previous
    snapshot's files (logically — data files stay for time travel until
    a vacuum).  A lost commit race re-reads the log and retries with the
    next version (append) or fails cleanly (overwrite, where the removes
    may be stale).

    ``txn_app_id``/``txn_version`` make the commit IDEMPOTENT (the Delta
    ``txn`` action): a version already recorded for the app id is
    skipped and None returned — replaying a streaming micro-batch after
    a failure cannot double-append.  A skip detected after the data
    files were staged leaves orphans; :func:`vacuum_delta_table` reaps
    them (never referenced by any commit, so they are invisible to
    readers either way).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version go together")
    prior = (
        read_delta_snapshot(table_path)
        if _list_log_versions(table_path)
        else None
    )
    if partition_by is None and prior is not None:
        # not specified: inherit the table's partitioning (the common
        # append case — a caller shouldn't have to restate it)
        partition_by = prior.partition_columns
    partition_by = list(partition_by or [])
    fsio.mkdirs(table_path)
    if txn_app_id is not None and prior is not None:
        committed = prior.app_versions.get(txn_app_id)
        if committed is not None and committed >= int(txn_version):
            return None  # replay of an already-committed batch

    adds = _stage_data_files(
        df,
        table_path,
        partition_by,
        column_mapping=prior.column_mapping if prior else None,
    )

    schema_json = df.schema.json()
    for attempt in range(max_retries):
        versions = _list_log_versions(table_path)
        next_version = (versions[-1] + 1) if versions else 0
        if txn_app_id is not None and attempt > 0 and versions:
            # we lost a race — the winner may have been our own replay
            committed = read_delta_snapshot(table_path).app_versions.get(
                txn_app_id
            )
            if committed is not None and committed >= int(txn_version):
                return None
        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": _now_ms(),
                    "operation": "WRITE",
                    "operationParameters": {"mode": mode.upper()},
                }
            }
        ]
        if next_version == 0:
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": MAX_WRITER_VERSION,
                    }
                }
            )
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_json,
                        "partitionColumns": partition_by,
                        "configuration": {},
                        "createdTime": _now_ms(),
                    }
                }
            )
        else:
            prev = read_delta_snapshot(table_path)
            _check_writer_protocol(
                prev,
                "WRITE",
                adds_rows=True,
                removes_rows=(mode == "overwrite"),
            )
            # compare names + types; nullability differences (literal
            # columns are non-nullable) don't constitute schema change
            shape = lambda sch: [(f.name, f.dataType) for f in sch.fields]  # noqa: E731
            if shape(prev.schema) != shape(df.schema) or (
                prev.partition_columns != partition_by
            ):
                if mode != "overwrite":
                    raise ValueError(
                        "schema/partitioning mismatch with existing table "
                        "(append requires identical schema; use overwrite)"
                    )
                if prev.column_mapping:
                    raise DeltaProtocolError(
                        "overwrite with a schema/partitioning change on a "
                        "column-mapped table would replace metaData and "
                        "drop the mapping — ALTER the schema first, then "
                        "overwrite with the matching shape"
                    )
                actions.append(
                    {
                        "metaData": {
                            # overwrite replaces data, not table identity
                            "id": prev.table_id or str(uuid.uuid4()),
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": schema_json,
                            "partitionColumns": partition_by,
                            "configuration": {},
                            "createdTime": _now_ms(),
                        }
                    }
                )
            if mode == "overwrite":
                ts = _now_ms()
                for old in prev.files:
                    actions.append(
                        {
                            "remove": {
                                "path": old.path,
                                "deletionTimestamp": ts,
                                "dataChange": True,
                            }
                        }
                    )
        if txn_app_id is not None:
            actions.append(
                {
                    "txn": {
                        "appId": txn_app_id,
                        "version": int(txn_version),
                        "lastUpdated": _now_ms(),
                    }
                }
            )
        actions.extend(adds)
        try:
            _attempt_commit(table_path, next_version, actions)
        except FileExistsError:
            continue  # lost the race: recompute against the new log tail
        if checkpoint_interval and next_version > 0 and (
            next_version % checkpoint_interval == 0
        ):
            _write_checkpoint(table_path, next_version)
        return next_version
    raise DeltaConcurrentCommitError(
        f"lost the commit race {max_retries} times at {table_path!r}"
    )


def alter_delta_table(
    table_path: str,
    add_columns: Mapping[str, str] | None = None,
    drop_columns: list[str] | None = None,
) -> int:
    """Schema evolution as a METADATA-ONLY commit (zero data I/O):
    ``add_columns`` maps new column name → Spark type string (added
    nullable — old files read them as NULL, the Delta contract);
    ``drop_columns`` removes columns from the schema (old files' extra
    physical columns are simply not projected).  Renames are
    deliberately NOT offered: without per-column id metadata in the
    parquet files a rename cannot re-bind old data, and
    add-then-backfill-then-drop expresses the safe version of it.
    Returns the commit version; time travel before it sees the old
    schema (the snapshot replays the metaData action history)."""
    add_columns = dict(add_columns or {})
    drop_columns = list(drop_columns or [])
    if not add_columns and not drop_columns:
        raise ValueError("ALTER needs add_columns and/or drop_columns")
    for _attempt in range(10):
        result = _alter_once(table_path, add_columns, drop_columns)
        if result is not None:
            return result
    raise DeltaConcurrentCommitError("lost the commit race 10 times")


def _alter_once(
    table_path: str, add_columns: dict, drop_columns: list[str]
) -> int | None:
    """One ALTER attempt built against the LIVE snapshot (so a raced
    concurrent ALTER's schema is never clobbered); None = lost the
    commit race, recompute and retry."""
    snap = read_delta_snapshot(table_path)
    _check_writer_protocol(snap, "ALTER")
    mapped = snap.configuration.get("delta.columnMapping.mode") in (
        "name", "id"
    )
    names = {f.name for f in snap.schema.fields}
    dropped = set(json.loads(
        snap.configuration.get("ballista.droppedColumns", "[]")
    ))
    for c in add_columns:
        if c in names:
            raise ValueError(f"column {c!r} already exists")
        if c in dropped and not mapped:
            # the unmapped reader projects parquet by NAME: re-adding a
            # dropped name would RESURRECT the old physical data in
            # pre-drop files (the reason delta-spark gates DROP behind
            # column mapping).  Rewrite the files first, then the name
            # frees up.  Mapped tables are immune: a re-added name gets
            # a FRESH physical name, so old file data stays invisible.
            raise ValueError(
                f"column {c!r} was previously dropped and its name is "
                "retired; re-adding it would resurrect old file data. "
                "Use a new name (the Iceberg field-id discipline, "
                "spelled in names), or enable_column_mapping() first"
            )
    for c in drop_columns:
        if c not in names:
            raise ValueError(f"column {c!r} does not exist")
        if c in snap.partition_columns:
            raise ValueError(f"cannot drop partition column {c!r}")
        if c in add_columns:
            raise ValueError(f"column {c!r} both added and dropped")
    fields = [
        f for f in snap.schema.fields if f.name not in set(drop_columns)
    ]
    config = dict(snap.configuration)
    if mapped:
        # new columns join the mapping: fresh id (never reused) + a
        # fresh physical name, delta-spark's col-<uuid> convention
        max_id = max(
            [int(config.get("delta.columnMapping.maxColumnId", 0))]
            + [
                int((f.metadata or {}).get("delta.columnMapping.id", 0))
                for f in snap.schema.fields
            ]
        )
        for c, t in add_columns.items():
            max_id += 1
            fields.append(
                T.StructField(
                    c,
                    T._parse_datatype_string(t),  # noqa: SLF001
                    True,
                    metadata={
                        "delta.columnMapping.id": max_id,
                        "delta.columnMapping.physicalName": (
                            f"col-{uuid.uuid4().hex[:16]}"
                        ),
                    },
                )
            )
        config["delta.columnMapping.maxColumnId"] = str(max_id)
    else:
        fields += [
            T.StructField(c, T._parse_datatype_string(t), True)  # noqa: SLF001
            for c, t in add_columns.items()
        ]
        config["ballista.droppedColumns"] = json.dumps(
            sorted(dropped | set(drop_columns))
        )
    if not fields:
        raise ValueError("cannot drop every column")
    new_schema = T.StructType(fields)
    actions = [
        {
            "commitInfo": {
                "timestamp": _now_ms(),
                "operation": "ALTER TABLE",
                "operationParameters": {
                    "added": json.dumps(add_columns),
                    "dropped": json.dumps(drop_columns),
                },
            }
        },
        {
            "metaData": {
                "id": snap.table_id or str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": new_schema.json(),
                "partitionColumns": snap.partition_columns,
                "configuration": config,
                "createdTime": _now_ms(),
            }
        },
    ]
    versions = _list_log_versions(table_path)
    try:
        _attempt_commit(table_path, versions[-1] + 1, actions)
        return versions[-1] + 1
    except FileExistsError:
        return None


def enable_column_mapping(table_path: str) -> int | None:
    """Turn on column mapping (``delta.columnMapping.mode = name``) as
    a METADATA-ONLY commit; returns the commit version, or None when
    the table is already mapped.

    Every EXISTING column keeps its current name as its physical name
    — so every already-written parquet file still resolves — and gets
    a stable column id (delta-spark does exactly this on ``ALTER TABLE
    SET TBLPROPERTIES ('delta.columnMapping.mode'='name')``).  Columns
    added later get fresh ``col-<uuid>`` physical names, which is what
    makes RENAME/re-add safe afterwards.  The protocol upgrades to the
    mapping's requirement: legacy (2, 5), or feature lists on tables
    already at reader 3 / writer 7 (implied legacy features
    enumerated, per the table-features spec).  Mapping cannot be
    DISABLED once on (protocol rule) — there is deliberately no
    inverse."""
    for _attempt in range(10):
        snap = read_delta_snapshot(table_path)
        _check_writer_protocol(snap, "ALTER")
        if snap.configuration.get("delta.columnMapping.mode") in (
            "name", "id"
        ):
            return None
        fields = []
        for i, f in enumerate(snap.schema.fields, 1):
            md = dict(f.metadata or {})
            md["delta.columnMapping.id"] = i
            md["delta.columnMapping.physicalName"] = f.name
            fields.append(
                T.StructField(f.name, f.dataType, f.nullable, metadata=md)
            )
        config = dict(snap.configuration)
        config["delta.columnMapping.mode"] = "name"
        config["delta.columnMapping.maxColumnId"] = str(len(fields))
        proto = dict(
            snap.protocol
            or {"minReaderVersion": 1, "minWriterVersion": MAX_WRITER_VERSION}
        )
        mrv = int(proto.get("minReaderVersion", 1))
        mwv = int(proto.get("minWriterVersion", 1))
        if mwv == 7 or mrv >= 3:
            rf = set(proto.get("readerFeatures") or [])
            wf = set(proto.get("writerFeatures") or [])
            rf |= _LEGACY_READER_FEATURES.get(mrv, frozenset())
            wf |= _LEGACY_WRITER_FEATURES.get(mwv, frozenset())
            new_proto = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(rf | {"columnMapping"}),
                "writerFeatures": sorted(wf | {"columnMapping"}),
            }
        else:
            new_proto = {
                "minReaderVersion": max(mrv, 2),
                "minWriterVersion": max(mwv, 5),
            }
        actions = [
            {
                "commitInfo": {
                    "timestamp": _now_ms(),
                    "operation": "SET TBLPROPERTIES",
                    "operationParameters": {
                        "properties": json.dumps(
                            {"delta.columnMapping.mode": "name"}
                        )
                    },
                }
            }
        ]
        if new_proto != proto:
            actions.append({"protocol": new_proto})
        actions.append(
            {
                "metaData": {
                    "id": snap.table_id or str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": T.StructType(fields).json(),
                    "partitionColumns": snap.partition_columns,
                    "configuration": config,
                    "createdTime": _now_ms(),
                }
            }
        )
        versions = _list_log_versions(table_path)
        try:
            _attempt_commit(table_path, versions[-1] + 1, actions)
            return versions[-1] + 1
        except FileExistsError:
            continue
    raise DeltaConcurrentCommitError("lost the commit race 10 times")


#: table properties whose semantics ride on a writer feature — SETTING
#: one upgrades the protocol to carry the requirement (legacy
#: minWriterVersion, feature name), exactly as delta-spark does
_PROPERTY_WRITER_REQUIREMENTS = {
    "delta.appendOnly": (2, "appendOnly"),
    "delta.enableChangeDataFeed": (4, "changeDataFeed"),
}


def _protocol_with_writer_requirement(
    proto: dict | None, legacy_version: int, feature: str
) -> dict:
    """The protocol action carrying a new writer requirement: a legacy
    minWriterVersion bump when the table is pre-table-features, or the
    feature added to an enumerated v7 list (implied legacy features
    spelled out, per the spec)."""
    proto = dict(
        proto or {"minReaderVersion": 1, "minWriterVersion": MAX_WRITER_VERSION}
    )
    mrv = int(proto.get("minReaderVersion", 1))
    mwv = int(proto.get("minWriterVersion", 1))
    if mwv == 7:
        wf = set(proto.get("writerFeatures") or [])
        out = dict(proto)
        out["writerFeatures"] = sorted(wf | {feature})
        return out
    if mwv >= legacy_version:
        return proto
    return {"minReaderVersion": mrv, "minWriterVersion": legacy_version}


def set_delta_table_properties(
    table_path: str,
    set_props: Mapping[str, object] | None = None,
    unset: list[str] | None = None,
) -> int:
    """``ALTER TABLE … SET/UNSET TBLPROPERTIES`` as a METADATA-ONLY
    commit: merges ``set_props`` into (and pops ``unset`` from) the
    table's configuration.  Feature-backed properties
    (``delta.appendOnly``, ``delta.enableChangeDataFeed``,
    ``delta.constraints.*``) upgrade the protocol to carry the writer
    requirement, and this engine's own writer-protocol gate then
    honors them (an appendOnly table refuses row removals; a
    CDF-enabled table refuses mutations it cannot produce cdc files
    for).  Column-mapping properties refuse: use
    :func:`enable_column_mapping` (the mode cannot be disabled per the
    protocol).  Returns the commit version."""
    set_props = {k: str(v) for k, v in (set_props or {}).items()}
    unset = list(unset or [])
    if not set_props and not unset:
        raise ValueError("SET/UNSET TBLPROPERTIES needs at least one key")
    for k in list(set_props) + unset:
        if k.startswith("delta.columnMapping"):
            raise ValueError(
                "delta.columnMapping.* cannot be set directly — use "
                "enable_column_mapping() (and mapping cannot be "
                "disabled once on, per the protocol)"
            )
    for _attempt in range(10):
        snap = read_delta_snapshot(table_path)
        _check_writer_protocol(snap, "ALTER")
        config = dict(snap.configuration)
        for k in unset:
            config.pop(k, None)
        config.update(set_props)
        proto = dict(snap.protocol or {})
        new_proto = dict(proto) if proto else None
        for k in set_props:
            req = _PROPERTY_WRITER_REQUIREMENTS.get(k)
            if req is None and k.startswith("delta.constraints."):
                req = (3, "checkConstraints")
            if req is not None:
                new_proto = _protocol_with_writer_requirement(
                    new_proto if new_proto else proto, *req
                )
        actions = [
            {
                "commitInfo": {
                    "timestamp": _now_ms(),
                    "operation": "SET TBLPROPERTIES",
                    "operationParameters": {
                        "properties": json.dumps(set_props),
                        "unset": json.dumps(unset),
                    },
                }
            }
        ]
        if new_proto and new_proto != proto:
            actions.append({"protocol": new_proto})
        actions.append(
            {
                "metaData": {
                    "id": snap.table_id or str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": snap.schema.json(),
                    "partitionColumns": snap.partition_columns,
                    "configuration": config,
                    "createdTime": _now_ms(),
                }
            }
        )
        versions = _list_log_versions(table_path)
        try:
            _attempt_commit(table_path, versions[-1] + 1, actions)
            return versions[-1] + 1
        except FileExistsError:
            continue
    raise DeltaConcurrentCommitError("lost the commit race 10 times")


def rename_delta_column(table_path: str, old: str, new: str) -> int:
    """``ALTER TABLE … RENAME COLUMN old TO new`` as a METADATA-ONLY
    commit (zero data I/O): only the LOGICAL name in the schema
    changes; the physical name bound into every parquet file stays
    put, which is why delta-spark gates renames behind column mapping.
    Auto-enables mapping (one extra metadata commit) on an unmapped
    table.  Time travel before the rename replays the old metaData and
    sees the old name.  Returns the rename's commit version."""
    if old == new:
        raise ValueError("rename to the same name is a no-op")
    for _attempt in range(10):
        snap = read_delta_snapshot(table_path)
        _check_writer_protocol(snap, "ALTER")
        if snap.configuration.get("delta.columnMapping.mode") not in (
            "name", "id"
        ):
            enable_column_mapping(table_path)
            snap = read_delta_snapshot(table_path)
        names = [f.name for f in snap.schema.fields]
        if old not in names:
            raise ValueError(f"column {old!r} does not exist")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        fields = [
            T.StructField(
                new if f.name == old else f.name,
                f.dataType,
                f.nullable,
                metadata=dict(f.metadata or {}),
            )
            for f in snap.schema.fields
        ]
        actions = [
            {
                "commitInfo": {
                    "timestamp": _now_ms(),
                    "operation": "RENAME COLUMN",
                    "operationParameters": {"from": old, "to": new},
                }
            },
            {
                "metaData": {
                    "id": snap.table_id or str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": T.StructType(fields).json(),
                    "partitionColumns": [
                        new if c == old else c for c in snap.partition_columns
                    ],
                    "configuration": dict(snap.configuration),
                    "createdTime": _now_ms(),
                }
            },
        ]
        versions = _list_log_versions(table_path)
        try:
            _attempt_commit(table_path, versions[-1] + 1, actions)
            return versions[-1] + 1
        except FileExistsError:
            continue
    raise DeltaConcurrentCommitError("lost the commit race 10 times")


def _write_checkpoint(table_path: str, version: int) -> None:
    """Compact the log state at ``version`` into one checkpoint parquet
    (+ ``_last_checkpoint``): snapshot reads then start there instead of
    replaying history."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    snap = read_delta_snapshot(table_path, version)
    blank = {"protocol": None, "metaData": None, "add": None, "txn": None}
    # republish the table's ACTUAL protocol: writing a default here
    # would downgrade a v3 (columnMapping/deletionVectors) table's
    # declared requirements for every reader starting at the checkpoint
    proto = snap.protocol or {
        "minReaderVersion": 1,
        "minWriterVersion": MAX_WRITER_VERSION,
    }
    rows = [
        {
            **blank,
            "protocol": {
                "minReaderVersion": int(proto.get("minReaderVersion", 1)),
                "minWriterVersion": int(
                    proto.get("minWriterVersion", MAX_WRITER_VERSION)
                ),
                "readerFeatures": proto.get("readerFeatures"),
                "writerFeatures": proto.get("writerFeatures"),
            },
        },
        {
            **blank,
            "metaData": {
                "id": snap.table_id or str(uuid.uuid4()),
                "schemaString": snap.schema.json(),
                "partitionColumns": snap.partition_columns,
                # configuration must survive checkpointing: the ALTER
                # layer's retired-name guard lives here
                "configuration": list(snap.configuration.items()),
            },
        },
    ]
    for app, ver in sorted(snap.app_versions.items()):
        rows.append({**blank, "txn": {"appId": app, "version": ver}})
    for f in snap.files:
        dv = None
        if f.deletion_vector:
            # untouched files keep their DVs across a checkpoint —
            # dropping the descriptor here would resurrect deleted rows
            # for every reader starting at the checkpoint
            d = f.deletion_vector
            dv = {
                "storageType": d.get("storageType"),
                "pathOrInlineDv": d.get("pathOrInlineDv"),
                "offset": d.get("offset"),
                "sizeInBytes": d.get("sizeInBytes"),
                "cardinality": d.get("cardinality"),
            }
        rows.append(
            {
                **blank,
                "add": {
                    "path": f.path,
                    # the on-disk contract: PHYSICAL keys on mapped tables
                    "partitionValues": _physical_partition_values(
                        f.partition_values, snap.column_mapping
                    ),
                    "size": f.size,
                    "modificationTime": _now_ms(),
                    "dataChange": False,
                    "stats": _physical_stats_json(f, snap.column_mapping),
                    "deletionVector": dv,
                },
            }
        )
    schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()),
                     ("minWriterVersion", pa.int32()),
                     ("readerFeatures", pa.list_(pa.string())),
                     ("writerFeatures", pa.list_(pa.string()))]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("deletionVector", pa.struct(
                            [
                                ("storageType", pa.string()),
                                ("pathOrInlineDv", pa.string()),
                                ("offset", pa.int32()),
                                ("sizeInBytes", pa.int32()),
                                ("cardinality", pa.int64()),
                            ]
                        )),
                    ]
                ),
            ),
            pa.field(
                "txn",
                pa.struct([("appId", pa.string()), ("version", pa.int64())]),
            ),
        ]
    )
    for r in rows:
        if r["add"] is not None:
            r["add"]["partitionValues"] = list(r["add"]["partitionValues"].items())
    table = pa.Table.from_pylist(rows, schema=schema)
    cp_path = _checkpoint_paths(table_path, version, None)[0]
    with fsio.open_output(cp_path) as sink:
        pq.write_table(table, sink)
    fsio.write_text(
        os.path.join(_log_dir(table_path), "_last_checkpoint"),
        json.dumps({"version": version, "size": len(rows)}),
    )


# ---------------------------------------------------------------------------
# compaction


def plan_compaction_bins(
    sizes: list[int], target_bytes: int
) -> list[list[int]]:
    """First-fit-decreasing bin packing of file indices into rewrite
    groups ≤ target_bytes (singletons already ≥ target stay untouched —
    returned as no bin at all).  Pure function; the unit the compactor
    tests against."""
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    bins: list[tuple[int, list[int]]] = []  # (remaining, members)
    for i in order:
        s = sizes[i]
        if s >= target_bytes:
            continue  # already big enough — leave in place
        for bi, (rem, members) in enumerate(bins):
            if s <= rem:
                bins[bi] = (rem - s, members + [i])
                break
        else:
            bins.append((target_bytes - s, [i]))
    # a bin with one small file and nothing merged in is a no-op rewrite
    return [members for _rem, members in bins if len(members) > 1]


def compact_delta_table(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> int | None:
    """Transactional small-file compaction: per partition, bin-pack live
    files under ``target_file_bytes`` and rewrite each bin as one file,
    committing remove+add atomically (``dataChange: false`` rewrites —
    the table's rows are unchanged, so concurrent readers at any version
    stay correct).  Returns the committed version, or None when nothing
    needed compacting.

    ``cluster_by`` switches to CLUSTERED rewrite (the OPTIMIZE ZORDER
    analogue): each partition's live files are rewritten as
    range-partitioned, sorted files on the given columns, so every
    output file covers a narrow value range and the log's per-file
    min/max stats become selective — stats-based file skipping on those
    columns then prunes most of the table.  For multi-dimensional
    locality pass a ``zorder_column`` (``operators/partitioning.py``)
    materialized as a column and cluster on it.

    This is the operational answer to the classic 100 TB failure mode:
    streaming/append pipelines produce millions of KB-sized files whose
    per-file task overhead dwarfs the data.  Compaction restores
    ~target-sized scan units without blocking writers (optimistic
    commit) or readers (old files stay until vacuum).
    """
    snap = read_delta_snapshot(table_path)
    _check_writer_protocol(snap, "OPTIMIZE")
    cm = snap.column_mapping
    by_part: dict[tuple, list[_AddFile]] = {}
    for f in snap.files:
        key = tuple(
            (c, f.partition_values.get(c, "")) for c in snap.partition_columns
        )
        by_part.setdefault(key, []).append(f)

    removes: list[_AddFile] = []
    adds: list[dict] = []
    data_fields = [
        fld for fld in snap.schema.fields
        if fld.name not in snap.partition_columns
    ]
    # column-mapped tables stage/name everything physically (dirs,
    # parquet columns, stats keys, partitionValues) — the reader remaps
    stat_cols = [cm.get(fld.name, fld.name) for fld in data_fields]

    def _rewrite(group: list[_AddFile], key: tuple, shaped) -> None:
        """Write `shaped` (already coalesced/range-partitioned), move its
        files into the partition dir, queue remove+add actions."""
        part_dir = "/".join(
            f"{cm.get(c, c)}="
            f"{'__HIVE_DEFAULT_PARTITION__' if v in (None, '') else v}"
            for c, v in key
        )
        if cm:
            shaped = shaped.select(
                *[shaped[c].alias(cm.get(c, c)) for c in shaped.columns]
            )
        out_dir = f"{table_path.rstrip('/')}/.compact-{uuid.uuid4().hex}"
        shaped.write.mode("overwrite").parquet(out_dir)
        written = sorted(
            (rel, size)
            for rel, size in fsio.walk_files(out_dir)
            if rel.endswith(".parquet")
        )
        stats_by_rel = _collect_file_stats(
            spark, out_dir, [r for r, _ in written], stat_cols
        )
        for name, size in written:
            stats, n = stats_by_rel[name]
            if n == 0:
                continue  # empty range split — swept with out_dir
            rel = (
                f"{part_dir}/part-compact-{uuid.uuid4().hex}.parquet"
                if part_dir
                else f"part-compact-{uuid.uuid4().hex}.parquet"
            )
            fsio.move(
                f"{out_dir}/{name}", f"{table_path.rstrip('/')}/{rel}"
            )
            adds.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {
                            cm.get(c, c): (v or "") for c, v in key
                        },
                        "size": size,
                        "modificationTime": _now_ms(),
                        "dataChange": False,
                        "stats": stats,
                    }
                }
            )
        fsio.remove_dir(out_dir)
        removes.extend(group)

    def _scan_group(group: list[_AddFile]) -> DataFrame:
        """Group scan through _scan_snapshot so deletion vectors apply:
        a direct parquet read would resurrect DV-deleted rows into the
        compacted file.  The rewrite PURGES the group's DVs (visible
        rows unchanged — dataChange:false stays correct)."""
        return _scan_snapshot(spark, snap.with_files(group)).select(
            [fld.name for fld in data_fields]
        )

    for key, files in by_part.items():
        if cluster_by:
            # clustered rewrite: ALL live files of the partition become
            # n_out range-sorted files (narrow per-file stat ranges)
            total = sum(f.size for f in files)
            n_out = max(1, -(-total // target_file_bytes))
            shaped = (
                _scan_group(files)
                .repartitionByRange(int(n_out), *cluster_by)
                .sortWithinPartitions(*cluster_by)
            )
            _rewrite(files, key, shaped)
            continue
        bins = plan_compaction_bins([f.size for f in files], target_file_bytes)
        for members in bins:
            group = [files[i] for i in members]
            shaped = _scan_group(group).coalesce(1)
            _rewrite(group, key, shaped)
    if not adds:
        return None
    ts = _now_ms()
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": "OPTIMIZE",
                "operationParameters": {
                    "targetSize": str(target_file_bytes)
                },
            }
        }
    ]
    for old in removes:
        actions.append(
            {
                "remove": {
                    "path": old.path,
                    "deletionTimestamp": ts,
                    "dataChange": False,
                }
            }
        )
    actions.extend(adds)
    for _attempt in range(10):
        versions = _list_log_versions(table_path)
        next_version = versions[-1] + 1
        try:
            _attempt_commit(table_path, next_version, actions)
            return next_version
        except FileExistsError:
            # a writer landed mid-compaction; only safe if OUR inputs are
            # all still live (no lost update) — re-check and retry
            live = {f.path for f in read_delta_snapshot(table_path).files}
            if not all(old.path in live for old in removes):
                raise DeltaConcurrentCommitError(
                    "compaction inputs were removed concurrently; rerun"
                ) from None
    raise DeltaConcurrentCommitError("lost the commit race 10 times")


# ---------------------------------------------------------------------------
# vacuum


def vacuum_delta_table(
    table_path: str,
    retention_ms: int = 7 * 24 * 3600 * 1000,
    now: int | None = None,
) -> list[str]:
    """Physically delete data files no longer referenced by the CURRENT
    snapshot whose tombstone (or, for never-committed orphans from
    crashed writers, file mtime) is older than ``retention_ms``.
    Returns the deleted paths (table-relative).

    Semantics match Delta's VACUUM: logical deletes (overwrite,
    compaction) keep old files readable for time travel until vacuum
    reaps them; after a vacuum, versions older than the horizon are no
    longer reconstructable — the retention window is the time-travel
    window.  Driver-side listing; at object-store scale run the walk
    from a manifest instead.
    """
    now = _now_ms() if now is None else int(now)
    horizon = now - int(retention_ms)
    snap = read_delta_snapshot(table_path)
    live = {f.path for f in snap.files}
    deleted: list[str] = []
    for rel, _size in fsio.walk_files(table_path):
        # never touch the log or in-flight staging dirs
        top = rel.split("/", 1)[0]
        if top == "_delta_log" or top.startswith((".staging-", ".compact-")):
            continue
        if not rel.endswith(".parquet") or rel in live:
            continue
        full = f"{table_path.rstrip('/')}/{rel}"
        ts = snap.tombstones.get(rel)
        if ts is None:  # orphan from a crashed/skipped writer
            ts = fsio.mtime_ms(full)
        if ts < horizon:
            fsio.remove(full)
            deleted.append(rel)
    return sorted(deleted)


# ---------------------------------------------------------------------------
# MERGE (upsert / delete-matched)


def merge_delta_table(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    on: list[str],
    when_matched: str = "update",
    insert_not_matched: bool = True,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int | None:
    """``MERGE INTO`` the Delta table: for rows whose ``on`` keys match a
    source row, ``when_matched`` = ``update`` replaces them with the
    source row (SCD-1) or ``delete`` drops them; unmatched source rows
    are inserted when ``insert_not_matched``.  One atomic commit; returns
    its version (None when the merge is a no-op).

    Scale shape — rewrite only what the keys touch:

    1. *stats pre-prune* (driver, free): for single-key merges the
       source's key min/max cut the candidate file list via the log's
       per-file stats before any Spark work;
    2. *touch probe*: candidates are scanned once with
       ``input_file_name()`` semi-joined against the (broadcast) source
       keys — a CDC batch is small, so the probe is a map-only broadcast
       join over just the candidate files;
    3. *rewrite*: only touched files are read again; kept rows
       (anti-join), updates, and inserts are staged as new files, and
       remove(touched)+add(new) publish in ONE exclusive-create commit.

    Untouched files are never read twice, never rewritten — at 100 TB a
    1M-row CDC batch against a well-clustered table rewrites a few
    files, not the table.  Matching the delta-spark semantics, a
    concurrent commit that removed one of our touched files aborts with
    :class:`DeltaConcurrentCommitError` (rerun on the new snapshot).

    Row semantics mirror ``operators.dataset.merge_upsert`` (the
    DataFrame-level MERGE); this is its transactional storage face.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError("when_matched must be update|delete")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version go together")
    on = list(on)
    snap = read_delta_snapshot(table_path)
    _check_writer_protocol(
        snap, "MERGE", adds_rows=True, removes_rows=True
    )
    if txn_app_id is not None:
        # streaming-upsert idempotence (the Delta `txn` action): a
        # replayed epoch is detected in the log and skipped before any
        # file is staged
        committed = snap.app_versions.get(txn_app_id)
        if committed is not None and committed >= int(txn_version):
            return None
    if when_matched == "update" or insert_not_matched:
        # names + types must match; nullability may differ (literals are
        # non-nullable, table columns usually nullable — irrelevant here)
        shape = lambda sch: [(f.name, f.dataType) for f in sch.fields]  # noqa: E731
        if shape(source.schema) != shape(snap.schema):
            raise ValueError(
                "merge source schema must equal the table schema "
                f"(table {snap.schema.simpleString()}, "
                f"source {source.schema.simpleString()})"
            )
    source = source.cache()

    # 1. stats pre-prune (proof-based superset of the true touch set)
    candidates = snap.files
    if len(on) == 1:
        key = on[0]
        bounds = source.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).collect()[0]
        if bounds["lo"] is not None:
            lo, hi = bounds["lo"], bounds["hi"]
            if hasattr(lo, "isoformat"):
                lo, hi = lo.isoformat(), hi.isoformat()
            candidates = [
                f
                for f in candidates
                if _file_may_match(f, key, ">=", lo)
                and _file_may_match(f, key, "<=", hi)
            ]

    # 2. touch probe over the candidates only
    touched_rel: set[str] = set()
    if candidates:
        probe_snap = snap.with_files(candidates)
        # _metadata.file_path, NOT input_file_name(): the DV anti-join
        # inside _scan_snapshot may shuffle, after which
        # input_file_name() returns '' and the probe silently under-
        # touches (review finding)
        probe = (
            _scan_snapshot(
                spark, probe_snap, file_col="__file"
            )
            .join(F.broadcast(source.select(*on).distinct()), on=on, how="semi")
            .select("__file")
            .distinct()
        )
        for r in probe.collect():
            # input_file_name yields a URI (file:/… locally, s3a://… on
            # a cluster) — _normalize_rel handles both spellings
            touched_rel.add(_normalize_rel(table_path, r["__file"]))
    touched = [f for f in snap.files if f.path in touched_rel]

    # 3. rewrite touched files + build the single commit
    adds: list[dict] = []
    matched_keys = None
    if touched:
        tsnap = snap.with_files(touched)
        touched_df = _scan_snapshot(spark, tsnap)
        kept = touched_df.join(
            F.broadcast(source.select(*on).distinct()), on=on, how="left_anti"
        )
        matched_keys = (
            touched_df.select(*on)
            .join(F.broadcast(source.select(*on).distinct()), on=on, how="semi")
            .distinct()
        )
        new_rows = kept
        if when_matched == "update":
            updates = source.join(matched_keys, on=on, how="semi")
            new_rows = kept.unionByName(updates)
        adds.extend(
            _stage_data_files(
                new_rows,
                table_path,
                snap.partition_columns,
                data_change=True,
                column_mapping=snap.column_mapping,
            )
        )
    if insert_not_matched:
        inserts = source
        if matched_keys is not None:
            inserts = source.join(matched_keys, on=on, how="left_anti")
        elif touched_rel == set() and candidates:
            pass  # no key matched anything: all of source inserts
        adds.extend(
            _stage_data_files(
                inserts,
                table_path,
                snap.partition_columns,
                data_change=True,
                column_mapping=snap.column_mapping,
            )
        )
    source.unpersist()
    if not adds and not touched:
        return None

    ts = _now_ms()
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": "MERGE",
                "operationParameters": {
                    "predicate": ",".join(on),
                    "matchedAction": when_matched,
                },
            }
        }
    ]
    if txn_app_id is not None:
        actions.append(
            {
                "txn": {
                    "appId": txn_app_id,
                    "version": int(txn_version),
                    "lastUpdated": ts,
                }
            }
        )
    for old in touched:
        actions.append(
            {
                "remove": {
                    "path": old.path,
                    "deletionTimestamp": ts,
                    "dataChange": True,
                }
            }
        )
    actions.extend(adds)
    for _attempt in range(10):
        versions = _list_log_versions(table_path)
        next_version = versions[-1] + 1
        try:
            _attempt_commit(table_path, next_version, actions)
            return next_version
        except FileExistsError:
            new_snap = read_delta_snapshot(table_path)
            if txn_app_id is not None:
                committed = new_snap.app_versions.get(txn_app_id)
                if committed is not None and committed >= int(txn_version):
                    return None  # the race loser WAS our replayed epoch
            live = {f.path for f in new_snap.files}
            if not all(old.path in live for old in touched):
                raise DeltaConcurrentCommitError(
                    "merge inputs were removed concurrently; rerun on the "
                    "new snapshot"
                ) from None
    raise DeltaConcurrentCommitError("lost the commit race 10 times")


def _filters_to_column(filters: list[tuple[str, str, object]]):
    """AND of (col, op, value) triples as a real row predicate — the
    exact-match twin of the proof language `_file_may_match` prunes on."""
    cond = F.lit(True)
    for col, op, val in filters:
        c = F.col(col)
        if op == "=":
            cond = cond & (c == F.lit(val))
        elif op == "!=":
            cond = cond & (c != F.lit(val))
        elif op == "<":
            cond = cond & (c < F.lit(val))
        elif op == "<=":
            cond = cond & (c <= F.lit(val))
        elif op == ">":
            cond = cond & (c > F.lit(val))
        elif op == ">=":
            cond = cond & (c >= F.lit(val))
        elif op == "is_null":
            cond = cond & c.isNull()
        else:
            raise ValueError(f"unsupported filter operator {op!r}")
    return cond


def _touched_files(
    spark: SparkSession,
    snap: DeltaSnapshot,
    filters: list[tuple[str, str, object]],
) -> list[_AddFile]:
    """The files that PROVABLY contain predicate matches: stats prune
    first (driver, free), then one scan of the surviving candidates with
    ``input_file_name()`` — so a file inside the stats superset whose
    rows all miss the predicate is never rewritten."""
    candidates = [
        f
        for f in snap.files
        if all(_file_may_match(f, c, op, v) for (c, op, v) in filters)
    ]
    if not candidates:
        return []
    probe_snap = snap.with_files(candidates)
    # file identity captured at the scan stage (file_col) — see the
    # merge probe comment: input_file_name() is '' after a DV shuffle
    probe = (
        _scan_snapshot(spark, probe_snap, file_col="__file")
        .where(F.coalesce(_filters_to_column(filters), F.lit(False)))
        .select("__file")
        .distinct()
    )
    touched_rel: set[str] = set()
    for r in probe.collect():
        touched_rel.add(_normalize_rel(snap.table_path, r["__file"]))
    return [f for f in snap.files if f.path in touched_rel]


def _commit_rewrite(
    table_path: str,
    touched: list[_AddFile],
    adds: list[dict],
    operation: str,
    parameters: dict,
    pre_actions: list[dict] | None = None,
) -> int:
    """remove(touched)+add(new) as ONE exclusive-create commit, with the
    merge-path race handling: a concurrent commit that removed one of
    our touched files aborts (rerun on the new snapshot).
    ``pre_actions`` prepend after commitInfo (the DV-delete path's
    protocol upgrade)."""
    ts = _now_ms()
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": operation,
                "operationParameters": parameters,
            }
        }
    ]
    actions.extend(pre_actions or [])
    for old in touched:
        actions.append(
            {
                "remove": {
                    "path": old.path,
                    "deletionTimestamp": ts,
                    "dataChange": True,
                }
            }
        )
    actions.extend(adds)
    for _attempt in range(10):
        versions = _list_log_versions(table_path)
        next_version = versions[-1] + 1
        try:
            _attempt_commit(table_path, next_version, actions)
            return next_version
        except FileExistsError:
            live = {f.path for f in read_delta_snapshot(table_path).files}
            if not all(old.path in live for old in touched):
                raise DeltaConcurrentCommitError(
                    f"{operation.lower()} inputs were removed concurrently; "
                    "rerun on the new snapshot"
                ) from None
    raise DeltaConcurrentCommitError("lost the commit race 10 times")


def delete_from_delta_table(
    spark: SparkSession,
    table_path: str,
    filters: list[tuple[str, str, object]],
    use_deletion_vectors: bool | None = None,
) -> int | None:
    """``DELETE FROM``: remove every row matching ALL ``filters``
    ((col, op, value) triples — the same proof language the reader
    prunes on), touching ONLY files that provably contain matches.
    Returns the commit version, or None when nothing matched (zero
    writes).  Rows where the predicate is NULL are KEPT — SQL DELETE
    semantics.  The transactional twin of
    ``delete_from_iceberg_table`` (sources/iceberg.py), same
    discipline: stats pre-prune → exact scan-stage touch probe → only
    the touched files pay, untouched files never read twice.

    Two write shapes:

    - default (copy-on-write): touched files REWRITE without the
      matching rows; a file left empty disappears.  Cost tracks touched
      BYTES.
    - ``use_deletion_vectors=True`` — or None (the default) on a table
      with ``delta.enableDeletionVectors=true``, the delta-spark
      routing (the modern delta-spark DELETE):
      matched physical row positions become a roaring bitmap in ONE
      shared DV file; each touched file re-adds with the descriptor
      (unioned with any existing DV), zero data bytes rewritten.  Cost
      tracks MATCHED ROWS — a 3-row delete from a 1 GB file writes a
      ~100-byte bitmap.  The commit upgrades the protocol to v3 +
      deletionVectors on first use (required for other readers to see
      the requirement); a file whose bitmap reaches its row count drops
      entirely.  Purge later with OPTIMIZE (compaction applies and
      drops DVs) — the usual operational pairing.
    """
    if not filters:
        raise ValueError(
            "refusing an unconditional DELETE — pass explicit filters "
            "(use write_delta_table(mode='overwrite') with an empty "
            "DataFrame to truncate)"
        )
    snap = read_delta_snapshot(table_path)
    _check_writer_protocol(snap, "DELETE", removes_rows=True)
    if use_deletion_vectors is None:
        # the delta-spark default: tables that enable DVs get the
        # zero-rewrite shape (SQL DELETE included); explicit True/False
        # overrides
        use_deletion_vectors = (
            (snap.configuration or {})
            .get("delta.enableDeletionVectors", "")
            .lower()
            == "true"
        )
    touched = _touched_files(spark, snap, filters)
    if not touched:
        return None
    if use_deletion_vectors:
        return _delete_with_deletion_vectors(
            spark, table_path, snap, touched, filters
        )
    tsnap = snap.with_files(touched)
    survivors = _scan_snapshot(spark, tsnap).where(
        ~F.coalesce(_filters_to_column(filters), F.lit(False))
    )
    adds = _stage_data_files(
        survivors,
        table_path,
        snap.partition_columns,
        data_change=True,
        column_mapping=snap.column_mapping,
    )
    return _commit_rewrite(
        table_path,
        touched,
        adds,
        "DELETE",
        {"predicate": json.dumps([list(map(str, f)) for f in filters])},
    )


def _delete_with_deletion_vectors(
    spark: SparkSession,
    table_path: str,
    snap: DeltaSnapshot,
    touched: list[_AddFile],
    filters: list[tuple[str, str, object]],
) -> int | None:
    """The DV write shape of DELETE (see delete_from_delta_table).
    Matched row positions NEVER collect to the driver: they aggregate
    per touched file EXECUTOR-SIDE (groupBy file → applyInPandas
    packing each file's roaring-bitmap DV-file segment), unioned there
    with any existing descriptor's positions (a DV replaces a DV).
    The driver receives one compressed segment per touched file —
    O(file count × bitmap bytes), the same order as the DV file it
    must write as a single object anyway — and concatenates them at
    running offsets into ONE shared DV file (round-8 weak item: the
    previous collect() of every matched (file, rowpos) row could OOM
    the driver on a broad DELETE where the COW path succeeded)."""
    import uuid as _uuid

    from ballista_spark.sources.dvbitmap import z85_encode

    tsnap = snap.with_files(touched)
    matched = (
        _scan_snapshot(spark, tsnap, file_col="__file", pos_col="__rowpos")
        .where(F.coalesce(_filters_to_column(list(filters)), F.lit(False)))
        .select("__file", "__rowpos")
    )

    def _to_rel(batches):
        import pandas as pd

        from ballista_spark.sources.deltalog import _normalize_rel

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "__rel": [
                        _normalize_rel(table_path, p) for p in pdf["__file"]
                    ],
                    "__pos": pdf["__rowpos"].astype("int64"),
                    "__new": 1,
                }
            )

    pos_schema = "__rel string, __pos long, __new int"
    all_pos = matched.mapInPandas(_to_rel, pos_schema)

    # existing descriptors on touched files fold into the replacement
    # vector executor-side too (the scan already anti-joined them out,
    # so matched rows are new deletions only)
    old_rows = [
        (f.path, json.dumps(f.deletion_vector))
        for f in touched
        if f.deletion_vector
    ]
    if old_rows:

        def _decode_old(batches):
            import numpy as np
            import pandas as pd

            from ballista_spark.sources.deltalog import _dv_positions

            for pdf in batches:
                for rel, dvj in zip(pdf["__rel"], pdf["__dv"]):
                    pos = np.asarray(
                        _dv_positions(table_path, json.loads(dvj)),
                        dtype="int64",
                    )
                    yield pd.DataFrame(
                        {
                            "__rel": np.repeat(rel, len(pos)),
                            "__pos": pos,
                            "__new": np.zeros(len(pos), dtype="int32"),
                        }
                    )

        old_df = spark.createDataFrame(
            old_rows, "__rel string, __dv string"
        ).mapInPandas(_decode_old, pos_schema)
        all_pos = all_pos.unionByName(old_df)

    def _pack(pdf):
        import struct as _struct
        import zlib as _zlib

        import pandas as pd

        from ballista_spark.sources.dvbitmap import encode_rbm_array

        if not int((pdf["__new"] == 1).sum()):
            # probe superset / carried-only descriptor: no new deletion
            return pd.DataFrame(
                {
                    "__rel": pd.Series([], dtype=str),
                    "__segment": pd.Series([], dtype=object),
                    "__size": pd.Series([], dtype="int64"),
                    "__card": pd.Series([], dtype="int64"),
                }
            )
        vals = sorted({int(p) for p in pdf["__pos"]})
        data = encode_rbm_array(vals)
        seg = (
            _struct.pack(">I", len(data))
            + data
            + _struct.pack(">I", _zlib.crc32(data) & 0xFFFFFFFF)
        )
        return pd.DataFrame(
            {
                "__rel": [pdf["__rel"].iloc[0]],
                "__segment": [seg],
                "__size": [len(data)],
                "__card": [len(vals)],
            }
        )

    packed = {
        r["__rel"]: r
        for r in all_pos.groupBy("__rel")
        .applyInPandas(
            _pack,
            "__rel string, __segment binary, __size long, __card long",
        )
        .collect()
    }

    removes: list[_AddFile] = []
    vec_files: list[tuple[_AddFile, dict]] = []
    for f in touched:
        seg = packed.get(f.path)
        if seg is None:
            continue  # probe superset: no live row actually matched
        removes.append(f)
        n_records = (f.stats or {}).get("numRecords")
        if n_records is not None and int(seg["__card"]) >= int(n_records):
            continue  # every physical row dead: drop the file entirely
        vec_files.append((f, seg))
    if not removes:
        return None

    adds: list[dict] = []
    if vec_files:
        u = _uuid.uuid4()
        enc = z85_encode(u.bytes)
        blob = bytearray(b"\x01")  # DV file format version
        for f, seg in vec_files:
            off = len(blob)
            blob += bytes(seg["__segment"])
            adds.append(
                {
                    "add": {
                        "path": f.path,
                        # the on-disk contract: PHYSICAL keys on mapped
                        # tables (the snapshot normalized to logical)
                        "partitionValues": _physical_partition_values(
                            f.partition_values, snap.column_mapping
                        ),
                        "size": f.size,
                        "modificationTime": _now_ms(),
                        "dataChange": True,
                        "stats": _physical_stats_json(
                            f, snap.column_mapping
                        ),
                        "deletionVector": {
                            "storageType": "u",
                            "pathOrInlineDv": enc,
                            "offset": off,
                            "sizeInBytes": int(seg["__size"]),
                            "cardinality": int(seg["__card"]),
                        },
                    }
                }
            )
        fsio.write_bytes(
            f"{table_path.rstrip('/')}/deletion_vector_{u}.bin", bytes(blob)
        )
    pre_actions: list[dict] = []
    if "deletionVectors" not in snap.reader_features:
        proto = dict(snap.protocol or {})
        rf = set(proto.get("readerFeatures") or [])
        wf = set(proto.get("writerFeatures") or [])
        # upgrading to v7 writers must ENUMERATE the legacy features the
        # old minWriterVersion implied (spec: table features) — the full
        # 1-6 map; _check_writer_protocol already refused any implied
        # feature this writer couldn't honor
        wf |= _LEGACY_WRITER_FEATURES.get(
            int(proto.get("minWriterVersion", 2)), frozenset()
        )
        # same on the reader side: a minReaderVersion=2 (column-mapped)
        # table upgraded to 3 must keep declaring columnMapping, or
        # other readers would scan physical names unmapped
        rf |= _LEGACY_READER_FEATURES.get(
            int(proto.get("minReaderVersion", 1)), frozenset()
        )
        pre_actions.append(
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": sorted(rf | {"deletionVectors"}),
                    "writerFeatures": sorted(wf | {"deletionVectors"}),
                }
            }
        )
    return _commit_rewrite(
        table_path,
        removes,
        adds,
        "DELETE",
        {
            "predicate": json.dumps([list(map(str, f)) for f in filters]),
            "deletionVectors": "true",
        },
        pre_actions=pre_actions,
    )


def update_delta_table(
    spark: SparkSession,
    table_path: str,
    set_exprs: Mapping[str, object],
    filters: list[tuple[str, str, object]] | None = None,
) -> int | None:
    """Copy-on-write ``UPDATE ... SET ... WHERE``: rows matching ALL
    ``filters`` get each ``set_exprs`` column replaced by its expression
    (SQL string or Column), cast back to the column's declared type so
    the table schema never drifts.  ``filters=None`` is the
    unconditional full-table UPDATE (SQL allows it; every file is
    rewritten).  Returns the commit version, or None when no row
    matched.  Same touch-only shape as :func:`delete_from_delta_table`;
    non-matching rows inside a touched file are carried byte-identical
    through the rewrite (``CASE WHEN`` keeps them).
    """
    if not set_exprs:
        raise ValueError("UPDATE needs at least one SET column")
    snap = read_delta_snapshot(table_path)
    _check_writer_protocol(
        snap, "UPDATE", adds_rows=True, removes_rows=True
    )
    by_name = {f.name: f for f in snap.schema.fields}
    for name in set_exprs:
        if name not in by_name:
            raise ValueError(f"SET column {name!r} is not in the table schema")
        if name in snap.partition_columns:
            raise ValueError(
                f"SET column {name!r} is a partition column — rewrite "
                "paths would change; use merge_delta_table (delete+insert)"
            )
    if filters:
        touched = _touched_files(spark, snap, list(filters))
        pred = F.coalesce(_filters_to_column(list(filters)), F.lit(False))
    else:
        touched = list(snap.files)
        pred = F.lit(True)
    if not touched:
        return None
    tsnap = snap.with_files(touched)
    base = _scan_snapshot(spark, tsnap)
    # SQL UPDATE semantics: every SET right-hand side evaluates against
    # the PRE-update row, so `SET a = b, b = a` swaps.  One select
    # projection over the original row — never chained withColumn (a
    # later assignment would see already-updated columns).
    replacements = {
        name: F.when(
            pred,
            (F.expr(expr) if isinstance(expr, str) else expr).cast(
                by_name[name].dataType
            ),
        ).otherwise(F.col(name))
        for name, expr in set_exprs.items()
    }
    updated = base.select(
        *[
            replacements[c].alias(c) if c in replacements else F.col(c)
            for c in base.columns
        ]
    )
    adds = _stage_data_files(
        updated,
        table_path,
        snap.partition_columns,
        data_change=True,
        column_mapping=snap.column_mapping,
    )
    return _commit_rewrite(
        table_path,
        touched,
        adds,
        "UPDATE",
        {
            "predicate": json.dumps(
                [list(map(str, f)) for f in (filters or [])]
            ),
            "set": json.dumps({k: str(v) for k, v in set_exprs.items()}),
        },
    )


# ---------------------------------------------------------------------------
# incremental change reads

#: union/exceptAll chains in change-feed reads localCheckpoint every
#: this many commits, bounding logical-plan depth on long windows
CDF_CHECKPOINT_EVERY = 32


def read_delta_changes(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows ADDED in commits ``(from_version, to_version]`` — the
    incremental-consumption face of the log (the batch analogue of the
    Delta change feed, insert-level granularity): a downstream pipeline
    remembers the last version it processed and reads only newer data
    files, never rescanning the table.

    Only ``dataChange: true`` adds count — compaction/clustering
    rewrites are invisible, exactly as a consumer wants.  Each row
    carries its ``_commit_version``.  Update-merges surface their
    rewritten file's rows as adds (the kept rows of a touched file
    reappear); consumers needing exact row-level deltas should pair this
    with a key-based ``corpus_diff`` (operators/mixture.py) downstream.
    """
    versions = [
        v
        for v in _list_log_versions(table_path)
        if from_version < v <= (to_version if to_version is not None else 1 << 60)
    ]
    snap = read_delta_snapshot(table_path)  # schema + partition cols
    data_fields = [
        fld for fld in snap.schema.fields
        if fld.name not in snap.partition_columns
    ]
    # raw commit JSON keys partitionValues by PHYSICAL names on a
    # column-mapped table; remap to logical like read_delta_snapshot
    to_logical = {p: l for l, p in snap.column_mapping.items()}
    out = None
    n_parts = 0
    for v in versions:
        adds = []
        for action in _iter_commit_actions(_commit_path(table_path, v)):
            a = action.get("add")
            if a and a.get("dataChange", True):
                dv = a.get("deletionVector")
                adds.append(
                    _AddFile(
                        path=_normalize_rel(table_path, a["path"]),
                        partition_values={
                            to_logical.get(k, k): val
                            for k, val in (
                                a.get("partitionValues") or {}
                            ).items()
                        },
                        size=int(a.get("size") or 0),
                        stats=None,
                        deletion_vector=(
                            dict(dv) if isinstance(dv, dict) else None
                        ),
                    )
                )
        if not adds:
            continue
        vsnap = snap.with_files(adds)
        part = _scan_snapshot(spark, vsnap).withColumn(
            "_commit_version", F.lit(v).cast("long")
        )
        out = part if out is None else out.unionByName(part)
        n_parts += 1
        if n_parts % CDF_CHECKPOINT_EVERY == 0:
            out = out.localCheckpoint(eager=True)  # bound plan depth
    if out is None:
        empty_schema = T.StructType(
            list(snap.schema.fields)
            + [T.StructField("_commit_version", T.LongType())]
        )
        return spark.createDataFrame([], empty_schema)
    return out


def read_delta_cdf(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """EXACT row-level change feed for commits ``(from_version,
    to_version]``: each changed row appears once with ``_change_type``
    (``insert`` | ``delete``; an update is its delete+insert pair) and
    ``_commit_version`` — the CDC-consumer face the plain
    :func:`read_delta_changes` can't provide (it resurfaces a rewritten
    file's CARRIED rows).

    Per commit: pure appends emit their rows as inserts (no diff work);
    rewrite commits (UPDATE/DELETE/MERGE/overwrite) diff the removed
    files' rows against the added files' rows as multisets
    (``exceptAll`` both ways), so carried rows cancel exactly and only
    real changes surface.  ``dataChange: false`` rewrites (compaction/
    clustering) and metadata-only commits emit nothing.  Cost tracks
    the TOUCHED files per commit — for touch-only mutations that is the
    mutation size, not the table.

    Needs the removed files still on disk (they are, until
    ``vacuum_delta_table`` passes their tombstones' retention); a
    vacuumed gap raises rather than under-reporting deletes.  Pre-ALTER
    commits surface under the final window schema with NULL for
    columns that didn't exist yet.
    """
    versions = [
        v
        for v in _list_log_versions(table_path)
        if from_version < v <= (to_version if to_version is not None else 1 << 60)
    ]
    final = read_delta_snapshot(
        table_path, versions[-1] if versions else None
    )
    # window-sized snapshot memo: commit v's post-snapshot IS commit
    # v+1's pre-snapshot — without it the loop replays the log
    # O(window²) times (review finding)
    _snap_memo: dict[int, DeltaSnapshot] = {final.version: final}

    def _snap_at(ver: int) -> DeltaSnapshot:
        if ver not in _snap_memo:
            _snap_memo[ver] = read_delta_snapshot(table_path, ver)
        return _snap_memo[ver]

    parts: list[DataFrame] = []
    for v in versions:
        added_rel: set[str] = set()
        removed_rel: set[str] = set()
        for action in _iter_commit_actions(_commit_path(table_path, v)):
            a = action.get("add")
            if a and a.get("dataChange", True):
                added_rel.add(_normalize_rel(table_path, a["path"]))
            r = action.get("remove")
            if r and r.get("dataChange", True):
                removed_rel.add(_normalize_rel(table_path, r["path"]))
        if not added_rel and not removed_rel:
            continue  # metadata-only / dataChange:false commit

        def _side(rel_paths: set[str], snap_at: DeltaSnapshot) -> DataFrame:
            files = [f for f in snap_at.files if f.path in rel_paths]
            missing = rel_paths - {f.path for f in files}
            if missing:
                raise DeltaProtocolError(
                    f"commit {v} references files absent from the "
                    f"version-{snap_at.version} snapshot: {sorted(missing)[:3]}"
                )
            for f in files:
                full = os.path.join(table_path, f.path)
                if not fsio.exists(full):
                    raise DeltaProtocolError(
                        f"data file {f.path!r} was vacuumed — the CDF for "
                        f"commit {v} can no longer be reconstructed"
                    )
            return _scan_snapshot(spark, snap_at.with_files(files))

        new_df = _side(added_rel, _snap_at(v)) if added_rel else None
        old_df = _side(removed_rel, _snap_at(v - 1)) if removed_rel else None
        if old_df is None:
            changes = new_df.withColumn("_change_type", F.lit("insert"))
        elif new_df is None:
            changes = old_df.withColumn("_change_type", F.lit("delete"))
        else:
            # align pre/post schemas (ALTER between them) before diffing
            cols = [f.name for f in new_df.schema.fields]
            old_aligned = old_df.select(
                *[
                    F.col(c) if c in old_df.columns
                    else F.lit(None).cast(
                        dict((f.name, f.dataType) for f in new_df.schema.fields)[c]
                    ).alias(c)
                    for c in cols
                ]
            )
            changes = (
                new_df.exceptAll(old_aligned)
                .withColumn("_change_type", F.lit("insert"))
                .unionByName(
                    old_aligned.exceptAll(new_df).withColumn(
                        "_change_type", F.lit("delete")
                    )
                )
            )
        # align to the FINAL window schema (an ALTER inside the window
        # must not make early commits un-unionable / un-selectable)
        final_types = {f.name: f.dataType for f in final.schema.fields}
        changes = changes.select(
            *[
                F.col(c) if c in changes.columns
                else F.lit(None).cast(final_types[c]).alias(c)
                for c in final_types
            ],
            "_change_type",
        )
        parts.append(
            changes.withColumn("_commit_version", F.lit(v).cast("long"))
        )
    if not parts:
        empty_schema = T.StructType(
            list(final.schema.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )
        return spark.createDataFrame([], empty_schema)
    out = parts[0]
    for i, p in enumerate(parts[1:], start=1):
        out = out.unionByName(p, allowMissingColumns=True)
        if i % CDF_CHECKPOINT_EVERY == 0:
            # truncate the logical plan every K commits (the
            # curate_corpus pattern): a 500-commit window would
            # otherwise build a 1000+-node exceptAll/union chain whose
            # analysis cost alone dwarfs the data
            out = out.localCheckpoint(eager=True)
    return out
