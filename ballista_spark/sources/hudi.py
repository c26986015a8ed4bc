"""Apache Hudi Copy-on-Write table READER — pure-Python timeline plane,
Spark data plane (jar-free, like ``deltalog`` and ``iceberg``).

Implements the read side of the public Hudi table layout
(hudi.apache.org/docs — table versions 5/6, the 0.x line): the
``.hoodie/`` timeline of completed instants (``<ts>.commit`` /
``<ts>.replacecommit`` JSON), base-file name parsing
(``<fileId>_<writeToken>_<instantTime>.parquet``), and file-slice
resolution — for every file group (partition, fileId) the base file
with the LATEST committed instant wins, file groups replaced by a
clustering/insert-overwrite ``replacecommit`` disappear, and files
whose instant never completed (inflight writers, failed jobs) are
invisible.  The surviving slice set reads through ONE
``spark.read.parquet`` — Hudi base files physically contain every
column (including partition columns and the ``_hoodie_*`` meta
columns), so no reconstruction is needed.

Supported subset (checked, not assumed): COPY_ON_WRITE tables,
``commit`` + ``replacecommit`` actions, time travel via
``as_of_instant``, incremental change reads.  MERGE_ON_READ tables
raise: their log files require an Avro record-merge pass, and silently
reading only base files would return stale rows.

Scale design: the timeline is a driver-side directory listing of
``.hoodie`` (one small dir however large the table), slice resolution
is a dict over file names (no data I/O), and the scan is the engine's
standard pushdown/pruning parquet path.  Nothing row-sized touches the
driver.

The reference engine has no table-format layer
(`rust/core/proto/ballista.proto:244-258`); with ``deltalog`` and
``iceberg`` this completes all three open lakehouse formats,
beyond-parity.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from ballista_spark.sources import fsio

__all__ = [
    "read_hudi_table",
    "read_hudi_changes",
    "hudi_snapshot_files",
    "HudiFeatureError",
]


class HudiFeatureError(RuntimeError):
    """Table uses a layout feature outside the implemented subset."""


#: base-file name: <fileId>_<writeToken>_<instantTime>[.<suffix>].parquet
#: fileId is a UUID (may carry a -<ordinal> suffix), writeToken is
#: task-attempt digits (d-d-d), instantTime is the commit timestamp
#: (14+ digits, millis variant 17)
_BASE_FILE_RE = re.compile(
    r"^(?P<file_id>[^_]+)_(?P<token>[\d\-]+)_(?P<instant>\d{14,17})"
    r"(?:[._].*)?\.parquet$"
)

#: completed-instant timeline file: "<instant>.commit" (0.x) or
#: "<requestTime>_<completionTime>.commit" (1.x two-part names)
_INSTANT_RE = re.compile(
    r"^(?P<instant>\d{14,17})(?:_\d{14,17})?\.(?P<action>commit|replacecommit)$"
)


def _table_props(table_path: str) -> dict:
    p = os.path.join(table_path, ".hoodie", "hoodie.properties")
    if not fsio.exists(p):
        raise FileNotFoundError(f"no Hudi table at {table_path!r} (.hoodie missing)")
    props = {}
    for line in fsio.read_text(p).splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        k, _, v = line.partition("=")
        props[k.strip()] = v.strip()
    return props


def _timeline(table_path: str) -> list[tuple[str, str, str]]:
    """Completed instants as sorted (instant, action, path) — requested/
    inflight files (no terminal suffix match) are skipped, which is what
    makes uncommitted data invisible."""
    hoodie = os.path.join(table_path, ".hoodie")
    dirs = [hoodie, os.path.join(hoodie, "timeline")]  # 0.x and 1.x homes
    out = []
    for d in dirs:
        for name in fsio.listdir(d):
            m = _INSTANT_RE.match(name)
            if m:
                out.append(
                    (m.group("instant"), m.group("action"), os.path.join(d, name))
                )
    out.sort()
    return out


def _replaced_file_ids(commit_path: str) -> dict[str, set[str]]:
    """partition → file ids retired by a replacecommit (clustering /
    insert-overwrite)."""
    try:
        doc = json.loads(fsio.read_text(commit_path))
    except (OSError, ValueError):
        return {}
    out: dict[str, set[str]] = {}
    for part, ids in (doc.get("partitionToReplaceFileIds") or {}).items():
        out[part] = set(ids)
    return out


def _replace_is_clustering(commit_path: str) -> bool:
    """True when a replacecommit is a pure clustering rewrite (adds no
    rows).  Hudi records ``operationType`` in the commit JSON; absent
    or unknown types are NOT assumed safe."""
    try:
        doc = json.loads(fsio.read_text(commit_path))
    except (OSError, ValueError):
        return False
    return str(doc.get("operationType", "")).lower() in (
        "cluster",
        "clustering",
    )


def hudi_snapshot_files(
    table_path: str, as_of_instant: str | None = None
) -> list[str]:
    """Resolve the COW snapshot to its base-file paths — driver-side,
    names + timeline only (no data I/O).

    One walk over the data tree; per file group (partition, fileId) the
    slice with the highest committed ``instant <= as_of_instant`` wins.
    """
    props = _table_props(table_path)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise HudiFeatureError(
            f"table type {ttype}: MERGE_ON_READ needs a log-merge pass; "
            "reading base files alone would return stale rows — compact "
            "the table or read through the Hudi runtime"
        )
    full_timeline = _timeline(table_path)
    instants = full_timeline
    if as_of_instant is not None:
        instants = [t for t in instants if t[0] <= str(as_of_instant)]
    committed = {t[0] for t in instants}
    all_active = {t[0] for t in full_timeline}
    # Hudi ARCHIVES old completed instants out of the active timeline
    # (default window ~30 commits, moved under .hoodie/archived in a
    # packed format this reader does not parse).  A base file whose
    # instant predates the earliest ACTIVE instant is therefore
    # committed-by-archival, not inflight — treating it as uncommitted
    # would silently drop old, fully-committed data.  (Failed writes
    # that old would have been rolled back by Hudi's own cleaner —
    # archival only proceeds past completed instants.)
    # the archival boundary comes from the FULL active timeline — an
    # as-of filter narrows which commits are visible, not which
    # instants were archived
    earliest_active = min(all_active) if all_active else None
    replaced: dict[str, set[str]] = {}
    for ts, action, path in instants:
        if action == "replacecommit":
            for part, ids in _replaced_file_ids(path).items():
                replaced.setdefault(part, set()).update(ids)

    # latest committed slice per (partition, file_id)
    best: dict[tuple[str, str], tuple[str, str]] = {}
    root = table_path.rstrip("/")
    for rel, _size in fsio.walk_files(table_path):
        # skip hidden dirs at ANY depth (.hoodie, staging temps)
        if any(seg.startswith(".") for seg in rel.split("/")[:-1]):
            continue
        part, _, name = rel.rpartition("/")
        m = _BASE_FILE_RE.match(name)
        if not m:
            continue
        instant = m.group("instant")
        archived = (
            earliest_active is not None
            and instant < earliest_active
            and (as_of_instant is None or instant <= str(as_of_instant))
        )
        if instant not in committed and not archived:
            continue  # inflight/failed writer — invisible
        fid = m.group("file_id")
        if fid in replaced.get(part, ()):
            continue
        key = (part, fid)
        if key not in best or instant > best[key][0]:
            best[key] = (instant, f"{root}/{rel}")
    return sorted(p for _ts, p in best.values())


def read_hudi_table(
    spark: SparkSession,
    table_path: str,
    as_of_instant: str | None = None,
    drop_meta: bool = True,
) -> DataFrame:
    """The COW table at the latest (or ``as_of_instant``) commit as a
    DataFrame — ONE parquet scan over the resolved file slices.
    ``drop_meta`` strips the five ``_hoodie_*`` bookkeeping columns
    (commit time/seqno/record key/partition path/file name) that Hudi
    writers prepend."""
    files = hudi_snapshot_files(table_path, as_of_instant)
    if not files:
        raise FileNotFoundError(
            f"no committed base files in Hudi table {table_path!r}"
        )
    df = spark.read.parquet(*files)
    if drop_meta:
        meta = [c for c in df.columns if c.startswith("_hoodie_")]
        if meta:
            df = df.drop(*meta)
    return df


def read_hudi_changes(
    spark: SparkSession,
    table_path: str,
    begin_instant: str,
    end_instant: str | None = None,
    drop_meta: bool = True,
) -> DataFrame:
    """Incremental read: rows written by commits in
    ``(begin_instant, end_instant]`` — the files each commit's
    ``partitionToWriteStats`` names, i.e. the same contract as
    ``deltalog.read_delta_changes``.  On COW an updated row's whole new
    file slice is returned (Hudi's own incremental semantics filter by
    ``_hoodie_commit_time``; pass ``drop_meta=False`` and filter on it
    for row-exact changes)."""
    instants = _timeline(table_path)
    window = [
        t
        for t in instants
        if t[0] > str(begin_instant)
        and (end_instant is None or t[0] <= str(end_instant))
    ]
    picked = []
    for ts, action, cpath in window:
        if action == "replacecommit":
            # clustering rewrites add no rows — skip; anything else
            # (insert_overwrite & co.) RETRACTS rows, which an
            # incremental consumer cannot represent — refuse loudly
            if _replace_is_clustering(cpath):
                continue
            raise HudiFeatureError(
                f"replacecommit {ts} is not a clustering rewrite: it "
                "retracts rows, which an incremental read cannot "
                "represent — consume a snapshot read instead"
            )
        picked.append((ts, action, cpath))
    paths: list[str] = []
    for _ts, _action, cpath in picked:
        doc = json.loads(fsio.read_text(cpath))
        for _part, stats in (doc.get("partitionToWriteStats") or {}).items():
            for s in stats:
                rel = s.get("path")
                if rel:
                    paths.append(os.path.join(table_path, rel))
    if not paths:
        return read_hudi_table(spark, table_path, drop_meta=drop_meta).limit(0)
    df = spark.read.parquet(*sorted(set(paths)))
    if drop_meta:
        meta = [c for c in df.columns if c.startswith("_hoodie_")]
        if meta:
            df = df.drop(*meta)
    return df
