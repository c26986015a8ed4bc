"""Hudi COW reader tests (sources/hudi.py) over spec-shaped fixtures:
``.hoodie`` timeline JSON + convention-named parquet base files, built
by hand from the public table layout (no Hudi runtime exists in this
environment to cross-check, so fidelity rests on the fixture following
the documented layout exactly — same stance as tests/test_iceberg.py).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ballista_spark.sources.hudi import (
    HudiFeatureError,
    hudi_snapshot_files,
    read_hudi_changes,
    read_hudi_table,
)


def _init_table(path, table_type="COPY_ON_WRITE"):
    os.makedirs(os.path.join(path, ".hoodie"), exist_ok=True)
    with open(os.path.join(path, ".hoodie", "hoodie.properties"), "w") as f:
        f.write(
            "hoodie.table.name=t\n"
            f"hoodie.table.type={table_type}\n"
            "hoodie.table.version=6\n"
        )


def _base_file(path, part, file_id, instant, rows, token="0-1-0"):
    """One convention-named base file with the _hoodie_* meta columns a
    real writer prepends."""
    d = os.path.join(path, part) if part else path
    os.makedirs(d, exist_ok=True)
    name = f"{file_id}_{token}_{instant}.parquet"
    ids, vals = zip(*rows)
    t = pa.table(
        {
            "_hoodie_commit_time": [instant] * len(rows),
            "_hoodie_record_key": [str(i) for i in ids],
            "_hoodie_partition_path": [part] * len(rows),
            "_hoodie_file_name": [name] * len(rows),
            "id": list(ids),
            "v": list(vals),
        }
    )
    pq.write_table(t, os.path.join(d, name))
    return os.path.join(part, name) if part else name


def _commit(
    path, instant, write_stats=None, action="commit", replace=None,
    optype=None,
):
    doc = {"partitionToWriteStats": write_stats or {}}
    if replace is not None:
        doc["partitionToReplaceFileIds"] = replace
        doc["operationType"] = optype or "cluster"
    if optype is not None:
        doc["operationType"] = optype
    with open(os.path.join(path, ".hoodie", f"{instant}.{action}"), "w") as f:
        json.dump(doc, f)


def _fid():
    return f"{uuid.uuid4()}-0"


def test_snapshot_latest_slice_wins(spark, tmp_path):
    """An upsert rewrites a file group at a newer instant — only the
    newest committed slice of each group is visible."""
    path = str(tmp_path / "t")
    _init_table(path)
    f1 = _fid()
    _base_file(path, "", f1, "20240101000000", [(1, "a"), (2, "b")])
    _commit(path, "20240101000000")
    _base_file(path, "", f1, "20240102000000", [(1, "a2"), (2, "b2")])
    _commit(path, "20240102000000")
    f2 = _fid()
    _base_file(path, "", f2, "20240102000000", [(3, "c")])

    got = read_hudi_table(spark, path)
    assert sorted(map(tuple, got.collect())) == [(1, "a2"), (2, "b2"), (3, "c")]
    assert len(hudi_snapshot_files(path)) == 2


def test_uncommitted_instant_invisible(spark, tmp_path):
    """A base file whose instant has no completed timeline file (crashed
    or inflight writer) must not be read."""
    path = str(tmp_path / "t")
    _init_table(path)
    _base_file(path, "", _fid(), "20240101000000", [(1, "a")])
    _commit(path, "20240101000000")
    _base_file(path, "", _fid(), "20240103000000", [(9, "ghost")])  # no commit
    # inflight marker files must also not complete the instant
    open(os.path.join(path, ".hoodie", "20240103000000.commit.requested"), "w")
    open(os.path.join(path, ".hoodie", "20240103000000.inflight"), "w")
    got = read_hudi_table(spark, path)
    assert [tuple(r) for r in got.collect()] == [(1, "a")]


def test_time_travel_as_of_instant(spark, tmp_path):
    path = str(tmp_path / "t")
    _init_table(path)
    f1 = _fid()
    _base_file(path, "", f1, "20240101000000", [(1, "a")])
    _commit(path, "20240101000000")
    _base_file(path, "", f1, "20240105000000", [(1, "a-new")])
    _commit(path, "20240105000000")
    old = read_hudi_table(spark, path, as_of_instant="20240103000000")
    assert [tuple(r) for r in old.collect()] == [(1, "a")]
    assert [tuple(r) for r in read_hudi_table(spark, path).collect()] == [
        (1, "a-new")
    ]


def test_replacecommit_retires_file_groups(spark, tmp_path):
    """Clustering: a replacecommit writes new files and names the file
    ids it replaced — those groups disappear even though their parquet
    files remain on disk."""
    path = str(tmp_path / "t")
    _init_table(path)
    f1, f2 = _fid(), _fid()
    _base_file(path, "", f1, "20240101000000", [(1, "a")])
    _base_file(path, "", f2, "20240101000000", [(2, "b")])
    _commit(path, "20240101000000")
    f3 = _fid()
    _base_file(path, "", f3, "20240102000000", [(1, "a"), (2, "b")])
    _commit(
        path, "20240102000000", action="replacecommit", replace={"": [f1, f2]}
    )
    got = read_hudi_table(spark, path)
    assert sorted(map(tuple, got.collect())) == [(1, "a"), (2, "b")]
    files = hudi_snapshot_files(path)
    assert len(files) == 1 and f3 in files[0]


def test_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    _init_table(path)
    _base_file(path, "2024/01/01", _fid(), "20240101000000", [(1, "a")])
    _base_file(path, "2024/01/02", _fid(), "20240101000000", [(2, "b")])
    _commit(path, "20240101000000")
    got = read_hudi_table(spark, path)
    assert sorted(map(tuple, got.collect())) == [(1, "a"), (2, "b")]


def test_meta_columns_kept_on_request(spark, tmp_path):
    path = str(tmp_path / "t")
    _init_table(path)
    _base_file(path, "", _fid(), "20240101000000", [(1, "a")])
    _commit(path, "20240101000000")
    slim = read_hudi_table(spark, path)
    full = read_hudi_table(spark, path, drop_meta=False)
    assert slim.columns == ["id", "v"]
    assert "_hoodie_commit_time" in full.columns
    assert full.select("_hoodie_commit_time").first()[0] == "20240101000000"


def test_incremental_changes_between_instants(spark, tmp_path):
    path = str(tmp_path / "t")
    _init_table(path)
    r1 = _base_file(path, "", _fid(), "20240101000000", [(1, "a")])
    _commit(path, "20240101000000", {"": [{"path": r1}]})
    r2 = _base_file(path, "", _fid(), "20240102000000", [(2, "b")])
    _commit(path, "20240102000000", {"": [{"path": r2}]})
    r3 = _base_file(path, "", _fid(), "20240103000000", [(3, "c")])
    _commit(path, "20240103000000", {"": [{"path": r3}]})

    inc = read_hudi_changes(spark, path, begin_instant="20240101000000")
    assert sorted(r["id"] for r in inc.collect()) == [2, 3]
    win = read_hudi_changes(
        spark, path, "20240101000000", end_instant="20240102000000"
    )
    assert [r["id"] for r in win.collect()] == [2]
    none = read_hudi_changes(spark, path, "20240103000000")
    assert none.count() == 0


def test_merge_on_read_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _init_table(path, table_type="MERGE_ON_READ")
    with pytest.raises(HudiFeatureError, match="MERGE_ON_READ"):
        read_hudi_table(spark, path)


def test_one_x_two_part_instant_names(spark, tmp_path):
    """Hudi 1.x completed instants are <request>_<completion>.commit
    under .hoodie/timeline/."""
    path = str(tmp_path / "t")
    _init_table(path)
    _base_file(path, "", _fid(), "20240101000000", [(1, "a")])
    tl = os.path.join(path, ".hoodie", "timeline")
    os.makedirs(tl)
    with open(
        os.path.join(tl, "20240101000000_20240101000111.commit"), "w"
    ) as f:
        json.dump({"partitionToWriteStats": {}}, f)
    assert [tuple(r) for r in read_hudi_table(spark, path).collect()] == [
        (1, "a")
    ]


def test_create_external_table_hudi(spark, tmp_path):
    """CREATE EXTERNAL TABLE ... STORED AS hudi routes through the pure
    COW reader and lands in the SQL catalog."""
    from ballista_spark.context import BallistaContext

    path = str(tmp_path / "t")
    _init_table(path)
    _base_file(path, "", _fid(), "20240101000000", [(1, "a"), (2, "b")])
    _commit(path, "20240101000000")
    ctx = BallistaContext(spark)
    ctx.create_external_table("docs_hudi", path, file_type="hudi")
    assert spark.sql("SELECT COUNT(*) FROM docs_hudi").first()[0] == 2


def test_connectors_read_hudi_falls_back_jar_free(spark, tmp_path):
    from ballista_spark.sources.connectors import read_hudi

    path = str(tmp_path / "t")
    _init_table(path)
    _base_file(path, "", _fid(), "20240101000000", [(1, "a")])
    _commit(path, "20240101000000")
    assert [tuple(r) for r in read_hudi(spark, path).collect()] == [(1, "a")]


# ---------------------------------------------------------------------------
# ballista_hudi DataSource face


def test_hudi_format_batch_and_time_travel(spark, tmp_path):
    from ballista_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    path = str(tmp_path / "t")
    _init_table(path)
    f1 = _fid()
    _base_file(path, "", f1, "20240101000000", [(1, "a"), (2, "b")])
    _commit(path, "20240101000000")
    _base_file(path, "", f1, "20240105000000", [(1, "a2"), (2, "b2")])
    _commit(path, "20240105000000")
    got = spark.read.format("ballista_hudi").option("path", path).load()
    assert got.columns == ["id", "v"]  # _hoodie_* meta stripped
    assert sorted(map(tuple, got.collect())) == [(1, "a2"), (2, "b2")]
    old = (
        spark.read.format("ballista_hudi")
        .option("path", path)
        .option("version", "20240103000000")
        .load()
    )
    assert sorted(map(tuple, old.collect())) == [(1, "a"), (2, "b")]


def test_hudi_format_streaming_consumes_new_commits(spark, tmp_path):
    from ballista_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _init_table(path)

    def commit_rows(instant, rows):
        rel = _base_file(path, "", _fid(), instant, rows)
        _commit(path, instant, {"": [{"path": rel}]})

    def run_trigger():
        q = (
            spark.readStream.format("ballista_hudi")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    commit_rows("20240101000000", [(0, "seed")])
    run_trigger()  # default start: only NEW commits
    assert spark.read.parquet(out_dir).count() == 0
    commit_rows("20240102000000", [(1, "a"), (2, "b")])
    # a clustering replacecommit mid-stream is invisible
    _commit(path, "20240102120000", action="replacecommit", replace={"": []})
    commit_rows("20240103000000", [(3, "c")])
    run_trigger()
    got = sorted(r["id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 3]


# ---------------------------------------------------------------------------
# round-7 review-pass regressions


def test_archived_instants_stay_committed(spark, tmp_path):
    """Hudi archives old completed instants out of the active timeline:
    base files OLDER than the earliest active instant are
    committed-by-archival and must stay visible — the uncommitted
    screen only applies at or past the active window."""
    path = str(tmp_path / "t")
    _init_table(path)
    # an old, archived commit: file present, instant NOT in .hoodie
    _base_file(path, "", _fid(), "20230101000000", [(1, "old")])
    # the active window
    _base_file(path, "", _fid(), "20240101000000", [(2, "new")])
    _commit(path, "20240101000000")
    got = sorted(map(tuple, read_hudi_table(spark, path).collect()))
    assert got == [(1, "old"), (2, "new")]
    # but a file NEWER than the newest active instant is inflight
    _base_file(path, "", _fid(), "20250101000000", [(9, "ghost")])
    got = sorted(map(tuple, read_hudi_table(spark, path).collect()))
    assert got == [(1, "old"), (2, "new")]
    # as-of time travel still excludes archived files past the horizon
    old = read_hudi_table(spark, path, as_of_instant="20230601000000")
    assert [tuple(r) for r in old.collect()] == [(1, "old")]


def test_insert_overwrite_refused_in_incremental_and_stream(spark, tmp_path):
    """A non-clustering replacecommit (insert_overwrite) retracts rows:
    incremental reads and the stream must refuse, not silently skip —
    while pure clustering stays invisible."""
    from ballista_spark.sources.hudi import HudiFeatureError
    from ballista_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    path = str(tmp_path / "t")
    _init_table(path)
    r1 = _base_file(path, "", _fid(), "20240101000000", [(1, "a")])
    _commit(path, "20240101000000", {"": [{"path": r1}]})
    f_new = _fid()
    r2 = _base_file(path, "", f_new, "20240102000000", [(9, "ow")])
    _commit(
        path, "20240102000000", {"": [{"path": r2}]},
        action="replacecommit", replace={"": []}, optype="insert_overwrite",
    )
    with pytest.raises(HudiFeatureError, match="retracts"):
        read_hudi_changes(spark, path, begin_instant="20240101000000")
    q = (
        spark.readStream.format("ballista_hudi")
        .option("path", path)
        .option("startingOrdinal", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="retraction|STREAM_FAILED"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
