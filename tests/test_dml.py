"""Copy-on-write DELETE/UPDATE for Delta tables and UPDATE for Iceberg
tables — completing the DML matrix (Iceberg already had DELETE+MERGE,
Delta had MERGE): touch-only rewrites, SQL NULL-predicate semantics,
schema stability under SET casts, exact-probe pruning (a file inside
the stats superset with no matching rows is never rewritten), and
time travel across the mutation.
"""

from __future__ import annotations

import pytest

from ballista_spark.sources.deltalog import (
    delete_from_delta_table,
    read_delta_snapshot,
    read_delta_table,
    update_delta_table,
    write_delta_table,
)
from ballista_spark.sources.iceberg import (
    read_iceberg_snapshot,
    read_iceberg_table,
    update_iceberg_table,
    write_iceberg_table,
)


def _df(spark, rows, schema="id long, cat string, v double"):
    return spark.createDataFrame(rows, schema)


def _three_file_delta(spark, path):
    """Three single-file commits with disjoint id ranges (so stats
    pruning has teeth); the 100-file carries one NULL-v row."""
    for lo in (0, 100, 200):
        rows = [(lo + i, "c", float(lo + i)) for i in range(10)]
        if lo == 100:
            rows.append((150, "n", None))
        write_delta_table(_df(spark, rows).coalesce(1), path)


# ------------------------------------------------------------ delta DELETE


def test_delta_delete_touch_only_and_null_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    _three_file_delta(spark, path)
    before = {f.path for f in read_delta_snapshot(path).files}
    assert len(before) == 3

    # bounds prove nothing matches: None, no new version
    assert delete_from_delta_table(spark, path, [("id", ">=", 10_000)]) is None
    assert read_delta_snapshot(path).version == 2

    # delete v < 103 within the middle file: 0-file also satisfies v<103
    # by stats, but the probe is EXACT on (id>=100 AND v<103)
    v = delete_from_delta_table(
        spark, path, [("id", ">=", 100), ("v", "<", 103.0)]
    )
    assert v == 3
    after = {f.path for f in read_delta_snapshot(path).files}
    assert len(before & after) == 2  # 0- and 200-files carried verbatim
    got = sorted(r["id"] for r in read_delta_table(spark, path).collect())
    # 100,101,102 gone; NULL-v row 150 KEPT (predicate NULL -> keep)
    want = sorted(list(range(10)) + list(range(103, 110)) + [150]
                  + list(range(200, 210)))
    assert got == want
    # pre-delete version still reads everything
    assert read_delta_table(spark, path, version=2).count() == 31


def test_delta_delete_emptied_file_disappears(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]).coalesce(1), path)
    write_delta_table(_df(spark, [(100, "b", 3.0)]).coalesce(1), path)
    delete_from_delta_table(spark, path, [("cat", "=", "a")])
    snap = read_delta_snapshot(path)
    assert snap.num_files == 1  # the emptied file staged no add
    assert _rows_ids(spark, path) == [100]


def test_delta_delete_unconditional_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_table(_df(spark, [(1, "a", 1.0)]), path)
    with pytest.raises(ValueError, match="unconditional"):
        delete_from_delta_table(spark, path, [])


def _rows_ids(spark, path):
    return sorted(r["id"] for r in read_delta_table(spark, path).collect())


def test_delta_delete_exact_probe_skips_statless_match(spark, tmp_path):
    """A file whose stats ADMIT the predicate but whose rows all miss it
    is probed out — its physical file survives the delete."""
    path = str(tmp_path / "t")
    # one file spanning ids 0..9 but only cat='a'; predicate hits cat='b'
    write_delta_table(
        _df(spark, [(i, "a", float(i)) for i in range(10)]).coalesce(1), path
    )
    write_delta_table(
        _df(spark, [(i + 10, "b", float(i)) for i in range(10)]).coalesce(1), path
    )
    before = {f.path for f in read_delta_snapshot(path).files}
    v = delete_from_delta_table(
        spark, path, [("id", "<", 100), ("cat", "=", "b")]
    )
    assert v == 2
    after = {f.path for f in read_delta_snapshot(path).files}
    # the cat='a' file passed the id<100 stats screen but the probe
    # proved it clean: carried physically
    assert len(before & after) == 1
    assert _rows_ids(spark, path) == list(range(10))


# ------------------------------------------------------------ delta UPDATE


def test_delta_update_where_touch_only(spark, tmp_path):
    path = str(tmp_path / "t")
    _three_file_delta(spark, path)
    before = {f.path for f in read_delta_snapshot(path).files}
    v = update_delta_table(
        spark,
        path,
        {"v": "v * 10", "cat": "upper(cat)"},
        [("id", ">=", 100), ("id", "<", 105)],
    )
    assert v == 3
    after = {f.path for f in read_delta_snapshot(path).files}
    assert len(before & after) == 2  # only the middle file rewrote
    out = {r["id"]: (r["cat"], r["v"]) for r in read_delta_table(spark, path).collect()}
    assert out[100] == ("C", 1000.0) and out[104] == ("C", 1040.0)
    assert out[105] == ("c", 105.0)  # same file, predicate false: unchanged
    assert out[150] == ("n", None)  # carried through the rewrite
    assert out[5] == ("c", 5.0)  # untouched file
    # schema stable (v stayed double after the int-ish expression)
    assert dict(
        (f.name, f.dataType.simpleString())
        for f in read_delta_table(spark, path).schema.fields
    ) == {"id": "bigint", "cat": "string", "v": "double"}
    # pre-update version intact
    old = {r["id"]: r["v"] for r in read_delta_table(spark, path, version=2).collect()}
    assert old[100] == 100.0


def test_delta_update_unconditional_and_null_where(spark, tmp_path):
    path = str(tmp_path / "t")
    _three_file_delta(spark, path)
    # unconditional UPDATE rewrites everything
    v = update_delta_table(spark, path, {"cat": "'x'"})
    assert v == 3
    cats = {r["cat"] for r in read_delta_table(spark, path).collect()}
    assert cats == {"x"}
    # NULL predicate -> row NOT updated (SQL semantics)
    v2 = update_delta_table(spark, path, {"cat": "'y'"}, [("v", "<", 1e9)])
    assert v2 == 4
    out = {r["id"]: r["cat"] for r in read_delta_table(spark, path).collect()}
    assert out[150] == "x"  # v is NULL: kept
    assert out[0] == "y"


def test_delta_update_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_table(
        _df(spark, [(1, "a", 1.0)]), path, partition_by=["cat"]
    )
    with pytest.raises(ValueError, match="not in the table schema"):
        update_delta_table(spark, path, {"nope": "1"})
    with pytest.raises(ValueError, match="partition column"):
        update_delta_table(spark, path, {"cat": "'b'"})
    with pytest.raises(ValueError, match="SET"):
        update_delta_table(spark, path, {})
    # zero-match: None, no commit
    assert update_delta_table(
        spark, path, {"v": "0.0"}, [("id", ">=", 99)]
    ) is None


# ---------------------------------------------------------- iceberg UPDATE


def test_iceberg_update_touch_only(spark, tmp_path):
    path = str(tmp_path / "t")
    for lo in (0, 100, 200):
        rows = [(lo + i, "c", float(lo + i)) for i in range(10)]
        write_iceberg_table(_df(spark, rows).coalesce(1), path)
    before = read_iceberg_snapshot(path)
    paths_before = {f[0] for f in before.files}

    # bounds prove no match: None, snapshot unchanged
    assert update_iceberg_table(
        spark, path, {"v": "0.0"}, [("id", ">=", 10_000)]
    ) is None
    assert read_iceberg_snapshot(path).snapshot_id == before.snapshot_id

    sid = update_iceberg_table(
        spark,
        path,
        {"v": "v + 0.5"},
        [("id", ">=", 100), ("id", "<", 105)],
    )
    assert sid is not None
    after = read_iceberg_snapshot(path)
    assert len({f[0] for f in after.files} & paths_before) == 2
    out = {r["id"]: r["v"] for r in read_iceberg_table(spark, path).collect()}
    assert out[100] == 100.5 and out[104] == 104.5
    assert out[105] == 105.0 and out[5] == 5.0
    # time travel to the pre-update snapshot
    old = {
        r["id"]: r["v"]
        for r in read_iceberg_table(
            spark, path, snapshot_id=before.snapshot_id
        ).collect()
    }
    assert old[100] == 100.0
    # schema stable
    assert [f.dataType.simpleString() for f in
            read_iceberg_table(spark, path).schema.fields] == [
        "bigint", "string", "double",
    ]


def test_iceberg_update_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_table(_df(spark, [(1, "a", 1.0)]), path)
    with pytest.raises(ValueError, match="not in the table schema"):
        update_iceberg_table(spark, path, {"nope": "1"})
    with pytest.raises(ValueError, match="SET"):
        update_iceberg_table(spark, path, {})
    # unconditional update rewrites all files
    sid = update_iceberg_table(spark, path, {"cat": "'z'"})
    assert sid is not None
    assert {r["cat"] for r in read_iceberg_table(spark, path).collect()} == {"z"}


# ------------------------------------------------- SET sees pre-update row


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_update_set_evaluates_against_pre_update_row(spark, tmp_path, fmt):
    """SQL UPDATE: every SET right-hand side sees the PRE-update row —
    `SET v = id, id = v` swaps (review finding: chained withColumn made
    the second assignment read the first's output)."""
    path = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 10.0), (2, "b", 20.0)])
    if fmt == "delta":
        write_delta_table(df, path)
        update_delta_table(
            spark, path, {"v": "cast(id as double)", "id": "cast(v as long)"}
        )
        out = read_delta_table(spark, path)
    else:
        write_iceberg_table(df, path)
        update_iceberg_table(
            spark, path, {"v": "cast(id as double)", "id": "cast(v as long)"}
        )
        out = read_iceberg_table(spark, path)
    got = sorted((r["id"], r["cat"], r["v"]) for r in out.collect())
    assert got == [(10, "a", 1.0), (20, "b", 2.0)]
    # column ORDER must not drift through the projection rewrite
    assert out.columns == ["id", "cat", "v"]
