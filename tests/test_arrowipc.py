"""Arrow IPC source/sink: cross-verification against pyarrow's own
reader/writer (our reader over a plain-pyarrow file, plain pyarrow over
our writer's file), format pins (ARROW1 magic), stream-format support,
compression, empty-input semantics, and the map-only plan gate.

The cross-checks are real: `read_arrow_ipc`'s per-task iteration and
schema normalization are exercised against files this module writes
with pyarrow directly (never through `write_arrow_ipc`), and vice
versa — so a paired bug in our read+write path cannot cancel.
"""

from __future__ import annotations

import datetime
import io
import os

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from ballista_spark.sources.arrowipc import (
    MAGIC,
    iter_ipc_batches,
    read_arrow_ipc,
    write_arrow_ipc,
)


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([1, 2, 3, None], type=pa.int64()),
            "name": pa.array(["a", None, "é中", "d"]),
            "score": pa.array([1.5, -0.25, None, 0.0], type=pa.float64()),
            "tags": pa.array([["x", "y"], [], None, ["z"]], type=pa.list_(pa.string())),
            "blob": pa.array([b"\x00\xff", b"", None, b"abc"], type=pa.binary()),
            "day": pa.array(
                [datetime.date(2020, 1, 1), None, datetime.date(1999, 12, 31),
                 datetime.date(2026, 8, 16)],
                type=pa.date32(),
            ),
        }
    )


def _rows(df):
    return sorted(
        map(tuple, (r for r in df.collect())),
        key=lambda t: (t[0] is None, t[0]),
    )


# ---------------------------------------------------------------- pure core


def test_iter_ipc_batches_file_format_batch_boundaries():
    t = _sample_table()
    buf = io.BytesIO()
    with ipc.new_file(buf, t.schema) as w:
        for batch in t.to_batches(max_chunksize=2):
            w.write_batch(batch)
    buf.seek(0)
    got = list(iter_ipc_batches(buf))
    # batch boundaries preserved — the reader streams, never concatenates
    assert [b.num_rows for b in got] == [2, 2]
    assert pa.Table.from_batches(got).equals(t)


def test_iter_ipc_batches_stream_format():
    t = _sample_table()
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    buf.seek(0)
    assert pa.Table.from_batches(list(iter_ipc_batches(buf))).equals(t)


# ------------------------------------------------------------- reader face


def test_read_over_plain_pyarrow_files(spark, tmp_path):
    t = _sample_table()
    for i, fmt in enumerate((ipc.new_file, ipc.new_stream)):
        with fmt(str(tmp_path / f"f{i}.arrow"), t.schema) as w:
            w.write_table(t)
    df = read_arrow_ipc(spark, str(tmp_path))
    assert df.count() == 8
    names = [f.name for f in df.schema.fields]
    assert names == ["id", "name", "score", "tags", "blob", "day"]
    one = [r for r in df.collect() if r["id"] == 3]
    assert len(one) == 2
    assert one[0]["name"] == "é中"
    assert one[0]["blob"] is None
    assert one[0]["day"] == datetime.date(1999, 12, 31)


def test_read_normalizes_schema_variants(spark, tmp_path):
    """large_string + reordered fields still read under one schema."""
    base = pa.table({"id": pa.array([1], pa.int64()), "s": pa.array(["a"])})
    variant = pa.table(
        {
            "s": pa.array(["b"], pa.large_string()),
            "id": pa.array([2], pa.int64()),
        }
    )
    with ipc.new_file(str(tmp_path / "a.arrow"), base.schema) as w:
        w.write_table(base)
    with ipc.new_file(str(tmp_path / "b.arrow"), variant.schema) as w:
        w.write_table(variant)
    df = read_arrow_ipc(spark, str(tmp_path))
    # which file the driver samples for the schema is unspecified;
    # normalize column order before comparing
    got = _rows(df.select("id", "s"))
    assert got == [(1, "a"), (2, "b")]


def test_read_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_arrow_ipc(spark, str(tmp_path))


def test_read_plan_map_only(spark, tmp_path):
    t = _sample_table()
    with ipc.new_file(str(tmp_path / "f.arrow"), t.schema) as w:
        w.write_table(t)
    df = read_arrow_ipc(spark, str(tmp_path)).select("id")
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # one exchange (the path repartition for file-parallelism), nothing else
    assert plan.count("Exchange") <= 1
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- writer face


def test_write_then_plain_pyarrow_reads(spark, tmp_path):
    t = _sample_table()
    sdf = spark.createDataFrame(t.to_pandas())
    out = str(tmp_path / "out")
    files = write_arrow_ipc(sdf.repartition(2), out)
    assert files and all(f.endswith(".arrow") for f in files)
    read_back = []
    for f in files:
        raw = open(f, "rb").read()
        assert raw[:6] == MAGIC and raw[-6:] == MAGIC  # file-format pin
        read_back.append(ipc.open_file(f).read_all())
    merged = pa.concat_tables(read_back, promote_options="permissive")
    assert merged.num_rows == 4
    assert sorted(merged.column("name").to_pylist(), key=lambda v: (v is None, v)) == [
        "a", "d", "é中", None,
    ]


def test_roundtrip_with_compression(spark, tmp_path):
    sdf = spark.range(1000).selectExpr(
        "id", "cast(id * 1.5 as double) v", "repeat('x', 50) s"
    )
    for codec in ("lz4", "zstd"):
        out = str(tmp_path / f"c_{codec}")
        write_arrow_ipc(sdf, out, compression=codec)
        got = read_arrow_ipc(spark, out)
        assert got.count() == 1000
        assert got.selectExpr("sum(v)").collect()[0][0] == pytest.approx(
            sum(i * 1.5 for i in range(1000))
        )


def test_write_empty_df_keeps_schema(spark, tmp_path):
    sdf = spark.range(10).filter("id < 0").selectExpr("id", "cast(id as string) s")
    out = str(tmp_path / "empty")
    files = write_arrow_ipc(sdf, out)
    assert len(files) == 1
    df = read_arrow_ipc(spark, out)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "s"]


def test_context_faces(spark, tmp_path):
    from ballista_spark.context import BallistaContext

    ctx = BallistaContext(spark=spark)
    sdf = spark.range(5).selectExpr("id", "id * 2 as v")
    out = str(tmp_path / "ctx")
    write_arrow_ipc(sdf, out)
    assert ctx.read_arrow(out).df.count() == 5
    ctx.create_external_table("t_ipc", out, file_type="arrow")
    assert ctx.sql("select sum(v) s from t_ipc").df.collect()[0]["s"] == 20
