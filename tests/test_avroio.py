"""Pure-Python Avro object-container codec: spec-shape pins, round
trips, codecs, schema translation, and the distributed Spark faces.

The byte-level pins matter because no Avro library exists in this
environment to cross-check against: MAGIC/zigzag/union-index encodings
are asserted against hand-computed spec values so a paired
encoder/decoder bug cannot cancel (the JPEG-oracle discipline,
tests/test_jpeg.py).
"""

from __future__ import annotations

import io
import json

import pytest

from ballista_spark.sources.avroio import (
    AvroTypeError,
    avro_to_spark_schema,
    iter_avro_blocks,
    read_avro,
    read_avro_bytes,
    spark_to_avro_schema,
    write_avro,
    write_avro_bytes,
)


REC_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "blob", "type": "bytes"},
    ],
}

ROWS = [
    {"id": 1, "name": "a", "score": 1.5, "tags": ["x", "y"],
     "props": {"k": 7}, "blob": b"\x00\xff"},
    {"id": -2, "name": None, "score": -0.25, "tags": [],
     "props": {}, "blob": b""},
    {"id": 2**40, "name": "unicode é中", "score": 0.0,
     "tags": ["z"], "props": {"a": -1, "b": 2}, "blob": b"abc"},
]


def test_container_roundtrip_null_and_deflate():
    for codec in ("null", "deflate"):
        payload = write_avro_bytes(ROWS, REC_SCHEMA, codec=codec)
        got, schema = read_avro_bytes(payload)
        assert got == ROWS
        assert schema == REC_SCHEMA


def test_header_and_zigzag_spec_pins():
    """Hand-computed spec values: magic, metadata map, zigzag longs."""
    payload = write_avro_bytes([], REC_SCHEMA, codec="null")
    assert payload[:4] == b"Obj\x01"
    assert b"avro.schema" in payload and b"avro.codec" in payload
    # zigzag: 0->0, -1->1, 1->2, -2->3, 2->4 (Avro spec table)
    from ballista_spark.sources.avroio import _read_long, _write_long

    for value, wire in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                        (-2, b"\x03"), (2, b"\x04"), (64, b"\x80\x01")]:
        buf = bytearray()
        _write_long(buf, value)
        assert bytes(buf) == wire, value
        assert _read_long(io.BytesIO(wire)) == value
    # nullable union: null branch encodes as index varint only
    one = write_avro_bytes(
        [{"id": 0, "name": None, "score": 0.0, "tags": [], "props": {},
          "blob": b""}],
        REC_SCHEMA,
        codec="null",
    )
    got, _ = read_avro_bytes(one)
    assert got[0]["name"] is None


def test_blocks_stream_bounded():
    rows = [{"id": i, "name": "n" * 50, "score": float(i), "tags": [],
             "props": {}, "blob": b""} for i in range(1000)]
    payload = write_avro_bytes(rows, REC_SCHEMA, block_bytes=4096)
    blocks = list(iter_avro_blocks(io.BytesIO(payload)))
    assert len(blocks) > 5  # really split into multiple blocks
    assert [r for b in blocks for r in b] == rows


def test_corrupt_inputs_raise_cleanly():
    with pytest.raises(ValueError, match="magic"):
        read_avro_bytes(b"NOPE" + b"\x00" * 40)
    good = write_avro_bytes(ROWS, REC_SCHEMA, codec="null",
                            sync=b"\xabSYNCSYNCSYNCSYN")
    with pytest.raises((ValueError, EOFError)):
        read_avro_bytes(good[:-8])  # truncated tail: short sync marker
    flipped = good[:-4] + b"\x00\x00\x00\x00"  # corrupt the sync itself
    with pytest.raises(ValueError, match="sync"):
        read_avro_bytes(flipped)


def test_enum_fixed_and_unsupported():
    sch = {
        "type": "record",
        "name": "e",
        "fields": [
            {"name": "c", "type": {"type": "enum", "name": "col",
                                   "symbols": ["RED", "GREEN"]}},
            {"name": "f", "type": {"type": "fixed", "name": "fx", "size": 3}},
        ],
    }
    rows = [{"c": "GREEN", "f": b"abc"}, {"c": "RED", "f": b"xyz"}]
    assert read_avro_bytes(write_avro_bytes(rows, sch))[0] == rows
    with pytest.raises(AvroTypeError):
        write_avro_bytes([{"u": 1}], {
            "type": "record", "name": "u",
            "fields": [{"name": "u", "type": ["int", "string"]}],
        })


def test_schema_translation_both_ways(spark):
    from pyspark.sql import types as T

    st = avro_to_spark_schema(REC_SCHEMA)
    assert isinstance(st, T.StructType)
    assert dict((f.name, f.dataType.simpleString()) for f in st.fields) == {
        "id": "bigint", "name": "string", "score": "double",
        "tags": "array<string>", "props": "map<string,bigint>",
        "blob": "binary",
    }
    assert st["name"].nullable and not st["id"].nullable
    back = spark_to_avro_schema(st)
    assert json.dumps(back).count('"record"') >= 1


def test_spark_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"name{i}" if i % 3 else None, float(i) / 4, ["t", str(i)],
          bytearray(b"\x01" + bytes([i % 256])))
         for i in range(500)],
        "id long, name string, score double, tags array<string>, blob binary",
    )
    out = str(tmp_path / "av")
    files = write_avro(df, out)
    assert files and all(f.endswith(".avro") for f in files)
    got = read_avro(spark, out)
    assert got.schema.simpleString() == df.schema.simpleString()
    a = sorted(
        (r["id"], r["name"], r["score"], tuple(r["tags"]), bytes(r["blob"]))
        for r in got.collect()
    )
    b = sorted(
        (r["id"], r["name"], r["score"], tuple(r["tags"]), bytes(r["blob"]))
        for r in df.collect()
    )
    assert a == b


def test_read_avro_plan_is_map_only(spark, tmp_path):
    df = spark.createDataFrame([(i, str(i)) for i in range(100)], "id long, s string")
    out = str(tmp_path / "av")
    write_avro(df, out)
    plan = (
        read_avro(spark, out)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one scan (the path listing) + Arrow-batched python stage; the
    # repartition-by-path exchange is the only shuffle
    assert plan.count("Exchange") <= 1
    assert "MapInPandas" in plan


def test_timestamp_and_date_logicals():
    import datetime

    sch = {
        "type": "record", "name": "t",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
        ],
    }
    rows = [{"d": datetime.date(2026, 8, 15),
             "ts": datetime.datetime(2026, 8, 15, 12, 30, 45, 123456)}]
    got, _ = read_avro_bytes(write_avro_bytes(rows, sch))
    assert got == rows


def test_read_avro_projected_and_kv_maps():
    """Round-10 additions: projection to flat tuples (missing paths →
    None), kv_arrays_as_maps dict decode, and the encoder re-emitting
    dict-form kv arrays byte-identically."""
    from ballista_spark.sources.avroio import read_avro_projected

    kv = {
        "type": "record",
        "name": "kv",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    }
    sch = {
        "type": "record",
        "name": "entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "inner",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "inner",
                        "fields": [
                            {"name": "path", "type": "string"},
                            {"name": "n", "type": "long"},
                            {
                                "name": "bounds",
                                "type": [
                                    "null",
                                    {"type": "array", "items": kv},
                                ],
                            },
                        ],
                    },
                ],
            },
        ],
    }
    recs = [
        {
            "status": 1,
            "inner": {
                "path": "a.parquet",
                "n": 5,
                "bounds": [{"key": 1, "value": b"\x01"}],
            },
        },
        {"status": 2, "inner": None},
    ]
    payload = write_avro_bytes(recs, sch, codec="null")

    rows = read_avro_projected(
        payload,
        [("status",), ("inner", "path"), ("inner", "bounds"),
         ("inner", "missing_field"), ("not_there",)],
        kv_arrays_as_maps=True,
    )
    assert rows == [
        (1, "a.parquet", {1: b"\x01"}, None, None),
        (2, None, None, None, None),
    ]

    # kv_arrays_as_maps full decode + re-encode round-trips to the
    # SAME bytes (the carry-forward contract for cached manifests)
    decoded, _ = read_avro_bytes(payload, kv_arrays_as_maps=True)
    assert decoded[0]["inner"]["bounds"] == {1: b"\x01"}
    assert write_avro_bytes(decoded, sch, codec="null") == payload

    # projection through an array falls back to full decode, same rows
    arr_sch = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "tag", "type": "string"},
        ],
    }
    arr_payload = write_avro_bytes(
        [{"xs": [1, 2], "tag": "t"}], arr_sch, codec="null"
    )
    assert read_avro_projected(arr_payload, [("xs", "oops"), ("tag",)]) == [
        (None, "t")
    ]
    assert read_avro_projected(arr_payload, [("tag",)]) == [("t",)]


def test_generated_decoder_matches_reference_decoder():
    """The codegen fast path and the original closure decoder agree on
    every supported construct (enums, fixed, unions, maps, logicals,
    nested records, negative block counts are writer-side absent but
    empty/None variants are covered)."""
    import datetime

    from ballista_spark.sources.avroio import (
        _block_decoder,
        _compile_buf_decoder,
    )

    sch = {
        "type": "record",
        "name": "all",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "f8", "size": 2}},
            {"name": "e", "type": {"type": "enum", "name": "col",
                                   "symbols": ["R", "G"]}},
            {"name": "ns", "type": ["null", "string"]},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "a", "type": {"type": "array", "items": "string"}},
            {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "long"}],
                },
            },
        ],
    }
    recs = [
        {
            "b": True, "i": -7, "f": 1.5, "d": -2.25, "s": "héllo",
            "by": b"\x00\xff", "fx": b"ab", "e": "G", "ns": None,
            "m": {"k1": 1, "k2": -2}, "a": ["x", ""],
            "dt": datetime.date(2021, 3, 4),
            "ts": datetime.datetime(2020, 1, 2, 3, 4, 5, 123456),
            "nested": {"x": 9},
        },
        {
            "b": False, "i": 0, "f": 0.0, "d": 0.0, "s": "", "by": b"",
            "fx": b"zz", "e": "R", "ns": "set", "m": {}, "a": [],
            "dt": datetime.date(1970, 1, 1),
            "ts": datetime.datetime(1970, 1, 1),
            "nested": {"x": -1},
        },
    ]
    payload = write_avro_bytes(recs, sch, codec="null")
    f = io.BytesIO(payload)
    from ballista_spark.sources.avroio import _read_header

    _sch, codec, sync = _read_header(f)
    block = f.read()  # one block: count, size, data, sync
    import ballista_spark.sources.avroio as av

    bf = io.BytesIO(block)
    n = av._read_long(bf)
    size = av._read_long(bf)
    raw = bf.read(size)

    fast: list = []
    _block_decoder(sch)(raw, 0, n, fast.append)
    slow: list = []
    pos = 0
    dec = _compile_buf_decoder(sch)
    for _ in range(n):
        v, pos = dec(raw, pos)
        slow.append(v)
    assert fast == slow
    assert fast[0]["m"] == {"k1": 1, "k2": -2}
    assert fast[0]["dt"] == datetime.date(2021, 3, 4)
    assert fast[0]["ts"] == datetime.datetime(2020, 1, 2, 3, 4, 5, 123456)
    assert fast == recs
