"""WARC ingest: synthesized archives (plain / whole-gzip / member-gzip),
record fidelity, HTTP envelope split, malformed-record tolerance, and
the html/url composition path."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from ballista_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_to_documents,
)


def make_record(
    rid: str,
    uri: str,
    body: bytes,
    rtype: str = "response",
    http: bool = True,
    content_type: str = "text/html",
) -> bytes:
    if http and rtype == "response":
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode()
            + b"\r\nX-Junk: 1\r\n\r\n"
            + body
        )
    else:
        payload = body
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype.encode() + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n"
    )
    return headers + payload + b"\r\n\r\n"


BODY_A = b"<html><body><p>Hello WARC</p></body></html>"
BODY_B = "café unicode".encode("utf-8")

ARCHIVE = (
    make_record("info", "", b"software: test", rtype="warcinfo", http=False)
    + make_record("a", "https://x.com/a", BODY_A)
    + make_record("b", "https://y.org/b", BODY_B, content_type="text/plain")
    + make_record("req", "https://x.com/a", b"GET /a HTTP/1.1", rtype="request",
                  http=False)
)


def test_parse_warc_bytes_pure():
    recs, errors = parse_warc_bytes(ARCHIVE)
    assert errors == 0
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "response", "request",
    ]
    a = recs[1]
    assert a["target_uri"] == "https://x.com/a"
    assert a["payload"] == BODY_A  # HTTP envelope stripped
    assert a["http_status"] == 200
    assert a["http_content_type"] == "text/html"
    assert recs[0]["payload"] == b"software: test"  # non-response kept whole


def test_malformed_records_skipped_not_fatal():
    bad_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\nxx"
    )
    truncated = make_record("t", "https://t", b"full body")[:-20]
    recs, errors = parse_warc_bytes(bad_len + ARCHIVE + truncated)
    assert errors == 2
    assert len(recs) == 4  # the good archive still parses


@pytest.mark.parametrize("compress", ["plain", "whole", "member"])
def test_read_warc_spark(spark, tmp_path, compress):
    p = tmp_path / ("t.warc" + (".gz" if compress != "plain" else ""))
    if compress == "plain":
        p.write_bytes(ARCHIVE)
    elif compress == "whole":
        p.write_bytes(gzip.compress(ARCHIVE))
    else:  # one gzip member per record, the Common Crawl layout
        recs = [
            make_record("info", "", b"software: test", rtype="warcinfo", http=False),
            make_record("a", "https://x.com/a", BODY_A),
            make_record("b", "https://y.org/b", BODY_B, content_type="text/plain"),
        ]
        p.write_bytes(b"".join(gzip.compress(r) for r in recs))
    df = read_warc(spark, str(p))
    rows = {r.target_uri: r for r in df.collect()}
    assert set(rows) == {"https://x.com/a", "https://y.org/b"}
    assert bytes(rows["https://x.com/a"].payload) == BODY_A
    assert rows["https://y.org/b"].http_content_type == "text/plain"
    assert all(r.warc_type == "response" for r in rows.values())
    assert sum(r.n_parse_errors for r in rows.values()) == 0


def test_record_type_filter_and_all(spark, tmp_path):
    p = tmp_path / "t2.warc"
    p.write_bytes(ARCHIVE)
    all_recs = read_warc(spark, str(p), record_types=None).collect()
    assert {r.warc_type for r in all_recs} == {"warcinfo", "response", "request"}
    wet = read_warc(spark, str(p), record_types=("warcinfo",)).collect()
    assert len(wet) == 1


def test_stream_parser_single_byte_feeds_match_batch():
    """The streaming parser must produce identical records + error count
    whether fed the archive whole, in single bytes, or in odd-sized
    chunks — the batch parse_warc_bytes is the mirror."""
    from ballista_spark.sources.warc import WarcStreamParser

    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\nxx"
    data = bad + ARCHIVE + make_record("t", "https://t", b"full body")[:-20]
    want_recs, want_errors = parse_warc_bytes(data)
    for step in (1, 7, 4096):
        p = WarcStreamParser()
        got = []
        for i in range(0, len(data), step):
            got += p.feed(data[i:i + step])
        got += p.finish()
        assert got == want_recs, step
        assert p.errors == want_errors, step


def test_record_batches_bounded_and_incremental():
    """iter_warc_record_batches must (a) cap every yielded batch at
    records_per_batch, (b) put the file's error total on the LAST
    record only, and (c) start yielding BEFORE the chunk stream is
    exhausted — the memory-bound contract (no whole-file buffering)."""
    import gzip

    from ballista_spark.sources.warc import iter_warc_record_batches

    recs = [
        make_record(f"r{i}", f"https://x.com/{i}", b"b" * 100) for i in range(50)
    ]
    truncated = make_record("t", "https://t", b"full body")[:-20]
    raw = b"".join(gzip.compress(r) for r in recs) + gzip.compress(truncated)
    chunk_size = 512
    consumed = []

    def chunks():
        for i in range(0, len(raw), chunk_size):
            consumed.append(i)
            yield raw[i:i + chunk_size]

    batches = []
    consumed_at_first_yield = None
    for b in iter_warc_record_batches(chunks(), ("response",), records_per_batch=8):
        if consumed_at_first_yield is None:
            consumed_at_first_yield = len(consumed)
        batches.append(b)
    flat = [r for b in batches for r in b]
    assert all(len(b) <= 8 for b in batches)
    assert len(flat) == 50
    assert [r["target_uri"] for r in flat] == [f"https://x.com/{i}" for i in range(50)]
    # error total rides the last record only
    assert [r["n_parse_errors"] for r in flat] == [0] * 49 + [1]
    # incremental: the first batch appeared well before EOF
    total_chunks = (len(raw) + chunk_size - 1) // chunk_size
    assert consumed_at_first_yield < total_chunks


def test_error_count_survives_type_filter(spark, tmp_path):
    """A file whose records are all filtered out (or all malformed)
    still reports n_parse_errors via a summary row (round-5 ADVICE)."""
    from ballista_spark.sources.warc import iter_warc_record_batches

    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\nxx"
    data = (
        bad
        + make_record("req", "https://x.com/a", b"GET /a", rtype="request", http=False)
    )
    # pure: filter keeps nothing -> one summary row with the count
    batches = list(iter_warc_record_batches([data], ("response",)))
    assert len(batches) == 1 and len(batches[0]) == 1
    s = batches[0][0]
    assert s["record_id"] is None and s["n_parse_errors"] == 1
    # end-to-end through Spark: the count lands in the DataFrame and
    # warc_to_documents drops the summary row
    p = tmp_path / "bad.warc"
    p.write_bytes(data)
    df = read_warc(spark, str(p), record_types=("response",))
    rows = df.collect()
    assert len(rows) == 1 and rows[0].record_id is None
    assert rows[0].n_parse_errors == 1
    assert warc_to_documents(df).count() == 0


def test_listing_prunes_content_column(spark, tmp_path):
    """The path-distributed design: the binaryFile scan must read ONLY
    the path column — no file bytes through the JVM, so the 2 GiB
    byte[] ceiling does not apply."""
    p = tmp_path / "t4.warc"
    p.write_bytes(ARCHIVE)
    df = read_warc(spark, str(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<path:string>" in plan
    assert "content" not in plan.split("ReadSchema")[1][:200]


def test_read_warc_multi_file_and_large_batching(spark, tmp_path):
    """Multiple files in one glob: per-file warc_file labels, per-file
    error attribution, small records_per_batch still exact."""
    import gzip

    a = tmp_path / "a.warc.gz"
    a.write_bytes(
        b"".join(
            gzip.compress(make_record(f"a{i}", f"https://a.com/{i}", b"x" * 10))
            for i in range(7)
        )
    )
    b = tmp_path / "b.warc"
    b.write_bytes(ARCHIVE + make_record("t", "https://t", b"body")[:-10])
    df = read_warc(spark, str(tmp_path) + "/*.warc*", records_per_batch=3)
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["a.warc.gz"]) == 7
    assert sum(r.n_parse_errors for r in by_file["a.warc.gz"]) == 0
    assert len(by_file["b.warc"]) == 2  # the two response records
    assert sum(r.n_parse_errors for r in by_file["b.warc"]) == 1


def test_warc_to_documents_composition(spark, tmp_path):
    from ballista_spark.operators.html import html_to_text
    from ballista_spark.operators.url import url_host

    p = tmp_path / "t3.warc"
    p.write_bytes(ARCHIVE)
    docs = warc_to_documents(read_warc(spark, str(p)))
    out = {
        r.host: r.text
        for r in docs.select(
            url_host("url").alias("host"), html_to_text("text").alias("text")
        ).collect()
    }
    assert out["x.com"] == "Hello WARC"
    assert out["y.org"] == "café unicode"


def test_iter_gunzip_bounds_inflation_per_yield():
    """A high-ratio member (zeros compress ~1000:1) must inflate in
    bounded slices, never one archive-sized allocation — the O(chunk)
    contract (decompress bombs are a real crawl input)."""
    import gzip

    from ballista_spark.sources.warc import DEFAULT_CHUNK_BYTES, _iter_gunzip

    blob = gzip.compress(b"\x00" * (64 * 1024 * 1024))  # 64 MiB -> ~64 KiB
    assert len(blob) < 1024 * 1024
    total = 0
    for out in _iter_gunzip([blob]):
        assert len(out) <= DEFAULT_CHUNK_BYTES
        total += len(out)
    assert total == 64 * 1024 * 1024


def test_hadoop_scheme_aliases_rewrite_to_pyarrow():
    """s3a:// (the Common Crawl-on-EMR spelling) and friends must map
    to schemes pyarrow's FileSystem.from_uri understands; native and
    local paths pass through untouched."""
    from ballista_spark.sources.warc import _pyarrow_uri

    assert _pyarrow_uri("s3a://bucket/cc/file.warc.gz") == "s3://bucket/cc/file.warc.gz"
    assert _pyarrow_uri("s3n://b/k") == "s3://b/k"
    assert _pyarrow_uri("S3A://b/k") == "s3://b/k"
    assert _pyarrow_uri("wasbs://c@a.blob/x") == "abfss://c@a.blob/x"
    assert _pyarrow_uri("viewfs://ns/x") == "hdfs://ns/x"
    assert _pyarrow_uri("s3://b/k") == "s3://b/k"
    assert _pyarrow_uri("gs://b/k") == "gs://b/k"
    assert _pyarrow_uri("/local/path.warc.gz") == "/local/path.warc.gz"


def test_streaming_package_exports_media_gate():
    import ballista_spark.streaming as bss

    assert callable(bss.media_neardup_gate_stream)
    assert "media_neardup_gate_stream" in bss.__all__
