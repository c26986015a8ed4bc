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
