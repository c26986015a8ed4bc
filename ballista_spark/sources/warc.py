"""WARC (Web ARChive, ISO 28500) ingest: the container format web-scale
corpora actually arrive in — Common Crawl publishes WARC (raw
responses), WAT (metadata) and WET (extracted text) — read into a
DataFrame of one row per record, feeding the engine's HTML/URL/curation
operators.

Scale design: WARC archives are published as many ~1 GiB files, so the
natural parallel unit is the FILE — ``spark.read.format("binaryFile")``
lists and distributes files, and each file's records are parsed inside
ONE Arrow-batched ``mapInPandas`` pass (pure-Python byte scanning —
there is no JVM WARC reader in stock Spark, making this one of the
repo's sanctioned Python stages, like the multimodal codecs).  No
shuffle: parse is map-only; downstream operators decide partitioning.
Member-gzipped archives (``.warc.gz`` — every record its own gzip
member, the Common Crawl layout) and plain-gzip/uncompressed files all
decode through the same zlib multi-member loop.

Record fidelity: WARC headers are parsed into a map, the HTTP response
envelope (for ``response`` records whose payload starts with an HTTP
status line) is split off so ``payload`` is the body bytes, and the
``http_content_type`` / ``http_status`` land in their own columns.
Malformed records (bad Content-Length, truncated tails) are skipped,
counted per-file in the ``n_parse_errors`` of the last emitted row
rather than failing the job — crawl archives contain garbage and a
100 TB ingest must not die on record 4-billion-and-two.

The reference engine has no WARC surface (`rust/core/proto/
ballista.proto` — CSV/Parquet/Avro only); training-data-pipeline
mandate (SURVEY §2 beyond-reference inventory).
"""

from __future__ import annotations

import io
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema of read_warc — one row per WARC record
WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_parse_errors", T.IntegerType()),
    ]
)


def _gunzip_all(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout) — or
    return the input unchanged when it is not gzip."""
    if len(data) < 2 or data[:2] != b"\x1f\x8b":
        return data
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.write(d.decompress(data[pos:]))
        except zlib.error:
            break
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return out.getvalue()


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # line 0 is WARC/1.x or HTTP/1.x
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1", "replace")
            )
    return headers


def parse_warc_bytes(data: bytes) -> tuple[list[dict], int]:
    """All records of one WARC file (already decompressed) + the count
    of malformed records skipped.  Pure function — the Python mirror in
    tests calls it directly."""
    records: list[dict] = []
    errors = 0
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            errors += 1
            break
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            errors += 1
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            errors += 1
            break
        payload = data[body_start:body_end]
        status, ctype = None, None
        if headers.get("warc-type") == "response" and payload.startswith(b"HTTP/"):
            http_end = payload.find(b"\r\n\r\n")
            if http_end >= 0:
                http_headers = _parse_headers(payload[:http_end])
                status_line = payload.split(b"\r\n", 1)[0].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    status = int(status_line[1])
                ctype = http_headers.get("content-type")
                payload = payload[http_end + 4:]
        records.append(
            {
                "record_id": headers.get("warc-record-id"),
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "http_status": status,
                "http_content_type": ctype,
                "payload": payload,
            }
        )
        pos = body_end
    return records, errors


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple = ("response",),
) -> DataFrame:
    """DataFrame of WARC records under ``path`` (glob ok; plain,
    whole-gzip, or member-gzip files).  ``record_types`` filters (e.g.
    ``("response",)`` for page bodies, ``("conversion",)`` for WET
    extracted text; ``None`` keeps everything including warcinfo/
    request records).

    One file per task via ``binaryFile``; see the module docstring for
    the scale contract.  Compose downstream:
    ``html_to_text(decode(payload))`` → curation.
    """
    types = tuple(record_types) if record_types else None

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                recs, errors = parse_warc_bytes(_gunzip_all(bytes(row["content"])))
                out = [
                    r for r in recs if types is None or r["warc_type"] in types
                ]
                for i, r in enumerate(out):
                    r["warc_file"] = row["path"]
                    r["n_parse_errors"] = errors if i == len(out) - 1 else 0
                if out:
                    yield pd.DataFrame(out, columns=[f.name for f in WARC_SCHEMA])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_to_documents(
    records: DataFrame,
    charset: str = "utf-8",
) -> DataFrame:
    """(doc_id, url, text) from response records: payload decoded
    (errors replaced), doc_id = the WARC record id.  Map-only JVM
    ``decode``; pair with ``html.html_to_text`` for body extraction."""
    return records.select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.decode(F.col("payload"), charset).alias("text"),
    )
