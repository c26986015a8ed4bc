"""WARC (Web ARChive, ISO 28500) ingest: the container format web-scale
corpora actually arrive in — Common Crawl publishes WARC (raw
responses), WAT (metadata) and WET (extracted text) — read into a
DataFrame of one row per record, feeding the engine's HTML/URL/curation
operators.

Scale design — STREAMING, memory-bounded: WARC archives are published
as many ~1 GiB files, so the natural parallel unit is the FILE.  The
engine distributes file *paths* (a `binaryFile` listing pruned to the
path column — no content bytes ever cross the JVM, so the 2 GiB Java
byte[] ceiling does not apply), and each task opens its file itself
(pyarrow FileSystem for hdfs://, s3://, …; plain ``open`` for local
paths), reads fixed-size chunks, decompresses the member-gzip chain
incrementally through ``zlib.decompressobj``, parses records out of a
rolling buffer, and yields an Arrow batch every ``records_per_batch``
records.  Peak memory per task is O(chunk + batch + largest record) —
independent of archive size — where the previous design materialized
the compressed file, the full decompressed archive, AND a payload copy
simultaneously (~10 GiB for a real 1 GiB ``.warc.gz``).  Parsing is
pure-Python byte scanning inside ONE Arrow-batched ``mapInPandas`` —
there is no JVM WARC reader in stock Spark, making this one of the
repo's sanctioned Python stages, like the multimodal codecs.  No
shuffle: parse is map-only; downstream operators decide partitioning.

Record fidelity: WARC headers are parsed into a map, the HTTP response
envelope (for ``response`` records whose payload starts with an HTTP
status line) is split off so ``payload`` is the body bytes, and the
``http_content_type`` / ``http_status`` land in their own columns.
Malformed records (bad Content-Length, truncated tails) are skipped,
counted per-file: the file's total ``n_parse_errors`` rides the LAST
emitted record of that file (0 on earlier rows); a file whose records
are all filtered out or malformed still reports its count on a single
summary row (``record_id`` NULL, ``n_parse_errors`` > 0) so the
accounting survives any ``record_types`` filter — crawl archives
contain garbage and a 100 TB ingest must not die on (or silently
swallow) record 4-billion-and-two.

The reference engine has no WARC surface (`rust/core/proto/
ballista.proto` — CSV/Parquet/Avro only); training-data-pipeline
mandate (SURVEY §2 beyond-reference inventory).
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

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

#: bytes read from the (compressed) file per chunk
DEFAULT_CHUNK_BYTES = 4 << 20
#: records per yielded Arrow batch — the memory bound knob
DEFAULT_RECORDS_PER_BATCH = 256
#: payload bytes per yielded batch — the bound that matters when
#: records are large (a batch flushes at whichever limit hits first)
DEFAULT_BATCH_BYTES = 32 << 20
#: a WARC header block larger than this is treated as malformed rather
#: than buffered forever (real WARC headers are < 1 KiB)
_MAX_HEADER_BYTES = 1 << 20


def _iter_gunzip(chunks: Iterable[bytes]) -> Iterator[bytes]:
    """Incrementally decompress a stream of byte chunks that may be a
    concatenation of gzip members (the ``.warc.gz`` layout), a single
    whole-file gzip, or not gzip at all (passed through unchanged).
    Yields decompressed chunks; never holds more than O(chunk) bytes.
    A corrupt/truncated gzip tail ends the stream (the parser then
    reports the dangling partial record as a parse error)."""
    it = iter(chunks)
    head = b""
    while len(head) < 2:
        nxt = next(it, None)
        if nxt is None:
            if head:
                yield head
            return
        head += nxt
    if head[:2] != b"\x1f\x8b":
        yield head
        yield from it
        return
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    data = head
    while True:
        while data:
            if d.eof:  # previous member finished mid-chunk — next one
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                # cap the inflate per call: a high-ratio chunk (zero
                # runs, decompression bombs) would otherwise inflate a
                # 4 MiB read to GiBs in ONE allocation, violating the
                # O(chunk) contract above; drain unconsumed_tail until
                # the input chunk is fully processed
                out = d.decompress(data, DEFAULT_CHUNK_BYTES)
            except zlib.error:
                return
            if out:
                yield out
            if d.unconsumed_tail:
                data = d.unconsumed_tail
            else:
                data = d.unused_data
        nxt = next(it, None)
        if nxt is None:
            return
        data = nxt


#: Hadoop-only scheme aliases → the pyarrow-native scheme that reaches
#: the same store.  pyarrow's FileSystem.from_uri knows s3/gs/hdfs/abfs
#: but not the Hadoop connector spellings (s3a://, wasbs://, …) that
#: real deployments — Common Crawl on EMR most of all — actually use.
_SCHEME_ALIASES = {
    "s3a": "s3",
    "s3n": "s3",
    "gcs": "gs",
    "wasb": "abfs",
    "wasbs": "abfss",
    "viewfs": "hdfs",
}


def _pyarrow_uri(path: str) -> str:
    """Rewrite a Hadoop-connector URI scheme to its pyarrow equivalent
    (s3a://b/k → s3://b/k); pyarrow-native schemes pass through."""
    scheme, sep, rest = path.partition("://")
    alias = _SCHEME_ALIASES.get(scheme.lower())
    return f"{alias}{sep}{rest}" if alias else path


def _open_chunks(path: str, chunk_bytes: int = DEFAULT_CHUNK_BYTES) -> Iterator[bytes]:
    """Chunked reader over a file URI.  ``file:`` URIs and bare paths
    open locally; any other scheme goes through pyarrow's FileSystem
    (hdfs://, s3://, gs://, … — Hadoop spellings like s3a:// are
    aliased first, see ``_SCHEME_ALIASES``) so executors stream straight
    from object storage without JVM round-trips.  If pyarrow cannot
    resolve the scheme, fsspec is tried before giving up (fsspec covers
    the long tail: ftp, sftp, http, …)."""
    if path.startswith("file:"):
        local = path[5:]
        while local.startswith("//"):
            local = local[1:]
        f = open(local, "rb")
    elif "://" in path:
        import pyarrow as pa
        from pyarrow import fs as pafs

        try:
            fsys, rel = pafs.FileSystem.from_uri(_pyarrow_uri(path))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError):
            try:
                import fsspec
            except ImportError:
                raise ValueError(
                    f"no filesystem for {path!r}: pyarrow does not "
                    "recognize the scheme and fsspec is not installed"
                ) from None
            f = fsspec.open(path, "rb").open()
        else:
            f = fsys.open_input_stream(rel)
    else:
        f = open(path, "rb")
    with f:
        while True:
            b = f.read(chunk_bytes)
            if not b:
                return
            yield bytes(b)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # line 0 is WARC/1.x or HTTP/1.x
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1", "replace")
            )
    return headers


def _finish_record(headers: dict[str, str], payload: bytes) -> dict:
    """Shared record assembly: split the HTTP envelope off response
    payloads, lift status/content-type into columns."""
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
    return {
        "record_id": headers.get("warc-record-id"),
        "warc_type": headers.get("warc-type"),
        "target_uri": headers.get("warc-target-uri"),
        "warc_date": headers.get("warc-date"),
        "http_status": status,
        "http_content_type": ctype,
        "payload": payload,
    }


class WarcStreamParser:
    """Incremental WARC parser over a rolling buffer: ``feed(chunk)``
    returns the records completed by that chunk, ``finish()`` flushes
    the tail; ``errors`` counts malformed records skipped.  The buffer
    only ever holds the bytes of the record currently in flight (plus a
    4-byte marker tail), so memory is O(largest record), not O(file).

    Identical record/error semantics to the batch :func:`parse_warc_bytes`
    (which is now a thin wrapper over this class) — the pure-Python
    mirror tests cover both via single-byte feeds."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self.errors = 0

    def feed(self, chunk: bytes) -> list[dict]:
        self._buf += chunk
        return self._drain(final=False)

    def finish(self) -> list[dict]:
        return self._drain(final=True)

    def _drain(self, final: bool) -> list[dict]:
        out: list[dict] = []
        buf = self._buf
        pos = 0
        n = len(buf)
        while True:
            start = buf.find(b"WARC/", pos)
            if start < 0:
                # no marker: drop everything but a potential partial
                # "WARC/" straddling the chunk boundary
                pos = n if final else max(pos, n - 4)
                break
            hdr_end = buf.find(b"\r\n\r\n", start)
            if hdr_end < 0:
                if final or n - start > _MAX_HEADER_BYTES:
                    self.errors += 1
                    pos = n
                else:
                    pos = start  # wait for the rest of the header block
                break
            headers = _parse_headers(bytes(buf[start:hdr_end]))
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                self.errors += 1
                pos = hdr_end + 4
                continue
            body_start = hdr_end + 4
            body_end = body_start + length
            if body_end > n:
                if final:
                    self.errors += 1
                    pos = n
                else:
                    pos = start  # wait for the full body
                break
            out.append(_finish_record(headers, bytes(buf[body_start:body_end])))
            pos = body_end
        del self._buf[:pos]
        return out


def parse_warc_bytes(data: bytes) -> tuple[list[dict], int]:
    """All records of one WARC file (already decompressed) + the count
    of malformed records skipped.  Pure function — the Python mirror in
    tests calls it directly.  Thin wrapper over the streaming
    :class:`WarcStreamParser` so batch and stream semantics can't drift."""
    p = WarcStreamParser()
    records = p.feed(data)
    records += p.finish()
    return records, p.errors


def _gunzip_all(data: bytes) -> bytes:
    """Decompress concatenated gzip members fully in memory — test/
    mirror helper only; the ingest path streams via :func:`_iter_gunzip`."""
    return b"".join(_iter_gunzip([data]))


def iter_warc_record_batches(
    chunks: Iterable[bytes],
    record_types: tuple | None,
    records_per_batch: int = DEFAULT_RECORDS_PER_BATCH,
    batch_bytes: int = DEFAULT_BATCH_BYTES,
) -> Iterator[list[dict]]:
    """Record batches (lists of dicts) from a stream of possibly-
    compressed file chunks.  A batch flushes at ``records_per_batch``
    records OR ``batch_bytes`` of payload, whichever first — the byte
    bound keeps peak memory flat when records are megabytes each (256
    one-MiB pages would otherwise pin ~¼ GiB per batch).  The final
    record carries the file's total ``n_parse_errors`` (earlier records
    carry 0), which requires holding exactly ONE record back until EOF;
    if no records survive the type filter but errors occurred, a single
    all-NULL summary row carries the count.  Pure function — unit tests
    drive it directly to assert the bounded-yield contract."""
    parser = WarcStreamParser()
    pending: list[dict] = []
    pending_bytes = 0

    def keep(recs: list[dict]) -> None:
        nonlocal pending_bytes
        for r in recs:
            if record_types is None or r["warc_type"] in record_types:
                r["n_parse_errors"] = 0
                pending.append(r)
                pending_bytes += len(r["payload"] or b"")

    for piece in _iter_gunzip(chunks):
        keep(parser.feed(piece))
        # hold ≥1 back so the last record can carry the error total
        while len(pending) > 1 and (
            len(pending) > records_per_batch or pending_bytes > batch_bytes
        ):
            take = min(records_per_batch, len(pending) - 1)
            batch = pending[:take]
            del pending[:take]
            pending_bytes -= sum(len(r["payload"] or b"") for r in batch)
            yield batch
    keep(parser.finish())
    if pending:
        pending[-1]["n_parse_errors"] = parser.errors
        for i in range(0, len(pending), records_per_batch):
            yield pending[i:i + records_per_batch]
    elif parser.errors:
        yield [
            {
                "record_id": None,
                "warc_type": None,
                "target_uri": None,
                "warc_date": None,
                "http_status": None,
                "http_content_type": None,
                "payload": None,
                "n_parse_errors": parser.errors,
            }
        ]


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple = ("response",),
    records_per_batch: int = DEFAULT_RECORDS_PER_BATCH,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
) -> DataFrame:
    """DataFrame of WARC records under ``path`` (glob ok; plain,
    whole-gzip, or member-gzip files).  ``record_types`` filters (e.g.
    ``("response",)`` for page bodies, ``("conversion",)`` for WET
    extracted text; ``None`` keeps everything including warcinfo/
    request records).

    Streaming + path-distributed — see the module docstring for the
    memory contract (O(chunk + batch + record) per task, no 2 GiB file
    ceiling).  Compose downstream: ``html_to_text(decode(payload))`` →
    curation.
    """
    types = tuple(record_types) if record_types else None
    cols = [f.name for f in WARC_SCHEMA]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                for batch in iter_warc_record_batches(
                    _open_chunks(p, chunk_bytes), types, records_per_batch
                ):
                    for r in batch:
                        r["warc_file"] = p
                    yield pd.DataFrame(batch, columns=cols)

    # listing only: the projection prunes `content`, so the JVM never
    # materializes file bytes (ReadSchema struct<path:string> — asserted
    # in tests) and files larger than 2 GiB list fine.  binaryFile's
    # size-aware packing still spreads big files one-per-task.
    files = spark.read.format("binaryFile").load(path).select("path")
    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_to_documents(
    records: DataFrame,
    charset: str = "utf-8",
) -> DataFrame:
    """(doc_id, url, text) from response records: payload decoded
    (errors replaced), doc_id = the WARC record id.  Map-only JVM
    ``decode``; pair with ``html.html_to_text`` for body extraction.
    Summary rows (``record_id`` NULL — emitted only for files with
    zero surviving records) are dropped here."""
    return records.where(F.col("record_id").isNotNull()).select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.decode(F.col("payload"), charset).alias("text"),
    )
