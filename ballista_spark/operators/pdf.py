"""PDF text extraction — stdlib-only (``zlib`` + ``re``), map-only.

PDFs are the second great raw-document format after HTML in web-scale
training corpora (Common Crawl alone surfaces hundreds of millions);
this module gives the pipeline a dependency-free baseline extractor the
way ``html.html_to_text`` does for HTML: `pdf_to_text` is a pure
function over bytes, `pdf_extract_text` fans it over Arrow batches with
``mapInPandas`` (no shuffle — the same scale shape as every other
payload decoder here).

Scope (the honest baseline): classic xref PDFs are scanned for their
``N 0 obj … endobj`` objects directly (no xref parsing — robust to the
truncated/appended files real crawls contain), FlateDecode streams
inflate via stdlib zlib, and text comes from the content-stream
operators ``Tj``/``TJ``/``'``/``"`` inside BT…ET blocks, with
``Td``/``TD``/``T*``/``Tm`` vertical moves emitting newlines and large
negative TJ kerns emitting spaces.  Literal-string escapes and hex
strings are handled; UTF-16BE (BOM) strings decode as such, other
bytes decode per PDFDocEncoding≈Latin-1.  Out of scope, by design:
CID/Type0 composite fonts' ToUnicode CMaps (bytes pass through
unmapped) and encrypted files (detected → empty text + flag).  Object
streams (``/Type /ObjStm``, v1.5+) hide non-stream objects from the raw
scan — but the spec forbids STREAM objects inside them, so page CONTENT
streams stay top-level and text extraction still works; only the page
*dicts* can disappear, which is why ``pdf_page_count`` falls back to
the page-tree root's ``/Count`` when no ``/Type /Page`` object is
visible.

Reference parity: the reference engine ships no document-format
operators (relational surface only — `rust/core/proto/ballista.proto`);
beyond-reference pipeline capability like WARC ingest and the media
codecs.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["pdf_to_text", "pdf_page_count", "pdf_extract_text"]

_OBJ_RE = re.compile(rb"\d+\s+\d+\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
#: page-tree root /Count — the v1.5+ fallback when page dicts hide
#: inside object streams (only non-stream objects may live there).
#: PDF dict key order is arbitrary, so /Type /Pages membership and the
#: /Count value are matched by two independent searches over the
#: object head, never one ordered regex.
_PAGES_TYPE_RE = re.compile(rb"/Type\s*/Pages\b")
_COUNT_RE = re.compile(rb"/Count\s+(\d+)")
_ENCRYPT_RE = re.compile(rb"/Encrypt\b")

#: content-stream tokens: strings, hex strings, arrays, numbers, names,
#: operators
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # literal string (with escapes)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"
    rb"|/[^\s/\[\]()<>{}]*"
    rb"|[A-Za-z'\"*]+"
)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # \ddd octal, 1-3 digits
            j = i + 1
            while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:
            out += nxt
            i += 2
    return bytes(out)


def _string_to_text(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":  # UTF-16BE with BOM (PDF text strings)
        return raw[2:].decode("utf-16-be", errors="replace")
    # PDFDocEncoding agrees with Latin-1 on all printable positions
    return raw.decode("latin-1")


_OPERAND_STARTS = (b"(", b"<", b"/", b"[", b"]", b"-", b"+", b".")


def _extract_stream_text(content: bytes) -> str:
    """Walk one content stream's tokens, emitting show-text strings with
    newline/space structure from the positioning operators.  Model: a
    ``pending`` operand list accumulates until an operator token, which
    consumes it — exactly the PDF postfix convention."""
    parts: list[str] = []
    pending: list[bytes] = []
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        if tok[:1] in _OPERAND_STARTS or tok[:1].isdigit():
            pending.append(tok)
            continue
        # operator: consume pending
        if tok in (b"Tj", b"'", b'"'):
            if tok != b"Tj" and parts and parts[-1] != "\n":
                parts.append("\n")  # ' and " move to the next line first
            for s in reversed(pending):
                if s[:1] in (b"(", b"<"):
                    parts.append(_decode_string_token(s))
                    break
        elif tok == b"TJ":
            # operand is the array between the last [ and ]
            try:
                start = len(pending) - 1 - pending[::-1].index(b"[")
            except ValueError:
                start = 0
            for el in pending[start:]:
                if el[:1] in (b"(", b"<"):
                    parts.append(_decode_string_token(el))
                elif el not in (b"[", b"]"):
                    try:
                        if float(el) < -180:  # big negative kern = a gap
                            parts.append(" ")
                    except ValueError:
                        pass
        elif tok in (b"Td", b"TD", b"T*", b"Tm", b"ET"):
            if parts and parts[-1] != "\n":
                parts.append("\n")
        pending.clear()
    text = "".join(parts)
    return text.strip()


def _decode_string_token(tok: bytes) -> str:
    if tok[:1] == b"(":
        return _string_to_text(_unescape_literal(tok[1:-1]))
    hexdigits = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexdigits) % 2:
        hexdigits += b"0"  # spec: odd-length hex pads with 0
    return _string_to_text(bytes.fromhex(hexdigits.decode("ascii")))


def _pdf_parse(payload: bytes) -> tuple[str, int]:
    """ONE object scan → (text, n_pages) — the mapInPandas stage calls
    this so multi-MB payloads are regex-walked once, not once per
    public accessor."""
    if not payload or payload[:5] != b"%PDF-":
        return "", 0
    if _ENCRYPT_RE.search(payload):
        return "", 0
    texts = []
    n_pages = 0
    pages_root_count = 0
    for obj in _OBJ_RE.finditer(payload):
        body = obj.group(1)
        sm = _STREAM_RE.search(body)
        head = body[: sm.start()] if sm else body
        n_pages += len(_PAGE_RE.findall(head))
        if _PAGES_TYPE_RE.search(head):
            cm = _COUNT_RE.search(head)
            if cm:
                pages_root_count = max(pages_root_count, int(cm.group(1)))
        if not sm:
            continue
        data = sm.group(1)
        if _FLATE_RE.search(head):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" not in data or b"ET" not in data:
            continue
        t = _extract_stream_text(data)
        if t:
            texts.append(t)
    # v1.5+ files can hide every /Type /Page dict in an object stream;
    # the page-tree root's /Count (often in the visible trailer chain)
    # is then the only page-count signal
    return "\n".join(texts), n_pages or pages_root_count


def pdf_to_text(payload: bytes) -> str:
    """Extract text from a PDF's content streams.  Returns '' for
    encrypted or text-free files; never raises on malformed input (the
    crawl-robustness contract shared with `parse_warc_bytes`)."""
    return _pdf_parse(payload)[0]


def pdf_page_count(payload: bytes) -> int:
    """Number of /Type /Page objects (0 for non-PDF/encrypted input)."""
    return _pdf_parse(payload)[1]


PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("n_pages", T.IntegerType(), False),
    ]
)


def pdf_extract_text(
    df: DataFrame, payload_col: str = "payload", key_col: str = "doc_id"
) -> DataFrame:
    """(key, text, n_pages) over binary PDF payloads — map-only Arrow
    batches (one ``mapInPandas``, zero shuffle); NULL/non-PDF payloads
    yield NULL text and 0 pages, never an error (crawl data)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            ids, texts, pages = [], [], []
            for k, p in zip(pdf_batch[key_col], pdf_batch[payload_col]):
                ids.append(k)
                if p is None:
                    texts.append(None)
                    pages.append(0)
                    continue
                t, np_ = _pdf_parse(bytes(p))
                texts.append(t if t else None)
                pages.append(np_)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "text": pd.array(texts, dtype=object),
                    "n_pages": pd.array(pages, dtype="int32"),
                }
            )

    return df.mapInPandas(run, schema=PDF_TEXT_SCHEMA)
