"""PDF text extraction tests (operators/pdf.py).

The oracle is the PDF spec itself: test files are hand-assembled per
ISO 32000 (objects, streams, content operators) — no PDF library exists
in this environment, which is exactly the condition the extractor is
built for.
"""

from __future__ import annotations

import zlib

import pytest

from ballista_spark.operators.pdf import pdf_extract_text, pdf_page_count, pdf_to_text


def _mini_pdf(content: bytes, compress: bool = False, n_pages: int = 1) -> bytes:
    """A structurally-honest single-content PDF: catalog, page tree,
    n_pages page objects, one content stream, xref + trailer."""
    if compress:
        data = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        data = content
        filt = b""
    kids = b" ".join(b"%d 0 R" % (10 + i) for i in range(n_pages))
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [" + kids + b"] /Count %d >> endobj" % n_pages,
        b"3 0 obj << "
        + filt
        + b"/Length %d >> stream\n" % len(data)
        + data
        + b"\nendstream endobj",
        b"4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj",
    ]
    for i in range(n_pages):
        objs.append(
            b"%d 0 obj << /Type /Page /Parent 2 0 R /Contents 3 0 R "
            b"/Resources << /Font << /F1 4 0 R >> >> >> endobj" % (10 + i)
        )
    body = b"\n".join(objs)
    return b"%PDF-1.4\n" + body + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def test_simple_tj():
    pdf = _mini_pdf(b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET")
    assert pdf_to_text(pdf) == "Hello World"
    assert pdf_page_count(pdf) == 1


def test_flate_compressed_stream():
    pdf = _mini_pdf(b"BT /F1 12 Tf 72 720 Td (Compressed text) Tj ET", compress=True)
    assert pdf_to_text(pdf) == "Compressed text"


def test_tj_array_kerning():
    # small kern: no gap; large negative kern: a word gap
    pdf = _mini_pdf(b"BT [(Hel) -50 (lo) -400 (world)] TJ ET")
    assert pdf_to_text(pdf) == "Hello world"


def test_multiline_td_and_tstar():
    pdf = _mini_pdf(
        b"BT /F1 12 Tf 72 720 Td (line one) Tj 0 -14 Td (line two) Tj T* "
        b"(line three) Tj ET"
    )
    assert pdf_to_text(pdf).split("\n") == ["line one", "line two", "line three"]


def test_quote_operators_advance_line():
    pdf = _mini_pdf(b"BT (first) Tj (second) ' ET")
    assert pdf_to_text(pdf).split("\n") == ["first", "second"]


def test_literal_string_escapes():
    pdf = _mini_pdf(rb"BT (a\(b\)c \\ \101\t) Tj ET")
    assert pdf_to_text(pdf) == "a(b)c \\ A"  # \101 octal = 'A'; tab stripped at end


def test_hex_strings_and_odd_padding():
    pdf = _mini_pdf(b"BT <48454C4C4F> Tj ET")
    assert pdf_to_text(pdf) == "HELLO"
    # odd-length hex pads a trailing 0 nibble: <5> -> 0x50 = 'P'
    pdf2 = _mini_pdf(b"BT <5> Tj ET")
    assert pdf_to_text(pdf2) == "P"


def test_utf16be_string():
    s = "﻿Café — résumé".encode("utf-16-be")
    pdf = _mini_pdf(b"BT (" + s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)") + b") Tj ET")
    assert pdf_to_text(pdf) == "Café — résumé"


def test_latin1_bytes():
    pdf = _mini_pdf(b"BT (na\xefve fa\xe7ade) Tj ET")
    assert pdf_to_text(pdf) == "naïve façade"


def test_encrypted_yields_empty():
    pdf = _mini_pdf(b"BT (secret) Tj ET")
    pdf = pdf.replace(b"trailer <<", b"trailer << /Encrypt 9 0 R")
    assert pdf_to_text(pdf) == ""


def test_non_pdf_and_garbage():
    assert pdf_to_text(b"") == ""
    assert pdf_to_text(b"not a pdf at all") == ""
    assert pdf_page_count(b"GIF89a") == 0
    # corrupt flate data: the stream is skipped, not fatal
    pdf = _mini_pdf(b"", compress=True)
    broken = pdf.replace(zlib.compress(b""), b"\x00\x01\x02garbage")
    assert pdf_to_text(broken) == ""


def test_page_count_multi():
    assert pdf_page_count(_mini_pdf(b"BT (x) Tj ET", n_pages=3)) == 3


def test_spark_extract(spark):
    rows = [
        (1, bytearray(_mini_pdf(b"BT (doc one) Tj ET"))),
        (2, bytearray(_mini_pdf(b"BT (doc two) Tj ET", compress=True, n_pages=2))),
        (3, None),
        (4, bytearray(b"plain bytes, not pdf")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["text"], r["n_pages"]) for r in pdf_extract_text(df).collect()}
    assert got[1] == ("doc one", 1)
    assert got[2] == ("doc two", 2)
    assert got[3] == (None, 0)
    assert got[4] == (None, 0)


def test_spark_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    plan = pdf_extract_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

def test_page_count_falls_back_to_pages_root_count():
    """PDF 1.5+ object streams may hide every /Type /Page dict from the
    raw scan (stream objects — incl. page CONTENT — cannot live there,
    so text still extracts); the page-tree root /Count is the fallback."""
    pdf = _mini_pdf(b"BT (objstm style) Tj ET", n_pages=2)
    # simulate: strip the /Type /Page objects (as if inside an ObjStm)
    hidden = b"\n".join(
        line
        for line in pdf.split(b"\n")
        if b"/Type /Page " not in line
    )
    assert pdf_to_text(hidden) == "objstm style"   # content stream survives
    assert pdf_page_count(hidden) == 2              # via /Pages /Count
    assert pdf_page_count(pdf) == 2                 # direct path unchanged


def test_pages_root_count_key_order_independent():
    """PDF dict key order is arbitrary: /Count listed BEFORE /Type in
    the page-tree root must still drive the v1.5+ fallback."""
    pdf = _mini_pdf(b"BT (reordered) Tj ET", n_pages=2)
    hidden = b"\n".join(
        line for line in pdf.split(b"\n") if b"/Type /Page " not in line
    )
    reordered = hidden.replace(
        b"<< /Type /Pages ", b"<< /Count 2 /Type /Pages "
    ).replace(b" /Count 2 >>", b" >>")
    assert reordered != hidden  # the swap must have applied
    assert reordered.index(b"/Count 2") < reordered.index(b"/Type /Pages")
    assert pdf_page_count(reordered) == 2
