"""Provenance/compliance gate demo for the round-6 operator wave:
robots.txt permission filtering, PDF + HTML text extraction into one
curation stream, sentence segmentation, and media near-dup over real
JPEG/GIF payloads with audio clip-containment screening.

    python examples/provenance_demo.py [sf_dir]

The synthetic testdata carries no PDFs, robots files or media, so the
demo fabricates spec-honest payloads (ISO 32000 PDFs, RFC 9309 robots
bodies, baseline JPEGs, tone-chord WAVs) — the point is the operator
composition and the plan shapes, not the data.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def main() -> None:
    from ballista_spark.operators.audiofp import audio_fingerprints, audio_match_pairs
    from ballista_spark.operators.jpeg import encode_jpeg
    from ballista_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        dhash_images,
        encode_gif,
        encode_wav,
        image_neardup_pairs,
    )
    from ballista_spark.operators.pdf import pdf_extract_text
    from ballista_spark.operators.robots import (
        filter_robots_allowed,
        parse_robots,
        parse_sitemaps,
    )
    from ballista_spark.operators.text import split_sentences
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="provenance_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. sitemap discovery -> robots.txt gate --------------------------------
    # each host publishes a sitemap whose <loc> entries are the frontier;
    # the robots rules then decide which of those URLs may be fetched
    sitemap_bodies = spark.createDataFrame(
        [
            (
                f"host{h}.example.com",
                "<urlset>"
                + "".join(
                    f"<url><loc>https://host{h}.example.com{p}</loc></url>"
                    for p in ("/private/x", "/public/y", "/public/archive.pdf")
                )
                + "</urlset>",
            )
            for h in range(5)
        ],
        "host string, sitemap_xml string",
    )
    discovered = parse_sitemaps(sitemap_bodies).where(~F.col("is_index_entry"))
    print(f"sitemap discovery: {discovered.count()} urls from 5 hosts")

    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://host"),
            F.pmod(F.col("doc_id"), F.lit(5)),
            F.lit(".example.com"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/private/x"))
            .when(F.col("doc_id") % 3 == 1, F.lit("/public/y"))
            .otherwise(F.lit("/public/archive.pdf")),
        ).alias("url"),
    )
    robots_bodies = spark.createDataFrame(
        [
            (f"host{h}.example.com",
             "User-agent: *\nDisallow: /private/\nDisallow: /*.pdf$")
            for h in range(3)  # hosts 3-4 publish no robots.txt
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots_bodies)
    allowed = filter_robots_allowed(urls, rules)
    print(f"robots gate: {urls.count()} urls -> {allowed.count()} fetchable")

    # 2. PDF bodies -> text -> sentences ------------------------------------
    import zlib

    def mini_pdf(text: str) -> bytes:
        content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
        data = zlib.compress(content)
        return (
            b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Filter /FlateDecode /Length "
            + str(len(data)).encode()
            + b" >> stream\n" + data + b"\nendstream endobj\n"
            b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 3 0 R >> endobj\n"
            b"trailer << /Root 1 0 R >>\n%%EOF"
        )

    first_words = docs.select(
        "doc_id",
        F.regexp_replace(
            F.substring(F.regexp_replace("text", r"[\\()]", " "), 1, 120), r"\s+", " "
        ).alias("head"),
    ).limit(50).collect()
    pdf_rows = [(r["doc_id"], bytearray(mini_pdf(r["head"]))) for r in first_words]
    pdfs = spark.createDataFrame(pdf_rows, "doc_id long, payload binary")
    texts = pdf_extract_text(pdfs)
    sentences = split_sentences(texts.where(F.col("text").isNotNull()), "text", "doc_id")
    print(
        f"pdf ingest: {texts.where(F.col('text').isNotNull()).count()} docs, "
        f"{sentences.count()} sentences"
    )

    # 3. image near-dup over real JPEG/GIF payloads --------------------------
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (32, 32, 3), np.uint8)
    near = np.clip(base.astype(int) + 3, 0, 255).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    gif_img = pal[rng.integers(0, 16, (32, 32))]
    media_rows = [
        (1, bytearray(encode_jpeg(base, 90)),
         {"modality": "image", "mime": "image/jpeg", "width": 32, "height": 32,
          "duration_ms": None}),
        (2, bytearray(encode_jpeg(near, 90)),
         {"modality": "image", "mime": "image/jpeg", "width": 32, "height": 32,
          "duration_ms": None}),
        (3, bytearray(encode_gif(gif_img)),
         {"modality": "image", "mime": "image/gif", "width": 32, "height": 32,
          "duration_ms": None}),
    ]
    media = spark.createDataFrame(media_rows, MEDIA_SCHEMA)
    pairs = image_neardup_pairs(dhash_images(media), max_hamming=10)
    print("image near-dups (jpeg recompress pair expected):", pairs.collect())

    # 4. audio clip containment ---------------------------------------------
    rate = 16000
    t = np.arange(2 * rate) / rate
    track = np.sin(2 * np.pi * 440 * t) + np.sin(2 * np.pi * 1310 * t)
    track = track / np.abs(track).max()
    embedded = np.concatenate([rng.standard_normal(rate) * 0.3, track[: rate]])
    audio_rows = [
        (10, bytearray(encode_wav((track * 32767).astype(np.int16), rate)),
         {"modality": "audio", "mime": "audio/wav", "width": None, "height": None,
          "duration_ms": 2000}),
        (11, bytearray(encode_wav((embedded * 32767).astype(np.int16), rate)),
         {"modality": "audio", "mime": "audio/wav", "width": None, "height": None,
          "duration_ms": 2000}),
    ]
    fps = audio_fingerprints(spark.createDataFrame(audio_rows, MEDIA_SCHEMA))
    matches = audio_match_pairs(fps, min_matches=5).collect()
    print("audio containment matches:", matches)
    assert any(r["key_a"] == 10 and r["key_b"] == 11 for r in matches)

    print("provenance demo complete:", n_docs, "docs scanned")
    spark.stop()


if __name__ == "__main__":
    main()
