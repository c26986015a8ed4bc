"""Perceptual-hash media dedup demo: synthetic BMP images and WAV clips
with planted exact / near / unrelated duplicates, deduplicated through
the dHash → banded-Hamming-pairs → connected-components →
one-survivor-per-cluster pipeline.

    python examples/media_dedup_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from ballista_spark.operators.dedup import connected_components
    from ballista_spark.operators.multimodal import (
        MEDIA_META_SCHEMA,
        dhash_audio,
        dhash_images,
        encode_bmp,
        encode_wav,
        hamming_neardup_pairs,
    )
    from ballista_spark.session import get_spark
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = get_spark(app_name="media_dedup_demo")
    rng = np.random.default_rng(0)

    def img(seed):
        r = np.random.default_rng(seed)
        return r.integers(0, 210, (32, 32, 3), dtype=np.uint8)

    base = img(1)
    near = base.copy()
    near[0:3, 0:3] += 1  # tiny edit
    rows = [
        (1, encode_bmp(base), "image/bmp", "image"),
        (2, encode_bmp(base), "image/bmp", "image"),          # exact dup
        (3, encode_bmp(near), "image/bmp", "image"),          # near dup
        (4, encode_bmp((base.astype(int) + 40).astype(np.uint8)),
         "image/bmp", "image"),                               # brightness
        (5, encode_bmp(img(2)), "image/bmp", "image"),        # unrelated
    ]
    env = np.abs(np.sin(np.linspace(0, 6, 4000))) + 0.05
    clip = (rng.uniform(-1, 1, 4000) * env * 0.4)
    rows += [
        (10, encode_wav(clip, 8000), "audio/wav", "audio"),
        (11, encode_wav(clip * 0.6, 8000), "audio/wav", "audio"),  # regained
        (12, encode_wav(rng.uniform(-0.4, 0.4, 4000), 8000), "audio/wav",
         "audio"),                                            # unrelated
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    media = spark.createDataFrame(
        [(i, bytearray(p), {"modality": mod, "mime": m, "width": None,
                            "height": None, "duration_ms": None})
         for i, p, m, mod in rows],
        schema,
    )
    hashes = dhash_images(media).unionAll(dhash_audio(media)).where(
        F.col("dhash").isNotNull()
    )
    pairs = hamming_neardup_pairs(hashes, max_hamming=6)
    print("near-dup pairs (hamming <= 6):")
    for r in pairs.orderBy("key_a", "key_b").collect():
        print(f"  {r['key_a']} ~ {r['key_b']}  d={r['hamming']}")
    comps = connected_components(
        pairs.select("key_a", "key_b")
    )
    survivors = sorted(
        set(r["media_id"] for r in hashes.collect())
        - set(r["key"] for r in comps.collect()
              if r["key"] != r["component"])
    )
    print(f"survivors after cluster resolution: {survivors}")
    spark.stop()


if __name__ == "__main__":
    main()
