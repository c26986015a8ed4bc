"""Real multimodal decode: pure-numpy BMP/PPM/PGM/WAV codecs with
known-answer pixel/sample values, exercised both as plain functions and
end-to-end through the Spark mapInPandas batch loop (use_stub=False).

This retires the round-4 ``partial``: the codec layer is no longer an
environment stub — only formats that genuinely need external libraries
(JPEG/MP4) raise, from the same dispatch point a deploy would extend.
Round 6 adds PNG (stdlib zlib + numpy: DEFLATE + the five scanline
filters), the first real web image format in the dispatch.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    N_FEATURES,
    decode_bmp,
    decode_media,
    decode_pgm,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    extract_features,
    resize_images,
)


def _img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# --- known-answer + round-trip, pure functions -----------------------


def test_bmp_known_answer_and_roundtrip():
    # 2x2 image with distinct corner colors; hand-verifiable
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], np.uint8
    )
    payload = encode_bmp(img)
    assert payload[:2] == b"BM"
    np.testing.assert_array_equal(decode_bmp(payload), img)
    # row padding: width 3 → 9 bytes padded to 12 per row
    img3 = _img(5, 3)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img3)), img3)


def test_bmp_top_down_negative_height():
    img = _img(4, 6)
    p = bytearray(encode_bmp(img))
    # flip to top-down: height := -height, rows already bottom-up in the
    # encoder so a top-down reader must un-flip — build manually
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * 3] = img[:, :, ::-1].reshape(h, w * 3)  # natural order
    import struct

    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(data), 0, 0, 0, 0)
    np.testing.assert_array_equal(decode_bmp(header + info + data), img)


def test_ppm_known_answer_comment_header():
    img = _img(3, 4)
    payload = encode_ppm(img)
    np.testing.assert_array_equal(decode_ppm(payload), img)
    # header with a comment line (the PNM spec allows them anywhere)
    with_comment = b"P6\n# generated\n4 3\n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(with_comment), img)


def test_pgm_decode():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = b"P5\n4 3\n255\n" + gray.tobytes()
    np.testing.assert_array_equal(decode_pgm(payload), gray)


def test_wav_known_answer_and_roundtrip():
    rate = 8000
    t = np.arange(64) / rate
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, got_rate = decode_wav(encode_wav(mono, rate))
    assert got_rate == rate
    assert samples.shape == (64, 1)
    np.testing.assert_allclose(samples[:, 0], mono, atol=1 / 32768)
    # stereo
    stereo = np.stack([mono, -mono], axis=1)
    s2, _ = decode_wav(encode_wav(stereo, rate))
    assert s2.shape == (64, 2)
    np.testing.assert_allclose(s2, stereo, atol=1 / 32768)
    # 8-bit PCM path
    import struct

    pcm8 = bytes([128, 255, 0, 128])  # 0, ~+1, -1, 0
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    wav8 = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + 4, b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", 4) + pcm8
    )
    s8, _ = decode_wav(wav8)
    np.testing.assert_allclose(s8[:, 0], [0.0, 127 / 128, -1.0, 0.0])


def test_decode_media_dispatch():
    img = _img(2, 2)
    np.testing.assert_array_equal(decode_media(encode_bmp(img), "image/bmp"), img)
    np.testing.assert_array_equal(
        decode_media(encode_ppm(img), "image/x-portable-pixmap"), img
    )
    with pytest.raises(NotImplementedError, match="video/mp4"):
        decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


# --- Spark end-to-end: the real path through mapInPandas -------------


def _media_df(spark, rows):
    """rows: (media_id, payload_bytes, mime, modality)"""
    data = [
        (i, bytearray(p), {"modality": mod, "mime": mime,
                           "width": None, "height": None, "duration_ms": None})
        for i, p, mime, mod in rows
    ]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    return spark.createDataFrame(data, schema)


def test_extract_features_real_path(spark):
    flat = np.full((8, 8, 3), 200, np.uint8)  # all luminance 200 → bin 12
    grad = np.zeros((4, 4, 3), np.uint8)
    grad[..., :] = np.arange(4, dtype=np.uint8)[:, None, None] * 64  # bins 0,4,8,12
    wav = encode_wav(np.zeros(32), 8000)  # silence → bin 8

    media = _media_df(
        spark,
        [
            (1, encode_bmp(flat), "image/bmp", "image"),
            (2, encode_ppm(grad), "image/x-portable-pixmap", "image"),
            (3, wav, "audio/wav", "audio"),
        ],
    )
    out = {r["media_id"]: r for r in extract_features(media, use_stub=False).collect()}
    f1 = out[1]["features"]
    assert f1[12] == 1.0 and sum(f1) == pytest.approx(1.0)
    f2 = out[2]["features"]
    assert [f2[0], f2[4], f2[8], f2[12]] == [0.25] * 4
    f3 = out[3]["features"]
    assert f3[8] == 1.0  # silence: amplitude 0 → bin 8 of [-1,1)


def test_resize_images_real_path(spark):
    # 4x4 quadrant image → 2x2 nearest-neighbor picks top-left of each
    # quadrant ((i*4)//2 floor grid)
    img = np.zeros((4, 4, 3), np.uint8)
    img[:2, :2] = [255, 0, 0]
    img[:2, 2:] = [0, 255, 0]
    img[2:, :2] = [0, 0, 255]
    img[2:, 2:] = [255, 255, 0]
    media = _media_df(
        spark,
        [
            (1, encode_bmp(img), "image/bmp", "image"),
            (2, encode_ppm(img), "image/x-portable-pixmap", "image"),
        ],
    )
    out = {
        r["media_id"]: r
        for r in resize_images(media, width=2, height=2, use_stub=False).collect()
    }
    expect = np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], np.uint8)
    np.testing.assert_array_equal(decode_bmp(bytes(out[1]["payload"])), expect)
    np.testing.assert_array_equal(decode_ppm(bytes(out[2]["payload"])), expect)
    for r in out.values():  # meta rewritten, format preserved
        assert (r["meta"]["width"], r["meta"]["height"]) == (2, 2)


def test_resize_upscale_roundtrip(spark):
    img = _img(2, 3)
    media = _media_df(spark, [(1, encode_bmp(img), "image/bmp", "image")])
    [r] = resize_images(media, width=6, height=4, use_stub=False).collect()
    up = decode_bmp(bytes(r["payload"]))
    assert up.shape == (4, 6, 3)
    # every upscaled pixel replicates its floor-grid source
    rows = (np.arange(4) * 2) // 4
    cols = (np.arange(6) * 3) // 6
    np.testing.assert_array_equal(up, img[rows][:, cols])


def test_y4m_known_answer_and_roundtrip():
    from ballista_spark.operators.multimodal import decode_y4m, encode_y4m

    frames = np.stack([np.full((4, 6), v, np.uint8) for v in (0, 100, 200)])
    payload = encode_y4m(frames, fps=(30, 1))
    assert payload.startswith(b"YUV4MPEG2 W6 H4 F30:1")
    np.testing.assert_array_equal(decode_y4m(payload), frames)
    with pytest.raises(NotImplementedError):  # packed 4:2:2 needs no support
        decode_y4m(b"YUV4MPEG2 W2 H2 C422p10\nFRAME\n" + b"\x00" * 8)


def test_sample_frames_real_path(spark):
    from ballista_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        sample_frames,
    )

    # 8 frames with luma == frame index * 30 → floor grid picks 0,2,4,6
    frames = np.stack([np.full((4, 4), i * 30, np.uint8) for i in range(8)])
    media = _media_df(
        spark, [(1, encode_y4m(frames), "video/x-yuv4mpeg", "video")]
    )
    got = sorted(
        (r["frame_idx"], bytes(r["frame_payload"]))
        for r in sample_frames(media, n_frames=4, use_stub=False).collect()
    )
    assert [i for i, _ in got] == [0, 1, 2, 3]
    for i, payload in got:
        np.testing.assert_array_equal(
            decode_pgm(payload), np.full((4, 4), ((i * 8) // 4) * 30, np.uint8)
        )


def test_video_features_real_path(spark):
    from ballista_spark.operators.multimodal import encode_y4m

    # two frames: luma 0 (bin 0) and luma 255 (bin 15), equal mass
    frames = np.stack(
        [np.zeros((4, 4), np.uint8), np.full((4, 4), 255, np.uint8)]
    )
    media = _media_df(
        spark, [(1, encode_y4m(frames), "video/x-yuv4mpeg", "video")]
    )
    [r] = extract_features(media, use_stub=False).collect()
    assert r["features"][0] == pytest.approx(0.5)
    assert r["features"][15] == pytest.approx(0.5)


# ---------------- perceptual-hash image dedup (dHash) ----------------

def _dhash_mirror(img: np.ndarray) -> int:
    """Independent dHash reference: grayscale, floor-grid 9x8 resample,
    horizontal gradient bits MSB-first."""
    gray = img.astype(np.float64).mean(axis=-1) if img.ndim == 3 else img.astype(np.float64)
    h, w = gray.shape
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(9) * w) // 9
    small = gray[rows][:, cols]
    out = 0
    for r in range(8):
        for c in range(8):
            out = (out << 1) | int(small[r, c + 1] > small[r, c])
    return out


def test_image_dhash_matches_mirror_and_is_robust():
    from ballista_spark.operators.multimodal import image_dhash

    rng = np.random.default_rng(0)
    # keep headroom so the +40 brightness shift below never clips (a
    # clipped gradient legitimately flattens and flips its bit)
    base = rng.integers(0, 210, (32, 32, 3), dtype=np.uint8)
    assert image_dhash(encode_bmp(base), "image/bmp") == _dhash_mirror(base)
    # unclipped brightness shift leaves every gradient sign identical
    brighter = (base.astype(np.int32) + 40).astype(np.uint8)
    assert image_dhash(encode_bmp(brighter), "image/bmp") == _dhash_mirror(base)
    # a downscaled copy of a SMOOTH image (the realistic case — photos
    # are locally correlated; iid noise is the adversarial bound) stays
    # within a small Hamming distance
    yy, xx = np.mgrid[0:32, 0:32]
    smooth = ((np.sin(yy / 5.0) + np.cos(xx / 3.0) + 2) * 60).astype(np.uint8)
    smooth = np.stack([smooth] * 3, axis=-1)
    d = bin(
        image_dhash(encode_bmp(smooth[::2, ::2]), "image/bmp")
        ^ image_dhash(encode_bmp(smooth), "image/bmp")
    ).count("1")
    assert d <= 8
    # audio refuses
    with pytest.raises(ValueError):
        image_dhash(encode_wav(np.zeros(8), 8000), "audio/wav")


def test_dhash_images_and_neardup_pairs_end_to_end(spark):
    from ballista_spark.operators.multimodal import (
        dhash_images,
        image_neardup_pairs,
    )

    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    dup = base.copy()
    near = base.copy()
    near[0:2, 0:2] += 1  # tiny edit -> few gradient bits at most
    other = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    media = _media_df(
        spark,
        [
            (1, encode_bmp(base), "image/bmp", "image"),
            (2, encode_bmp(dup), "image/bmp", "image"),
            (3, encode_bmp(near), "image/bmp", "image"),
            (4, encode_bmp(other), "image/bmp", "image"),
            (5, encode_wav(np.zeros(8), 8000), "audio/wav", "audio"),
        ],
    )
    hashes = dhash_images(media)
    hv = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert hv[1] == hv[2] and hv[5] is None
    pairs = {
        (r["key_a"], r["key_b"]): r["hamming"]
        for r in image_neardup_pairs(hashes, max_hamming=6).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6
    assert not any(4 in k for k in pairs)
    plan = (
        image_neardup_pairs(hashes, max_hamming=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_image_neardup_banding_is_exact_on_random_hashes(spark):
    """Pigeonhole banding must be LOSSLESS for Hamming distance: on
    random 64-bit hashes (sign bit exercised) the operator's pair set
    equals the brute-force all-pairs answer at several budgets."""
    import itertools
    import random

    from ballista_spark.operators.multimodal import image_neardup_pairs

    rng = random.Random(7)
    vals = [rng.getrandbits(64) - (1 << 63) for _ in range(40)]
    # plant close pairs: copies of some values with few bits flipped
    for i in (0, 5, 11):
        v = vals[i]
        for _ in range(rng.randint(1, 3)):
            v ^= 1 << rng.randrange(64)
        vals.append(v)
    hashes = spark.createDataFrame(
        list(enumerate(vals)), "media_id long, dhash long"
    )
    for k in (0, 2, 4):
        got = {
            (r["key_a"], r["key_b"]): r["hamming"]
            for r in image_neardup_pairs(hashes, max_hamming=k).collect()
        }
        want = {}
        for (i, a), (j, b) in itertools.combinations(enumerate(vals), 2):
            d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
            if d <= k:
                want[(i, j)] = d
        assert got == want, k


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Encode a PNG applying a caller-chosen filter per scanline (the
    forward transforms from RFC 2083) — exercises the decoder's
    unfiltering paths, which the filter-0-only encoder cannot."""
    import struct
    import zlib

    from ballista_spark.operators.multimodal import _PNG_SIG, _png_chunk

    if img.ndim == 2:
        h, w, ch = *img.shape, 1
        flat = img.astype(np.int32)
    else:
        h, w, ch = img.shape
        flat = img.reshape(h, w * ch).astype(np.int32)
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        row = flat[y]
        enc = np.zeros(stride, np.int32)
        for x in range(stride):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(row[x]) - pred) & 0xFF
        out.append(f)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_channel_counts():
    from ballista_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in ((7, 5), (7, 5, 2), (7, 5, 3), (6, 9, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img), shape


def test_png_decoder_handles_all_five_filters():
    from ballista_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (16, 11, 3), dtype=np.uint8)
    # every filter as the uniform choice, then a per-row mix
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_png(_png_with_filters(img, filters))
        assert np.array_equal(got, img), filters
    gray = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    for filters in ([1], [3], [4], [4, 3, 2, 1, 0]):
        assert np.array_equal(decode_png(_png_with_filters(gray, filters)), gray)


def test_png_known_answer_pixels():
    """Literal byte-level known answer: a 2x2 RGB image built by hand
    (filter 0), pinned against the decoder output pixel-for-pixel."""
    import struct
    import zlib as _z

    from ballista_spark.operators.multimodal import _PNG_SIG, _png_chunk, decode_png

    px = [[255, 0, 0, 0, 255, 0], [0, 0, 255, 10, 20, 30]]
    raw = b"\x00" + bytes(px[0]) + b"\x00" + bytes(px[1])
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], np.uint8
    )
    assert np.array_equal(got, want)
    # multiple IDAT chunks concatenate into one zlib stream
    z = _z.compress(raw)
    split = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", z[:7])
        + _png_chunk(b"IDAT", z[7:])
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(split), want)


def test_png_unsupported_branches():
    import struct
    import zlib as _z

    from ballista_spark.operators.multimodal import _PNG_SIG, _png_chunk, decode_png

    with pytest.raises(ValueError):
        decode_png(b"nope")
    # 16-bit and palette and interlaced all refuse loudly
    for depth, color, inter in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, inter))
            + _png_chunk(b"IDAT", _z.compress(b"\x00\x00\x00\x00"))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            decode_png(payload)


def test_png_dhash_and_neardup_end_to_end(spark):
    """PNG payloads flow through decode → dHash → banded pairing: a PNG
    and its BMP-encoded twin hash identically (same pixels), and the
    near-dup operator pairs PNG-sourced hashes."""
    from ballista_spark.operators.multimodal import (
        dhash_images,
        encode_png,
        image_dhash,
        image_neardup_pairs,
    )

    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    near = base.copy()
    near[0:2, 0:2] += 1
    other = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert image_dhash(encode_png(base), "image/png") == image_dhash(
        encode_bmp(base), "image/bmp"
    )
    media = _media_df(
        spark,
        [
            (1, encode_png(base), "image/png", "image"),
            (2, encode_png(near), "image/png", "image"),
            (3, encode_png(other), "image/png", "image"),
        ],
    )
    hashes = dhash_images(media)
    pairs = {
        (r["key_a"], r["key_b"])
        for r in image_neardup_pairs(hashes, max_hamming=6).collect()
    }
    assert (1, 2) in pairs and not any(3 in k for k in pairs)


def test_image_neardup_chunk0_sign_flip_regression(spark):
    """Regression (round-5 ADVICE high): a pair whose ONLY agreeing
    chunk is chunk 0 while the sign bits differ must still be found.
    The old `%`-based chunk-0 extract gave a negative chunk value for
    the negative hash and a positive one for the positive hash, so the
    banded equi-join silently dropped the pair.  At max_hamming=4 the
    hash splits into 5 chunks of width 12 (last absorbs bits 48..63):
    flip bit 63 (sign) plus one bit in chunks 1, 2, 3 -> hamming 4,
    chunks 1..4 all disagree, chunk 0 is the sole pigeonhole."""
    from ballista_spark.operators.multimodal import image_neardup_pairs

    a = 0x0123456789ABCDEF & ~(1 << 63)  # positive, arbitrary low bits
    b = a ^ (1 << 63) ^ (1 << 12) ^ (1 << 24) ^ (1 << 36)
    to_signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v
    hashes = spark.createDataFrame(
        [(1, to_signed(a)), (2, to_signed(b))], "media_id long, dhash long"
    )
    got = {
        (r["key_a"], r["key_b"]): r["hamming"]
        for r in image_neardup_pairs(hashes, max_hamming=4).collect()
    }
    assert got == {(1, 2): 4}
    # and the mirrored polarity (a negative, b positive) also survives
    hashes2 = spark.createDataFrame(
        [(1, to_signed(a ^ (1 << 63))), (2, to_signed(b ^ (1 << 63)))],
        "media_id long, dhash long",
    )
    got2 = {
        (r["key_a"], r["key_b"]): r["hamming"]
        for r in image_neardup_pairs(hashes2, max_hamming=4).collect()
    }
    assert got2 == {(1, 2): 4}


def test_audio_dhash_gain_invariance_and_pairing(spark):
    from ballista_spark.operators.multimodal import (
        audio_dhash,
        dhash_audio,
        image_neardup_pairs,
    )

    rng = np.random.default_rng(3)
    env = np.abs(np.sin(np.linspace(0, 6, 4000))) + 0.05
    base = (rng.uniform(-1, 1, 4000) * env * 0.4).astype(np.float64)
    wav = encode_wav(base, 8000)
    # gain change preserves every energy-delta sign
    half = encode_wav(base * 0.5, 8000)
    assert audio_dhash(wav, "audio/wav") == audio_dhash(half, "audio/wav")
    # image payload refuses
    with pytest.raises(ValueError):
        audio_dhash(encode_bmp(np.zeros((4, 4, 3), np.uint8)), "image/bmp")

    other = (rng.uniform(-1, 1, 4000) * (1.05 - env) * 0.4).astype(np.float64)
    media = _media_df(
        spark,
        [
            (1, encode_wav(base, 8000), "audio/wav", "audio"),
            (2, encode_wav(base * 0.7, 8000), "audio/wav", "audio"),
            (3, encode_wav(other, 8000), "audio/wav", "audio"),
            (4, encode_bmp(np.zeros((4, 4, 3), np.uint8)), "image/bmp", "image"),
        ],
    )
    hashes = dhash_audio(media)
    hv = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert hv[1] == hv[2] and hv[4] is None
    pairs = {
        (r["key_a"], r["key_b"])
        for r in image_neardup_pairs(hashes, max_hamming=4).collect()
    }
    assert (1, 2) in pairs and not any(3 in k for k in pairs)


def test_video_dhash_trim_robust_and_discriminative():
    from ballista_spark.operators.multimodal import encode_y4m, video_dhash

    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:16, 0:16]
    # smooth, slowly-evolving content (photographic-like)
    frames = np.stack(
        [
            ((np.sin(yy / 4.0 + t / 3.0) + np.cos(xx / 3.0) + 2) * 55).astype(np.uint8)
            for t in range(24)
        ]
    )
    base = encode_y4m(frames)
    trimmed = encode_y4m(frames[2:])  # drop first two frames
    other = encode_y4m(
        rng.integers(0, 256, (24, 16, 16), dtype=np.uint8)
    )
    hb = video_dhash(base, "video/x-yuv4mpeg")
    d_trim = bin(hb ^ video_dhash(trimmed, "video/x-yuv4mpeg")).count("1")
    d_other = bin(hb ^ video_dhash(other, "video/x-yuv4mpeg")).count("1")
    assert d_trim <= 8 < d_other
    with pytest.raises(ValueError):
        video_dhash(encode_wav(np.zeros(8), 8000), "audio/wav")


# --- scene cuts -------------------------------------------------------


def test_scene_cut_scores_flat_segments():
    """Two flat-luma segments: exactly one transition scores high."""
    from ballista_spark.operators.multimodal import scene_cut_scores

    frames = np.concatenate(
        [np.full((5, 16, 16), 40, np.uint8), np.full((4, 16, 16), 200, np.uint8)]
    )
    s = scene_cut_scores(frames)
    assert len(s) == 8
    assert s[4] == pytest.approx(2.0)  # disjoint histograms -> L1 = 2
    assert (np.delete(s, 4) == 0).all()


def test_scene_cut_scores_gradual_vs_hard():
    from ballista_spark.operators.multimodal import scene_cut_scores

    rng = np.random.default_rng(8)
    drift = np.clip(
        rng.integers(100, 120, (6, 8, 8)).cumsum(axis=0) // np.arange(1, 7)[:, None, None],
        0,
        255,
    ).astype(np.uint8)
    hard = np.concatenate([drift, rng.integers(0, 40, (1, 8, 8)).astype(np.uint8)])
    s = scene_cut_scores(hard)
    assert s[-1] == s.max()


def test_video_scene_cuts_spark(spark):
    from ballista_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_y4m,
        video_scene_cuts,
    )

    frames = np.concatenate(
        [
            np.full((4, 16, 16), 30, np.uint8),
            np.full((3, 16, 16), 220, np.uint8),
            np.full((3, 16, 16), 120, np.uint8),
        ]
    )
    rows = [
        (
            1,
            bytearray(encode_y4m(frames)),
            {
                "modality": "video",
                "mime": "video/x-yuv4mpeg",
                "width": 16,
                "height": 16,
                "duration_ms": 400,
            },
        ),
        (2, None, {"modality": "video", "mime": "video/x-yuv4mpeg",
                   "width": None, "height": None, "duration_ms": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["media_id"], r["frame_idx"]) for r in video_scene_cuts(media, 0.5).collect()
    }
    assert got == {(1, 4), (1, 7)}


def test_media_hash_ops_survive_corrupt_payloads(spark):
    """Crawl-robustness contract: truncated/corrupt payloads and
    formats needing an external codec (progressive JPEG, WebP) must
    yield NULL hashes / no rows — never a task failure."""
    from ballista_spark.operators.multimodal import (
        dhash_audio,
        dhash_images,
        video_scene_cuts,
    )

    rng = np.random.default_rng(7)
    good = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    media = _media_df(
        spark,
        [
            (1, encode_bmp(good), "image/bmp", "image"),
            (2, b"\xff\xd8\xff\xc2 progressive-ish", "image/jpeg", "image"),
            (3, b"RIFF....WEBPVP8 ", "image/webp", "image"),
            (4, b"BM truncated", "image/bmp", "image"),
            (5, b"RIFFgarbage", "audio/wav", "audio"),
            (6, b"YUV4MPEG2 garbage", "video/x-yuv4mpeg", "video"),
        ],
    )
    hv = {r["media_id"]: r["dhash"] for r in dhash_images(media).collect()}
    assert hv[1] is not None
    assert hv[2] is None and hv[3] is None and hv[4] is None and hv[6] is None
    av = {r["media_id"]: r["dhash"] for r in dhash_audio(media).collect()}
    assert av[5] is None
    assert video_scene_cuts(media, 0.0).count() == 0  # corrupt video: no rows
