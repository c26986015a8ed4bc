"""Baseline JPEG codec tests (operators/jpeg.py).

Two layers of evidence, deliberately asymmetric so a matched
encoder/decoder bug pair cannot cancel:

1. HAND-CONSTRUCTED bitstreams — segments and entropy bits assembled in
   this file with a local bit-writer (independent of the module's), with
   expected pixels computed from the DCT definition written out here.
2. Round-trip bounds through encode_jpeg at several qualities, shapes
   and subsampled/gray variants, plus mapInPandas integration through
   image_dhash / extract_features.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from ballista_spark.operators.jpeg import decode_jpeg, encode_jpeg


# ---------------------------------------------------------------------------
# local, independent bitstream assembly helpers

class _Bits:
    def __init__(self):
        self.bits = []

    def put(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _dqt(tid: int, table64) -> bytes:
    return b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(table64)


def _sof0(h: int, w: int, comps) -> bytes:
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body


def _dht(tclass: int, tid: int, bits16, vals) -> bytes:
    body = bytes([(tclass << 4) | tid]) + bytes(bits16) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _sos(comps) -> bytes:
    body = bytes([len(comps)])
    for cid, tdc, tac in comps:
        body += bytes([cid, (tdc << 4) | tac])
    body += bytes([0, 63, 0])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _idct_pixel(coef_nat: np.ndarray, x: int, y: int) -> float:
    """Straight T.81 A.3.3 IDCT definition — the trusted formula."""
    total = 0.0
    for u in range(8):
        for v in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            total += (
                cu * cv * coef_nat[u, v]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
            )
    return total / 4 + 128


# ---------------------------------------------------------------------------
# hand-constructed decode vectors

def test_decode_hand_built_single_ac_coefficient():
    """8x8 grayscale, one AC coefficient at zigzag index 1 (natural
    (0,1) — horizontal frequency).  Pixels must match the IDCT formula
    and vary along WIDTH only — catches transposed axes that a
    round-trip test through our own encoder would cancel out."""
    quant = [16] * 64
    # DC table: symbol 0 (size 0) <- code '0'; AC table: 0x02 <- '00',
    # 0x00 (EOB) <- '01'
    dc_bits = [1] + [0] * 15
    ac_bits = [0, 2] + [0] * 14
    bs = _Bits()
    bs.put(0b0, 1)        # DC size 0 -> diff 0
    bs.put(0b00, 2)       # AC (run 0, size 2)
    bs.put(0b11, 2)       # magnitude 3
    bs.put(0b01, 2)       # EOB
    payload = (
        b"\xff\xd8"
        + _dqt(0, quant)
        + _sof0(8, 8, [(1, 1, 1, 0)])
        + _dht(0, 0, dc_bits, [0])
        + _dht(1, 0, ac_bits, [0x02, 0x00])
        + _sos([(1, 0, 0)])
        + bs.tobytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 8)
    coef = np.zeros((8, 8))
    coef[0, 1] = 3 * 16  # dequantized
    want = np.clip(
        np.rint([[_idct_pixel(coef, x, y) for y in range(8)] for x in range(8)]),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(out, want)
    # orientation: varies across columns, constant down rows
    assert (out == out[0:1, :]).all()
    assert len(set(out[0].tolist())) > 1


def test_decode_hand_built_420_quadrants():
    """16x16 YCbCr 4:2:0, four Y blocks with distinct DC levels, flat
    chroma — exercises MCU interleaving, per-block DC prediction and
    chroma upsample with exactly-known output (gray quadrants)."""
    quant = [16] * 64
    # DC: size 0 <- '0', size 5 <- '10' ; AC: EOB <- '0'
    dc_bits = [1, 1] + [0] * 14
    ac_bits = [1] + [0] * 15
    bs = _Bits()
    # Y blocks raster within the MCU: TL (DC diff 0), TR (+16), BL (+16),
    # BR (+16) — dequantized DC 0/256/512/768 = flat 128/160/192/224
    bs.put(0b0, 1); bs.put(0b0, 1)                      # TL: DC0, EOB
    for _ in range(3):
        bs.put(0b10, 2); bs.put(16, 5); bs.put(0b0, 1)  # +16, EOB
    bs.put(0b0, 1); bs.put(0b0, 1)                      # Cb: DC0, EOB
    bs.put(0b0, 1); bs.put(0b0, 1)                      # Cr: DC0, EOB
    payload = (
        b"\xff\xd8"
        + _dqt(0, quant)
        + _sof0(16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + _dht(0, 0, dc_bits, [0, 5])
        + _dht(1, 0, ac_bits, [0x00])
        + _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)])
        + bs.tobytes()
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (16, 16, 3)
    for (r0, c0), level in [((0, 0), 128), ((0, 8), 160), ((8, 0), 192), ((8, 8), 224)]:
        quad = out[r0 : r0 + 8, c0 : c0 + 8]
        assert (quad == level).all(), f"quadrant@{(r0, c0)}: {np.unique(quad)}"


def test_decode_progressive_raises():
    payload = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes(
        [1, 0x11, 0]
    )
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(payload)


def test_decode_rejects_non_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


# ---------------------------------------------------------------------------
# round-trip properties

def test_roundtrip_flat_gray_exact_q100():
    img = np.full((16, 24), 130, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, 100)), img)


def test_roundtrip_gradient_q100_within_1():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_roundtrip_rgb_odd_size_bounded_error():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (33, 49, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(img, 85))
    assert out.shape == img.shape
    # random noise is the worst case for DCT coding; just bound the mean
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 20


def test_roundtrip_photo_like_quality_ladder():
    """Smooth content must improve monotonically-ish with quality."""
    x = np.arange(64)
    img = (
        128
        + 60 * np.sin(np.add.outer(x, x) / 9.0)
        + 40 * np.cos(np.subtract.outer(x, x) / 7.0)
    )
    img = np.clip(img, 0, 255).astype(np.uint8)
    errs = []
    for q in (50, 85, 100):
        out = decode_jpeg(encode_jpeg(img, q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] <= 1.0


def test_restart_interval_roundtrip_against_own_decoder():
    """DRI handling: splice a restart interval into an encoded stream by
    re-encoding MCU rows manually is overkill — instead decode a stream
    hand-built with RST markers between DC-only MCUs."""
    quant = [16] * 64
    dc_bits = [1, 1] + [0] * 14
    ac_bits = [1] + [0] * 15
    # 8x16 grayscale: two MCUs, restart interval 1 — predictor must reset,
    # so BOTH blocks encode diff +16 (dequant DC 256 = flat 160)
    def one_block():
        bs = _Bits()
        bs.put(0b10, 2); bs.put(16, 5); bs.put(0b0, 1)
        return bs.tobytes()

    entropy = one_block() + b"\xff\xd0" + one_block()
    payload = (
        b"\xff\xd8"
        + _dqt(0, quant)
        + b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1
        + _sof0(8, 16, [(1, 1, 1, 0)])
        + _dht(0, 0, dc_bits, [0, 5])
        + _dht(1, 0, ac_bits, [0x00])
        + _sos([(1, 0, 0)])
        + entropy
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 16)
    assert (out == 160).all()


# ---------------------------------------------------------------------------
# pipeline integration

def test_media_pipeline_runs_on_jpeg(spark):
    """JPEG payloads flow through decode_media → image_dhash → near-dup
    banding exactly like the other codec formats."""
    from ballista_spark.operators.multimodal import (
        decode_media,
        image_dhash,
        image_neardup_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 32, 3), np.uint8)
    near = base.copy()
    near[:16] = np.clip(near[:16].astype(int) + 2, 0, 255).astype(np.uint8)
    far = rng.integers(0, 256, (32, 32, 3), np.uint8)

    rows = [
        ("a", encode_jpeg(base, 95)),
        ("b", encode_jpeg(near, 95)),
        ("c", encode_jpeg(far, 95)),
    ]
    assert decode_media(rows[0][1], "image/jpeg").shape == (32, 32, 3)

    hashes = {mid: image_dhash(p, "image/jpeg") for mid, p in rows}
    dist_ab = bin(hashes["a"] ^ hashes["b"]).count("1")
    dist_ac = bin(hashes["a"] ^ hashes["c"]).count("1")
    assert dist_ab < dist_ac

    df = spark.createDataFrame(
        [(mid, h - (1 << 64) if h >= (1 << 63) else h) for mid, h in hashes.items()],
        "media_id string, dhash long",
    )
    pairs = image_neardup_pairs(df, hash_col="dhash", max_hamming=dist_ab)
    got = {tuple(sorted((r[0], r[1]))) for r in pairs.collect()}
    assert ("a", "b") in got


def test_resize_reencodes_jpeg(spark):
    from ballista_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        resize_images,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 56, 3), np.uint8)
    rows = [
        (
            1,
            bytearray(encode_jpeg(img, 90)),
            {
                "modality": "image",
                "mime": "image/jpeg",
                "width": 56,
                "height": 40,
                "duration_ms": None,
            },
        )
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, width=16, height=12, use_stub=False).collect()
    dec = decode_media(bytes(out[0]["payload"]), "image/jpeg")
    assert dec.shape == (12, 16, 3)


# --- EXIF orientation ---------------------------------------------------


def _with_exif(jpeg: bytes, orientation: int, byte_order: bytes = b"II") -> bytes:
    """Splice a hand-built APP1 EXIF segment (one IFD0 entry) after SOI."""
    if byte_order == b"II":
        tiff = (
            b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", orientation, 0)
            + struct.pack("<I", 0)
        )
    else:
        tiff = (
            b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", orientation, 0)
            + struct.pack(">I", 0)
        )
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    return jpeg[:2] + app1 + jpeg[2:]


def test_exif_orientation_parse_both_byte_orders():
    from ballista_spark.operators.jpeg import jpeg_orientation

    base = encode_jpeg(np.zeros((8, 8), np.uint8), 90)
    assert jpeg_orientation(base) == 1  # no EXIF
    assert jpeg_orientation(_with_exif(base, 6)) == 6
    assert jpeg_orientation(_with_exif(base, 8, b"MM")) == 8
    assert jpeg_orientation(_with_exif(base, 99)) == 1  # out of range


def test_exif_orientation_applied_on_decode():
    # asymmetric image: bright column 0 — rotation is visible
    img = np.zeros((16, 8), np.uint8)
    img[:, 0] = 255
    base = encode_jpeg(img, 100)
    raw = decode_jpeg(base)
    assert raw.shape == (16, 8)

    rot = decode_jpeg(_with_exif(base, 6))  # stored = scene rotated; fix = 90 CW
    assert rot.shape == (8, 16)
    # rot90 CW maps column 0 (left edge) to row 0 (top edge)
    assert rot[0].mean() > 200 and rot[-1].mean() < 50

    flipped = decode_jpeg(_with_exif(base, 2))
    assert flipped.shape == (16, 8)
    assert flipped[:, -1].mean() > 200 and flipped[:, 0].mean() < 50

    # opting out returns the stored pixels
    stored = decode_jpeg(_with_exif(base, 6), apply_exif_orientation=False)
    assert np.array_equal(stored, raw)
