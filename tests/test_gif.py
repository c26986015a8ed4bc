"""GIF codec tests (multimodal.decode_gif / encode_gif).

The independent oracle is a hand-assembled GIF whose LZW stream was
derived by hand (dictionary growth, the KwKwK case, and a mid-stream
code-width increase) — encode_gif can't cancel a decoder bug there
because it never builds a dictionary (clear-code-per-pixel device).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ballista_spark.operators.multimodal import decode_gif, encode_gif


class _LsbBits:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, value: int, width: int):
        self.acc |= value << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def tobytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _gif(w, h, palette_rgb, image_blocks, gce=None, bg=0, depth=2):
    """Assemble a GIF89a from parts (palette padded to 2^depth)."""
    ncolors = 1 << depth
    pal = bytearray()
    for rgb in palette_rgb:
        pal += bytes(rgb)
    pal += b"\x00" * (ncolors * 3 - len(pal))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), bg, 0)
    out += pal
    if gce is not None:
        out += b"\x21\xf9\x04" + bytes(gce) + b"\x00"
    for block in image_blocks:
        out += block
    out += b"\x3b"
    return bytes(out)


def _image_block(left, top, fw, fh, min_code, lzw_bytes, flags=0):
    out = bytearray(b"\x2c")
    out += struct.pack("<HHHHB", left, top, fw, fh, flags)
    out.append(min_code)
    for i in range(0, len(lzw_bytes), 255):
        chunk = lzw_bytes[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    return bytes(out)


PAL4 = [(10, 20, 30), (200, 0, 0), (0, 200, 0), (0, 0, 200)]


def test_decode_hand_lzw_kwkwk_and_width_growth():
    """Pixels [1,1,1,1,1] hand-encoded with REAL LZW (min code size 2):
    codes CLEAR(4)@3b, 1@3b, 6@3b (KwKwK — code == table size), 6@3b
    (now a real entry), then the table hits 8 entries so EOI(5) reads at
    4 bits.  Any off-by-one in dictionary growth, width switching or the
    KwKwK branch breaks this vector."""
    bits = _LsbBits()
    bits.put(4, 3)  # CLEAR
    bits.put(1, 3)  # emit "1"            (table grows to 7 on next add)
    bits.put(6, 3)  # KwKwK: (1,1)        (add #6, then #7 -> width 4)
    bits.put(6, 3)  # (1,1)
    bits.put(5, 4)  # EOI at the grown width
    payload = _gif(5, 1, PAL4, [_image_block(0, 0, 5, 1, 2, bits.tobytes())])
    out = decode_gif(payload)
    assert out.shape == (1, 5, 3)
    assert (out == np.array(PAL4[1])).all()


def test_decode_transparency_composites_background():
    """GCE transparency: transparent pixels show the logical-screen
    background color (palette[bg])."""
    bits = _LsbBits()
    # pixels [2, 3]: CLEAR, 2, 3, EOI at constant width 3 (table reaches
    # only 7 entries — one add after the first emit)
    for code, wd in [(4, 3), (2, 3), (3, 3), (5, 3)]:
        bits.put(code, wd)
    payload = _gif(
        2,
        1,
        PAL4,
        [_image_block(0, 0, 2, 1, 2, bits.tobytes())],
        gce=[0x01, 0, 0, 3],  # transparency on, transparent index 3
        bg=1,
    )
    out = decode_gif(payload)
    assert tuple(out[0, 0]) == PAL4[2]  # opaque pixel
    assert tuple(out[0, 1]) == PAL4[1]  # transparent -> bg color


def test_decode_frame_offset_composites_on_screen():
    """A 1x1 frame at (left=2, top=1) inside a 4x3 screen: everything
    else is background."""
    bits = _LsbBits()
    for code, wd in [(4, 3), (2, 3), (5, 3)]:
        bits.put(code, wd)
    payload = _gif(4, 3, PAL4, [_image_block(2, 1, 1, 1, 2, bits.tobytes())], bg=0)
    out = decode_gif(payload)
    assert out.shape == (3, 4, 3)
    assert tuple(out[1, 2]) == PAL4[2]
    mask = np.ones((3, 4), bool)
    mask[1, 2] = False
    assert (out[mask] == np.array(PAL4[0])).all()


def test_decode_animated_returns_first_frame():
    b1 = _LsbBits()
    for code, wd in [(4, 3), (1, 3), (5, 3)]:
        b1.put(code, wd)
    b2 = _LsbBits()
    for code, wd in [(4, 3), (2, 3), (5, 3)]:
        b2.put(code, wd)
    payload = _gif(
        1,
        1,
        PAL4,
        [
            _image_block(0, 0, 1, 1, 2, b1.tobytes()),
            _image_block(0, 0, 1, 1, 2, b2.tobytes()),
        ],
    )
    assert tuple(decode_gif(payload)[0, 0]) == PAL4[1]


def test_roundtrip_random_palette_image():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (17, 3), np.uint8)
    idx = rng.integers(0, 17, (23, 31))
    img = pal[idx]
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, img)


def test_roundtrip_grayscale_and_two_color():
    img = np.zeros((9, 7), np.uint8)
    img[::2] = 255
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, np.stack([img] * 3, axis=-1))


def test_interlaced_decode_restores_row_order():
    """Encode the rows pre-permuted into interlace order, flip the
    interlace flag in the image descriptor, and the decoder must undo
    the permutation."""
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (8, 3), np.uint8)
    img = pal[rng.integers(0, 8, (8, 5))]
    order = [0] * 8
    pos = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for r in range(start, 8, step):
            order[pos] = r
            pos += 1
    enc = bytearray(encode_gif(img[order]))
    depth = max(2, int(np.ceil(np.log2(8))))
    flag_pos = 13 + 3 * (1 << depth) + 9  # header+LSD, GCT, 0x2C + 8
    assert enc[flag_pos] == 0
    enc[flag_pos] = 0x40
    out = decode_gif(bytes(enc))
    assert np.array_equal(out, img)


def test_encoder_rejects_truecolor():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (40, 40, 3), np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_decode_rejects_non_gif():
    with pytest.raises(ValueError):
        decode_gif(b"\xff\xd8\xff\xe0 not a gif")


def test_dispatch_and_dhash_on_gif():
    from ballista_spark.operators.multimodal import decode_media, image_dhash

    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (32, 3), np.uint8)
    img = pal[rng.integers(0, 32, (24, 24))]
    payload = encode_gif(img)
    assert decode_media(payload, "image/gif").shape == (24, 24, 3)
    h1 = image_dhash(payload, "image/gif")
    h2 = image_dhash(encode_gif(img), "image/gif")
    assert h1 == h2
