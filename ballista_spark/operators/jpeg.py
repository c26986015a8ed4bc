"""Baseline JPEG codec — pure stdlib + numpy, no external library.

Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1) is Huffman coding +
8×8 DCT + quantization — all implementable with ``struct`` and numpy,
like the repo's PNG/BMP/PNM/WAV/Y4M codecs (``operators/multimodal.py``).
This module completes the *real web format* story for the perceptual
dedup pipeline: ``image_dhash`` → ``image_neardup_pairs`` now runs on
actual ``image/jpeg`` payloads with zero deploy-time dependencies.

Decoder (:func:`decode_jpeg`) supports what covers the overwhelming
majority of web JPEGs: baseline DCT (SOF0), 8-bit, grayscale or YCbCr,
any H×V chroma subsampling (4:4:4 / 4:2:2 / 4:2:0 / 4:1:1), restart
markers, 16-bit DQT precision.  Progressive (SOF2), arithmetic coding,
12-bit, and CMYK raise ``NotImplementedError`` from the same dispatch
convention as the other codecs.

Performance shape: the serial part (Huffman bit-stream walk) runs per
block in Python but uses a flat 16-bit peek LUT per table (the standard
fast-decode trick — one dict lookup per symbol, never per bit); the
numeric part (dequantize, de-zigzag, IDCT, level shift) is batched over
ALL blocks of a component in one numpy einsum.  At cluster scale the
parallel unit is the IMAGE (one payload per row inside ``mapInPandas``),
so per-image decode cost is the only constant that matters.

Encoder (:func:`encode_jpeg`) writes baseline 4:4:4 with the T.81
Annex-K example quantization (quality-scaled per the IJG formula) and
Annex-K Huffman tables — enough to generate test vectors and to let
``resize_images`` re-encode JPEG without PIL.

Reference parity: the reference engine ships no media codecs (its
surface is relational — `rust/core/proto/ballista.proto`); this is
beyond-reference pipeline capability like the PNG codec before it.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# ---------------------------------------------------------------------------
# shared tables

#: zig-zag scan order: index i of the scan → (row, col) flat index
_ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: T.81 Annex K.1 example luminance / chrominance quantization tables
#: (natural order) — the de-facto standard every encoder scales
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# T.81 Annex K.3 typical Huffman tables: (BITS counts per length 1..16,
# HUFFVAL symbol list) — used by the encoder and by the vast majority of
# real-world baseline files
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: orthonormal 8×8 DCT-II basis: block = C.T @ coef @ C reconstructs
#: pixels from coefficients (C[u, x] = a(u) cos((2x+1)uπ/16))
def _dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(-1, 1)
    x = np.arange(8).reshape(1, -1)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(0.25)
    c[0, :] *= 1 / np.sqrt(2)
    return c


_DCT = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman machinery

_LUT_BITS = 16  # JPEG code length cap — one peek resolves any symbol


def _canonical_codes(bits: list[int], huffval: list[int]):
    """(symbol, code, length) triples in canonical order (T.81 C.2)."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((huffval[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], huffval: list[int]) -> list[int]:
    """Flat 2^16 lookup: LUT[next16bits] = (symbol << 8) | code_length.

    Fills each code's aligned prefix range so ONE table index replaces
    the bit-by-bit tree walk — the classic fast Huffman decode.  A
    plain Python list: list indexing returns an int in one op, and a
    slice-assign fill beats building a numpy array + per-scan tolist()
    (which profiled as ⅓ of small-image decode time).
    """
    lut = [0] * (1 << _LUT_BITS)
    for sym, code, length in _canonical_codes(bits, huffval):
        lo = code << (_LUT_BITS - length)
        span = 1 << (_LUT_BITS - length)
        lut[lo : lo + span] = [(sym << 8) | length] * span
    return lut


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG
    byte-unstuffing (0xFF 0x00 → 0xFF) and restart-marker awareness."""

    __slots__ = ("data", "pos", "acc", "nbits", "_marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self._marker = None  # marker byte hit while filling, if any

    def _fill(self) -> None:
        # drop consumed high bits first so acc stays bounded even when
        # the caller skips the per-read masking (the inlined hot loop)
        self.acc &= (1 << self.nbits) - 1
        data, n = self.data, len(self.data)
        # top up well past one coefficient's 27-bit worst case: a large
        # buffer amortizes the call overhead (the scan refills every
        # ~8 coefficients instead of every other one)
        while self.nbits < 256:
            if self._marker is not None or self.pos >= n:
                # past a marker (or EOF): pad with 1-bits per T.81 F.2.2.5
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = data[self.pos]
            if b == 0xFF:
                nxt = data[self.pos + 1] if self.pos + 1 < n else 0xD9
                if nxt == 0x00:  # stuffed literal 0xFF
                    self.pos += 2
                else:  # a real marker terminates the segment
                    self._marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Discard buffered bits and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self._marker is not None and 0xD0 <= self._marker <= 0xD7:
            self._marker = None
            self.pos += 2
        else:  # scan forward for it (tolerate stray fill bytes)
            data, n = self.data, len(self.data)
            while self.pos + 1 < n:
                if data[self.pos] == 0xFF and 0xD0 <= data[self.pos + 1] <= 0xD7:
                    self.pos += 2
                    return
                self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# EXIF orientation

def _tiff_orientation(tiff: bytes) -> int:
    """Orientation (tag 0x0112) from a TIFF blob's IFD0, 1 if absent."""
    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        return 1
    try:
        if struct.unpack_from(e + "H", tiff, 2)[0] != 42:
            return 1
        (off,) = struct.unpack_from(e + "I", tiff, 4)
        (n,) = struct.unpack_from(e + "H", tiff, off)
        for i in range(n):
            ent = off + 2 + 12 * i
            tag, typ = struct.unpack_from(e + "HH", tiff, ent)
            if tag == 0x0112 and typ == 3:  # SHORT
                (val,) = struct.unpack_from(e + "H", tiff, ent + 8)
                return val if 1 <= val <= 8 else 1
    except struct.error:
        return 1
    return 1


def jpeg_orientation(payload: bytes) -> int:
    """EXIF orientation (1–8; 1 = upright/absent) from the APP1 segment.
    Cameras store rotated sensor data and set this tag; perceptual
    hashing without applying it mismatches visually-identical images."""
    if payload[:2] != b"\xff\xd8":
        return 1
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # scan data: APP segments are over
            return 1
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return _tiff_orientation(payload[pos + 10 : pos + 2 + seglen])
        pos += 2 + seglen
    return 1


#: EXIF orientation → upright-correcting array transform
_ORIENT_FIX = {
    2: lambda a: a[:, ::-1],
    3: lambda a: a[::-1, ::-1],
    4: lambda a: a[::-1],
    5: lambda a: np.swapaxes(a, 0, 1),
    6: lambda a: np.rot90(a, k=-1, axes=(0, 1)),
    7: lambda a: np.swapaxes(a, 0, 1)[::-1, ::-1],
    8: lambda a: np.rot90(a, k=1, axes=(0, 1)),
}


# ---------------------------------------------------------------------------
# decoder

def decode_jpeg(payload: bytes, apply_exif_orientation: bool = True) -> np.ndarray:
    """Baseline JPEG → uint8 array: (h, w) for grayscale, (h, w, 3) RGB.

    Pure stdlib + numpy.  Supports SOF0 (baseline sequential), 8-bit,
    1- or 3-component, arbitrary chroma subsampling, restart intervals;
    progressive/arithmetic/12-bit/CMYK raise ``NotImplementedError``.
    EXIF orientation is applied by default (what a browser shows —
    required for perceptual-hash consistency across camera rotations);
    pass ``apply_exif_orientation=False`` for the raw stored pixels.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    if apply_exif_orientation:
        o = jpeg_orientation(payload)
        if o != 1:
            img = decode_jpeg(payload, apply_exif_orientation=False)
            return np.ascontiguousarray(_ORIENT_FIX[o](img))
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list[int]] = {}  # (class, id) → LUT
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1  # tolerate fill bytes between segments
            continue
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                b += 1
                if prec == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, b).astype(np.float64)
                    b += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, b).astype(np.float64)
                    b += 128
                qt[tid] = tbl  # zigzag order, like the coefficients
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tclass, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                huff[(tclass, tid)] = _decode_lut(bits, vals)
                b += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both Huffman-sequential)
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision={prec} (only 8-bit)")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise NotImplementedError(f"JPEG {kind} (only baseline SOF0/1)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = {}
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan[cid] = (tabs >> 4, tabs & 0xF)  # (dc table, ac table)
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scan, qt, huff, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("JPEG had no scan (truncated?)")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row (incl. MCU padding)
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["dc_lut"] = huff[(0, scan[c["id"]][0])]
        c["ac_lut"] = huff[(1, scan[c["id"]][1])]
        c["pred"] = 0

    rd = _BitReader(data, pos)
    nmcu = mcux * mcuy
    # the bit budget per coefficient is ≤16 (code) + ≤11 (magnitude), so
    # one `nbits < 32` refill check per coefficient suffices (_fill tops
    # up past 48); acc/nbits live in locals, synced to rd only around
    # _fill/restart — attribute access per bit op would dominate
    acc = 0
    nbits = 0
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            rd.sync_restart()
            acc = 0
            nbits = 0
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_lut, ac_lut, coef = c["dc_lut"], c["ac_lut"], c["coef"]
            pred = c["pred"]
            cbw = c["bw"]
            for by in range(c["v"]):
                row = my * c["v"] + by
                for bx in range(c["h"]):
                    blk = [0] * 64
                    if nbits < 32:
                        rd.acc, rd.nbits = acc, nbits
                        rd._fill()
                        acc, nbits = rd.acc, rd.nbits
                    # DC
                    e = dc_lut[(acc >> (nbits - 16)) & 0xFFFF]
                    nbits -= e & 0xFF
                    t = e >> 8
                    if t:
                        v = (acc >> (nbits - t)) & ((1 << t) - 1)
                        nbits -= t
                        pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                    blk[0] = pred
                    # AC — run/size symbols until EOB or index 63
                    k = 1
                    while k < 64:
                        if nbits < 32:
                            rd.acc, rd.nbits = acc, nbits
                            rd._fill()
                            acc, nbits = rd.acc, rd.nbits
                        e = ac_lut[(acc >> (nbits - 16)) & 0xFFFF]
                        nbits -= e & 0xFF
                        rs = e >> 8
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL: 16 zeros
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 0xF
                        if size:
                            v = (acc >> (nbits - size)) & ((1 << size) - 1)
                            nbits -= size
                        else:
                            v = 0
                        if k > 63:
                            break  # corrupt stream; clamp
                        blk[k] = (
                            v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                        ) if size else 0
                        k += 1
                    coef[row * cbw + mx * c["h"] + bx] = blk
            c["pred"] = pred

    # numeric phase, batched per component: dequantize (zigzag order),
    # de-zigzag, IDCT over all blocks in one einsum, level shift
    planes = []
    for c in comps:
        deq = c["coef"].astype(np.float64) * qt[c["tq"]][None, :]
        nat = np.zeros_like(deq)
        nat[:, _ZIGZAG] = deq
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT, optimize=True)
        pix = np.clip(np.rint(pix + 128), 0, 255).astype(np.uint8)
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution by sample replication, crop
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise NotImplementedError(f"JPEG with {len(planes)} components (CMYK?)")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder

def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → table as-is, 100 → all ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip(np.floor((tbl * s + 50) / 100), 1, 255)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _encode_table(bits_vals) -> dict[int, tuple[int, int]]:
    return {s: (c, ln) for s, c, ln in _canonical_codes(*bits_vals)}


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes
    (4:4:4, Annex-K tables at the given IJG-scaled quality)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qluma = _quality_scale(_QUANT_LUMA, quality)
    qchroma = _quality_scale(_QUANT_CHROMA, quality)
    qts = [qluma] + ([] if gray else [qchroma])

    bh, bw = -(-h // 8), -(-w // 8)
    comp_coefs = []
    for ci, plane in enumerate(planes):
        pad = np.empty((bh * 8, bw * 8), dtype=np.float64)
        pad[:h, :w] = plane
        pad[h:, :w] = plane[-1:, :]  # edge replicate
        pad[:, w:] = pad[:, w - 1 : w]
        blocks = (
            pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
        )
        coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT, optimize=True)
        # quantize in natural order, then reorder to zigzag for the scan
        qnat = qluma if ci == 0 else qchroma
        coef = np.rint(coef.reshape(-1, 64) / qnat[None, :]).astype(np.int32)
        comp_coefs.append(coef[:, _ZIGZAG])  # zigzag scan order

    dc_tabs = [_encode_table(_HUFF_DC_LUMA)] + (
        [] if gray else [_encode_table(_HUFF_DC_CHROMA)]
    )
    ac_tabs = [_encode_table(_HUFF_AC_LUMA)] + (
        [] if gray else [_encode_table(_HUFF_AC_CHROMA)]
    )

    # inlined bit writer (locals instead of method calls — the encode
    # hot loop, same discipline as the decoder's scan) over list-form
    # blocks (one C-level tolist per component, not per-element numpy
    # scalar reads)
    comp_lists = [c.tolist() for c in comp_coefs]
    acc = 0
    nbits = 0
    out_bytes = bytearray()
    append = out_bytes.append
    preds = [0] * len(planes)
    for bi in range(bh * bw):
        for ci in range(len(planes)):
            t = 0 if ci == 0 else 1
            dct_, act_ = dc_tabs[t], ac_tabs[t]
            blk = comp_lists[ci][bi]
            dc = blk[0]
            diff = dc - preds[ci]
            preds[ci] = dc
            size = _csize(diff)
            code, ln = dct_[size]
            if size:
                acc = (acc << (ln + size)) | (code << size) | (
                    diff if diff >= 0 else diff + (1 << size) - 1
                )
                nbits += ln + size
            else:
                acc = (acc << ln) | code
                nbits += ln
            run = 0
            for k in range(1, 64):
                v = blk[k]
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = act_[0xF0]
                    acc = (acc << ln) | code
                    nbits += ln
                    run -= 16
                size = _csize(v)
                code, ln = act_[(run << 4) | size]
                acc = (acc << (ln + size)) | (code << size) | (
                    v if v >= 0 else v + (1 << size) - 1
                )
                nbits += ln + size
                run = 0
            if run:
                code, ln = act_[0x00]  # EOB
                acc = (acc << ln) | code
                nbits += ln
            while nbits >= 8:
                b = (acc >> (nbits - 8)) & 0xFF
                append(b)
                if b == 0xFF:
                    append(0x00)  # byte stuffing
                nbits -= 8
            acc &= (1 << nbits) - 1
    if nbits:  # pad the tail with 1-bits
        pad = 8 - nbits
        b = ((acc << pad) | ((1 << pad) - 1)) & 0xFF
        append(b)
        if b == 0xFF:
            append(0x00)
    bwt = _BitWriter()
    bwt.out = out_bytes

    out = bytearray(b"\xff\xd8")
    for tid, q in enumerate(qts):
        # DQT stores the table in zigzag order (T.81 B.2.4.1)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in q[_ZIGZAG]
        )
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    huff_specs = [(0, 0, _HUFF_DC_LUMA), (1, 0, _HUFF_AC_LUMA)]
    if not gray:
        huff_specs += [(0, 1, _HUFF_DC_CHROMA), (1, 1, _HUFF_AC_CHROMA)]
    for tclass, tid, (bits, vals) in huff_specs:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), (tclass << 4) | tid
        ) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += bytes([0, 63, 0])  # Ss, Se, Ah/Al (full sequential scan)
    out += bwt.out
    out += b"\xff\xd9"
    return bytes(out)
