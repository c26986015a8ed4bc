"""Content-defined chunking vs an independent per-position Python
mirror, the shift-robustness property that motivates CDC, and dedup
statistics."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.cdc import DEFAULT_WIN, cdc_chunks, cdc_dedup_stats

_P = 0x100000001B3


def _hash_py(window: bytes) -> int:
    h = 0
    for b in window:
        h = (h * _P + b) % 2**64
    return h


def _cuts_py(data: bytes, win: int, avg: int, lo: int, hi: int) -> list[int]:
    """Spec mirror: every window hash recomputed independently per
    position (catches vectorized-Horner bugs)."""
    n = len(data)
    if n == 0:
        return []
    if n <= lo:
        return [n]
    cand = []
    if n > win:
        for i in range(n - win + 1):
            if _hash_py(data[i : i + win]) % avg == avg - 1:
                cand.append(i + win)
    cuts: list[int] = []
    last = 0
    for c in cand:
        while c - last > hi:
            last += hi
            cuts.append(last)
        if c - last < lo:
            continue
        cuts.append(c)
        last = c
    while n - last > hi:
        last += hi
        cuts.append(last)
    if last < n:
        cuts.append(n)
    return cuts


def _chunks_py(data: bytes, win: int, avg: int, lo: int, hi: int):
    prev, out = 0, []
    for i, cut in enumerate(_cuts_py(data, win, avg, lo, hi)):
        out.append((i, prev, cut - prev, hashlib.md5(data[prev:cut]).hexdigest()))
        prev = cut
    return out


def _blobs(rng: random.Random, n: int, max_len: int = 6000):
    return [
        (i, bytearray(rng.getrandbits(8) for _ in range(rng.randint(0, max_len))))
        for i in range(n)
    ]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("avg,lo,hi", [(256, 64, 1024), (512, 0, 600), (64, 16, 256)])
def test_matches_python_mirror(spark, seed, avg, lo, hi):
    rng = random.Random(seed)
    rows = _blobs(rng, 12)
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    got = {
        (r.key, r.chunk_idx, r.offset, r.length, r.chunk_hash)
        for r in cdc_chunks(
            df, "data", "doc_id", avg_size=avg, min_size=lo, max_size=hi
        ).collect()
    }
    want = {
        (i, ci, off, ln, h)
        for i, blob in rows
        for (ci, off, ln, h) in _chunks_py(bytes(blob), DEFAULT_WIN, avg, lo, hi)
    }
    assert got == want


def test_chunk_invariants(spark):
    rng = random.Random(5)
    rows = _blobs(rng, 20, max_len=20000)
    avg, lo, hi = 512, 128, 2048
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    chunks = cdc_chunks(df, avg_size=avg, min_size=lo, max_size=hi).collect()
    by_key: dict[int, list] = {}
    for r in chunks:
        by_key.setdefault(r.key, []).append(r)
    sizes = {i: len(bytes(b)) for i, b in rows}
    for key, rs in by_key.items():
        rs.sort(key=lambda r: r.chunk_idx)
        # contiguous cover of the blob
        assert rs[0].offset == 0
        for a, b in zip(rs, rs[1:]):
            assert b.offset == a.offset + a.length
        assert rs[-1].offset + rs[-1].length == sizes[key]
        # every non-final chunk within the size band (unless whole-blob)
        for r in rs[:-1]:
            assert lo <= r.length <= hi
        assert 0 < rs[-1].length <= max(hi, lo if sizes[key] <= lo else hi)
    # empty blobs produce no chunks
    empties = [i for i, b in rows if len(b) == 0]
    assert all(k not in by_key for k in empties)


def test_shift_robustness(spark):
    """The CDC property: prefix insertion re-aligns — almost all chunk
    hashes of the original reappear in the shifted blob."""
    rng = random.Random(11)
    base = bytes(rng.getrandbits(8) for _ in range(30000))
    shifted = bytes(rng.getrandbits(8) for _ in range(137)) + base
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(shifted))], "doc_id long, data binary"
    )
    out = cdc_chunks(df, avg_size=512, min_size=128, max_size=2048).collect()
    h0 = {r.chunk_hash for r in out if r.key == 0}
    h1 = {r.chunk_hash for r in out if r.key == 1}
    assert len(h0) > 20
    # only the chunks up to the first re-aligned boundary may differ
    assert len(h0 - h1) <= 3


def test_dedup_stats(spark):
    """Three identical blobs + one unique: ratio reflects the copies."""
    rng = random.Random(3)
    shared = bytearray(rng.getrandbits(8) for _ in range(8000))
    uniq = bytearray(rng.getrandbits(8) for _ in range(4000))
    df = spark.createDataFrame(
        [(0, shared), (1, shared), (2, shared), (3, uniq)],
        "doc_id long, data binary",
    )
    chunks = cdc_chunks(df, avg_size=512, min_size=128, max_size=2048)
    row = cdc_dedup_stats(chunks).collect()[0]
    assert row.total_bytes == 3 * 8000 + 4000
    # unique bytes: one copy of the shared chunks + the unique blob
    # (random 8k vs 4k bytes share no chunks at these sizes)
    assert row.unique_bytes == 8000 + 4000
    assert row.n_chunks == 3 * (row.n_unique_chunks - _n_uniq_chunks(uniq)) + _n_uniq_chunks(uniq)
    assert abs(row.dedup_ratio - row.total_bytes / row.unique_bytes) < 1e-12


def _n_uniq_chunks(blob: bytearray) -> int:
    return len(_cuts_py(bytes(blob), DEFAULT_WIN, 512, 128, 2048))


def test_null_and_empty_blobs(spark):
    df = spark.createDataFrame(
        [(0, None), (1, bytearray()), (2, bytearray(b"tiny"))],
        "doc_id long, data binary",
    )
    rows = cdc_chunks(df, avg_size=256).collect()
    assert {(r.key, r.offset, r.length) for r in rows} == {(2, 0, 4)}


def test_partitioning_invariant(spark):
    rng = random.Random(8)
    rows = _blobs(rng, 16)
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    a = sorted(map(tuple, cdc_chunks(df, avg_size=256).collect()))
    b = sorted(map(tuple, cdc_chunks(df.repartition(9), avg_size=256).collect()))
    assert a == b


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(0, bytearray(b"x"))], "doc_id long, data binary")
    with pytest.raises(ValueError):
        cdc_chunks(df, avg_size=1)
    with pytest.raises(ValueError):
        cdc_chunks(df, avg_size=256, min_size=300, max_size=200)
