"""Content-defined chunking (CDC) over binary columns: shift-robust
chunk boundaries + chunk-level dedup statistics.

Fixed-size chunking breaks under insertion — one added byte shifts every
later boundary and every chunk hash changes.  CDC (the LBFS scheme of
Muthitacharoen et al., *A Low-Bandwidth Network File System*, SOSP 2001;
refined by FastCDC, USENIX ATC 2016) cuts where a rolling hash of the
last ``win`` bytes hits a content-determined pattern, so boundaries
re-align after any local edit and shared regions between blobs produce
byte-identical chunks — the storage-dedup primitive for the multimodal
side of a training corpus (near-identical images/audio re-encoded with
different metadata headers, re-crawled PDFs, snapshot deltas).

Boundary rule: cut after byte ``i`` when the ``win``-byte polynomial
hash ``H(b[i-win+1..i]) mod D == D-1`` with ``D = avg_size`` — expected
chunk length ≈ ``avg_size``; ``min_size`` suppresses early candidates
and ``max_size`` forces a cut (both FastCDC normalizations).  The hash
is a plain degree-``win`` polynomial in P = 0x100000001B3 (the FNV
prime) over uint64 wraparound arithmetic — chosen over a gear/Rabin
*incremental* rolling hash because the windowed form vectorizes: the
whole candidate mask for a blob is ``win`` fused numpy passes
(Horner over byte lanes), no per-byte Python loop, while remaining
bit-for-bit reproducible in pure Python (the mirror in
tests/test_cdc.py recomputes every window hash independently).

Scale shape (100 TB): chunking is ONE Arrow-batched ``mapInPandas``
pass — map-only, no shuffle, blobs never leave their partition; the
only state is the ``win``-byte window arithmetic.  Dedup statistics are
one chunk-hash-keyed map-side-combined aggregation.  Nothing is
collected or broadcast.

The reference engine has no binary operators (relational surface,
``rust/core/proto/ballista.proto``); this is pipeline-completing
functionality alongside operators/multimodal.py's perceptual hashes
(those dedup *decoded content*; CDC dedups *encoded bytes*).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: polynomial base (FNV-1 64-bit prime) — any odd constant works; fixed
#: so chunk boundaries are reproducible across engines and sessions
_P = np.uint64(0x100000001B3)
#: rolling-window width in bytes (LBFS uses 48; 16 is plenty at 64-bit)
DEFAULT_WIN = 16


def _cut_points(data: bytes, win: int, avg: int, lo: int, hi: int) -> list[int]:
    """Sorted cut offsets (exclusive chunk ends) for one blob — numpy
    candidate mask + a sparse greedy pass enforcing min/max size."""
    n = len(data)
    if n == 0:
        return []
    if n <= lo:  # shorter than min chunk: one whole chunk (lo < hi)
        return [n]
    if n > win:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        m = n - win + 1
        h = np.zeros(m, dtype=np.uint64)
        for j in range(win):  # Horner: h = h*P + lane j (win vector passes)
            h = h * _P + arr[j : j + m]
        # cut AFTER the window's last byte -> offset i+win
        cand = (
            np.flatnonzero(h % np.uint64(avg) == np.uint64(avg - 1)) + win
        ).tolist()
    else:  # too short for any hash window: forced cuts only
        cand = []
    cuts: list[int] = []
    last = 0
    for c in cand:
        while c - last > hi:  # forced cut: no candidate within max_size
            last += hi
            cuts.append(last)
        if c - last < lo:  # min_size: suppress too-early candidate
            continue
        cuts.append(c)
        last = c
    while n - last > hi:
        last += hi
        cuts.append(last)
    if last < n:
        cuts.append(n)
    return cuts


def cdc_chunks(
    df: DataFrame,
    bin_col: str = "data",
    key_col: str = "doc_id",
    avg_size: int = 4096,
    win: int = DEFAULT_WIN,
    min_size: int | None = None,
    max_size: int | None = None,
) -> DataFrame:
    """(key, chunk_idx, offset, length, chunk_hash) — content-defined
    chunks per blob; ``chunk_hash`` is the chunk bytes' md5 hex.

    ``min_size``/``max_size`` default to ``avg_size/4`` and
    ``4*avg_size`` (FastCDC's normalization band).  NULL blobs yield no
    rows; empty blobs yield none; a blob shorter than ``min_size`` (or
    the hash window) is one whole chunk.  Map-only — see module
    docstring.
    """
    if avg_size < 2:
        raise ValueError(f"avg_size must be >= 2, got {avg_size}")
    lo = avg_size // 4 if min_size is None else min_size
    hi = avg_size * 4 if max_size is None else max_size
    if not (0 <= lo < hi):
        raise ValueError(f"need 0 <= min_size < max_size, got {lo}, {hi}")
    field = df.schema[key_col]
    schema = T.StructType(
        [
            T.StructField("key", field.dataType, True),
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("chunk_hash", T.StringType(), False),
        ]
    )

    def chunk_batches(batches):
        for pdf in batches:
            keys, idxs, offs, lens, hashes = [], [], [], [], []
            for key, blob in zip(pdf[key_col], pdf[bin_col]):
                if blob is None:
                    continue
                data = bytes(blob)
                prev = 0
                for i, cut in enumerate(_cut_points(data, win, avg_size, lo, hi)):
                    keys.append(key)
                    idxs.append(i)
                    offs.append(prev)
                    lens.append(cut - prev)
                    hashes.append(hashlib.md5(data[prev:cut]).hexdigest())
                    prev = cut
            yield pd.DataFrame(
                {
                    "key": pd.Series(keys, dtype=pdf[key_col].dtype),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(key_col, bin_col).mapInPandas(chunk_batches, schema=schema)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row storage-dedup summary over a :func:`cdc_chunks` output:
    (n_chunks, n_unique_chunks, total_bytes, unique_bytes, dedup_ratio)
    — ``dedup_ratio = total/unique`` (≥ 1; the factor a content-
    addressed store shrinks the corpus by).  ONE chunk-hash-keyed
    map-side-combined aggregation + a scalar roll-up.
    """
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count("*").alias("__cnt"), F.first("length").alias("__len")
    )
    return per_hash.agg(
        F.sum("__cnt").cast("long").alias("n_chunks"),
        F.count("*").alias("n_unique_chunks"),
        F.sum(F.col("__cnt") * F.col("__len")).cast("long").alias("total_bytes"),
        F.sum("__len").cast("long").alias("unique_bytes"),
        (
            F.sum(F.col("__cnt") * F.col("__len")) / F.sum("__len")
        ).alias("dedup_ratio"),
    )
