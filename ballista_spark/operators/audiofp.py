"""Audio landmark fingerprinting — constellation peak-pair hashes with
offset voting (the Shazam scheme: Wang 2003, "An Industrial-Strength
Audio Search Algorithm").

The existing :func:`multimodal.audio_dhash` is a whole-file envelope
hash: good for near-identical file dedup, blind to containment.  This
operator answers the harder pipeline question — "is this 10-second
clip *inside* that track?" (training-data provenance, copyrighted-audio
filtering, broadcast-overlap dedup):

1. **Fingerprint** (map-only, pure numpy per payload): STFT → log
   magnitude → 2-D local-max peak constellation → each anchor peak
   pairs with a few forward targets; ``hash = (f_anchor, f_target,
   Δt)`` packed into 26 bits.  A payload yields O(seconds × fanout)
   rows — bounded, tiny vs the payload.
2. **Match** (one equi-join + one groupBy): candidate pairs join on
   ``fp_hash``; true matches vote for a CONSISTENT time offset
   ``t_a − t_b``, so grouping by (a, b, offset) and thresholding the
   peak bin count separates real containment from chance collisions.

Scale shape: extraction is ``mapInPandas`` (no shuffle; peak memory =
one Arrow batch of payloads).  The join is hash-partitioned on
``fp_hash``; a pathologically common hash (DC hum, test tones) would
quadratically blow up the candidate set, so hashes appearing in more
than ``max_df`` distinct items are dropped first — the same stopword
device as bm25's document-frequency pruning, and the same reason it is
safe: a hash shared by half the corpus carries no discriminative votes.

Reference parity: the reference engine has no media operators (its
surface is relational — `rust/core/proto/ballista.proto`); this is
beyond-reference pipeline capability like the codecs and perceptual
hashes before it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "landmark_fingerprints",
    "audio_fingerprints",
    "audio_match_pairs",
]

#: STFT frame/hop (samples) — 64 ms / 32 ms at 16 kHz
N_FFT = 1024
HOP = 512
#: peak neighborhood half-width (time frames × freq bins)
PEAK_NEIGHBORHOOD = 4
#: strongest peaks kept per STFT frame (constellation density cap)
PEAKS_PER_FRAME = 3
#: each anchor pairs with up to FANOUT targets within the window
FANOUT = 6
TARGET_DT = (1, 63)  # Δt window in frames (6 bits)

FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fp_hash", T.LongType(), False),
        T.StructField("t", T.IntegerType(), False),
    ]
)


def _stft_logmag(mono: np.ndarray) -> np.ndarray:
    """(n_frames, n_bins) log-magnitude spectrogram, Hann window."""
    n = len(mono)
    if n < N_FFT:
        mono = np.pad(mono, (0, N_FFT - n))
        n = N_FFT
    n_frames = 1 + (n - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = mono[idx] * np.hanning(N_FFT)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    return np.log1p(mag)


def _constellation(spec: np.ndarray) -> np.ndarray:
    """(k, 2) array of (t_frame, f_bin) peaks: strict 2-D local maxima
    over a (2r+1)² neighborhood, magnitude above the spectrogram mean,
    top ``PEAKS_PER_FRAME`` per frame."""
    r = PEAK_NEIGHBORHOOD
    padded = np.pad(spec, r, mode="constant", constant_values=-np.inf)
    win = np.lib.stride_tricks.sliding_window_view(padded, (2 * r + 1, 2 * r + 1))
    neigh_max = win.max(axis=(2, 3))
    is_peak = (spec >= neigh_max) & (spec > spec.mean())
    t, f = np.nonzero(is_peak)
    if len(t) == 0:
        return np.empty((0, 2), np.int64)
    # keep the strongest PEAKS_PER_FRAME per frame: sort by (t, -mag)
    mags = spec[t, f]
    order = np.lexsort((-mags, t))
    t, f = t[order], f[order]
    rank = np.arange(len(t)) - np.searchsorted(t, t, side="left")
    keep = rank < PEAKS_PER_FRAME
    return np.stack([t[keep], f[keep]], axis=1)


def landmark_fingerprints(samples: np.ndarray, rate: int) -> np.ndarray:
    """(k, 2) int64 array of (hash, t_anchor) landmark fingerprints.

    ``hash`` packs (f_anchor:10 | f_target:10 | Δt:6) — 26 bits; ``t``
    is the anchor's STFT frame index (the offset-voting coordinate).
    Deterministic: no randomness, rate only affects frame duration.
    """
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    mono = np.asarray(mono, np.float64)
    if mono.size == 0:
        return np.empty((0, 2), np.int64)
    peak = np.abs(mono).max()
    if peak > 0:
        mono = mono / peak  # gain-invariance before the log-magnitude
    peaks = _constellation(_stft_logmag(mono))
    if len(peaks) < 2:
        return np.empty((0, 2), np.int64)
    lo, hi = TARGET_DT
    ts, fs = peaks[:, 0], peaks[:, 1]
    # vectorized pairing: per anchor i the targets are the first FANOUT
    # peaks in the [t+lo, t+hi] frame window — one searchsorted pair +
    # a broadcast index grid, no per-peak Python loop
    j = np.searchsorted(ts, ts + lo, side="left")
    k = np.searchsorted(ts, ts + hi, side="right")
    tgt = j[:, None] + np.arange(FANOUT)[None, :]
    valid = tgt < np.minimum(k, j + FANOUT)[:, None]
    tgt = np.clip(tgt, 0, len(ts) - 1)
    h = (fs[:, None] << 16) | (fs[tgt] << 6) | (ts[tgt] - ts[:, None])
    anchors = np.broadcast_to(ts[:, None], h.shape)
    out = np.stack([h[valid], anchors[valid]], axis=1)
    return out.astype(np.int64)


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, fp_hash, t) rows for every audio payload — map-only
    fan-out over Arrow batches; non-audio/NULL payloads yield nothing."""
    from ballista_spark.operators.multimodal import decode_media

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, times = [], [], []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                mime = (m or {}).get("mime") or ""
                if p is None or not mime.startswith("audio"):
                    continue
                try:
                    samples, rate = decode_media(bytes(p), mime)
                except Exception:
                    continue  # corrupt/unsupported payload → no landmarks
                fps = landmark_fingerprints(samples, rate)
                ids.extend([mid] * len(fps))
                hashes.extend(fps[:, 0].tolist())
                times.extend(fps[:, 1].tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "fp_hash": pd.array(hashes, dtype="int64"),
                    "t": pd.array(times, dtype="int32"),
                }
            )

    return media.mapInPandas(run, schema=FINGERPRINT_SCHEMA)


def audio_match_pairs(
    fps: DataFrame,
    min_matches: int = 8,
    max_df: int = 1000,
    key_col: str = "media_id",
) -> DataFrame:
    """(key_a, key_b, offset, n_matches) — pairs of items sharing
    ``>= min_matches`` fingerprints at ONE consistent time offset
    (``t_a − t_b`` in STFT frames), key_a < key_b.

    The offset-histogram vote is what makes landmarks robust: chance
    hash collisions scatter across offsets, true containment piles onto
    a single bin.  One self-equi-join on ``fp_hash`` + one groupBy —
    both hash-partitioned, no cartesian; ubiquitous hashes (df >
    ``max_df`` distinct items) are pruned first to bound the join
    fan-out (see module docstring).
    """
    k = F.col(key_col)
    # document-frequency prune — bounds the per-hash join blow-up
    df_ok = (
        fps.groupBy("fp_hash")
        .agg(F.countDistinct(key_col).alias("__df"))
        .where(F.col("__df") <= max_df)
        .select("fp_hash")
    )
    slim = fps.join(df_ok, "fp_hash").select(
        k.alias("__k"), F.col("fp_hash"), F.col("t")
    )
    a = slim.select(
        F.col("__k").alias("key_a"), "fp_hash", F.col("t").alias("__ta")
    )
    b = slim.select(
        F.col("__k").alias("key_b"), "fp_hash", F.col("t").alias("__tb")
    )
    return (
        a.join(b, "fp_hash")
        .where(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b", (F.col("__ta") - F.col("__tb")).alias("offset"))
        .agg(F.count("*").alias("n_matches"))
        .where(F.col("n_matches") >= min_matches)
    )
