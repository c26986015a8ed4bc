"""Audio landmark fingerprinting tests (operators/audiofp.py).

Synthetic deterministic audio (tone mixtures via numpy) — detection
properties: identical → exact self-match, containment (clip inside a
longer track) → one dominant offset bin at the right position,
gain-invariance, and unrelated noise staying below threshold.
"""

from __future__ import annotations

import numpy as np
import pytest

from ballista_spark.operators.audiofp import (
    HOP,
    audio_fingerprints,
    audio_match_pairs,
    landmark_fingerprints,
)
from ballista_spark.operators.multimodal import encode_wav

RATE = 16000


def _tone_track(seed: int, seconds: float) -> np.ndarray:
    """Deterministic melody-ish signal: a sequence of 0.25 s tone chords
    with per-segment frequencies drawn from a seeded RNG."""
    rng = np.random.default_rng(seed)
    seg = int(0.25 * RATE)
    n = int(seconds * RATE)
    t = np.arange(seg) / RATE
    out = np.empty(n)
    for i in range(0, n, seg):
        freqs = rng.integers(200, 4000, 3)
        chord = sum(np.sin(2 * np.pi * f * t) for f in freqs)
        out[i : i + seg] = chord[: n - i]
    return (out / np.abs(out).max() * 0.8).astype(np.float64)


def _wav(sig: np.ndarray) -> bytes:
    return encode_wav((sig * 32767).astype(np.int16), RATE)


def test_fingerprints_deterministic_and_nonempty():
    sig = _tone_track(1, 3.0)
    a = landmark_fingerprints(sig, RATE)
    b = landmark_fingerprints(sig, RATE)
    assert len(a) > 50
    assert np.array_equal(a, b)


def test_gain_invariance():
    sig = _tone_track(2, 3.0)
    a = landmark_fingerprints(sig, RATE)
    b = landmark_fingerprints(sig * 0.25, RATE)
    # peak normalization makes scaling exactly invariant
    assert np.array_equal(a, b)


def test_clip_containment_votes_consistent_offset():
    """A 2 s excerpt of track A, prepended with 3 s of unrelated audio,
    must share many hashes with A at ONE offset ≈ the 3 s shift minus
    the excerpt position."""
    track = _tone_track(3, 6.0)
    start = int(2.0 * RATE)
    clip = track[start : start + int(2.0 * RATE)]
    other = _tone_track(99, 3.0)
    embedded = np.concatenate([other, clip])

    fa = landmark_fingerprints(track, RATE)
    fb = landmark_fingerprints(embedded, RATE)
    ha = {}
    for h, t in fa:
        ha.setdefault(h, []).append(t)
    votes = {}
    for h, t in fb:
        for ta in ha.get(h, ()):
            votes[ta - t] = votes.get(ta - t, 0) + 1
    assert votes, "no shared hashes at all"
    best_offset, best_n = max(votes.items(), key=lambda kv: kv[1])
    assert best_n >= 8
    want = (start - len(other)) // HOP  # clip frame i aligns to track frame i+want
    assert abs(best_offset - want) <= 2
    # the winning bin dominates scattered chance collisions
    rest = sorted(votes.values())[-2] if len(votes) > 1 else 0
    assert best_n >= 3 * max(rest, 1)


def test_unrelated_noise_below_threshold():
    rng = np.random.default_rng(0)
    a = landmark_fingerprints(rng.standard_normal(3 * RATE), RATE)
    b = landmark_fingerprints(rng.standard_normal(3 * RATE), RATE)
    ha = {}
    for h, t in a:
        ha.setdefault(h, []).append(t)
    votes = {}
    for h, t in b:
        for ta in ha.get(h, ()):
            votes[ta - t] = votes.get(ta - t, 0) + 1
    assert max(votes.values(), default=0) < 8


def test_short_and_silent_payloads():
    assert len(landmark_fingerprints(np.zeros(100), RATE)) == 0
    assert landmark_fingerprints(np.zeros(0, np.float64), RATE).shape == (0, 2)


def test_spark_end_to_end_match(spark):
    """mapInPandas extraction + the offset-voting join find the planted
    containment pair and nothing else."""
    from ballista_spark.operators.multimodal import MEDIA_SCHEMA

    track = _tone_track(7, 6.0)
    clip = track[int(RATE * 1.0) : int(RATE * 3.5)]
    embedded = np.concatenate([_tone_track(55, 2.0), clip])
    unrelated = _tone_track(77, 5.0)

    def row(mid, sig):
        return (
            mid,
            bytearray(_wav(sig)),
            {
                "modality": "audio",
                "mime": "audio/wav",
                "width": None,
                "height": None,
                "duration_ms": int(1000 * len(sig) / RATE),
            },
        )

    media = spark.createDataFrame(
        [row(1, track), row(2, embedded), row(3, unrelated)], MEDIA_SCHEMA
    )
    fps = audio_fingerprints(media)
    assert fps.where("media_id = 1").count() > 50
    pairs = audio_match_pairs(fps, min_matches=8).collect()
    keys = {(r["key_a"], r["key_b"]) for r in pairs}
    assert (1, 2) in keys
    assert all(k == (1, 2) for k in keys)


def test_match_pairs_prunes_ubiquitous_hashes(spark):
    """A hash present in > max_df items must not generate candidates."""
    rows = [(i, 12345, 0) for i in range(6)] + [(1, 777, 5), (2, 777, 9)] * 10
    fps = spark.createDataFrame(rows, "media_id long, fp_hash long, t int")
    got = audio_match_pairs(fps, min_matches=1, max_df=5).collect()
    assert {(r["key_a"], r["key_b"]) for r in got} == {(1, 2)}


def test_fingerprints_skip_corrupt_payloads(spark):
    """Corrupt/undecodable audio rows yield no landmarks, never a task
    failure (the crawl-robustness contract of the media operators)."""
    from ballista_spark.operators.multimodal import MEDIA_SCHEMA

    track = _tone_track(7, 3.0)

    def row(mid, payload, mime):
        return (
            mid,
            bytearray(payload),
            {"modality": "audio", "mime": mime, "width": None,
             "height": None, "duration_ms": None},
        )

    media = spark.createDataFrame(
        [
            row(1, _wav(track), "audio/wav"),
            row(2, b"RIFFgarbage-not-a-wav", "audio/wav"),
            row(3, b"\x00\x01\x02", "audio/mpeg"),  # external-codec format
        ],
        MEDIA_SCHEMA,
    )
    fps = audio_fingerprints(media)
    assert fps.where("media_id = 1").count() > 0
    assert fps.where("media_id != 1").count() == 0
