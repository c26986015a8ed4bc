"""Winnowing fingerprints vs an exact plain-Python mirror of the MOSS
algorithm (robust winnowing: per-window rightmost minimum), plus the
paper's coverage guarantee and the overlap-pair construction."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.hashing import md5_long_py
from ballista_spark.operators.winnow import (
    DEFAULT_K,
    DEFAULT_W,
    HASH_SPACE,
    fingerprint_overlap_pairs,
    winnow_fingerprints,
)
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel"]


def _winnow_py(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Exact mirror: robust winnowing over md5-derived 40-bit k-gram
    hashes; returns {(fp_hash, 1-based token pos)}."""
    toks = text.strip().split(" ")
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [md5_long_py(g) % HASH_SPACE for g in grams]
    n = len(hs)
    starts = range(n - w + 1) if n >= w else [0]
    sel = set()
    for i in starts:
        window = range(i, min(i + w, n))
        # rightmost minimum: min hash, largest position on ties
        best = min(window, key=lambda t: (hs[t], -t))
        sel.add((hs[best], best + 1))
    return sel


def _rand_corpus(rng: random.Random, n_docs: int = 40) -> list[tuple[int, str]]:
    docs = []
    for i in range(n_docs):
        n = rng.randint(0, 30)
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(n))))
    return docs


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k,w", [(3, 4), (5, 8), (1, 1), (2, 50)])
def test_fingerprints_match_python_mirror(spark, seed, k, w):
    rng = random.Random(seed)
    docs = _rand_corpus(rng)
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r.key, r.fp_hash, r.fp_pos)
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }
    want = {
        (i, h, p) for i, t in docs for (h, p) in _winnow_py(t, k, w)
    }
    assert got == want


def test_fingerprints_on_real_documents(spark):
    """Mirror parity on the synthetic documents table (real text shapes:
    punctuation, repeated sentences, multi-space-free)."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    got = {
        (r.key, r.fp_hash, r.fp_pos)
        for r in winnow_fingerprints(docs).collect()
    }
    want = {
        (i, h, p)
        for i, t in rows
        for (h, p) in _winnow_py(t, DEFAULT_K, DEFAULT_W)
    }
    assert got == want and got


@pytest.mark.parametrize("seed", range(5))
def test_shared_passage_guarantee(spark, seed):
    """Paper §3: two documents sharing a token run of length >= w + k - 1
    share at least one fingerprint hash."""
    k, w = 4, 6
    t = w + k - 1
    rng = random.Random(100 + seed)
    passage = " ".join(rng.choice(WORDS) for _ in range(t))
    a = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 20)))
    b = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 20)))
    c = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 20)))
    docs = [(0, f"{a} {passage} {b}".strip()), (1, f"{c} {passage}".strip())]
    m0 = {h for (h, _) in _winnow_py(docs[0][1], k, w)}
    m1 = {h for (h, _) in _winnow_py(docs[1][1], k, w)}
    assert m0 & m1, "mirror must already satisfy the guarantee"
    df = spark.createDataFrame(docs, "doc_id int, text string")
    by_key: dict[int, set[int]] = {0: set(), 1: set()}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        by_key[r.key].add(r.fp_hash)
    assert by_key[0] & by_key[1]


def test_density_near_two_over_w_plus_one(spark):
    """Expected selected density ~ 2/(w+1) on random text."""
    rng = random.Random(7)
    n_tokens = 4000
    text = " ".join(rng.choice(WORDS) for _ in range(n_tokens))
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    k, w = 3, 9
    n_fp = winnow_fingerprints(df, k=k, w=w).count()
    density = n_fp / (n_tokens - k + 1)
    assert 0.5 * 2 / (w + 1) < density < 2.0 * 2 / (w + 1)


def test_overlap_pairs_match_mirror(spark):
    """fingerprint_overlap_pairs == the pair table computed from the
    Python-mirror fingerprint sets (no max_df pruning in range)."""
    rng = random.Random(42)
    docs = _rand_corpus(rng, 30)
    # plant a strong mirror pair
    docs[28] = (28, docs[3][1] + " extra tail tokens here")
    k, w = 3, 4
    df = spark.createDataFrame(docs, "doc_id int, text string")
    sets = {i: {h for (h, _) in _winnow_py(t, k, w)} for i, t in docs}
    want = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j and sets[i] and sets[j]:
                s = len(sets[i] & sets[j])
                if s >= 2:
                    ov = s / min(len(sets[i]), len(sets[j]))
                    want[(i, j)] = (s, len(sets[i]), len(sets[j]), ov)
    got = {
        (r.key_a, r.key_b): (r.shared, r.m_a, r.m_b, r.overlap)
        for r in fingerprint_overlap_pairs(
            df, k=k, w=w, max_df=10**6, min_shared=2
        ).collect()
    }
    assert got == want
    assert (3, 28) in got and got[(3, 28)][3] >= 0.9


def test_max_df_prunes_boilerplate(spark):
    """A k-gram present in every document is pruned by max_df, so the
    boilerplate-only pair signal disappears while a genuine mirrored
    passage still pairs."""
    k, w = 3, 3
    boiler = "common license header text always present"
    mirror = "mirrored passage of unusual words indeed"
    # four byte-identical boilerplate docs: their selected fingerprint
    # sets are identical, so every gram they share has df >= 4
    docs = [(i, f"{boiler} one red fish") for i in range(4)]
    docs += [(10, f"{boiler} {mirror}"), (11, f"{mirror} different ending")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    pairs = fingerprint_overlap_pairs(
        df, k=k, w=w, max_df=3, min_shared=1
    ).collect()
    keys = {(r.key_a, r.key_b) for r in pairs}
    # the boilerplate-only pairs (0..3 x each other, 0..3 x 10) are gone;
    # only the genuinely mirrored passage still pairs
    assert keys == {(10, 11)}


def test_partitioning_invariance(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    a = {
        (r.key, r.fp_hash, r.fp_pos)
        for r in winnow_fingerprints(docs).collect()
    }
    b = {
        (r.key, r.fp_hash, r.fp_pos)
        for r in winnow_fingerprints(docs.repartition(17)).collect()
    }
    assert a == b and a


def test_plan_no_cartesian_no_python(spark):
    """The pair plan must stay equi-join + hash-aggregate: no cartesian,
    no BroadcastNestedLoopJoin, no Python eval in the hot path."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    plan = (
        fingerprint_overlap_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_composes_with_resolve_duplicates(spark):
    """Winnow pairs are edge-shaped like the MinHash emitters: cluster
    resolution keeps exactly one survivor per mirror group."""
    from ballista_spark.operators.dedup import resolve_duplicates

    rng = random.Random(77)
    base = " ".join(rng.choice(WORDS) for _ in range(120))
    docs = [
        (0, base),
        (1, base + " tiny tail difference"),     # mirror of 0
        (2, "prefix words here " + base),        # mirror of 0 (transitive)
        (3, " ".join(rng.choice(WORDS) for _ in range(100))),  # distinct
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = fingerprint_overlap_pairs(
        df, k=4, w=5, min_shared=2, min_overlap=0.6
    )
    out = resolve_duplicates(df, pairs, "doc_id")
    canon = {r.doc_id: r.is_canonical for r in out.collect()}
    assert canon == {0: True, 1: False, 2: False, 3: True}
