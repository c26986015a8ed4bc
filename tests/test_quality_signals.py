"""Compressibility quality signals (compression_ratio / char_entropy)
vs exact Python mirrors and their discriminative ordering."""

from __future__ import annotations

import math
import zlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.quality import char_entropy, compression_ratio
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def _ratio_py(t):
    b = t.encode("utf-8")
    return len(zlib.compress(b, 6)) / len(b) if b else None


def _ent_py(t):
    if not t:
        return None
    n = len(t)
    return -sum((c / n) * math.log2(c / n) for c in Counter(t).values())


def test_matches_python_mirror_on_documents(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    rows = {r.doc_id: r.text for r in docs.collect()}
    got = {
        r.doc_id: (r.cr, r.ce)
        for r in docs.select(
            "doc_id",
            compression_ratio("text").alias("cr"),
            char_entropy("text").alias("ce"),
        ).collect()
    }
    assert got
    for k, t in rows.items():
        cr, ce = got[k]
        assert cr == pytest.approx(_ratio_py(t), abs=1e-12)
        assert ce == pytest.approx(_ent_py(t), abs=1e-12)


def test_discriminative_ordering(spark):
    import random

    rng = random.Random(4)
    prose = (
        "the quick brown fox jumps over the lazy dog while carefully "
        "observing seventeen distinct atmospheric phenomena near the shore "
        "meanwhile a completely different paragraph describes how harbor "
        "engineers measured tidal currents with borrowed instruments and "
        "compared their findings against decades of archived observations "
        "before presenting a cautious summary to the municipal council"
    )
    spam = "buy now " * 40
    # random printable ASCII: ~6.5 bits/char, incompressible for zlib
    noise = "".join(chr(rng.randint(33, 126)) for _ in range(400))
    df = spark.createDataFrame(
        [(0, prose), (1, spam), (2, noise), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.cr, r.ce)
        for r in df.select(
            "doc_id",
            compression_ratio("text").alias("cr"),
            char_entropy("text").alias("ce"),
        ).collect()
    }
    # repetitive spam compresses far below prose; noise far above
    assert got[1][0] < got[0][0] < got[2][0]
    # entropy: spam < prose < high-alphabet noise
    assert got[1][1] < got[0][1] < got[2][1]
    assert got[3] == (None, None) and got[4] == (None, None)


def test_plan_is_single_arrow_stage(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    plan = (
        docs.select("doc_id", compression_ratio("text").alias("cr"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Arrow-batched, not row-at-a-time; and map-only (no exchange)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
