"""Exact heavy hitters (Misra-Gries sweep + exact verify) vs DuckDB
GROUP BY / HAVING and a plain-Python Counter mirror on randomized data."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.sketch import heavy_hitters
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE, assert_frames_match


def _exact(values, phi):
    n = len(values)
    return {v: c for v, c in Counter(values).items() if c > phi * n}


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("phi", [0.05, 0.12, 0.3])
def test_matches_counter_mirror_randomized(spark, seed, phi):
    """Zipf-ish random stream, many partitions: output must equal the
    exact Counter threshold set."""
    rng = random.Random(seed)
    # heavy head + long tail of rare values
    vals = []
    for _ in range(3000):
        if rng.random() < 0.6:
            vals.append(f"head{rng.randint(0, 4)}")
        else:
            vals.append(f"tail{rng.randint(0, 2000)}")
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(16)
    got = {r.tok: r["count"] for r in heavy_hitters(df, "tok", phi).collect()}
    assert got == _exact(vals, phi)


def test_matches_duckdb_twin_on_documents(spark, duck):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = heavy_hitters(docs, "source", 0.15)
    duck.execute("SET schema 'smoke'")
    oracle = duck.sql(
        """
        SELECT source, COUNT(*) AS count FROM documents
        WHERE source IS NOT NULL GROUP BY source
        HAVING COUNT(*) > 0.15 * (SELECT COUNT(source) FROM documents)
        """
    )
    assert_frames_match(got, oracle)


def test_exact_counts_despite_tiny_summary(spark):
    """k at the guarantee minimum still yields EXACT counts (the verify
    pass recounts candidates from scratch)."""
    vals = ["a"] * 500 + ["b"] * 300 + [f"r{i}" for i in range(200)]
    random.Random(9).shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(8)
    got = {r.tok: r["count"] for r in heavy_hitters(df, "tok", 0.25).collect()}
    assert got == {"a": 500, "b": 300}


def test_nulls_excluded_and_edge_cases(spark):
    df = spark.createDataFrame(
        [("x",)] * 10 + [(None,)] * 90, "tok string"
    ).repartition(4)
    # NULL is 90% of rows but excluded; x is 100% of non-null rows
    got = {r.tok: r["count"] for r in heavy_hitters(df, "tok", 0.5).collect()}
    assert got == {"x": 10}
    # all-unique stream -> empty
    uniq = spark.createDataFrame([(f"u{i}",) for i in range(100)], "tok string")
    assert heavy_hitters(uniq, "tok", 0.05).count() == 0


def test_integer_column(spark):
    df = spark.createDataFrame(
        [(7,)] * 60 + [(i,) for i in range(40)], "v long"
    ).repartition(8)
    got = {r.v: r["count"] for r in heavy_hitters(df, "v", 0.3).collect()}
    assert got == {7: 61}  # 60 planted + the i=7 tail row


def test_bad_params_raise(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 1.5)
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 0.1, k=3)  # below ceil(1/phi)


def test_partitioning_invariant(spark):
    vals = [f"v{i % 7}" for i in range(700)] + [f"t{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    a = sorted(map(tuple, heavy_hitters(df, "tok", 0.08).collect()))
    b = sorted(
        map(tuple, heavy_hitters(df.repartition(23), "tok", 0.08).collect())
    )
    assert a == b and a


def test_candidate_volume_is_bounded(spark):
    """The sweep emits <= k rows per partition — the scale claim."""
    from ballista_spark.operators.sketch import _mg_summary_func

    import pandas as pd

    rng = random.Random(3)
    batches = [
        pd.DataFrame({"tok": [f"w{rng.randint(0, 999)}" for _ in range(500)]})
        for _ in range(10)
    ]
    out = list(_mg_summary_func("tok", 20)(iter(batches)))
    assert len(out) == 1 and len(out[0]) <= 20
