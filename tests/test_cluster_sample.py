"""cluster_assign / cluster_sizes / cluster_balanced_sample: brute-force
assignment mirror, cap enforcement, partitioning invariance, plan gates."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from ballista_spark.operators.similarity import (
    cluster_assign,
    cluster_balanced_sample,
    cluster_sizes,
    kmeans_fit,
)

#: three well-separated axis clusters in 4-d, heavily imbalanced
CENTERS = [
    [10.0, 0.0, 0.0, 0.0],
    [0.0, 10.0, 0.0, 0.0],
    [0.0, 0.0, 10.0, 0.0],
]
SIZES = [40, 12, 3]


def _vec_rows():
    rng = random.Random(7)
    rows, vid = [], 0
    for c, n in zip(CENTERS, SIZES):
        for _ in range(n):
            rows.append(
                (vid, [x + rng.uniform(-0.5, 0.5) for x in c])
            )
            vid += 1
    return rows


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na and nb else None


def _brute_assign(rows, cents):
    out = {}
    for vid, v in rows:
        best = max(
            range(len(cents)),
            key=lambda i: (_cosine(v, cents[i]) or -2.0, -i),
        )
        out[vid] = best
    return out


def test_assignment_matches_brute_force(spark):
    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.cluster
        for r in cluster_assign(df, CENTERS).collect()
    }
    assert got == _brute_assign(rows, CENTERS)


def test_cluster_sizes(spark):
    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.cluster: r.n for r in cluster_sizes(df, CENTERS).collect()}
    assert got == {0: SIZES[0], 1: SIZES[1], 2: SIZES[2]}


def test_balanced_sample_caps_and_keeps_small_clusters(spark):
    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_balanced_sample(df, CENTERS, cap=5).collect()
    per = {}
    for r in out:
        per[r.cluster] = per.get(r.cluster, 0) + 1
    # mega-cluster capped, tiny cluster intact
    assert per == {0: 5, 1: 5, 2: 3}
    # schema: input columns + cluster
    assert set(out[0].asDict().keys()) == {"vec_id", "embedding", "cluster"}


def test_balanced_sample_partitioning_invariant(spark):
    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {
        r.vec_id
        for r in cluster_balanced_sample(df, CENTERS, cap=4).collect()
    }
    b = {
        r.vec_id
        for r in cluster_balanced_sample(
            df.repartition(13), CENTERS, cap=4
        ).collect()
    }
    assert a == b


def test_composes_with_kmeans_fit(spark):
    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, max_iters=5, spherical=True)
    sizes = {r.cluster: r.n for r in cluster_sizes(df, cents).collect()}
    # learned cells must reproduce the generative cluster sizes
    assert sorted(sizes.values()) == sorted(SIZES)


def test_assignment_plan_has_no_shuffle(spark):
    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = (
        cluster_assign(df, CENTERS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus is never hash-shuffled; the only exchanges are the k-row
    # centroid pack (SinglePartition aggregate + its broadcast)
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_balanced_sample_single_cluster_shuffle(spark):
    rows = _vec_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = (
        cluster_balanced_sample(df, CENTERS, cap=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one hash-partitioning exchange: the group_cap cluster key
    assert plan.count("Exchange hashpartitioning") == 1
