"""weighted_sample_k (Efraimidis-Spirakis) vs a Python mirror of the
exact race formula, inclusion-frequency proportionality, grouped form,
determinism, and the TakeOrderedAndProject plan."""

from __future__ import annotations

import math

import pytest

from ballista_spark.operators.hashing import md5_long_py
from ballista_spark.operators.sampling import _LOTTERY_SPACE, _SEP, weighted_sample_k

ROWS = [(i, float(1 + (i % 5) * 3)) for i in range(60)]  # weights 1,4,7,10,13


def py_race(seed, key, w):
    h = md5_long_py(f"{seed}{_SEP}{key}")
    u = (h + 1) / _LOTTERY_SPACE
    return -math.log(u) / w


def py_topk(rows, k, seed="wsample"):
    ranked = sorted(rows, key=lambda r: (py_race(seed, r[0], r[1]), r[0]))
    return {r[0] for r in ranked[:k]}


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, w double")


def test_matches_python_mirror(spark):
    df = _df(spark)
    for k in (1, 7, 25):
        got = {r.doc_id for r in weighted_sample_k(df, "w", k, ["doc_id"]).collect()}
        assert got == py_topk(ROWS, k), k


def test_partitioning_invariant_and_reseedable(spark):
    df = _df(spark)
    a = {r.doc_id for r in weighted_sample_k(df, "w", 10, ["doc_id"]).collect()}
    b = {r.doc_id
         for r in weighted_sample_k(df.repartition(13), "w", 10, ["doc_id"]).collect()}
    assert a == b
    c = {r.doc_id
         for r in weighted_sample_k(df, "w", 10, ["doc_id"], seed="s2").collect()}
    assert c != a


def test_inclusion_frequency_proportional_to_weight(spark):
    """Across many seeds, a weight-13 row is sampled far more often than
    a weight-1 row (loose statistical bound; the mirror test above is
    the exact check)."""
    counts = {i: 0 for i, _ in ROWS}
    for s in range(40):
        for d in py_topk(ROWS, 12, seed=f"s{s}"):
            counts[d] += 1
    heavy = sum(counts[i] for i, w in ROWS if w == 13.0)
    light = sum(counts[i] for i, w in ROWS if w == 1.0)
    assert heavy > 3 * light


def test_invalid_weights_excluded(spark):
    df = spark.createDataFrame(
        [(0, 5.0), (1, 0.0), (2, -1.0), (3, None)], "doc_id long, w double"
    )
    got = {r.doc_id for r in weighted_sample_k(df, "w", 10, ["doc_id"]).collect()}
    assert got == {0}
    with pytest.raises(ValueError, match="k must"):
        weighted_sample_k(df, "w", -1, ["doc_id"])


def test_grouped_form(spark):
    rows = [(i, i % 3, 1.0 + i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, grp int, w double")
    out = weighted_sample_k(df, "w", 4, ["doc_id"], group_cols=["grp"]).collect()
    per = {}
    for r in out:
        per[r.grp] = per.get(r.grp, 0) + 1
    assert per == {0: 4, 1: 4, 2: 4}
    assert "__race" not in out[0].asDict() and "__rk" not in out[0].asDict()


def test_plan_is_take_ordered(spark):
    df = _df(spark)
    plan = (
        weighted_sample_k(df, "w", 5, ["doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no global sort


def test_composes_with_dedup_weights(spark):
    from ballista_spark.operators.dedup import exact_dedup_weighted

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")], "doc_id long, text string"
    )
    canon = exact_dedup_weighted(df).where("is_canonical")
    [r] = weighted_sample_k(canon, "dup_count", 1, ["doc_id"]).collect()
    assert r.doc_id in (1, 4)
