"""group_split (leakage-safe) and curriculum_order: group atomicity,
partitioning invariance, exact-boundary mirror, plan shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.dataset import curriculum_order, group_split


def _docs(spark, n=300, n_groups=40, seed=11):
    rng = random.Random(seed)
    rows = [
        (i, rng.randrange(n_groups), rng.uniform(0, 1)) for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, grp long, score double")


def test_group_split_is_atomic_per_group(spark):
    rows, df = _docs(spark)
    out = group_split(df, ["grp"]).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, set()).add(r.split)
    for g, splits in by_grp.items():
        assert len(splits) == 1, f"group {g} straddles {splits}"
    # weights roughly respected over groups
    grp_split = {g: next(iter(s)) for g, s in by_grp.items()}
    n_train = sum(1 for v in grp_split.values() if v == "train")
    assert n_train >= len(grp_split) * 0.5


def test_group_split_matches_row_split_on_group_key(spark):
    """Same ticket function as hash_split keyed on the group column."""
    from ballista_spark.operators.dataset import hash_split

    rows, df = _docs(spark)
    a = {r.doc_id: r.split for r in group_split(df, ["grp"]).collect()}
    b = {r.doc_id: r.split for r in hash_split(df, ["grp"]).collect()}
    assert a == b


def test_group_split_partitioning_invariant(spark):
    rows, df = _docs(spark)
    a = {r.doc_id: r.split for r in group_split(df, ["grp"]).collect()}
    b = {r.doc_id: r.split for r in group_split(df.repartition(17), ["grp"]).collect()}
    assert a == b


def test_curriculum_stages_follow_score(spark):
    rows, df = _docs(spark)
    out = curriculum_order(df, "score", ["doc_id"], n_stages=4).collect()
    # output order: stage ascending; within a stage, lottery order
    stages = [r.stage for r in out]
    assert stages == sorted(stages)
    # stage means decrease (descending curriculum: best scores first)
    by_stage = {}
    for r in out:
        by_stage.setdefault(r.stage, []).append(r.score)
    means = [sum(v) / len(v) for _, v in sorted(by_stage.items())]
    assert all(a > b for a, b in zip(means, means[1:]))
    assert set(by_stage) == {1, 2, 3, 4}
    # roughly equal stage sizes (sketch-exact on 300 distinct values)
    for v in by_stage.values():
        assert 60 <= len(v) <= 90


def test_curriculum_explicit_boundaries_exact_mirror(spark):
    rows, df = _docs(spark)
    bounds = [0.25, 0.5, 0.75]
    out = curriculum_order(
        df, "score", ["doc_id"], n_stages=4, boundaries=bounds
    ).collect()
    def want_stage(s):
        if s >= 0.75:
            return 1
        if s >= 0.5:
            return 2
        if s >= 0.25:
            return 3
        return 4
    for r in out:
        assert r.stage == want_stage(r.score), (r.doc_id, r.score)


def test_curriculum_ascending_and_null_scores(spark):
    df = spark.createDataFrame(
        [(0, 0.1), (1, 0.9), (2, None)], "doc_id long, score double"
    )
    out = {
        r.doc_id: r.stage
        for r in curriculum_order(
            df, "score", ["doc_id"], n_stages=2, ascending=True,
            boundaries=[0.5],
        ).collect()
    }
    assert out[0] == 1 and out[1] == 2  # ascending: low scores first
    assert out[2] == 2  # NULL -> last stage


def test_curriculum_deterministic_within_stage(spark):
    rows, df = _docs(spark)
    a = [r.doc_id for r in curriculum_order(df, "score", ["doc_id"],
                                            boundaries=[0.25, 0.5, 0.75]).collect()]
    b = [r.doc_id for r in curriculum_order(df.repartition(13), "score",
                                            ["doc_id"],
                                            boundaries=[0.25, 0.5, 0.75]).collect()]
    assert a == b


def test_curriculum_plan_has_no_global_single_task_sort(spark):
    """No ntile/window over an unpartitioned frame: the plan must contain
    no Window at all — boundaries are a sketch aggregate + map-side
    comparisons."""
    rows, df = _docs(spark)
    plan = (
        curriculum_order(df, "score", ["doc_id"], boundaries=[0.25, 0.5, 0.75])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_curriculum_validates(spark):
    rows, df = _docs(spark)
    with pytest.raises(ValueError, match="n_stages"):
        curriculum_order(df, "score", ["doc_id"], n_stages=0)
    with pytest.raises(ValueError, match="boundaries"):
        curriculum_order(df, "score", ["doc_id"], n_stages=3, boundaries=[0.5])


# --- fim_split ---------------------------------------------------------------


def test_fim_reassembles_exactly(spark):
    import random as _r
    rng = _r.Random(5)
    rows = [(i, "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 40))))
            for i in range(200)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from ballista_spark.operators.dataset import fim_split

    out = fim_split(df).collect()
    cuts = set()
    for r in out:
        want = dict(rows)[r.doc_id]
        if want is None:
            assert r.fim_prefix is None and r.fim_middle is None and r.fim_suffix is None
            continue
        assert (r.fim_prefix or "") + (r.fim_middle or "") + (r.fim_suffix or "") == want
        if len(want) >= 3:
            cuts.add((len(r.fim_prefix), len(r.fim_middle)))
        else:
            assert r.fim_prefix == want and r.fim_middle == "" and r.fim_suffix == ""
    assert len(cuts) > 20  # cut points actually vary across documents


def test_fim_deterministic_and_reseedable(spark):
    df = spark.createDataFrame(
        [(i, "hello world " * 5) for i in range(50)], "doc_id long, text string"
    )
    from ballista_spark.operators.dataset import fim_split

    a = {r.doc_id: (r.fim_prefix, r.fim_middle) for r in fim_split(df).collect()}
    b = {r.doc_id: (r.fim_prefix, r.fim_middle)
         for r in fim_split(df.repartition(7)).collect()}
    assert a == b
    c = {r.doc_id: (r.fim_prefix, r.fim_middle)
         for r in fim_split(df, seed="epoch2").collect()}
    assert c != a  # reseeding re-rolls the cuts


def test_fim_plan_map_only(spark):
    df = spark.createDataFrame([(0, "abcdefgh")], "doc_id long, text string")
    from ballista_spark.operators.dataset import fim_split

    plan = fim_split(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- exact_dedup_weighted ------------------------------------------------------


def test_exact_dedup_weighted(spark):
    from ballista_spark.operators.dedup import exact_dedup_weighted

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.is_canonical, r.dup_count) for r in
           exact_dedup_weighted(df).collect()}
    assert out[1] == (True, 3) and out[2] == (False, 3) and out[3] == (False, 3)
    assert out[4] == (True, 1)
    # NULL text: md5(NULL) = NULL -> its own partition; kept, weight 1
    assert out[5][1] == 1
    # single shuffle: the count rides the same window exchange
    from ballista_spark.operators.dedup import exact_dedup_weighted as edw
    plan = edw(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
