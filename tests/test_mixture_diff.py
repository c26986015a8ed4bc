"""Mixture-recipe sampling, token-budget selection, and corpus snapshot
diff vs DuckDB oracles / exact Python mirrors.

mixture_sample and budget_sample are md5-lottery + correctly-rounded-IEEE
constructions, so DuckDB reproduces the exact selected set; mixture_epochs
(per-epoch lottery over replicated domains) is mirrored exactly in plain
Python via md5_long_py."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.dataset import corpus_diff
from ballista_spark.operators.hashing import md5_long_py
from ballista_spark.operators.mixture import (
    budget_sample,
    mixture_epochs,
    mixture_rates,
    mixture_sample,
)
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE, assert_frames_match

FULL = os.environ.get("BS_TEST_FULL") == "1"
SCALES = [(SF_SMOKE, "smoke")] + ([(SF_CORRECT, "correct")] if FULL else [])

#: a deliberately non-uniform recipe over the uniform synthetic sources
#: (src3 untargeted → dropped; weights not normalized on purpose)
_WEIGHTS = {"src0": 5.0, "src1": 3.0, "src2": 1.0, "src4": 1.0}
_WSUM = sum(_WEIGHTS.values())

#: DuckDB twin of the 60-bit integer lottery (sampling.lottery_long)
def _duck_lot(seed_expr: str, key_expr: str) -> str:
    return (
        "CAST(CONCAT('0x', SUBSTR(MD5(CONCAT_WS(CHR(31), "
        f"{seed_expr}, {key_expr})), 1, 15)) AS BIGINT)"
    )


def _weights_values_sql() -> str:
    rows = ", ".join(
        f"('{k}', CAST({v / _WSUM!r} AS DOUBLE))" for k, v in sorted(_WEIGHTS.items())
    )
    return f"(VALUES {rows}) AS w(source, tw)"


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_mixture_sample_matches_oracle(spark, duck, sf_dir, schema):
    docs = load_table(spark, sf_dir, "documents")
    got = mixture_sample(docs, "source", _WEIGHTS, ["doc_id"]).select(
        "doc_id", "source"
    )
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        f"""
        WITH obs AS (
          SELECT source, COUNT(*) AS observed FROM documents GROUP BY source
        ), j AS (
          SELECT obs.source, obs.observed, w.tw
          FROM obs JOIN {_weights_values_sql()} USING (source)
        ), t AS (
          SELECT MIN(observed / tw) AS tt FROM j
        ), rates AS (
          SELECT j.source,
                 FLOOR(LEAST(j.tw * t.tt / j.observed, 1.0)
                       * 1152921504606846976.0) AS thr
          FROM j CROSS JOIN t
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN rates r USING (source)
        WHERE {_duck_lot("'mixture'", "COALESCE(CAST(d.doc_id AS VARCHAR), CHR(30))")}
              < r.thr
        """
    )
    assert_frames_match(got, oracle)


def test_mixture_rates_values(spark):
    """Exact-arithmetic check of the rate/epoch table against the published
    mixture-recipe formulas computed in plain Python."""
    docs = load_table(spark, SF_SMOKE, "documents")
    obs = {
        r.source: r.cnt
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
        if r.source in _WEIGHTS
    }
    rows = {
        r[0]: r
        for r in mixture_rates(docs, "source", _WEIGHTS).collect()
    }
    assert set(rows) == set(_WEIGHTS)
    t_total = min(obs[d] / (w / _WSUM) for d, w in _WEIGHTS.items())
    budget = sum(obs.values())
    for d, w in _WEIGHTS.items():
        wn = w / _WSUM
        assert rows[d].observed == obs[d]
        assert rows[d].target_w == wn
        assert rows[d].rate == min(wn * t_total / obs[d], 1.0)
        assert rows[d].epochs == wn * budget / obs[d]
    # the binding domain keeps everything
    assert max(rows[d].rate for d in _WEIGHTS) == 1.0


def test_mixture_sample_hits_target_proportions(spark):
    """At sf0.001 (25 docs/source) expected kept counts are w*T; check the
    realized mixture is within lottery noise of the target."""
    docs = load_table(spark, SF_SMOKE, "documents")
    kept = (
        mixture_sample(docs, "source", _WEIGHTS, ["doc_id"])
        .groupBy("source")
        .count()
        .collect()
    )
    by_src = {r.source: r["count"] for r in kept}
    assert set(by_src) <= set(_WEIGHTS)  # untargeted domains dropped
    # binding domain (largest weight) kept whole: 25 of 25
    assert by_src["src0"] == 25
    # others scale ~ w/5 of 25 docs (binomial noise at n=25 is wide; just
    # check ordering and hard bounds)
    assert by_src["src0"] >= by_src.get("src1", 0) >= by_src.get("src2", 26) - 13


def _epoch_mirror(obs, weights, budget, docs_by_domain, seed="mixture"):
    """Plain-Python exact mirror of mixture_epochs' kept (doc_id, epoch) set."""
    wsum = float(sum(weights.values()))
    b_total = sum(obs[d] for d in weights if d in obs)
    kept = set()
    for d, w in weights.items():
        if d not in obs:
            continue
        wn = w / wsum
        ep = wn * b_total / obs[d]
        if budget is not None:
            ep = ep * float(budget) / b_total
        full = math.floor(ep)
        thr = math.floor((ep - math.floor(ep)) * 2.0**60)
        for doc_id in docs_by_domain[d]:
            for e in range(full + 1):
                if e < full:
                    kept.add((doc_id, e))
                else:
                    lot = md5_long_py("\x1f".join([seed, str(e), str(doc_id)]))
                    if lot < thr:
                        kept.add((doc_id, e))
    return kept


@pytest.mark.parametrize("budget", [None, 40])
def test_mixture_epochs_matches_python_mirror(spark, budget):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r.doc_id, r.epoch)
        for r in mixture_epochs(
            docs, "source", _WEIGHTS, ["doc_id"], budget=budget
        ).select("doc_id", "epoch").collect()
    }
    obs = {
        r.source: r.cnt
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    by_dom = {
        d: [
            r.doc_id
            for r in docs.where(F.col("source") == d).select("doc_id").collect()
        ]
        for d in _WEIGHTS
    }
    assert got == _epoch_mirror(obs, _WEIGHTS, budget, by_dom)


def test_mixture_epochs_upsamples_scarce_domain(spark):
    """A domain weighted far above its share must appear in >1 full epoch."""
    docs = load_table(spark, SF_SMOKE, "documents")
    out = mixture_epochs(
        docs, "source", {"src0": 9.0, "src1": 1.0}, ["doc_id"]
    )
    epochs = {
        r.source: r.mx
        for r in out.groupBy("source").agg(F.max("epoch").alias("mx")).collect()
    }
    # w_src0=0.9, B=50, obs=25 → 1.8 epochs: epoch 0 full + fractional epoch 1
    assert epochs["src0"] == 1
    # every src0 doc present in epoch 0
    n0 = out.where((F.col("source") == "src0") & (F.col("epoch") == 0)).count()
    assert n0 == 25


_BUDGET_ORACLE = """
WITH tc AS (
  SELECT doc_id, source, n_chars,
         {lot} AS lot
  FROM documents
), run AS (
  SELECT *, SUM(n_chars) OVER ({part} ORDER BY lot, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tc
)
SELECT doc_id, source FROM run WHERE cum <= {budget}
"""


@pytest.mark.parametrize("sf_dir,schema", SCALES)
@pytest.mark.parametrize("per_domain", [False, True])
def test_budget_sample_matches_oracle(spark, duck, sf_dir, schema, per_domain):
    docs = load_table(spark, sf_dir, "documents")
    budget = 3000 if per_domain else 20000
    got = budget_sample(
        docs,
        "n_chars",
        budget,
        ["doc_id"],
        domain_col="source" if per_domain else None,
        n_buckets=8,
    ).select("doc_id", "source")
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        _BUDGET_ORACLE.format(
            lot=_duck_lot("'budget'", "COALESCE(CAST(doc_id AS VARCHAR), CHR(30))"),
            part="PARTITION BY source" if per_domain else "",
            budget=budget,
        )
    )
    assert_frames_match(got, oracle)


def test_budget_sample_never_exceeds_budget(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    budget = 12345
    kept = budget_sample(docs, "n_chars", budget, ["doc_id"], n_buckets=8)
    total = kept.agg(F.sum("n_chars").alias("s")).collect()[0].s
    assert total is not None and total <= budget
    # maximality: no dropped doc could still fit (the boundary doc crossing
    # the budget is dropped by construction, so allow exactly that gap)
    assert total > budget - docs.agg(F.max("n_chars")).collect()[0][0]


def test_budget_sample_is_partitioning_invariant(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = {
        r.doc_id
        for r in budget_sample(docs, "n_chars", 9000, ["doc_id"], n_buckets=8)
        .select("doc_id")
        .collect()
    }
    b = {
        r.doc_id
        for r in budget_sample(
            docs.repartition(17, "source"), "n_chars", 9000, ["doc_id"], n_buckets=3
        )
        .select("doc_id")
        .collect()
    }
    assert a == b and a


#: snapshot-evolution transformations expressed identically in both engines
_NEW_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text,
       lang, source, n_chars
FROM documents WHERE doc_id % 7 <> 0
UNION ALL
SELECT doc_id + 1000000, text, lang, source, n_chars
FROM documents WHERE doc_id % 11 = 0
"""

_DIFF_ORACLE = f"""
WITH new_snap AS ({_NEW_SQL})
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text IS NOT DISTINCT FROM n.text
             AND o.lang IS NOT DISTINCT FROM n.lang
             AND o.source IS NOT DISTINCT FROM n.source
             AND o.n_chars IS NOT DISTINCT FROM n.n_chars THEN 'unchanged'
            ELSE 'changed' END AS diff_status
FROM documents o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
"""


def _new_snapshot(docs):
    changed = docs.where(F.expr("doc_id % 7 <> 0")).withColumn(
        "text",
        F.when(F.expr("doc_id % 5 = 0"), F.concat("text", F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    added = docs.where(F.expr("doc_id % 11 = 0")).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    return changed.unionByName(added)


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_corpus_diff_matches_oracle(spark, duck, sf_dir, schema):
    docs = load_table(spark, sf_dir, "documents")
    got = corpus_diff(docs, _new_snapshot(docs), ["doc_id"], include_unchanged=True)
    duck.execute(f"SET schema '{schema}'")
    assert_frames_match(got, duck.sql(_DIFF_ORACLE))


def test_corpus_diff_default_hides_unchanged(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = corpus_diff(docs, _new_snapshot(docs), ["doc_id"])
    statuses = {r.diff_status for r in out.select("diff_status").distinct().collect()}
    assert statuses == {"added", "removed", "changed"}


def test_corpus_diff_identical_snapshots_empty(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    assert corpus_diff(docs, docs, ["doc_id"]).count() == 0
