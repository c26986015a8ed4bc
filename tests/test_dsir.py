"""DSIR importance resampling: exact Python-mirror parity, a DuckDB twin
over the real documents table, behavioral enrichment toward the target
distribution, determinism, and plan discipline."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.dsir import (
    DSIRModel,
    dsir_fit,
    dsir_log_weights,
    dsir_resample,
    gumbel_column,
)
from tests.conftest import SF_SMOKE

NF = 1 << 10  # small feature space so bucket collisions are exercised
ALPHA = 1.0


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip()) if t]


def _grams(text: str, ngrams=(1, 2)) -> list[str]:
    toks = _toks(text)
    out = []
    for n in ngrams:
        out += [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return out


def _bucket(g: str, nf: int = NF) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % nf


def _mirror_fit(target: list[str], raw: list[str], nf: int = NF, alpha: float = ALPHA):
    """Python twin of dsir_fit: bucket -> log ratio, plus the floor."""
    ct, cr = {}, {}
    for texts, acc in ((target, ct), (raw, cr)):
        for t in texts:
            for g in _grams(t):
                b = _bucket(g, nf)
                acc[b] = acc.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    dt, dr = tt + alpha * nf, tr + alpha * nf
    lr = {
        b: math.log((ct.get(b, 0) + alpha) / dt) - math.log((cr.get(b, 0) + alpha) / dr)
        for b in set(ct) | set(cr)
    }
    floor = math.log(alpha / dt) - math.log(alpha / dr)
    return lr, floor


def _mirror_log_w(text: str, lr: dict, floor: float, nf: int = NF) -> float:
    return sum(lr.get(_bucket(g, nf), floor) for g in _grams(text))


TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "a quiet morning walk along the river bank",
    "she read the old letter under the oak tree",
    "fresh bread and warm coffee in the kitchen",
]
RAW = [
    (0, "the quick fox ran along the river in the morning"),  # target-like
    (1, "warm bread under the oak tree by the bank"),  # target-like
    (2, "buy cheap pills online now click here win money"),  # spam
    (3, "zxq vvv kkk qqq jjj xxx zzz www qpz kfj"),  # garbage
    (4, "the lazy dog slept in the warm kitchen all morning"),  # target-like
    (5, "click click subscribe smash that like button now now"),  # spam
    (6, ""),  # empty
]


@pytest.fixture(scope="module")
def fitted(spark):
    tgt = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    model = dsir_fit(tgt, raw, n_features=NF, alpha=ALPHA)
    return model, raw


def test_log_weights_match_python_mirror(spark, fitted):
    """Exact parity (1e-12 rel) with an independent Python implementation,
    including bucket collisions, the smoothing floor, and empty docs."""
    model, raw = fitted
    lr, floor = _mirror_fit(TARGET, [t for _, t in RAW])
    assert model.default_lr == pytest.approx(floor, rel=1e-12)
    got = {r["key"]: (r["n_grams"], r["log_w"]) for r in dsir_log_weights(raw, model).collect()}
    assert set(got) == {i for i, _ in RAW}
    for i, t in RAW:
        want = _mirror_log_w(t, lr, floor)
        assert got[i][0] == len(_grams(t))
        assert got[i][1] == pytest.approx(want, rel=1e-12, abs=1e-12)
    assert got[6] == (0, 0.0)  # empty doc kept at weight 1


def test_target_like_docs_outweigh_spam(spark, fitted):
    """Importance weights rank target-like raw docs above spam/garbage."""
    model, raw = fitted
    w = {r["key"]: r["log_w"] for r in dsir_log_weights(raw, model).collect()}
    assert min(w[0], w[1], w[4]) > max(w[2], w[3], w[5])


def test_resample_deterministic_and_weighted(spark, fitted):
    """Same seed → identical selection; the target-like docs dominate the
    top-3 (their weights differ by orders of magnitude here, so Gumbel
    noise cannot flip the outcome).  The empty doc is excluded: its
    weight-1 convention (log_w = 0) tops every negative-sum doc in a
    corpus this small — correct per the likelihood-ratio math, but not
    the ranking under test here."""
    model, raw = fitted
    raw = raw.where(F.length("text") > 0)
    a = [r["doc_id"] for r in dsir_resample(raw, model, 3, seed="s1").collect()]
    b = [r["doc_id"] for r in dsir_resample(raw, model, 3, seed="s1").collect()]
    assert a == b
    assert set(a) == {0, 1, 4}
    # a different seed redraws the Gumbels but cannot promote garbage here
    c = [r["doc_id"] for r in dsir_resample(raw, model, 3, seed="s2").collect()]
    assert set(c) == {0, 1, 4}


def test_duckdb_twin_on_documents(spark, duck, fitted):
    """Full fit+score twin in DuckDB over the real sf0.001 documents table:
    target = src1 docs, raw = all docs; per-doc log_w agrees to 1e-9."""
    from ballista_spark.sources.registry import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    model = dsir_fit(
        docs.where(F.col("source") == "src1"), docs, n_features=NF, alpha=ALPHA
    )
    got = {
        r["key"]: r["log_w"]
        for r in dsir_log_weights(docs, model).collect()
    }
    sql = f"""
WITH toks AS (
  SELECT doc_id, source,
         LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'), x -> LEN(x) > 0) AS l
  FROM smoke.documents
), grams AS (
  SELECT doc_id, source, l[i] AS gram FROM toks, UNNEST(GENERATE_SERIES(1, LEN(l))) g(i)
  UNION ALL
  SELECT doc_id, source, l[i] || ' ' || l[i+1] FROM toks, UNNEST(GENERATE_SERIES(1, LEN(l)-1)) g(i)
), bg AS (
  SELECT doc_id, source,
         CAST(CONCAT('0x', SUBSTR(MD5(gram), 1, 15)) AS BIGINT) % {NF} AS bucket
  FROM grams
), ct AS (
  SELECT bucket, COUNT(*) AS c FROM bg WHERE source = 'src1' GROUP BY bucket
), cr AS (
  SELECT bucket, COUNT(*) AS c FROM bg GROUP BY bucket
), tot AS (
  SELECT (SELECT COALESCE(SUM(c),0) FROM ct) AS tt, (SELECT COALESCE(SUM(c),0) FROM cr) AS tr
), lr AS (
  SELECT COALESCE(ct.bucket, cr.bucket) AS bucket,
         LN((COALESCE(ct.c,0) + {ALPHA}) / (tot.tt + {ALPHA}*{NF}))
       - LN((COALESCE(cr.c,0) + {ALPHA}) / (tot.tr + {ALPHA}*{NF})) AS lr
  FROM ct FULL OUTER JOIN cr USING (bucket), tot
), floor_ AS (
  SELECT LN({ALPHA} / (tt + {ALPHA}*{NF})) - LN({ALPHA} / (tr + {ALPHA}*{NF})) AS f FROM tot
), perdoc AS (
  SELECT bg.doc_id, SUM(COALESCE(lr.lr, floor_.f)) AS lw
  FROM bg LEFT JOIN lr USING (bucket), floor_
  GROUP BY bg.doc_id
)
SELECT d.doc_id, COALESCE(perdoc.lw, 0.0) AS lw
FROM smoke.documents d LEFT JOIN perdoc USING (doc_id)
"""
    want = {int(i): float(w) for i, w in duck.execute(sql).fetchall()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9), k


def test_gumbel_matches_formula(spark):
    """The Gumbel draw reproduces -ln(-ln((md5_60bit + 0.5)/2^60))."""
    df = spark.createDataFrame([(7,), (42,)], "doc_id long")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", gumbel_column(["doc_id"], "sx").alias("g")).collect()
    }
    for k in (7, 42):
        h = hashlib.md5(f"sx\x1f{k}".encode()).hexdigest()[:15]
        u = (int(h, 16) + 0.5) / float(1 << 60)
        assert got[k] == pytest.approx(-math.log(-math.log(u)), rel=1e-12)


def test_plan_no_python_no_cartesian_model_broadcast(spark, fitted):
    """Scoring stays JVM-side, no cartesian/BNLJ, and the ratio table is
    the broadcast side (the corpus must never broadcast)."""
    model, raw = fitted
    plan = (
        dsir_log_weights(raw, model)._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan
    assert "BroadcastHashJoin" in plan
