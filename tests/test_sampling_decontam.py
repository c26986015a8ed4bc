"""Deterministic sampling + benchmark decontamination vs DuckDB oracles.

The md5 lottery is standardized, so DuckDB recomputes the *identical*
selection — these are exact set compares, not statistical ones."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.decontam import contamination_stats, decontaminate
from ballista_spark.operators.sampling import (
    group_cap,
    hash_sample,
    lottery_column,
    rate_threshold,
    stratified_sample,
)
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE, assert_frames_match

FULL = os.environ.get("BS_TEST_FULL") == "1"
SCALES = [(SF_SMOKE, "smoke")] + ([(SF_CORRECT, "correct")] if FULL else [])

#: DuckDB twin of sampling.lottery_column (seed, key cast to varchar,
#: unit-separator joined, first 15 md5 hex digits)
def _duck_lottery(seed: str, key_expr: str) -> str:
    return f"SUBSTR(MD5(CONCAT_WS(CHR(31), '{seed}', {key_expr})), 1, 15)"


@pytest.mark.parametrize("sf_dir,schema", SCALES)
@pytest.mark.parametrize("rate", [0.0, 0.3, 1.0])
def test_hash_sample_matches_oracle(spark, duck, sf_dir, schema, rate):
    docs = load_table(spark, sf_dir, "documents")
    got = hash_sample(docs, ["doc_id"], rate).select("doc_id", "source")
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        f"""SELECT doc_id, source FROM documents
            WHERE {_duck_lottery('sample', 'CAST(doc_id AS VARCHAR)')}
                  < '{rate_threshold(rate)}'"""
    )
    assert_frames_match(got, oracle)


def test_hash_sample_rate_is_calibrated(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    kept = hash_sample(docs, ["doc_id"], 0.5).count()
    assert abs(kept / n - 0.5) < 0.1, (kept, n)


def test_hash_sample_is_partitioning_invariant(spark):
    """Same selection regardless of physical layout — the property
    DataFrame.sample does NOT have."""
    docs = load_table(spark, SF_SMOKE, "documents")
    a = {r.doc_id for r in hash_sample(docs, ["doc_id"], 0.3).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(7), ["doc_id"], 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_hash_sample_plan_is_filter_only(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = hash_sample(docs, ["doc_id"], 0.3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_stratified_sample_matches_oracle(spark, duck, sf_dir, schema):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    got = stratified_sample(
        docs, "source", rates, ["doc_id"], default_rate=0.1
    ).select("doc_id", "source")
    case = " ".join(
        f"WHEN source = '{s}' THEN '{rate_threshold(r)}'" for s, r in sorted(rates.items())
    )
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        f"""SELECT doc_id, source FROM documents
            WHERE {_duck_lottery('sample', 'CAST(doc_id AS VARCHAR)')}
                  < (CASE {case} ELSE '{rate_threshold(0.1)}' END)"""
    )
    assert_frames_match(got, oracle)


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_group_cap_matches_oracle(spark, duck, sf_dir, schema):
    docs = load_table(spark, sf_dir, "documents")
    got = group_cap(docs, ["source"], 5, ["doc_id"]).select("doc_id", "source")
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        f"""SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {_duck_lottery('cap', 'CAST(doc_id AS VARCHAR)')}, doc_id
                     ) AS rk
              FROM documents) WHERE rk <= 5"""
    )
    assert_frames_match(got, oracle)


def test_hash_sample_null_keys_match_oracle(spark, duck):
    """NULL key parts are encoded (CHR(30)), not skipped: composite keys
    (NULL,'x') and ('x',NULL) must draw different lottery values, and the
    documented DuckDB mirror must reproduce the exact selection."""
    rows = [
        (1, None, "x"), (2, "x", None), (3, None, None),
        (4, "x", "x"), (5, "y", "z"), (6, None, "y"), (7, "y", None),
    ]
    df = spark.createDataFrame(rows, "id long, k1 string, k2 string")
    got = {r.id for r in hash_sample(df, ["k1", "k2"], 0.5).select("id").collect()}
    duck.execute("CREATE OR REPLACE TEMP TABLE nk(id BIGINT, k1 VARCHAR, k2 VARCHAR)")
    duck.executemany("INSERT INTO nk VALUES (?, ?, ?)", rows)
    key = "COALESCE(k1, CHR(30)), COALESCE(k2, CHR(30))"
    want = {
        r[0]
        for r in duck.execute(
            f"""SELECT id FROM nk
                WHERE {_duck_lottery('sample', key)} < '{rate_threshold(0.5)}'"""
        ).fetchall()
    }
    assert got == want
    lottery = {
        (r.k1, r.k2): r.lv
        for r in df.select(
            "k1", "k2", lottery_column(["k1", "k2"]).alias("lv")
        ).collect()
    }
    assert lottery[(None, "x")] != lottery[("x", None)]


def test_group_cap_caps_every_group(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    counts = group_cap(docs, ["source"], 3, ["doc_id"]).groupBy("source").count()
    assert counts.where(F.col("count") > 3).count() == 0


#: benchmark stand-in: one source's documents play the eval set
_BENCH_SRC = "src0"

#: DuckDB twin of contamination_stats (shingle CTE mirrors
#: queries/pipeline._SHINGLE_CTE / operators.dedup.shingle_sets)
_CONTAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS l FROM documents
), sh AS (
  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS s
  FROM toks, UNNEST(GENERATE_SERIES(1, LEN(l) - 2)) AS g(i)
  WHERE LEN(l) >= 3
), bench AS (
  SELECT DISTINCT sh.s FROM sh
  JOIN documents d ON sh.doc_id = d.doc_id AND d.source = '{_BENCH_SRC}'
)
SELECT sh.doc_id AS key, COUNT(*) AS n_ngrams,
       COUNT(bench.s) AS n_hits,
       COUNT(bench.s) * 1.0 / COUNT(*) AS contamination
FROM sh LEFT JOIN bench ON sh.s = bench.s
GROUP BY sh.doc_id
"""


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_contamination_stats_match_oracle(spark, duck, sf_dir, schema):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == _BENCH_SRC)
    got = contamination_stats(docs, bench)
    duck.execute(f"SET schema '{schema}'")
    assert_frames_match(got, duck.sql(_CONTAM_ORACLE))


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_decontaminate_matches_oracle(spark, duck, sf_dir, schema):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == _BENCH_SRC)
    got = decontaminate(docs, bench, max_contamination=0.2).select("doc_id")
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        f"""SELECT doc_id FROM documents
            WHERE doc_id NOT IN (
              SELECT key FROM ({_CONTAM_ORACLE}) WHERE contamination > 0.2)"""
    )
    assert_frames_match(got, oracle)


def test_decontaminate_drops_exact_benchmark_members(spark):
    """A document verbatim in the benchmark is 100% contaminated and must
    be removed; unrelated long documents survive."""
    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.where(F.col("source") == _BENCH_SRC)
    clean = decontaminate(docs, bench, max_contamination=0.99)
    # every benchmark member with >= 3 tokens is gone
    leaked = clean.join(bench.select("doc_id"), "doc_id", "inner").where(
        F.size(F.split(F.trim("text"), " ")) >= 3
    )
    assert leaked.count() == 0


def test_decontam_plan_shape(spark):
    """Broadcast on the benchmark side by default; shuffle join when
    disabled (the unbounded-benchmark escape hatch)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.where(F.col("source") == _BENCH_SRC)
    bcast = (
        contamination_stats(docs, bench)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in bcast or "BroadcastExchange" in bcast, bcast
    shuf = (
        contamination_stats(docs, bench, broadcast_benchmark=False)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "ResolvedHint" not in shuf


def test_fuzzy_decontam_catches_paraphrase_exact_misses(spark):
    """A lightly-perturbed copy of a benchmark doc keeps jaccard >= 0.8
    while its exact trigram overlap drops well below a 0.5 threshold on
    perturbation-adjacent grams — the case the fuzzy pass exists for."""
    from ballista_spark.operators.decontam import (
        decontaminate_fuzzy,
        fuzzy_contaminated_keys,
    )

    base = " ".join(f"w{i}" for i in range(60))
    toks = base.split(" ")
    # perturb every 10th token: 6 of 60 tokens -> jaccard ~ (54-2)/(66+2)
    # over shingles stays > 0.8 while each perturbation kills 3 trigrams
    per = list(toks)
    for i in range(0, 60, 10):
        per[i] = f"x{i}"
    paraphrase = " ".join(per)
    docs = spark.createDataFrame(
        [(1, paraphrase), (2, " ".join(f"z{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")

    flagged = fuzzy_contaminated_keys(docs, bench, threshold=0.5)
    rows = {r["key"]: r for r in flagged.collect()}
    assert set(rows) == {"1"}
    assert rows["1"]["seen_key"] == "100"
    assert rows["1"]["jaccard"] >= 0.5

    clean = decontaminate_fuzzy(docs, bench, threshold=0.5)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2]


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_fuzzy_contaminated_keys_match_bruteforce_oracle(spark, duck, sf_dir, schema):
    """The LSH-pruned fuzzy pass equals brute-force cross-dataset jaccard
    at the 0.8 threshold (16x4 banding recall plus exact-member collapse,
    same argument as dedup_minhash_lsh's oracle; equality pinned here).  Benchmark = src0 docs, so
    exact members (jaccard 1.0) and near members are both present."""
    from ballista_spark.operators.decontam import fuzzy_contaminated_keys

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source") != _BENCH_SRC
    )
    bench = load_table(spark, sf_dir, "documents").where(
        F.col("source") == _BENCH_SRC
    )
    got = fuzzy_contaminated_keys(docs, bench, threshold=0.8)
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        f"""
WITH toks AS (
  SELECT doc_id, source, STRING_SPLIT(TRIM(text), ' ') AS l FROM documents
), sh AS (
  SELECT DISTINCT doc_id, source, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS s
  FROM toks, UNNEST(GENERATE_SERIES(1, LEN(l) - 2)) AS g(i)
  WHERE LEN(l) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS ka, b.doc_id AS kb, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.source != '{_BENCH_SRC}' AND b.source = '{_BENCH_SRC}'
  GROUP BY 1, 2
), jac AS (
  SELECT ka, kb, inter * 1.0 / (sa.n + sb.n - inter) AS j
  FROM pairs JOIN sizes sa ON ka = sa.doc_id JOIN sizes sb ON kb = sb.doc_id
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
)
SELECT CAST(ka AS VARCHAR) AS key,
       MAX(struct_pack(j := j, kb := CAST(kb AS VARCHAR))).kb AS seen_key,
       MAX(struct_pack(j := j, kb := CAST(kb AS VARCHAR))).j AS jaccard
FROM jac
GROUP BY ka ORDER BY key
"""
    )
    assert_frames_match(got, oracle)


def test_contamination_matrix_attributes_per_suite(spark, duck):
    """One corpus pass yields per-(doc, suite) attribution equal to
    running contamination_stats per suite, and matches a DuckDB replay."""
    from ballista_spark.operators.decontam import (
        contamination_matrix,
        contamination_stats,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    b0 = docs.where(F.col("source") == "src0").withColumn("suite", F.lit("s0"))
    b1 = docs.where(F.col("source") == "src1").withColumn("suite", F.lit("s1"))
    benches = b0.unionByName(b1)

    got = sorted(
        map(tuple, contamination_matrix(docs, benches).collect())
    )

    # per-suite equivalence with N separate single-suite passes
    expect = []
    for suite, bdf in (("s0", b0), ("s1", b1)):
        for r in contamination_stats(docs, bdf).where(F.col("n_hits") > 0).collect():
            expect.append(
                (r["key"], suite, r["n_ngrams"], r["n_hits"], r["contamination"])
            )
    assert got == sorted(expect)

    oracle = duck.execute(
        f"""
WITH d AS (SELECT * FROM read_parquet('{SF_SMOKE}/documents.parquet')),
toks AS (SELECT doc_id, source, STRING_SPLIT(TRIM(text), ' ') AS l FROM d),
sh AS (
  SELECT DISTINCT doc_id, source, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS s
  FROM toks, UNNEST(GENERATE_SERIES(1, LEN(l) - 2)) g(i) WHERE LEN(l) >= 3
),
bench AS (
  SELECT DISTINCT CASE source WHEN 'src0' THEN 's0' ELSE 's1' END AS suite, s
  FROM sh WHERE source IN ('src0', 'src1')
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
SELECT sh.doc_id, bench.suite, sizes.n, COUNT(*) AS h,
       COUNT(*) * 1.0 / sizes.n AS c
FROM sh JOIN bench USING (s) JOIN sizes USING (doc_id)
GROUP BY 1, 2, 3 ORDER BY 1, 2
"""
    ).fetchall()
    assert got == sorted(map(tuple, oracle))
