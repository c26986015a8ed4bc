"""Document chunking (operators/text.py:chunk_documents): Python-mirror
parity, coverage/overlap invariants, DuckDB twin, and the no-shuffle
plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.text import chunk_documents
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def _mirror(rows, c, o):
    step = c - o
    out = []
    for k, t in rows:
        toks = [x for x in t.strip().split() if x]
        if not toks:
            continue
        starts = list(range(1, max(len(toks) - o, 1) + 1, step))
        for cid, s in enumerate(starts):
            ts = toks[s - 1 : s - 1 + c]
            out.append((k, cid, s, len(ts), " ".join(ts)))
    return sorted(out)


@pytest.mark.parametrize("c,o", [(8, 2), (5, 0), (16, 8)])
def test_chunks_match_python_mirror(spark, c, o):
    rows = [
        (1, " ".join(f"t{i}" for i in range(30))),
        (2, "exactly five tokens right here"),
        (3, "short"),
        (4, "   "),  # empty after trim -> no chunks
        (5, " ".join(f"u{i}" for i in range(c))),  # exactly one chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in chunk_documents(df, chunk_tokens=c, overlap=o).collect()
    )
    assert got == _mirror(rows, c, o)


def test_chunk_coverage_and_overlap_invariants(spark):
    """Every token of every doc is covered; consecutive chunks overlap by
    exactly `overlap` except a shorter final chunk."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    ch = chunk_documents(docs, chunk_tokens=16, overlap=4).collect()
    per_doc: dict = {}
    for r in ch:
        per_doc.setdefault(r["key"], []).append(r)
    toks = {
        r["doc_id"]: len(r["text"].strip().split())
        for r in docs.collect()
    }
    for k, chunks in per_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        covered = set()
        for r in chunks:
            covered.update(range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"]))
        assert covered == set(range(1, toks[k] + 1)), k
        for a, b in zip(chunks, chunks[1:]):
            assert b["chunk_start"] - a["chunk_start"] == 12  # step = 16-4


def test_chunks_match_duckdb(spark, duck):
    got = sorted(
        map(
            tuple,
            chunk_documents(
                load_table(spark, SF_SMOKE, "documents"), chunk_tokens=12, overlap=3
            ).collect(),
        )
    )
    oracle = duck.execute(
        f"""
WITH t AS (
  SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
                             x -> LEN(x) > 0) AS l
  FROM read_parquet('{SF_SMOKE}/documents.parquet')
), s AS (
  SELECT doc_id, l, i AS chunk_start,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS chunk_id
  FROM t, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(l) - 3, 1), 9)) g(i)
  WHERE LEN(l) > 0
)
SELECT doc_id, chunk_id, chunk_start,
       LEN(l[chunk_start:chunk_start+11]) AS n_chunk_tokens,
       ARRAY_TO_STRING(l[chunk_start:chunk_start+11], ' ') AS chunk_text
FROM s ORDER BY doc_id, chunk_id
"""
    ).fetchall()
    assert got == sorted(map(tuple, oracle))


def test_chunking_plan_is_map_only(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan


def test_overlap_must_be_smaller(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)
