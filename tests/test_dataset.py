"""Deterministic split + merge-upsert operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_spark.operators.dataset import hash_split, merge_upsert
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def test_hash_split_partitions_completely_and_deterministically(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    s1 = hash_split(docs, ["doc_id"])
    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = docs.count()
    assert sum(counts.values()) == total
    # rough proportions (hash lottery on 50 docs is noisy; just sanity-band)
    assert counts.get("train", 0) > counts.get("val", 0)
    # deterministic: same assignment on recompute and under repartitioning
    s2 = hash_split(docs.repartition(7), ["doc_id"])
    a = {(r["doc_id"], r["split"]) for r in s1.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in s2.select("doc_id", "split").collect()}
    assert a == b
    # different seed reshuffles
    s3 = hash_split(docs, ["doc_id"], seed="other")
    c = {(r["doc_id"], r["split"]) for r in s3.select("doc_id", "split").collect()}
    assert a != c


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], ["id", "v", "ver"]
    )
    updates = spark.createDataFrame([(2, "B", 2), (4, "d", 2)], ["id", "v", "ver"])
    out = {r["id"]: (r["v"], r["ver"]) for r in merge_upsert(target, updates, "id").collect()}
    assert out == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1), 4: ("d", 2)}


def test_shuffle_deterministic_order_properties(spark, duck):
    """The epoch shuffle is (a) identical across partition layouts,
    (b) re-rolled by seed, (c) exactly the md5-lottery order a SQL engine
    recomputes, and (d) shard-sliced so concatenated shards reproduce the
    global order."""
    from ballista_spark.operators.dataset import shuffle_deterministic

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    base = [r["doc_id"] for r in shuffle_deterministic(docs, ["doc_id"]).collect()]
    relaid = [
        r["doc_id"]
        for r in shuffle_deterministic(docs.repartition(7), ["doc_id"]).collect()
    ]
    assert base == relaid  # partition-layout invariance
    other = [
        r["doc_id"]
        for r in shuffle_deterministic(docs, ["doc_id"], seed="epoch2").collect()
    ]
    assert other != base and sorted(other) == sorted(base)  # re-roll, same set

    oracle = [
        r[0]
        for r in duck.execute(
            f"""
            SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet')
            ORDER BY CAST(CONCAT('0x', SUBSTR(MD5(CONCAT_WS(CHR(31), 'shuffle',
                     CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), doc_id
            """
        ).fetchall()
    ]
    assert base == oracle  # cross-engine exact order

    sharded = shuffle_deterministic(docs, ["doc_id"], n_shards=4)
    assert sharded.rdd.getNumPartitions() == 4
    by_shard = sharded.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, [r["doc_id"] for r in it])]
    ).collect()
    concat = [d for _, ds in sorted(by_shard) for d in ds]
    assert concat == base  # shard i = i-th contiguous slice of the order


# --- T5 span corruption ------------------------------------------------


def _reconstruct(inputs, targets):
    """Invert span corruption: splice each sentinel's span back in."""
    spans = {}
    cur = None
    for t in targets:
        if t.startswith("<extra_id_"):
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    out = []
    for tok in inputs:
        if tok.startswith("<extra_id_"):
            out.extend(spans.get(tok, []))
        else:
            out.append(tok)
    return out


def test_span_corrupt_reconstructs_exactly(spark):
    from ballista_spark.operators.dataset import span_corrupt

    rows = [(i, [f"w{i}_{j}" for j in range(5 + (i * 7) % 40)]) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = span_corrupt(df).collect()
    assert len(got) == 29
    for r in got:
        orig = dict(rows)[r["doc_id"]]
        assert _reconstruct(r["corrupt_inputs"], r["corrupt_targets"]) == orig
        # targets end with the closing sentinel
        assert r["corrupt_targets"][-1].startswith("<extra_id_")
        # sentinels appear in order in the inputs
        sents = [t for t in r["corrupt_inputs"] if t.startswith("<extra_id_")]
        assert sents == [f"<extra_id_{k}>" for k in range(len(sents))]


def test_span_corrupt_rate_and_determinism(spark):
    from ballista_spark.operators.dataset import span_corrupt

    rows = [(i, [f"t{j}" for j in range(200)]) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = {r["doc_id"]: r for r in span_corrupt(df, corruption_rate=0.15).collect()}
    masked = [
        sum(1 for t in r["corrupt_targets"] if not t.startswith("<extra_id_"))
        for r in got.values()
    ]
    assert all(m == 30 for m in masked)  # round(0.15*200) exactly
    # partition-layout invariance + reseed changes the draw
    again = {
        r["doc_id"]: r for r in span_corrupt(df.repartition(7)).collect()
    }
    assert all(
        again[k]["corrupt_inputs"] == got[k]["corrupt_inputs"] for k in got
    )
    other = {r["doc_id"]: r for r in span_corrupt(df, seed="epoch2").collect()}
    assert any(
        other[k]["corrupt_inputs"] != got[k]["corrupt_inputs"] for k in got
    )


def test_span_corrupt_edges(spark):
    from ballista_spark.operators.dataset import span_corrupt

    df = spark.createDataFrame(
        [(1, ["a"]), (2, None), (3, ["a", "b"])],
        "doc_id long, tokens array<string>",
    )
    got = {r["doc_id"]: r for r in span_corrupt(df).collect()}
    assert got[1]["corrupt_inputs"] == ["a"] and got[1]["corrupt_targets"] == []
    assert got[2]["corrupt_inputs"] is None and got[2]["corrupt_targets"] is None
    assert _reconstruct(got[3]["corrupt_inputs"], got[3]["corrupt_targets"]) == ["a", "b"]
