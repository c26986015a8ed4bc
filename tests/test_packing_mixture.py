"""Sequence packing, temperature mixture sampling, and incremental dedup
vs DuckDB oracles / Python references.

pack_contiguous and temperature_sample are integer/correctly-rounded-IEEE
constructions, so DuckDB reproduces the exact layout / selected set;
pack_greedy (bin packing, applyInPandas) is compared against a plain-Python
mirror of the same FFD algorithm."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.dataset import pack_contiguous, pack_greedy
from ballista_spark.operators.dedup import dedup_against
from ballista_spark.operators.hashing import md5_long_py
from ballista_spark.operators.sampling import temperature_sample
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE, assert_frames_match

FULL = os.environ.get("BS_TEST_FULL") == "1"
SCALES = [(SF_SMOKE, "smoke")] + ([(SF_CORRECT, "correct")] if FULL else [])

_L = 512  # seq_len used throughout
_NB = 8  # n_buckets — small so every bucket is non-trivially populated

#: DuckDB twin of text token counts (split on single space after trim)
_TC = "LEN(STRING_SPLIT(TRIM(text), ' '))"


def _docs_with_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn("n_tok", F.size(F.split(F.trim("text"), " ")))


_PACK_ORACLE = f"""
WITH tc AS (
  SELECT doc_id, source, {_TC} AS n_tok,
         CAST(CONCAT('0x', SUBSTR(MD5(CONCAT_WS(CHR(31), 'pack',
              CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % {_NB} AS b
  FROM documents
), loc AS (
  SELECT *, SUM(n_tok) OVER (PARTITION BY b ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lend
  FROM tc
), btot AS (
  SELECT b, SUM(n_tok) AS t FROM tc GROUP BY b
), boff AS (
  SELECT b, COALESCE(SUM(t) OVER (ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM btot
)
SELECT loc.doc_id, loc.source,
       CAST(boff.off + loc.lend - loc.n_tok AS BIGINT) AS pack_start,
       CAST((boff.off + loc.lend - loc.n_tok) // {_L} AS BIGINT) AS pack_first,
       CAST((boff.off + loc.lend - loc.n_tok
             + GREATEST(loc.n_tok, 1) - 1) // {_L} AS BIGINT) AS pack_last,
       CAST((boff.off + loc.lend - loc.n_tok) % {_L} AS BIGINT) AS pack_offset
FROM loc JOIN boff USING (b)
"""


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_pack_contiguous_matches_oracle(spark, duck, sf_dir, schema):
    docs = _docs_with_counts(spark, sf_dir)
    got = pack_contiguous(docs, "n_tok", "doc_id", _L, n_buckets=_NB).select(
        "doc_id", "source", "pack_start", "pack_first", "pack_last", "pack_offset"
    )
    duck.execute(f"SET schema '{schema}'")
    assert_frames_match(got, duck.sql(_PACK_ORACLE))


def test_pack_contiguous_layout_invariants(spark):
    docs = _docs_with_counts(spark, SF_SMOKE)
    out = pack_contiguous(docs, "n_tok", "doc_id", _L, n_buckets=_NB)
    rows = out.select("n_tok", "pack_start", "pack_first", "pack_last", "pack_offset").collect()
    total = sum(r.n_tok for r in rows)
    # spans tile [0, total) exactly: starts are distinct, offsets in range
    starts = sorted(r.pack_start for r in rows)
    assert starts[0] == 0
    ends = sorted(r.pack_start + r.n_tok for r in rows)
    assert ends[-1] == total
    assert set(starts[1:]) == set(ends[:-1])  # contiguous, no gap/overlap
    for r in rows:
        assert 0 <= r.pack_offset < _L
        assert r.pack_first == r.pack_start // _L
        assert r.pack_last >= r.pack_first


def test_pack_contiguous_is_partitioning_invariant(spark):
    docs = _docs_with_counts(spark, SF_SMOKE)
    a = {
        (r.doc_id, r.pack_start)
        for r in pack_contiguous(docs, "n_tok", "doc_id", _L, n_buckets=_NB)
        .select("doc_id", "pack_start")
        .collect()
    }
    b = {
        (r.doc_id, r.pack_start)
        for r in pack_contiguous(docs.repartition(13), "n_tok", "doc_id", _L, n_buckets=_NB)
        .select("doc_id", "pack_start")
        .collect()
    }
    assert a == b


def _ffd_reference(rows, cap, n_buckets):
    """Plain-Python mirror of pack_greedy's per-bucket FFD."""
    by_bucket: dict[int, list] = {}
    for doc_id, n in rows:
        b = md5_long_py(f"pack\x1f{doc_id}") % n_buckets
        by_bucket.setdefault(b, []).append((doc_id, n))
    out = {}
    for b, docs in by_bucket.items():
        docs.sort(key=lambda d: (-d[1], d[0]))
        remaining: list[int] = []
        for doc_id, n in docs:
            placed = False
            if n <= cap:
                for i, r in enumerate(remaining):
                    if n <= r:
                        out[doc_id] = (b * (1 << 33) + i, cap - r)
                        remaining[i] = r - n
                        placed = True
                        break
            if not placed:
                remaining.append(max(cap - n, 0))
                out[doc_id] = (b * (1 << 33) + len(remaining) - 1, 0)
    return out


def test_pack_greedy_matches_python_reference(spark):
    docs = _docs_with_counts(spark, SF_SMOKE)
    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in pack_greedy(docs, "n_tok", "doc_id", _L, n_buckets=_NB)
        .select("doc_id", "pack_id", "pack_offset")
        .collect()
    }
    want = _ffd_reference(
        [(r.doc_id, r.n_tok) for r in docs.select("doc_id", "n_tok").collect()],
        _L,
        _NB,
    )
    assert got == want


def test_pack_greedy_capacity_and_determinism(spark):
    docs = _docs_with_counts(spark, SF_SMOKE)
    out = pack_greedy(docs, "n_tok", "doc_id", _L, n_buckets=_NB)
    fills = out.groupBy("pack_id").agg(
        F.sum("n_tok").alias("fill"), F.count("*").alias("m")
    )
    # a pack only exceeds capacity when it holds a single oversized doc
    bad = fills.where((F.col("fill") > _L) & (F.col("m") > 1)).count()
    assert bad == 0
    a = {
        (r.doc_id, r.pack_id)
        for r in out.select("doc_id", "pack_id").collect()
    }
    b = {
        (r.doc_id, r.pack_id)
        for r in pack_greedy(docs.repartition(13), "n_tok", "doc_id", _L, n_buckets=_NB)
        .select("doc_id", "pack_id")
        .collect()
    }
    assert a == b


@pytest.mark.parametrize("sf_dir,schema", SCALES)
@pytest.mark.parametrize("alpha,duck_rate", [
    (0.5, "SQRT(CAST(nmin AS DOUBLE) / n)"),
    (0.0, "CAST(nmin AS DOUBLE) / n"),
])
def test_temperature_sample_matches_oracle(spark, duck, sf_dir, schema, alpha, duck_rate):
    docs = load_table(spark, sf_dir, "documents")
    got = temperature_sample(docs, "source", alpha, ["doc_id"]).select(
        "doc_id", "source"
    )
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        f"""
        WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        m AS (SELECT MIN(n) AS nmin FROM counts),
        thr AS (SELECT source,
                       CAST(FLOOR({duck_rate} * 1152921504606846976) AS BIGINT) AS t
                FROM counts, m)
        SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)
        WHERE CAST(CONCAT('0x', SUBSTR(MD5(CONCAT_WS(CHR(31), 'mixture',
                  CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) < thr.t
        """
    )
    assert_frames_match(got, oracle)


def test_temperature_sample_alpha_one_keeps_everything(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    assert temperature_sample(docs, "source", 1.0, ["doc_id"]).count() == docs.count()


def test_temperature_sample_alpha_zero_equalizes(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    counts = {
        r.source: r.n
        for r in temperature_sample(docs, "source", 0.0, ["doc_id"])
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    base = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    nmin = min(base.values())
    # smallest domain kept whole; every domain lands near nmin (Bernoulli noise)
    for src, n in counts.items():
        assert n <= base[src]
        assert abs(n - nmin) <= max(6 * nmin**0.5, 8), (src, n, nmin)
    assert counts[min(base, key=base.get)] == nmin


def test_temperature_sample_validates_alpha(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        temperature_sample(docs, "source", 1.5, ["doc_id"])


@pytest.mark.parametrize("sf_dir,schema", SCALES)
def test_dedup_against_matches_oracle(spark, duck, sf_dir, schema):
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.where(F.col("source") != "src0")
    seen = docs.where(F.col("source") == "src0")
    got = dedup_against(batch, seen).select("doc_id", "source")
    duck.execute(f"SET schema '{schema}'")
    oracle = duck.sql(
        """
        SELECT doc_id, source FROM documents
        WHERE source <> 'src0'
          AND MD5(text) NOT IN (SELECT MD5(text) FROM documents WHERE source = 'src0')
        """
    )
    assert_frames_match(got, oracle)


def test_dedup_against_no_explicit_corpus_broadcast(spark):
    """The seen-side is corpus-sized: the plan must not hand-broadcast it
    (AQE may still pick broadcast at runtime for small actual sizes —
    asserted on the *logical* plan, which records only explicit hints)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = dedup_against(docs, docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in plan, plan


# ---------------- packed_sequences (materialized windows) ----------------

def _token_docs(spark):
    """Docs with token arrays: varied lengths incl. empty, NULL, and one
    longer than the window (must spill across several seq boundaries)."""
    rows = []
    for i in range(40):
        if i == 7:
            rows.append((i, None))
        elif i % 9 == 0:
            rows.append((i, []))
        elif i == 13:
            rows.append((i, list(range(13000, 13000 + 3 * _L + 17))))
        else:
            rows.append((i, list(range(i * 100, i * 100 + (i * 37) % 190))))
    return spark.createDataFrame(rows, "doc_id long, token_ids array<long>")


def _mirror_stream(rows):
    """Python mirror of the pack_contiguous global order: (md5 bucket asc,
    key asc), concatenated token stream."""
    order = sorted(
        rows,
        key=lambda r: (md5_long_py(f"pack\x1f{r[0]}") % _NB, r[0]),
    )
    stream = []
    for _, toks in order:
        stream.extend(toks or [])
    return stream


def test_packed_sequences_match_python_mirror(spark):
    from ballista_spark.operators.dataset import packed_sequences

    docs = _token_docs(spark)
    got = {
        r["seq_id"]: list(r["tokens"])
        for r in packed_sequences(docs, seq_len=_L, n_buckets=_NB).collect()
    }
    stream = _mirror_stream([(r["doc_id"], r["token_ids"]) for r in docs.collect()])
    n_full = len(stream) // _L
    want = {i: stream[i * _L:(i + 1) * _L] for i in range(n_full)}
    assert got == want
    assert all(len(t) == _L for t in got.values())
    assert n_full >= 4  # the corpus genuinely spans several windows


def test_packed_sequences_pad_path_and_total_preservation(spark):
    from ballista_spark.operators.dataset import packed_sequences

    docs = _token_docs(spark)
    out = packed_sequences(docs, seq_len=_L, n_buckets=_NB, pad_id=-100)
    rows = sorted(out.collect(), key=lambda r: r["seq_id"])
    stream = _mirror_stream([(r["doc_id"], r["token_ids"]) for r in docs.collect()])
    # every window exactly L, ids contiguous, padded tail reconstructs stream
    assert [r["seq_id"] for r in rows] == list(range(len(rows)))
    assert all(len(r["tokens"]) == _L for r in rows)
    flat = [t for r in rows for t in r["tokens"]]
    n_pad = -len(stream) % _L
    assert flat == stream + [-100] * n_pad


def test_packed_sequences_partitioning_invariant(spark):
    from ballista_spark.operators.dataset import packed_sequences

    docs = _token_docs(spark)
    a = sorted(
        map(tuple, packed_sequences(docs, seq_len=_L, n_buckets=_NB).collect())
    )
    b = sorted(
        map(
            tuple,
            packed_sequences(
                docs.repartition(13), seq_len=_L, n_buckets=_NB
            ).collect(),
        )
    )
    assert a == b


def test_write_packed_shards_layout(spark, tmp_path):
    from ballista_spark.operators.dataset import write_packed_shards

    docs = _token_docs(spark)
    path = str(tmp_path / "shards")
    back = write_packed_shards(
        docs, path, seq_len=_L, seqs_per_shard=2, n_buckets=_NB
    )
    rows = back.collect()
    assert all(len(r["tokens"]) == _L for r in rows)
    # shard directories hold consecutive windows, seqs_per_shard each
    assert all(r["seq_id"] // 2 == r["shard"] for r in rows)
    import glob as _g

    assert len(_g.glob(os.path.join(path, "shard=*"))) >= 2


def test_packed_sequences_plan_shape(spark):
    """Bounded exchanges: the bucket prefix-sum window, the tiny offsets
    aggregate, and ONE seq_id assembly shuffle — no sort of the global
    token stream through a single partition, no cartesian."""
    from ballista_spark.operators.dataset import packed_sequences

    plan = (
        packed_sequences(_token_docs(spark), seq_len=_L, n_buckets=_NB)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 5


# ---------------------------------------------------------------------------
# group-contiguous / semantic packing (round 7)


def test_pack_contiguous_group_col_makes_groups_contiguous(spark):
    """With group_col, the token stream is ordered (group, bucket, key):
    every group's [min pack_start, max pack_start+count) range is
    disjoint from every other group's, and group order is numeric."""
    from ballista_spark.operators.dataset import pack_contiguous

    rows = [(i, 10 + (i % 3), i % 4) for i in range(40)]  # (key, count, grp)
    df = spark.createDataFrame(rows, "k long, n long, grp int")
    out = pack_contiguous(df, "n", "k", seq_len=16, group_col="grp").collect()
    spans = {}
    for r in out:
        g = r["grp"]
        lo, hi = spans.get(g, (1 << 62, -1))
        spans[g] = (min(lo, r["pack_start"]), max(hi, r["pack_start"] + r["n"]))
    ordered = sorted(spans.items())
    for (g1, (_l1, h1)), (g2, (l2, _h2)) in zip(ordered, ordered[1:]):
        assert h1 <= l2, f"groups {g1}/{g2} interleave"
    # the stream is still gap-free: total span == total tokens
    total = sum(r["n"] for r in out)
    assert max(h for _l, h in spans.values()) == total
    assert min(l for l, _h in spans.values()) == 0


def test_pack_contiguous_group_col_python_mirror(spark):
    """Exact layout vs a pandas mirror over the same (group, bucket,
    key) order — buckets read back from pack_bucket itself so the
    mirror shares only the ordering DEFINITION, not the prefix-sum
    machinery."""
    from ballista_spark.operators.dataset import pack_bucket, pack_contiguous

    rows = [(i, 1 + (i * 7) % 5, (i * 3) % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, n long, grp int")
    buckets = {
        r["k"]: r["b"]
        for r in df.select("k", pack_bucket("k", 8).alias("b")).collect()
    }
    order = sorted(rows, key=lambda r: (r[2], buckets[r[0]], r[0]))
    want, off = {}, 0
    for k, n, _g in order:
        want[k] = off
        off += n
    got = pack_contiguous(df, "n", "k", seq_len=16, n_buckets=8, group_col="grp")
    assert {r["k"]: r["pack_start"] for r in got.collect()} == want


def test_semantic_pack_clusters_window_locality(spark):
    """Two well-separated embedding clusters: semantic_pack puts each
    cluster's documents in disjoint window ranges, while plain
    pack_contiguous interleaves them."""
    from ballista_spark.operators.dataset import pack_contiguous, semantic_pack

    rows = []
    for i in range(40):
        vec = [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]
        rows.append((i, 8, vec))
    df = spark.createDataFrame(rows, "k long, n long, embedding array<double>")
    out = semantic_pack(
        df, centroids=[[1.0, 0.0], [0.0, 1.0]], count_col="n",
        key_col="k", seq_len=16,
    )
    by_cluster = {}
    for r in out.collect():
        by_cluster.setdefault(r["cluster"], []).append(r["pack_first"])
    assert set(by_cluster) == {0, 1}
    assert max(by_cluster[0]) < min(by_cluster[1])  # disjoint window ranges
    # plain packing interleaves the two families
    plain = pack_contiguous(df, "n", "k", seq_len=16).collect()
    evens = {r["pack_first"] for r in plain if r["k"] % 2 == 0}
    odds = {r["pack_first"] for r in plain if r["k"] % 2 == 1}
    assert evens & odds  # shared windows without grouping


def test_packed_sequences_group_col_passthrough(spark):
    """Grouped window CONTENTS: every materialized window holds tokens
    from one group only (counts divide seq_len exactly here)."""
    from ballista_spark.operators.dataset import packed_sequences

    rows = []
    for i in range(24):
        g = i % 2
        rows.append((i, [g * 1000 + i] * 8, g))
    df = spark.createDataFrame(rows, "k long, token_ids array<long>, grp int")
    seqs = packed_sequences(
        df, tokens_col="token_ids", key_col="k", seq_len=16, group_col="grp"
    ).collect()
    assert len(seqs) == 24 * 8 // 16
    for r in seqs:
        fams = {t // 1000 for t in r["tokens"]}
        assert len(fams) == 1, f"window {r['seq_id']} mixes groups"


def test_pack_contiguous_null_group_rows_kept_and_order_first(spark):
    """NULL-group rows must be packed (ordered first), never silently
    dropped with their counts still shifting later buckets — the
    round-7 review regression."""
    from ballista_spark.operators.dataset import pack_contiguous

    rows = [(i, 5, None if i % 4 == 0 else i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, n long, grp int")
    out = pack_contiguous(df, "n", "k", seq_len=16, group_col="grp").collect()
    assert len(out) == 20  # nothing dropped
    total = sum(r["n"] for r in out)
    assert max(r["pack_start"] + r["n"] for r in out) == total  # gap-free
    null_max = max(r["pack_start"] for r in out if r["grp"] is None)
    nonnull_min = min(r["pack_start"] for r in out if r["grp"] is not None)
    assert null_max < nonnull_min  # NULL group orders first
