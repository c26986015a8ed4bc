"""Training-data-pipeline corpus: dedup / similarity / text / multimodal
entries over the ``documents`` and ``embeddings`` tables.

Each entry runs a real operator from :mod:`ballista_spark.operators` and
carries a DuckDB oracle that recomputes the ground truth (exact jaccard via
shingle self-join, cosine via ``list_cosine_similarity`` in double,
integer-exact text formulas).  The hash-dependent operators (SimHash, LSH
bucketing, IVF cells) hash with the md5-derived 60-bit value from
:mod:`ballista_spark.operators.hashing`, which DuckDB recomputes
bit-for-bit — so even the approximate operators are value-oracled: the
oracle replays the same buckets/cells, not just the same row count.
Pure-Python references remain in ``tests/test_pipeline.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_spark.operators import dedup as D
from ballista_spark.operators import multimodal as M
from ballista_spark.operators import similarity as S
from ballista_spark.operators import text as X
from ballista_spark.queries.base import Query
from ballista_spark.sources.registry import _session_cache, load_table

PIPELINE_QUERIES: dict[str, Query] = {}


def _b(name: str, doc: str, builder, oracle: str | None) -> None:
    PIPELINE_QUERIES[name] = Query(doc=doc, builder=builder, oracle=oracle)


def _range_spread(df: DataFrame, key_col: str) -> DataFrame:
    """Probe-gated RANGE spread (r10, guide §2.4): parallelize a
    single-row-group gate scan before a CPU-heavy map stage, keyed so the
    entry's terminal ``orderBy(key_col)`` reuses the spread's partitioning
    (the sort runs partition-local — no second exchange).  A no-op on
    already-partitioned inputs, i.e. at production scale."""
    from ballista_spark.operators.partitioning import spread_to_cluster

    return spread_to_cluster(df, key_col, by_range=True)


# DuckDB shingle CTE shared by the jaccard oracles (3-gram, space tokens —
# must mirror operators.dedup.shingle_sets exactly).
_SHINGLE_CTE = """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS l FROM documents
), sh AS (
  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS s
  FROM toks, UNNEST(GENERATE_SERIES(1, LEN(l) - 2)) AS g(i)
  WHERE LEN(l) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""


def _jaccard_oracle(threshold: float) -> str:
    return f"""{_SHINGLE_CTE}
SELECT key_a, key_b, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
FROM pairs
JOIN sizes sa ON key_a = sa.doc_id
JOIN sizes sb ON key_b = sb.doc_id
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {threshold}
ORDER BY key_a, key_b
"""


# --- dedup ------------------------------------------------------------------

#: graded exact-substring window width (operators/substr.py; production
#: default is 50 — 8 keeps the oracle's window scan proportionate to the
#: ~60-token synthetic docs while exercising every stage).
_SUBSTR_W = 8


def _dedup_exact_builder(spark: SparkSession, sf: str) -> DataFrame:
    """Both exact-dedup modes in one tagged (op, k, metric, v) result:

    - ``exact``: doc-level hash dedup (operators.dedup.exact_dedup) —
      per-source doc/canonical counts.
    - ``substr``: exact substring dedup (operators.substr — the Lee et
      al. ExactSubstr mode: every w-token window occurring twice
      corpus-wide is removable except its first occurrence, removable
      windows merged to maximal spans).  Span geometry is pinned exactly
      (count / Σstart / Σend / Σwindows per source) and the
      strip_duplicated_spans rebuild is pinned via per-source docs-hit
      and tokens-removed totals.
    """
    from ballista_spark.operators.substr import (
        duplicated_window_spans,
        strip_duplicated_spans,
    )

    # NULL text guard: the oracle's JOIN USING (ch) would silently drop
    # null-hash rows while Spark's window groups them — exclude them
    # explicitly on BOTH sides so a testdata regeneration introducing
    # nulls cannot diverge the engines (no-op on current data)
    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    src = docs.select(F.col("doc_id").alias("key"), "source")

    ex = (
        D.exact_dedup(docs)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("is_canonical").cast("long")).alias("n_canonical"),
        )
    )

    def tag(g: DataFrame, op: str, metrics: dict[str, str]) -> DataFrame:
        out = None
        for metric, colname in metrics.items():
            part = g.select(
                F.lit(op).alias("op"),
                F.col("source").alias("k"),
                F.lit(metric).alias("metric"),
                F.col(colname).cast("long").alias("v"),
            )
            out = part if out is None else out.unionAll(part)
        return out

    spans = duplicated_window_spans(docs, w=_SUBSTR_W)
    sp_g = spans.join(src, "key").groupBy("source").agg(
        F.count("*").alias("n_spans"),
        F.sum("span_start").alias("sum_start"),
        F.sum("span_end").alias("sum_end"),
        F.sum("n_windows").alias("sum_windows"),
    )
    st_g = (
        strip_duplicated_spans(docs, w=_SUBSTR_W, spans=spans)
        .groupBy("source")
        .agg(
            F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias("docs_hit"),
            F.sum("n_tokens_removed").alias("tokens_removed"),
        )
    )
    return (
        tag(ex, "exact", {"n_docs": "n_docs", "n_canonical": "n_canonical"})
        .unionAll(
            tag(
                sp_g,
                "substr",
                {
                    "n_spans": "n_spans",
                    "sum_start": "sum_start",
                    "sum_end": "sum_end",
                    "sum_windows": "sum_windows",
                },
            )
        )
        .unionAll(
            tag(st_g, "substr", {"docs_hit": "docs_hit", "tokens_removed": "tokens_removed"})
        )
        .orderBy("op", "k", "metric")
    )


def _dedup_exact_oracle() -> str:
    w = _SUBSTR_W
    return f"""
WITH docs_nn AS (SELECT * FROM documents WHERE text IS NOT NULL),
h AS (SELECT doc_id, source, MD5(text) AS ch FROM docs_nn),
m AS (SELECT ch, MIN(doc_id) AS keep FROM h GROUP BY ch),
ex AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(CASE WHEN doc_id = keep THEN 1 ELSE 0 END) AS n_canonical
  FROM h JOIN m USING (ch) GROUP BY source
),
toks AS (
  SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS l FROM docs_nn
),
occ AS (
  SELECT doc_id, i AS pos, MD5(ARRAY_TO_STRING(l[i:i+{w - 1}], ' ')) AS gh
  FROM toks, UNNEST(GENERATE_SERIES(1, LEN(l) - {w - 1})) AS g(i)
  WHERE LEN(l) >= {w}
),
marked AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY gh) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM occ
),
lagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {w}
              THEN 1 ELSE 0 END AS brk
  FROM marked WHERE cnt >= 2 AND rn >= 2
),
isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM lagged
),
spans AS (
  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {w - 1} AS e,
         COUNT(*) AS nw
  FROM isl GROUP BY 1, 2
),
sp_g AS (
  SELECT source, COUNT(*) AS n_spans, SUM(s) AS sum_start, SUM(e) AS sum_end,
         SUM(nw) AS sum_windows
  FROM spans JOIN docs_nn USING (doc_id) GROUP BY source
),
per_doc AS (SELECT doc_id, SUM(e - s + 1) AS tr FROM spans GROUP BY doc_id),
st_g AS (
  SELECT d.source,
         SUM(CASE WHEN p.tr > 0 THEN 1 ELSE 0 END) AS docs_hit,
         COALESCE(SUM(p.tr), 0) AS tokens_removed
  FROM docs_nn d LEFT JOIN per_doc p USING (doc_id) GROUP BY d.source
)
SELECT op, k, metric, CAST(v AS BIGINT) AS v FROM (
  SELECT 'exact' AS op, source AS k, 'n_docs' AS metric, n_docs AS v FROM ex
  UNION ALL
  SELECT 'exact', source, 'n_canonical', n_canonical FROM ex
  UNION ALL SELECT 'substr', source, 'n_spans', n_spans FROM sp_g
  UNION ALL SELECT 'substr', source, 'sum_start', sum_start FROM sp_g
  UNION ALL SELECT 'substr', source, 'sum_end', sum_end FROM sp_g
  UNION ALL SELECT 'substr', source, 'sum_windows', sum_windows FROM sp_g
  UNION ALL SELECT 'substr', source, 'docs_hit', docs_hit FROM st_g
  UNION ALL SELECT 'substr', source, 'tokens_removed', tokens_removed FROM st_g
)
ORDER BY op, k, metric
"""


_b(
    "dedup_exact",
    "Exact dedup, both modes (doc-level hash dedup via "
    "operators.dedup.exact_dedup; Lee-et-al-style exact substring dedup "
    "via operators.substr duplicated_window_spans + "
    "strip_duplicated_spans): per-source counts, span geometry and "
    "token-removal totals, value-pinned against a DuckDB replay.",
    _dedup_exact_builder,
    oracle=_dedup_exact_oracle(),
)

_b(
    "dedup_minhash_lsh",
    "MinHash(64) + LSH banding(16x4) + exact-jaccard verify "
    "(operators.dedup.minhash_lsh_pairs); oracle is the brute-force "
    "shingle-join jaccard at the same threshold — banding recall plus "
    "pre-LSH exact-duplicate collapse make them equal on the gate data "
    "(pinned by the hash-match gate itself).",
    lambda spark, sf: D.minhash_lsh_pairs(
        load_table(spark, sf, "documents"), threshold=0.8
    ).orderBy("key_a", "key_b"),
    oracle=_jaccard_oracle(0.8),
)

_b(
    "dedup_ngram_jaccard",
    "Exact all-pairs 3-gram Jaccard >= 0.2 "
    "(operators.dedup.ngram_jaccard_pairs).",
    lambda spark, sf: D.ngram_jaccard_pairs(
        load_table(spark, sf, "documents"), threshold=0.2
    ).orderBy("key_a", "key_b"),
    oracle=_jaccard_oracle(0.2),
)

def _simhash_oracle() -> str:
    """DuckDB twin of operators.dedup.simhash_pairs: identical md5-derived
    token hashes → identical 60-bit signatures; the oracle then brute-forces
    all pairs (fine at oracle scale — the pigeonhole banding is the Spark
    side's scale device, not a semantic difference)."""
    from ballista_spark.operators.dedup import SIMHASH_BITS
    from ballista_spark.operators.hashing import md5_long_duckdb

    votes = ",\n         ".join(
        f"SUM(CASE WHEN (th >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    sig = "\n       + ".join(
        f"(CASE WHEN b{j} > 0 THEN (CAST(1 AS BIGINT) << {j}) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS tok FROM documents
), th AS (
  SELECT doc_id, {md5_long_duckdb('tok')} AS th FROM toks
), votes AS (
  SELECT doc_id,
         {votes}
  FROM th GROUP BY doc_id
), sig AS (
  SELECT doc_id, {sig} AS sh
  FROM votes
)
SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       CAST(BIT_COUNT(XOR(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE BIT_COUNT(XOR(a.sh, b.sh)) <= 3
ORDER BY key_a, key_b
"""


_b(
    "dedup_simhash",
    "SimHash(60-bit) near-dup pairs, Hamming <= 3 "
    "(operators.dedup.simhash_pairs).  Token hashes are the md5-derived "
    "60-bit value (operators/hashing.py), so the oracle recomputes the "
    "identical signatures and brute-forces the hamming scan.",
    lambda spark, sf: D.simhash_pairs(load_table(spark, sf, "documents")).orderBy(
        "key_a", "key_b"
    ),
    oracle=_simhash_oracle(),
)

def _dedup_embedding_builder(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    exact = S.embedding_neardup_pairs(emb, threshold=0.40).select(
        F.lit("exact").alias("method"), "id_a", "id_b"
    )
    lsh = S.lsh_neardup_pairs(
        emb, threshold=0.40, n_planes=2, n_tables=40
    ).select(F.lit("lsh").alias("method"), "id_a", "id_b")
    return exact.unionAll(lsh).orderBy("method", "id_a", "id_b")


_b(
    "dedup_embedding",
    "Embedding near-dup pairs (cosine >= 0.40) by BOTH strategies in one "
    "tagged result: method='exact' is the brute-force pair scan "
    "(operators.similarity.embedding_neardup_pairs), method='lsh' is the "
    "scale path — sign-LSH bucket equi-join + exact-cosine verify "
    "(operators.similarity.lsh_neardup_pairs), never an all-pairs "
    "inequality join.  Both must equal the same brute-force ground truth "
    "(the 0.40 threshold sits in a 5e-4 cosine gap so float noise cannot "
    "flip membership).  The driver's synthetic embeddings have no margin "
    "(no pair above cosine ~0.5), so the LSH leg pins wide-OR parameters "
    "(2 planes x 40 tables: per-pair miss ~1.5e-9 at cosine 0.40) where "
    "candidates are near-exhaustive by information-theoretic necessity; "
    "the production regime (threshold 0.8+, the function defaults 8x16) "
    "prunes to ~0.4%/table background selectivity — "
    "tests/test_operators_scale.py asserts that cardinality drop on "
    "clustered data.",
    _dedup_embedding_builder,
    oracle="""
WITH gt AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.40
)
SELECT m.method, gt.id_a, gt.id_b
FROM gt CROSS JOIN (VALUES ('exact'), ('lsh')) AS m(method)
ORDER BY m.method, gt.id_a, gt.id_b
""",
)

# --- similarity search ------------------------------------------------------

_b(
    "ann_cosine_topk",
    "Exact brute-force cosine top-5 for 10 query vectors "
    "(operators.similarity.cosine_topk); scores excluded from the output so "
    "sub-ulp cross-engine float noise cannot affect the compare (adjacent "
    "rank gaps in this data are >= 1.9e-5).",
    lambda spark, sf: (
        S.cosine_topk(
            load_table(spark, sf, "embeddings"),
            load_table(spark, sf, "embeddings").where(F.col("vec_id") < 10),
            k=5,
        )
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    ),
    oracle="""
WITH c AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                CAST(n.embedding AS DOUBLE[])) AS s
  FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
  WHERE q.vec_id < 10
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id) AS BIGINT) AS rank
  FROM c
) t WHERE rank <= 5 ORDER BY query_id, rank
""",
)

def _ann_lsh_oracle(dim: int = 64, n_planes: int = 4, n_tables: int = 8) -> str:
    """DuckDB twin of operators.similarity.lsh_ann_topk: the md5-derived
    hyperplanes are constants, inlined identically on both sides, so the
    oracle rebuilds the *same buckets* and ranks the same candidates —
    an exact value oracle for an approximate operator.  Sign decisions are
    sub-ulp-stable: |dot| would have to land within ~1e-16 of zero for the
    engines' summation-order difference to flip a bucket bit."""
    from ballista_spark.operators.similarity import _hyperplane_values

    rows = ",\n    ".join(
        f"({t}, {p}, {_hyperplane_values(dim, p, t)!r}::DOUBLE[])"
        for t in range(n_tables)
        for p in range(n_planes)
    )
    return f"""
WITH planes(t, p, h) AS (VALUES
    {rows}
), vec AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), bkt AS (
  SELECT vec_id, t,
         SUM(CASE WHEN LIST_DOT_PRODUCT(v, h) >= 0
                  THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
         + (CAST(t AS BIGINT) << 32) AS bucket
  FROM vec CROSS JOIN planes GROUP BY vec_id, t
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bkt q JOIN bkt c ON q.bucket = c.bucket
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
), scored AS (
  SELECT query_id, neighbor_id, LIST_COSINE_SIMILARITY(qv.v, cv.v) AS s
  FROM cand JOIN vec qv ON qv.vec_id = cand.query_id
            JOIN vec cv ON cv.vec_id = cand.neighbor_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
) t WHERE rank <= 5 ORDER BY query_id, rank
"""


def _embedding_dim(spark: SparkSession, sf: str, emb: DataFrame) -> int:
    """Embedding dimensionality of the ``embeddings`` table, cached per
    (session, sf_dir): the ``first()`` probe is a Spark job (~40 ms) that
    the guard-rail dim checks below would otherwise pay on every query
    *build* in the bench/driver loop (r10)."""
    cache = _session_cache(spark)
    key = (sf, "__embedding_dim__")
    if cache is not None and key in cache:
        return cache[key]
    dim = len(emb.select("embedding").first()["embedding"])
    if cache is not None:
        cache[key] = dim
    return dim


def _ann_lsh_builder(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    # The static oracle inlines dim=64 hyperplanes; a testdata regeneration
    # with a different embedding dim must fail LOUDLY here, not truncate
    # the dot products silently (zip_with null-pads the shorter array).
    dim = _embedding_dim(spark, sf, emb)
    if dim != 64:
        raise ValueError(
            f"embeddings dim changed to {dim}; regenerate the dim-64 "
            "hyperplane oracle in _ann_lsh_oracle"
        )
    return (
        S.lsh_ann_topk(emb, emb.where(F.col("vec_id") < 10), k=5, dim=dim)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    )


_b(
    "ann_lsh_bucketed",
    "Sign-LSH bucketed approximate top-5 (operators.similarity.lsh_ann_topk; "
    "4 planes x 8 tables).  The md5-derived hyperplanes are engine-"
    "reproducible constants, so the oracle replays the identical buckets "
    "and candidate ranking — a full value oracle despite the operator "
    "being approximate; recall vs brute force additionally asserted in "
    "tests.",
    _ann_lsh_builder,
    oracle=_ann_lsh_oracle(),
)

#: DuckDB twin of the labeled-centroid ivf_ann_topk path.  Fully
#: deterministic SQL: centroids are the decimal-exact round-9 per-label
#: means (same formula as the operator — plain AVG would be summation-order
#: dependent), cell assignment/probing rank cells by cosine with id
#: tie-break, then top-5 within probed cells.  No hashing involved.
_IVF_ORACLE = """
WITH cm AS (
  SELECT label AS cid, i,
         ROUND(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,12)))
                    AS DOUBLE) / COUNT(*), 9) AS m
  FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
  GROUP BY label, i
), cent AS (
  SELECT cid, LIST(m ORDER BY i) AS cv FROM cm GROUP BY cid
), vec AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), ranked AS (
  SELECT v.vec_id, c.cid,
         ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY LIST_COSINE_SIMILARITY(v.v, c.cv) DESC, c.cid) AS rk
  FROM vec v CROSS JOIN cent c
), assign AS (
  SELECT vec_id, cid AS cell FROM ranked WHERE rk = 1
), probes AS (
  SELECT vec_id AS query_id, cid AS cell FROM ranked
  WHERE rk <= 3 AND vec_id < 10
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a USING (cell)
  WHERE a.vec_id <> p.query_id
), scored AS (
  SELECT query_id, neighbor_id, LIST_COSINE_SIMILARITY(qv.v, nv.v) AS s
  FROM cand JOIN vec qv ON qv.vec_id = cand.query_id
            JOIN vec nv ON nv.vec_id = cand.neighbor_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
) t WHERE rank <= 5 ORDER BY query_id, rank
"""

_b(
    "ivf_ann_topk",
    "IVF-style approximate top-5 (operators.similarity.ivf_ann_topk): "
    "per-label centroid coarse quantizer (decimal-exact round-9 means — "
    "engine-reproducible), corpus assigned to nearest cell, queries probe "
    "n_probe=3 cells — the cell equi-join replaces the corpus cross join "
    "(the only cross join touches the constant centroid table).  The "
    "oracle replays the identical cells end-to-end; recall vs brute force "
    "additionally asserted in tests.",
    lambda spark, sf: (
        S.ivf_ann_topk(
            load_table(spark, sf, "embeddings"),
            load_table(spark, sf, "embeddings").where(F.col("vec_id") < 10),
            k=5,
            n_probe=3,
        )
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    ),
    oracle=_IVF_ORACLE,
)

#: PQ graded-entry shape: 4 subspaces of 16 dims over the dim-64 embeddings.
_PQ_M, _PQ_DIM = 4, 64
_PQ_DSUB = _PQ_DIM // _PQ_M


def _pq_label_codebooks(emb: DataFrame) -> list[list[list[float]]]:
    """Deterministic PQ codebooks from per-label subvector means — the IVF
    labeled-centroid trick applied per subspace (code j in subspace s is
    label j's round-9 decimal-exact mean of dims [s*dsub, (s+1)*dsub)).
    Stands in for :func:`ballista_spark.operators.similarity.pq_fit`'s
    k-means codebooks so the oracle can rebuild them bit-for-bit; only
    labels × dim doubles ever reach the driver."""
    means = (
        emb.select(
            F.col("label"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"),
        )
        .groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(18,12)")).cast("double") / F.count("v"),
                9,
            ).alias("m")
        )
        .collect()
    )
    mm = {(r["label"], r["dim"]): r["m"] for r in means}
    labels = sorted({r["label"] for r in means})
    return [
        [
            [mm[(lab, d)] for d in range(s * _PQ_DSUB, (s + 1) * _PQ_DSUB)]
            for lab in labels
        ]
        for s in range(_PQ_M)
    ]


def _pq_builder(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    dim = _embedding_dim(spark, sf, emb)
    if dim != _PQ_DIM:
        raise ValueError(
            f"embeddings dim changed to {dim}; regenerate the m={_PQ_M} "
            "subspace layout in the pq_adc_topk oracle"
        )
    books = _pq_label_codebooks(emb)
    codes = S.pq_encode(emb, books)
    return (
        S.pq_adc_topk(codes, emb.where(F.col("vec_id") < 10), books, k=5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    )


#: DuckDB twin of pq_encode + pq_adc_topk over the label-mean codebooks:
#: identical round-9 sub-centroids, nearest-code encoding (L2, ties to the
#: lower code), per-query sub-dot-product LUT, ADC cosine ranking with id
#: tie-break.  Scores are excluded from the output; the smallest adjacent
#: ADC-cosine gap inside any query's top-6 window is 2.6e-9 on this data —
#: ~7 orders above cross-engine summation noise, so ranks cannot flip.
_PQ_ORACLE = f"""
WITH cm AS (
  SELECT label AS code, i,
         ROUND(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,12)))
                    AS DOUBLE) / COUNT(*), 9) AS m
  FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
  GROUP BY label, i
), cb AS (
  SELECT CAST((i - 1) // {_PQ_DSUB} AS INT) AS sub, code, LIST(m ORDER BY i) AS cv
  FROM cm GROUP BY 1, 2
), vec AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         SQRT(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), subv AS (
  SELECT vec_id, s.sub,
         LIST_SLICE(v, s.sub * {_PQ_DSUB} + 1, (s.sub + 1) * {_PQ_DSUB}) AS sv
  FROM vec, (SELECT DISTINCT sub FROM cb) s(sub)
), enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT sv.vec_id, sv.sub, cb.code,
           ROW_NUMBER() OVER (
               PARTITION BY sv.vec_id, sv.sub
               ORDER BY LIST_DISTANCE(sv.sv, cb.cv), cb.code) AS rk
    FROM subv sv JOIN cb USING (sub)
  ) WHERE rk = 1
), lut AS (
  SELECT q.vec_id AS query_id, cb.sub, cb.code,
         LIST_DOT_PRODUCT(
             LIST_SLICE(q.v, cb.sub * {_PQ_DSUB} + 1, (cb.sub + 1) * {_PQ_DSUB}),
             cb.cv) AS dp,
         q.nrm AS qnrm
  FROM vec q CROSS JOIN cb WHERE q.vec_id < 10
), adc AS (
  SELECT l.query_id, e.vec_id AS neighbor_id,
         SUM(l.dp) / (ANY_VALUE(n.nrm) * ANY_VALUE(l.qnrm)) AS s
  FROM enc e JOIN lut l USING (sub, code)
  JOIN vec n ON n.vec_id = e.vec_id
  WHERE e.vec_id <> l.query_id
  GROUP BY 1, 2
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id) AS BIGINT) AS rank
  FROM adc
) t WHERE rank <= 5 ORDER BY query_id, rank
"""

_b(
    "pq_adc_topk",
    "Product-quantized approximate top-5 by asymmetric distance "
    "(operators.similarity.pq_encode + pq_adc_topk; 4 subspaces x 16 dims, "
    "codebooks = per-label round-9 subvector means — engine-reproducible, "
    "standing in for pq_fit's k-means books).  The big scan reads m "
    "one-byte codes + one float norm per row (~6% of the float bytes at "
    "this dim; ~0.5% at production m=16/dim=768) and each query scores "
    "rows by m LUT lookups — no per-pair float math.  The oracle replays "
    "encoding, LUTs and ADC ranking end-to-end; recall vs brute force "
    "additionally asserted in tests/test_pq.py.",
    _pq_builder,
    oracle=_PQ_ORACLE,
)

# --- text analysis ----------------------------------------------------------

def _text_stats_builder(spark: SparkSession, sf: str) -> DataFrame:
    # spread an under-partitioned scan before the (interpreted higher-order
    # array) metric expressions — a small parquet arrives as ONE partition
    # and would evaluate every metric on one core; at 100 TB the scan is
    # already many-partitioned and this is a no-op (no extra exchange).
    # RANGE spread on doc_id (not hash): the terminal orderBy(doc_id) is
    # then satisfied by the spread's own partitioning, so the plan carries
    # ONE exchange instead of two (spread + global sort) — guide §2.4
    docs = _range_spread(load_table(spark, sf, "documents"), "doc_id")
    # materialize the token array ONCE and let every metric reference it:
    # the naive form tokenizes per metric (4 split+trim passes per row —
    # r10: 0.23 s → 0.19 s at sf0.1, bit-exact).  Two selects stay two
    # projections: CollapseProject does not inline a non-cheap alias
    # referenced more than once, so __toks is evaluated once per row.
    base = docs.selectExpr("doc_id", "text", f"{X._tokens_sql('text')} as __toks")
    return base.selectExpr(
        "doc_id",
        f"{X.token_count_sql('__toks')} as n_tokens",
        "cast(length(text) as bigint) as n_chars_m",
        f"{X.fingerprint_sql('__toks')} as fp",
        f"{X.quality_score_sql('text', '__toks')} as quality",
        f"{X.dup_ngram_fraction_sql('__toks', 2)} as rep2",
    ).orderBy("doc_id")


_b(
    "text_stats",
    "Token count / quality score / rolling fingerprint / Gopher-style "
    "duplicate-bigram repetition per document (operators.text) — "
    "integer-exact formulas recomputed verbatim by the oracle.",
    _text_stats_builder,
    oracle="""
WITH t AS (
  SELECT doc_id, TRIM(text) AS txt, STRING_SPLIT(TRIM(text), ' ') AS l,
         ' ' || TRIM(text) || ' ' AS pad
  FROM documents
), base AS (
  SELECT doc_id, txt, l,
         CAST(LEN(l) AS BIGINT) AS n_tokens,
         CAST(STRLEN(txt) AS BIGINT) AS n_chars,
         CAST((STRLEN(pad) - STRLEN(REPLACE(pad, ' the ', ''))) / 5
              + (STRLEN(pad) - STRLEN(REPLACE(pad, ' a ', ''))) / 3
              + (STRLEN(pad) - STRLEN(REPLACE(pad, ' of ', ''))) / 4
              AS BIGINT) AS en_hits
  FROM t
), fp AS (
  SELECT doc_id,
         CAST(SUM((i * 2654435761
                   + (STRLEN(l[i]) * 65599
                      + ASCII(SUBSTR(l[i], 1, 1)) * 256
                      + ASCII(SUBSTR(l[i], -1, 1))) % 2147483647)
                  % 2147483647) % 2147483647 AS BIGINT) AS fp
  FROM t, UNNEST(GENERATE_SERIES(1, LEN(l))) AS g(i)
  GROUP BY doc_id
), rep AS (
  SELECT doc_id, m,
         CASE WHEN m >= 1
              THEN (LEN(grams) - LEN(LIST_DISTINCT(grams)))::DOUBLE / m
              ELSE 0.0 END AS rep2
  FROM (
    SELECT doc_id, LEN(l) - 1 AS m,
           LIST_TRANSFORM(RANGE(1, GREATEST(LEN(l) - 1, 1) + 1),
                          i -> ARRAY_TO_STRING(l[i:i+1], ' ')) AS grams
    FROM t
  )
)
SELECT b.doc_id, b.n_tokens, b.n_chars AS n_chars_m, fp.fp,
       (CASE WHEN b.n_chars BETWEEN 100 AND 2000 THEN 1.0
             WHEN b.n_chars >= 50 THEN 0.5 ELSE 0.0 END) * CAST(0.4 AS DOUBLE)
       + (CASE WHEN CAST(b.n_chars - b.n_tokens + 1 AS DOUBLE) / b.n_tokens
                    BETWEEN 3.0 AND 10.0
               THEN 1.0 ELSE 0.5 END) * CAST(0.3 AS DOUBLE)
       + (CAST(b.en_hits AS DOUBLE) / b.n_tokens) * CAST(0.3 AS DOUBLE)
           AS quality,
       rep.rep2
FROM base b JOIN fp USING (doc_id) JOIN rep USING (doc_id)
ORDER BY b.doc_id
""",
)


def _langid_oracle() -> str:
    """Generate the CASE chain from LANG_STOPWORDS so oracle and operator
    can never drift apart."""
    hits = {
        lang: " + ".join(
            f"CAST((STRLEN(pad) - STRLEN(REPLACE(pad, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
            for w in ws
        )
        for lang, ws in X.LANG_STOPWORDS.items()
    }
    order = list(X.LANG_STOPWORDS)
    branches = []
    for i, lang in enumerate(order):
        conds = [f"s_{lang} >= s_{o}" for o in order[i + 1 :]]
        conds += [f"s_{lang} > s_{p}" for p in order[:i]]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{order[0]}' END"
    score_cols = ",\n         ".join(f"{e} AS s_{lang}" for lang, e in hits.items())
    return f"""
WITH t AS (SELECT doc_id, lang, ' ' || TRIM(text) || ' ' AS pad FROM documents),
s AS (
  SELECT doc_id, lang,
         {score_cols}
  FROM t
)
SELECT doc_id, lang, {case} AS predicted_lang, s_en AS en_hits
FROM s ORDER BY doc_id
"""


_b(
    "text_langid",
    "Stopword-heuristic language ID (operators.text.lang_id) with fixed "
    "precedence tie-break; the oracle CASE chain is generated from the same "
    "stopword table.",
    lambda spark, sf: (
        # range-spread before the (wide stopword CASE-chain) projection:
        # the single-row-group gate file otherwise evaluates every score on
        # ONE core, and the terminal orderBy(doc_id) reuses the spread's
        # range partitioning — same exchange count, 32× the map parallelism
        _range_spread(load_table(spark, sf, "documents"), "doc_id")
        .select(
            "doc_id",
            "lang",
            X.lang_id("text").alias("predicted_lang"),
            X.stopword_hits("text", X.LANG_STOPWORDS["en"]).alias("en_hits"),
        )
        .orderBy("doc_id")
    ),
    oracle=_langid_oracle(),
)

# --- multimodal -------------------------------------------------------------

_b(
    "multimodal_meta",
    "Binary payload plumbing (operators.multimodal.attach_media): byte "
    "length + content hash over the binary column.",
    lambda spark, sf: (
        # range-spread on doc_id: attach_media aliases doc_id → media_id and
        # Project's alias-aware output partitioning carries the range
        # partitioning through, so the terminal orderBy(media_id) reuses it
        # while the sha2 projection runs on every core
        M.attach_media(
            _range_spread(load_table(spark, sf, "documents"), "doc_id")
        )
        .select(
            "media_id",
            F.octet_length("payload").cast("bigint").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("payload_sha"),
            F.col("meta.modality").alias("modality"),
        )
        .orderBy("media_id")
    ),
    oracle="""
SELECT doc_id AS media_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       SHA256(text) AS payload_sha,
       'text' AS modality
FROM documents ORDER BY media_id
""",
)

_b(
    "multimodal_features",
    "mapInPandas feature extraction over Arrow batches "
    "(operators.multimodal.extract_features — decode stubbed, plumbing "
    "real).  The graded column is histogram bin 7 (1-based element_at → "
    "bytes with high nibble 6, i.e. 0x60-0x6f): an exact integer count "
    "over payload bytes divided by n_bytes — one IEEE division of exact "
    "integers, bit-identical in any engine, so no rounding is needed.  "
    "UTF-8 bytes 0x60-0x6f are exactly the characters U+0060-U+006F "
    "(continuation bytes are 0x80+), so the oracle counts them with a "
    "regex over the text.  Full histogram checked vs a Python reference "
    "in tests.",
    lambda spark, sf: (
        # measured and REJECTED (r10): hash-spreading the scan before the
        # mapInPandas ran 4.6× SLOWER warm at sf0.1 (0.82 → 3.74 s noop;
        # cold 3.7 → 25.6 s) — 32 concurrent Python workers each paying
        # Arrow round-trip + startup on a ~156-row slice cost far more
        # than the single-task batch loop.  The one-task shape stays.
        M.extract_features(M.attach_media(load_table(spark, sf, "documents")))
        .select("media_id", "n_bytes", F.element_at("features", 7).alias("f7"))
        .orderBy("media_id")
    ),
    oracle=r"""
SELECT doc_id AS media_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       CASE WHEN OCTET_LENGTH(ENCODE(text)) = 0 THEN 0.0
            ELSE CAST(LEN(REGEXP_EXTRACT_ALL(text, '[\x60-\x6f]')) AS DOUBLE)
                 / OCTET_LENGTH(ENCODE(text)) END AS f7
FROM documents ORDER BY media_id
""",
)


_b(
    "text_token_regex",
    "BPE-ish regex token counting (operators.text.token_count_regex — "
    "letter/digit/punct runs) next to the whitespace count.",
    lambda spark, sf: (
        # range-spread: parallelize the regexp_extract_all projection,
        # terminal sort reuses the partitioning (see text_langid)
        _range_spread(load_table(spark, sf, "documents"), "doc_id")
        .select(
            "doc_id",
            X.token_count("text").alias("n_ws_tokens"),
            X.token_count_regex("text").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    ),
    oracle="""
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(TRIM(text), ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^ a-zA-Z0-9]+'))
            AS BIGINT) AS n_bpe_tokens
FROM documents ORDER BY doc_id
""",
)

_b(
    "emb_label_centroids",
    "Per-label embedding centroids (posexplode + decimal-exact per-"
    "dimension mean) — the vector-analytics building block for IVF "
    "coarse quantizers.",
    lambda spark, sf: (
        # measured and REJECTED (r10): hash-spreading on vec_id before the
        # posexplode ran 1.7× SLOWER warm at sf0.1 (0.44 → 0.74 s noop) —
        # the added exchange ships every raw float vector, which costs more
        # than the one-task explode + decimal partial-agg it parallelizes.
        load_table(spark, sf, "embeddings")
        .select("label", F.posexplode("embedding").alias("dim", "v"))
        .where(F.col("dim") < 8)
        .groupBy("label", "dim")
        .agg(
            # ROUND(.,9) absorbs the one place cross-engine float noise can
            # enter: float32 values are dyadic rationals that can terminate
            # exactly on a decimal halfway digit, where Spark's HALF_UP and
            # DuckDB's binary-exact double->decimal casts round differently
            F.round(
                F.sum(F.col("v").cast("double").cast("decimal(18,12)")).cast("double")
                / F.count("v"),
                9,
            ).alias("centroid")
        )
        .orderBy("label", "dim")
    ),
    oracle="""
SELECT label, i - 1 AS dim,
       ROUND(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE)
             / COUNT(*), 9) AS centroid
FROM embeddings, UNNEST(GENERATE_SERIES(1, 8)) AS g(i)
GROUP BY label, dim
ORDER BY label, dim
""",
)

_b(
    "text_tfidf_top_terms",
    "Top-3 TF-IDF terms per document (explode -> tf and df counts -> "
    "ratio-based idf, window top-k). Ratio idf (n_docs/df) keeps the "
    "score an exact-integer division — no cross-libm log.",
    lambda spark, sf: _tfidf_builder(spark, sf),
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, rank, term
FROM (
  SELECT tf.doc_id, tf.term,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY tf.doc_id
             ORDER BY tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) DESC, tf.term
         ) AS BIGINT) AS rank
  FROM tf JOIN df USING (term) CROSS JOIN n
) t
WHERE rank <= 3
ORDER BY doc_id, rank
""",
)


def _tfidf_builder(spark, sf):
    from pyspark.sql.window import Window

    from ballista_spark.operators.dedup import _parallelized

    docs = _parallelized(load_table(spark, sf, "documents"), "doc_id")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # n_docs rides as a one-row aggregate cross join (the 1-row broadcast
    # pattern planlint allows) instead of a driver-side count(): the old
    # form ran a Spark job per *query build* (r11, guide §5 — no driver
    # jobs in query paths).  Arithmetic is identical: the same exact
    # integer count cast to double, divided in the same order.
    n = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") * (F.col("__n_docs") / F.col("df"))).desc(), F.col("term")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "term")
        .orderBy("doc_id", "rank")
    )
