"""Dataset management operators: deterministic splits, merge-upsert, and
sequence packing.

Training-data pipelines need reproducible dataset surgery at 100 TB:

- :func:`hash_split` — content-hash train/val/test assignment.  Unlike
  ``DataFrame.randomSplit`` it is a pure projection: deterministic across
  runs/cluster sizes/partitionings, stable under re-execution, and requires
  no RNG state or shuffle.
- :func:`merge_upsert` — SCD-1 style MERGE emulation for plain parquet
  (no Delta in this environment): anti-join + union, one shuffle on the
  key.  The pattern the guide describes for CDC without a lakehouse format.
- :func:`shuffle_deterministic` — reproducible epoch shuffle: global
  training order from the md5 lottery, identical across runs and
  partition layouts (``orderBy(rand())`` is neither), optionally
  range-sharded for streaming readers.
- :func:`pack_contiguous` / :func:`pack_greedy` — sequence packing: lay
  documents out into fixed-length training windows (the tokenize-and-pack
  step before pretraining).  Contiguous packing (documents spill across
  window boundaries) is a distributed prefix sum — exact, deterministic,
  and SQL-reproducible; greedy packing (documents never split) is a
  per-bucket first-fit-decreasing bin pack via ``applyInPandas``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_spark.operators.hashing import md5_long

#: resolution of the split lottery (1 ppm)
_SPLIT_DENOM = 1_000_000


def split_column(key_cols: Sequence[str], weights: Sequence[float],
                 names: Sequence[str], seed: str = "split") -> F.Column:
    """A deterministic split label derived from the row's key columns.

    ``weights`` need not sum to 1 (normalized); same key → same split,
    always, everywhere.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = float(sum(weights))
    ticket = F.pmod(
        F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols]),
        F.lit(_SPLIT_DENOM),
    )
    expr = None
    cum = 0.0
    for w, name in zip(weights, names):
        cum += w / total
        bound = int(cum * _SPLIT_DENOM)
        cond = ticket < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(F.lit(names[-1]))


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    seed: str = "split",
) -> DataFrame:
    """Attach a deterministic ``split`` column (train/val/test…)."""
    return df.withColumn("split", split_column(key_cols, weights, names, seed))


def shuffle_deterministic(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: str = "shuffle",
    n_shards: int | None = None,
) -> DataFrame:
    """Reproducible global shuffle for training order: rows sorted by the
    md5 lottery of ``(seed, key_cols)`` — the epoch-shuffle step of a
    pretraining pipeline, where the order must be (a) statistically
    random, (b) identical across runs/cluster sizes/partitionings, and
    (c) re-rollable per epoch by changing ``seed`` (e.g. ``"epoch3"``).
    ``DataFrame.orderBy(rand())`` gives none of these: Spark's rand() is
    per-partition-seeded, so the order silently changes with the
    partition layout.

    With ``n_shards`` the result is also range-repartitioned into that
    many ordered shards (shard i holds the i-th contiguous slice of the
    global order) — write it with ``.write`` and readers stream shards
    in filename order for the exact global sequence.  One range exchange
    + in-partition sort; the lottery is a map-side projection (the same
    cross-engine md5 construction as the sampling/packing lotteries).
    """
    lottery = md5_long(
        F.concat_ws(
            _SEP, F.lit(seed), *[F.col(c).cast("string") for c in key_cols]
        )
    )
    tagged = df.withColumn("__ord", lottery)
    # tie-break on the keys so byte-identical lottery values (same key
    # re-seeded, or astronomically-unlikely collisions) stay deterministic
    order = [F.col("__ord")] + [F.col(c) for c in key_cols]
    if n_shards is not None:
        tagged = tagged.repartitionByRange(int(n_shards), *order)
    return tagged.sortWithinPartitions(*order).drop("__ord") if n_shards \
        else tagged.orderBy(*order).drop("__ord")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Snapshot diff between two corpus versions — the audit step of an
    incremental dataset build (what changed between crawl N and crawl N+1,
    which documents a re-curation pass touched).

    Returns ``key_cols`` + ``diff_status`` in {'added', 'removed',
    'changed'} (+ 'unchanged' when ``include_unchanged``).  Rows are
    compared NULL-safely on ``compare_cols`` (default: every column the
    two frames share beyond the keys).

    Scale shape: ONE full-outer hash join on the keys (both sides shuffle
    once); comparisons are map-side column equality — no content is
    collected or broadcast, and at 100 TB the join is the unavoidable
    cost of keying two snapshots.  Fully SQL-expressible (DuckDB twin in
    tests/test_mixture_diff.py).
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    joined = o.join(n, on=keys, how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    out = joined.select(*keys, status.alias("diff_status"))
    if include_unchanged:
        return out
    return out.where(F.col("diff_status") != "unchanged")


def merge_upsert(target: DataFrame, updates: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """MERGE (SCD-1): update rows present in ``updates``, keep the rest,
    insert new keys.  Equivalent to ``MERGE INTO … WHEN MATCHED THEN UPDATE
    WHEN NOT MATCHED THEN INSERT`` on row granularity."""
    keys = [key] if isinstance(key, str) else list(key)
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


#: separator mirrored from the sampling lottery (operators/sampling.py)
_SEP = "\x1f"


def pack_bucket(key_col: str, n_buckets: int, seed: str = "pack") -> F.Column:
    """Deterministic md5-derived bucket for a document key — the unit of
    packing parallelism.  Cross-engine reproducible (``md5_long`` twin)."""
    return F.pmod(
        md5_long(F.concat_ws(_SEP, F.lit(seed), F.col(key_col).cast("string"))),
        F.lit(int(n_buckets)),
    )


def pack_contiguous(
    df: DataFrame,
    count_col: str,
    key_col: str,
    seq_len: int,
    n_buckets: int = 64,
    seed: str = "pack",
    group_col: str | None = None,
) -> DataFrame:
    """Contiguous sequence packing: concatenate every document's tokens (in
    the deterministic total order ``(bucket, key)``) into one stream and
    chop it into ``seq_len``-token training windows — documents spill
    across window boundaries (the standard pretraining "packed" layout;
    zero padding waste).

    Adds ``pack_start`` (global token offset), ``pack_first``/``pack_last``
    (window ids the document spans) and ``pack_offset`` (offset inside its
    first window).  ``key_col`` must be unique per row; ``count_col`` is
    the document's token count (>= 0).

    Scale shape — a two-level distributed prefix sum, NOT a global-order
    window (which would serialize 100 TB through one reducer):

    1. per-bucket running totals: one hash shuffle on the md5 bucket, each
       bucket cumsums independently in parallel;
    2. bucket base offsets: an ``n_buckets``-row aggregate cumsum'd on a
       single (tiny) partition and broadcast back.

    Every step is integer arithmetic on md5-derived ordering, so any
    engine reproduces the identical layout bit-for-bit.

    ``group_col`` (an integer column) prepends a grouping level to the
    total order — ``(group, bucket, key)`` — so all of a group's tokens
    are CONTIGUOUS in the stream: the in-context-pretraining layout
    (:func:`semantic_pack` composes it with cluster assignment).  The
    bucket-offset aggregate grows to (groups x n_buckets) rows — still
    driver-tiny for any sane cluster count.  NULL groups order first.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    staged = df.withColumn("__b", pack_bucket(key_col, n_buckets, seed))
    if group_col is not None:
        # null-SAFE grouping: a NULL composite bucket would silently
        # drop rows at the broadcast offsets equi-join (NULL never
        # equals NULL) while their counts still shifted every later
        # bucket — coalesce NULL groups to a sentinel that orders first
        g = F.coalesce(F.col(group_col).cast("long"), F.lit(-(1 << 40)))
        staged = staged.withColumn(
            "__b", g * F.lit(int(n_buckets)) + F.col("__b")
        )
    w_local = Window.partitionBy("__b").orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = staged.withColumn("__lend", F.sum(count_col).over(w_local))
    btot = staged.groupBy("__b").agg(F.sum(count_col).alias("__t"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "__b", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off")
    )
    start = (F.col("__off") + F.col("__lend") - F.col(count_col)).cast("long")
    L = int(seq_len)
    # integer division (`div`), not floor-of-double: exact past 2^53 tokens
    return (
        staged.join(F.broadcast(offsets), "__b")
        .withColumn("pack_start", start)
        .withColumn(
            "__pend", F.col("pack_start") + F.greatest(F.col(count_col), F.lit(1)) - 1
        )
        .withColumn("pack_first", F.expr(f"pack_start div {L}"))
        .withColumn("pack_last", F.expr(f"__pend div {L}"))
        .withColumn("pack_offset", F.col("pack_start") % F.lit(L))
        .drop("__b", "__lend", "__off", "__pend")
    )


def pack_greedy(
    df: DataFrame,
    count_col: str,
    key_col: str,
    seq_len: int,
    n_buckets: int = 64,
    seed: str = "pack",
) -> DataFrame:
    """Greedy sequence packing: first-fit-decreasing bin packing so no
    document is ever split across training windows (the "unpacked"
    fine-tuning layout — some padding waste, no cross-document attention
    leakage).  Adds ``pack_id`` (globally unique window) and
    ``pack_offset``.

    Documents are bucketed by the md5 hash of their key and each bucket is
    bin-packed independently by an ``applyInPandas`` group — deterministic
    for a fixed ``(seed, n_buckets)`` regardless of cluster partitioning
    (FFD order is (count desc, key asc) with a stable sort).  Per-group
    state is the open-pack remainder list — bounded by the bucket's pack
    count; size buckets (``n_buckets``) so a bucket's documents fit one
    task.  Oversized documents (count > seq_len) get a window of their own
    at offset 0 (truncate downstream if needed).

    Bin packing has no single-pass SQL form (the running remainder resets
    data-dependently), which is exactly the ``applyInPandas`` escape hatch;
    use :func:`pack_contiguous` when splitting documents is acceptable —
    it is cheaper and fully SQL-expressible.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    staged = df.withColumn("__b", pack_bucket(key_col, n_buckets, seed))
    out_schema = StructType(
        staged.schema.fields
        + [StructField("pack_id", LongType()), StructField("pack_offset", LongType())]
    )
    cap = int(seq_len)
    shift = 1 << 33  # bucket-local pack index below, bucket above: collision-free
    ccol, kcol = count_col, key_col

    def _pack(pdf):
        pdf = pdf.sort_values([ccol, kcol], ascending=[False, True], kind="mergesort")
        bucket = int(pdf["__b"].iloc[0]) if len(pdf) else 0
        remaining: list[int] = []
        ids: list[int] = []
        offs: list[int] = []
        for n in pdf[ccol]:
            n = int(n)
            placed = False
            if n <= cap:
                for i, r in enumerate(remaining):
                    if n <= r:
                        ids.append(i)
                        offs.append(cap - r)
                        remaining[i] = r - n
                        placed = True
                        break
            if not placed:
                remaining.append(max(cap - n, 0))
                ids.append(len(remaining) - 1)
                offs.append(0)
        return pdf.assign(
            pack_id=[bucket * shift + i for i in ids],
            pack_offset=[int(o) for o in offs],
        )

    return staged.groupBy("__b").applyInPandas(_pack, out_schema).drop("__b")


def packed_sequences(
    df: DataFrame,
    tokens_col: str = "token_ids",
    key_col: str = "doc_id",
    seq_len: int = 2048,
    n_buckets: int = 64,
    seed: str = "pack",
    pad_id: int | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Materialize the fixed-length training sequences whose layout
    :func:`pack_contiguous` computes: (seq_id, tokens) with every
    ``tokens`` array exactly ``seq_len`` long — the tokenize→pack→write
    tail of a pretraining data pipeline (compose with ``bpe_encode_ids``
    upstream and :func:`write_packed_shards` downstream).

    The final partial window is DROPPED when ``pad_id`` is None (the
    standard pretraining convention — at most ``seq_len - 1`` tokens of
    the whole corpus) or padded to length with ``pad_id`` otherwise.
    NULL/empty token arrays contribute nothing (count 0 keeps the layout
    identical to ``pack_contiguous`` over ``size(tokens)``).

    Scale shape: ``pack_contiguous``'s two-level prefix sum (one bucket
    hash shuffle + an n_buckets-row broadcast) assigns each document its
    global token offset; then ONE posexplode + ONE shuffle keyed by
    ``seq_id`` assembles windows.  Per-group state is ``seq_len``
    (offset, token) structs — bounded regardless of corpus size; the
    token stream is never collected, broadcast, or globally sorted
    through one reducer.  Everything is md5-derived integer arithmetic,
    so the layout is bit-identical on any cluster and any partitioning.
    """
    L = int(seq_len)
    n = F.when(F.col(tokens_col).isNull(), F.lit(0)).otherwise(
        F.size(tokens_col)
    )
    staged = df.withColumn("__n", n)
    packed = pack_contiguous(
        staged, "__n", key_col, L, n_buckets, seed, group_col=group_col
    )
    placed = packed.select(
        "pack_start", F.posexplode(tokens_col).alias("__p", "__tok")
    ).select(
        F.expr(f"(pack_start + __p) div {L}").alias("seq_id"),
        ((F.col("pack_start") + F.col("__p")) % F.lit(L)).alias("__o"),
        "__tok",
    )
    seqs = placed.groupBy("seq_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("__o"), F.col("__tok")))
            ),
            lambda s: s["__tok"],
        ).alias("tokens")
    )
    if pad_id is None:
        return seqs.where(F.size("tokens") == L)
    short = F.size("tokens")
    return seqs.withColumn(
        "tokens",
        F.when(short == L, F.col("tokens")).otherwise(
            F.concat(
                F.col("tokens"),
                F.array_repeat(
                    F.lit(pad_id).cast("long"), (F.lit(L) - short).cast("int")
                ),
            )
        ),
    )


def semantic_pack(
    df: DataFrame,
    centroids: list[list[float]],
    count_col: str,
    key_col: str,
    seq_len: int,
    vec_col: str = "embedding",
    n_buckets: int = 64,
    seed: str = "pack",
) -> DataFrame:
    """In-context packing (Shi et al. 2023, "In-Context Pretraining"):
    documents that are semantically RELATED land in the same training
    windows, so cross-document attention inside a window sees coherent
    context instead of random concatenation.

    Composition of two existing scale shapes: map-only cluster
    assignment against broadcast ``centroids``
    (`similarity.cluster_assign` — train them with ``kmeans_fit``), then
    :func:`pack_contiguous` with ``group_col="cluster"`` so the token
    stream is cluster-contiguous.  Adds ``cluster`` plus the usual
    ``pack_*`` columns; total extra cost over plain packing is one
    broadcast scan.  The full ICP method orders docs within a cluster
    by a greedy nearest-neighbor path — at 100 TB that is a per-cluster
    TSP and the paper's own ablation shows clustering does most of the
    work, so within-cluster order stays the deterministic (bucket, key)
    hash order.
    """
    from ballista_spark.operators.similarity import cluster_assign

    assigned = cluster_assign(df, centroids, id_col=key_col, vec_col=vec_col)
    return pack_contiguous(
        assigned,
        count_col,
        key_col,
        seq_len,
        n_buckets=n_buckets,
        seed=seed,
        group_col="cluster",
    )


def write_packed_shards(
    df: DataFrame,
    path: str,
    tokens_col: str = "token_ids",
    key_col: str = "doc_id",
    seq_len: int = 2048,
    seqs_per_shard: int = 8192,
    **kwargs,
) -> DataFrame:
    """Write :func:`packed_sequences` output as shard-partitioned parquet
    (``shard=k/`` directories of ``seqs_per_shard`` consecutive windows
    — the unit a training reader streams).  Spark writers only, so the
    same call targets local/HDFS/S3.  Returns a reader over the written
    dataset.  Extra kwargs pass through to :func:`packed_sequences`.
    """
    seqs = packed_sequences(
        df, tokens_col=tokens_col, key_col=key_col, seq_len=seq_len, **kwargs
    )
    out = seqs.withColumn(
        "shard", F.expr(f"seq_id div {int(seqs_per_shard)}")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    return df.sparkSession.read.parquet(path)


def group_split(
    df: DataFrame,
    group_cols: Sequence[str],
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    seed: str = "split",
) -> DataFrame:
    """:func:`hash_split`, but the lottery ticket is drawn per GROUP —
    every row of a group lands in the SAME split.  This is the
    leakage-safe split: near-duplicate documents (one dedup cluster),
    pages of one host, turns of one conversation must not straddle
    train/test, or evaluation quietly measures memorization of
    training neighbors.  Compose the group key from
    ``dedup.connected_components`` output (cluster component),
    ``url.url_host``, or ``similarity.cluster_assign``.

    Map-only — the same xxhash64 ticket as :func:`hash_split`, keyed on
    the group columns only, so no join against a group table and no
    shuffle; deterministic across partitionings and runs.  Split sizes
    land on the weights only in expectation over GROUPS (a giant group
    drags its whole mass into one split — that is the point).
    """
    return df.withColumn(
        "split", split_column(group_cols, weights, names, seed)
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    key_cols: Sequence[str],
    n_stages: int = 4,
    ascending: bool = False,
    seed: str = "curriculum",
    n_shards: int | None = None,
    boundaries: Sequence[float] | None = None,
) -> DataFrame:
    """Curriculum training order: rows bucketed into ``n_stages`` score
    stages (default descending — highest quality first), deterministically
    shuffled WITHIN each stage (the :func:`shuffle_deterministic`
    lottery), stages concatenated in order.  Adds a ``stage`` column
    (1-based).

    Quality-ordered curricula (clean data first, noisy tail later — or
    the anti-curriculum, ``ascending=True``) are a standard pretraining
    data lever; the hard requirement is the same as epoch shuffling:
    reproducible order.

    Stage boundaries: by default the ``approx_percentile`` sketch
    (mergeable, fully distributed — stages are equal-sized up to sketch
    accuracy).  NOT an ``ntile`` window: global ntile funnels the whole
    corpus through ONE task's sort — the exact anti-pattern the plan
    lint exists to catch.  The sketch is deterministic for a fixed
    physical layout; for byte-identical curricula across different
    partitionings, pass explicit ``boundaries`` (len = n_stages - 1,
    ascending score values; boundary ties land in the BETTER stage, and
    NULL scores land in the last stage).

    Scale shape: one sketch aggregation (scalar collect) + map-only
    stage assignment + ONE range exchange for the final (stage,
    lottery) order.
    """
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    sc = F.col(score_col)
    if boundaries is None:
        if n_stages == 1:
            boundaries = []
        else:
            qs = [i / n_stages for i in range(1, n_stages)]
            [row] = df.agg(
                F.percentile_approx(
                    sc, F.array(*[F.lit(q) for q in qs]), F.lit(10_000)
                ).alias("b")
            ).collect()
            boundaries = sorted(float(x) for x in (row["b"] or []))
    else:
        boundaries = sorted(float(x) for x in boundaries)
        if len(boundaries) != n_stages - 1:
            raise ValueError(
                f"need {n_stages - 1} boundaries, got {len(boundaries)}"
            )
    # stage 1 = best: for descending curricula the TOP quantile is stage 1
    stage = F.lit(1)
    ordered = boundaries if ascending else list(reversed(boundaries))
    for i, b in enumerate(ordered):
        past = (sc > F.lit(b)) if ascending else (sc < F.lit(b))
        stage = F.when(past, F.lit(i + 2)).otherwise(stage)
    stage = F.when(sc.isNull(), F.lit(n_stages)).otherwise(stage)
    staged = df.withColumn("stage", stage)
    lottery = md5_long(
        F.concat_ws(
            _SEP, F.lit(seed), *[F.col(c).cast("string") for c in key_cols]
        )
    )
    tagged = staged.withColumn("__ord", lottery)
    order = [F.col("stage"), F.col("__ord")] + [F.col(c) for c in key_cols]
    if n_shards is not None:
        tagged = tagged.repartitionByRange(int(n_shards), *order)
        return tagged.sortWithinPartitions(*order).drop("__ord")
    return tagged.orderBy(*order).drop("__ord")


def fim_split(
    df: DataFrame,
    text_col: str = "text",
    key_cols: Sequence[str] = ("doc_id",),
    seed: str = "fim",
    min_len: int = 3,
) -> DataFrame:
    """Fill-in-the-middle training prep (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): adds
    ``fim_prefix`` / ``fim_middle`` / ``fim_suffix`` character slices
    with ``prefix || middle || suffix == text`` exactly (pinned in
    tests).  The two cut points derive from the md5 lottery of
    ``(seed, key_cols)`` — deterministic across runs and partitionings,
    re-rollable per epoch by reseeding, never from ``rand()``.

    Character-level cuts (apply before tokenization, the PSM/SPM
    document-level transform from the paper); texts shorter than
    ``min_len`` chars (and NULLs) get the whole text as ``fim_prefix``
    with empty middle/suffix — callers usually leave those in AR form.
    Map-only: two hashes + three substrings, no shuffle.
    """
    col = F.col(text_col)
    n = F.length(col)
    h1 = F.pmod(
        md5_long(F.concat_ws(_SEP, F.lit(seed + ":a"),
                             *[F.col(c).cast("string") for c in key_cols])),
        n + F.lit(1),
    )
    h2 = F.pmod(
        md5_long(F.concat_ws(_SEP, F.lit(seed + ":b"),
                             *[F.col(c).cast("string") for c in key_cols])),
        n + F.lit(1),
    )
    a = F.least(h1, h2).cast("int")
    b = F.greatest(h1, h2).cast("int")
    splittable = col.isNotNull() & (n >= min_len)
    prefix = F.when(splittable, col.substr(F.lit(1), a)).otherwise(col)
    middle = F.when(splittable, col.substr(a + 1, b - a)).otherwise(
        F.when(col.isNotNull(), F.lit("")).otherwise(F.lit(None))
    )
    suffix = F.when(splittable, col.substr(b + 1, n - b)).otherwise(
        F.when(col.isNotNull(), F.lit("")).otherwise(F.lit(None))
    )
    return (
        df.withColumn("fim_prefix", prefix)
        .withColumn("fim_middle", middle)
        .withColumn("fim_suffix", suffix)
    )


def span_corrupt(
    df: DataFrame,
    tokens_col: str = "tokens",
    key_cols: Sequence[str] = ("doc_id",),
    corruption_rate: float = 0.15,
    mean_span: int = 3,
    seed: str = "t5",
    sentinel_fmt: str = "<extra_id_{}>",
) -> DataFrame:
    """T5 span-corruption prep (Raffel et al. 2020 §3.1.4): adds
    ``corrupt_inputs`` / ``corrupt_targets`` token arrays — masked spans
    replaced by per-span sentinels in the inputs, targets = each
    sentinel followed by the span it hides (then a final closing
    sentinel), so the pair reconstructs the original exactly (pinned in
    tests).

    ``round(rate·n)`` tokens are masked across ``round(n_mask/mean_span)``
    non-adjacent spans.  Span lengths and gap positions come from a
    PRNG seeded with the md5 of ``(seed, key_cols)`` — the fim_split
    determinism contract: identical across runs, partitionings and
    cluster sizes, re-rollable per epoch by reseeding, never ``rand()``.

    Arrow-batched pandas UDF (the per-doc segment construction is
    genuinely imperative — the bpe_encode precedent), map-only, no
    shuffle.  Docs with fewer than 2 tokens (or NULL) pass through with
    empty targets.
    """
    import hashlib
    import random

    from pyspark.sql import types as T

    keys = [F.col(c).cast("string") for c in key_cols]

    # single Series UDF returning [inputs, targets] — a struct-returning
    # pandas UDF can't infer its eval type under
    # `from __future__ import annotations` (string hints)
    @F.pandas_udf(T.ArrayType(T.ArrayType(T.StringType())))
    def corrupt(toks_s: pd.Series, key_s: pd.Series) -> pd.Series:
        out = []
        for toks, key in zip(toks_s, key_s):
            if toks is None:
                out.append(None)
                continue
            if len(toks) < 2:
                out.append([list(toks), []])
                continue
            toks = list(toks)
            n = len(toks)
            n_mask = min(n - 1, max(1, round(corruption_rate * n)))
            n_spans = max(1, round(n_mask / mean_span))
            rng = random.Random(
                hashlib.md5((seed + ":" + key).encode()).digest()
            )
            # span lengths: positive parts of n_mask (stars and bars)
            cuts = sorted(rng.sample(range(1, n_mask), n_spans - 1)) if n_spans > 1 else []
            lens = [b - a for a, b in zip([0] + cuts, cuts + [n_mask])]
            # gaps: n_keep tokens split into n_spans+1 segments, interior
            # gaps >= 1 so spans never touch (T5's non-adjacency)
            n_keep = n - n_mask
            n_gaps = n_spans + 1
            interior = n_gaps - 2
            free = n_keep - interior  # first/last gap may be 0
            if free < 0:  # degenerate: too many spans for the gaps
                n_spans = max(1, n_keep)
                cuts = sorted(rng.sample(range(1, n_mask), n_spans - 1)) if n_spans > 1 else []
                lens = [b - a for a, b in zip([0] + cuts, cuts + [n_mask])]
                interior = n_spans - 1
                free = n_keep - interior
            gcuts = sorted(rng.choices(range(free + 1), k=n_gaps - 1))
            gaps = [b - a for a, b in zip([0] + gcuts, gcuts + [free])]
            for i in range(1, len(gaps) - 1):
                gaps[i] += 1  # interior minimum
            inp, tgt = [], []
            pos = 0
            for si, (g, L) in enumerate(zip(gaps, lens + [0])):
                inp.extend(toks[pos : pos + g])
                pos += g
                if si < n_spans:
                    s = sentinel_fmt.format(si)
                    inp.append(s)
                    tgt.append(s)
                    tgt.extend(toks[pos : pos + L])
                    pos += L
            tgt.append(sentinel_fmt.format(n_spans))
            out.append([inp, tgt])
        return pd.Series(out)

    packed = corrupt(F.col(tokens_col), F.concat_ws("\x1f", *keys))
    return (
        df.withColumn("__c", packed)
        .withColumn("corrupt_inputs", F.try_element_at("__c", F.lit(1)))
        .withColumn("corrupt_targets", F.try_element_at("__c", F.lit(2)))
        .drop("__c")
    )
