"""Exact substring deduplication: duplicated token-window detection and
span removal — the "ExactSubstr" mode of Lee et al., *Deduplicating
Training Data Makes Language Models Better* (2021), re-expressed as
DataFrame ops.

Doc-level dedup (operators/dedup.py) removes whole near-identical
documents; this operator removes *repeated passages* — license headers,
navigation chrome, quoted boilerplate — that recur verbatim across (or
within) otherwise-distinct documents.  The reference engine has no such
operator (pure relational surface, `rust/core/proto/ballista.proto`);
this exists because a 100 TB training-data pipeline needs it.

Semantics (matching the paper's, with a window instead of a suffix
array): every ``w``-token window whose exact text occurs ``min_count``
or more times in the corpus is *duplicated*; every occurrence except the
globally-first (min ``(key, pos)``) is removable.  Removable windows
within a document are merged into maximal spans (overlapping or
adjacent), and :func:`strip_duplicated_spans` rebuilds the text without
the spanned tokens.  A duplicated passage of length L ≥ w is covered by
L - w + 1 duplicated windows, so whole repeated passages are removed
while their first occurrence survives — the paper's guarantee.

Scale design (100 TB / 1000 executors): the suffix array the paper
builds does not distribute; the Spark-native shape is

1. *window hashing* — per-doc token arrays widened to w-token window
   strings by O(log w) whole-array ``zip_with`` doubling passes (NOT a
   per-position ``slice`` transform, which re-evaluates the tokenizer
   per element and measured O(len²) — see BASELINE.md's interpreted-HOF
   lesson), then md5-hashed (128-bit: no collision management needed at
   any corpus size, and DuckDB/any engine reproduces the hex digest).
2. *one shuffle keyed by window hash* computes each window's occurrence
   count and canonical (first) occurrence as a groupBy(gh) joined back
   to the occurrences — map-side partial aggregation collapses
   same-partition repeats of hot hashes first, both sides share ONE
   reused exchange (Spark ReuseExchange), and a corpus-wide boilerplate
   hash streams through (and can be AQE-skew-split in) the join-back
   instead of pinning a single Window partition.  This is the inherent
   cost of exact substring dedup: one corpus-token-sized shuffle.
   ``stride`` > 1 divides the shuffled row count ~stride-fold
   by keeping only windows whose content hash ≡ 0 (mod stride) —
   selection depends on window CONTENT alone, so every occurrence of a
   duplicated passage selects the same windows and a passage with m
   windows is missed with probability ~((stride-1)/stride)^m regardless
   of how its occurrences are aligned.  (A positional grid — every
   stride-th position — would silently miss passages whose occurrence
   offsets differ mod stride.)
3. *one shuffle keyed by doc* merges removable windows into spans
   (sort-free gaps-and-islands: equal-width intervals sorted by start
   have sorted ends, so a lag comparison finds island breaks).

No broadcasts, no self-joins, no n² pair space anywhere — every stage
is a keyed shuffle whose volume is input-sized or output-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_spark.operators.dedup import _parallelized, _tokens

#: Lee et al. use 50 BPE tokens; 50 whitespace tokens is the analogue.
DEFAULT_WINDOW = 50


def _with_window_strings(
    df: DataFrame, text_col: str, key_col: str, w: int, out_col: str
) -> DataFrame:
    """(key, ``out_col``) where ``out_col[i] = toks[i..i+w-1]`` joined by
    ' ' for ``i in 1..len-w+1`` — the w-token window-string array, built
    whole-array by binary doubling: power-of-two width arrays
    ``g_{2p}[i] = g_p[i] || ' ' || g_p[i+p]`` (one ``zip_with`` each),
    then the binary decomposition of ``w`` composed the same way —
    O(log w) array passes per document instead of O(w) per position.

    Every doubling level lands in its own materialized column: each
    level references the previous one TWICE, and an expression subtree
    referenced twice is *evaluated* twice per row in Spark's interpreted
    higher-order-function path — O(w) re-evaluations of the tokenizer by
    the time the tree bottoms out (measured 9 s for 270k tokens at w=50;
    sub-second with the column chain).  ``CollapseProject`` keeps the
    chain apart because the multiply-referenced aliases are non-cheap
    (SPARK-36718); the same discipline as lm.py's ``_gram_orders``.
    Every intermediate is pre-sliced so ``zip_with`` never pads.
    """
    toks = _tokens(text_col)
    # every level's expression is handed to the SQL parser as ONE string
    # (r10, the operators/text.py discipline — ~15 Column-API py4j
    # round-trips per level otherwise); parsed trees compute identical
    # values, pinned by tests/test_substr.py
    base = (
        _parallelized(df, key_col)
        .where(F.size(toks) >= w)
        .select(F.col(key_col).alias("key"), toks.alias("__t1"))
    )
    if w == 1:
        return base.withColumnRenamed("__t1", out_col)
    p = 1
    while p * 2 <= w:
        n = f"greatest(size(__t{p}) - {p}, 0)"
        base = base.withColumn(
            f"__t{p * 2}",
            F.expr(
                f"zip_with(slice(__t{p}, 1, {n}), slice(__t{p}, {p + 1}, {n}),"
                f" (x, y) -> concat_ws(' ', x, y))"
            ),
        )
        p *= 2
    target = f"greatest(size(__t1) - {w - 1}, 0)"
    out = None
    offset = 0  # tokens already composed into `out`
    pw = p
    while pw >= 1:
        if ((w - offset) & pw) != 0:  # pw is in w's binary decomposition
            piece = f"slice(__t{pw}, {offset + 1}, {target})"
            # single reference to each operand -> evaluated once per row
            out = (
                piece
                if out is None
                else f"zip_with({out}, {piece}, (x, y) -> concat_ws(' ', x, y))"
            )
            offset += pw
        pw //= 2
    return base.withColumn(out_col, F.expr(out)).select("key", out_col)


def window_occurrences(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    w: int = DEFAULT_WINDOW,
    stride: int = 1,
) -> DataFrame:
    """(key, pos, gh) — md5 of the ``w``-token windows, content-sampled.

    ``pos`` is the 1-based token index of the window start.  With
    ``stride`` > 1 only windows whose 60-bit hash prefix ≡ 0 (mod
    stride) survive — sampling by CONTENT, so both occurrences of a
    duplicated passage keep the same ~1/stride of its windows (a
    positional grid would require the occurrences' offsets to agree mod
    stride).  The hashing itself is full-scan either way; what stride
    buys is the expensive part — the corpus-token-sized shuffle.
    """
    base = _with_window_strings(df, text_col, key_col, w, "__ws")
    hashed = F.expr("transform(__ws, s -> md5(s))")
    occ = base.select(
        "key", F.posexplode(hashed).alias("p0", "gh")
    ).select("key", (F.col("p0") + 1).alias("pos"), "gh")
    if stride == 1:
        return occ
    from ballista_spark.operators.hashing import hex15_long

    return occ.where(hex15_long("gh") % stride == 0)


def duplicated_window_spans(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    w: int = DEFAULT_WINDOW,
    min_count: int = 2,
    stride: int = 1,
    bridge: int | None = None,
) -> DataFrame:
    """Maximal removable spans: (key, span_start, span_end, n_windows).

    A window is removable when its exact text occurs >= ``min_count``
    times corpus-wide AND it is not the globally-first occurrence
    (min ``(key, pos)``) — so exactly one copy of every duplicated
    passage survives, including self-repeats within one document.
    Overlapping/adjacent removable windows merge into one span
    ``[span_start, span_end]`` (1-based token indices, inclusive).

    **Stride sampling strips partially.** With ``stride`` > 1 a
    duplicated passage is detected via its content-sampled windows only:
    spans start at the first *sampled* window and end w-1 past the last,
    so up to ~``stride-1`` boundary tokens of the passage survive the
    strip at each end, and a sampling gap wider than the island
    tolerance splits one passage into multiple spans with unstripped
    interior stretches.  ``bridge`` (default ``3*(stride-1)``, i.e. 0 —
    exact semantics — at stride=1) widens the island-merge tolerance
    from ``w`` to ``w + bridge`` so consecutive sampled windows of one
    passage with a typical geometric gap (~mean ``stride``) still merge;
    the boundary-token remainder is inherent to sampling and documented
    rather than hidden.  Exactness requires ``stride=1``.
    """
    if bridge is None:
        bridge = 3 * (stride - 1)
    # Per-hash occurrence count + canonical-first occurrence via
    # groupBy(gh) + join-back on gh, NOT Window.partitionBy(gh): a
    # corpus-wide boilerplate window (a license header repeated 1e8
    # times) makes one hash's partition unboundedly hot, and WindowExec
    # must BUFFER its whole partition (memory/spill hot spot) while a
    # hash-aggregate and a sort-merge probe both *stream* a hot key in
    # constant memory.  The explicit repartition(gh) satisfies the
    # required distribution of BOTH consumers with one identical
    # exchange subtree, so ReuseExchange executes the corpus-token-sized
    # shuffle (and the tokenize+md5 window hashing feeding it) exactly
    # ONCE (asserted in test_substr.py) — same shuffle volume as the old
    # Window, none of its buffering.
    occ = window_occurrences(df, text_col, key_col, w, stride).repartition("gh")
    agg = (
        occ.groupBy("gh")
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.struct("key", "pos")).alias("canon"),
        )
        .where(F.col("cnt") >= min_count)
        .select("gh", "canon")
    )
    rem = (
        occ.join(agg, "gh")
        .where(
            ~(
                (F.col("key") == F.col("canon.key"))
                & (F.col("pos") == F.col("canon.pos"))
            )
        )
        .select("key", "pos")
    )
    # equal-width intervals sorted by start have sorted ends -> islands
    # break exactly where the gap to the previous start exceeds w
    # (pos = prev + w is adjacent: [prev, prev+w-1] ++ [prev+w, ...]);
    # `bridge` widens the tolerance for stride-sampled windows (above).
    win = Window.partitionBy("key").orderBy("pos")
    flagged = rem.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(win) > w + bridge, 1).otherwise(0),
    ).withColumn("island", F.sum("brk").over(win))
    return (
        flagged.groupBy("key", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(w - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select("key", "span_start", "span_end", "n_windows")
    )


def strip_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    w: int = DEFAULT_WINDOW,
    min_count: int = 2,
    stride: int = 1,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Input plus ``text_dedup`` (spanned tokens removed, space-rejoined)
    and ``n_tokens_removed``.

    One left shuffle-join of the corpus against the per-doc span lists
    (span lists are output-sized << corpus-sized; AQE may broadcast when
    small, the plan never requires it); token filtering is a whole-array
    expression against the few spans of that document.  Pass a
    precomputed :func:`duplicated_window_spans` frame via ``spans`` when
    the caller also needs the span geometry — the window-hash shuffle is
    the expensive stage, and recomputing it here would double it (the
    ``decontaminate(stats=)`` reuse pattern).
    """
    if spans is None:
        spans = duplicated_window_spans(df, text_col, key_col, w, min_count, stride)
    per_doc = spans.groupBy("key").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    ).withColumnRenamed("key", "__sd_key")
    # SQL-text construction (one parse per projection — see
    # _with_window_strings); values identical, pinned by test_substr.py
    kept = (
        f"filter(transform(split(trim(`{text_col}`), ' '),"
        f" (t, i) -> named_struct('t', t, 'i', i + 1)),"
        f" s -> NOT exists(__spans,"
        f" sp -> s.i >= sp.span_start AND s.i <= sp.span_end))"
    )
    removed = (
        "aggregate(__spans, cast(0 as bigint),"
        " (acc, sp) -> acc + (sp.span_end - sp.span_start + 1))"
    )
    return (
        df.join(per_doc, F.col(key_col) == F.col("__sd_key"), "left")
        .withColumn(
            "text_dedup",
            F.expr(
                f"CASE WHEN __sd_key IS NULL THEN `{text_col}`"
                f" ELSE concat_ws(' ', transform({kept}, s -> s.t)) END"
            ),
        )
        .withColumn(
            "n_tokens_removed",
            F.expr(f"coalesce({removed}, cast(0 as bigint))"),
        )
        .drop("__sd_key", "__spans")
    )
