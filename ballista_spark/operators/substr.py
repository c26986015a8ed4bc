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
   count and canonical (first) occurrence — map-side partial
   aggregation collapses same-partition repeats first.  This is the
   inherent cost of exact substring dedup: one corpus-token-sized
   shuffle.  ``stride`` > 1 divides the shuffled row count by emitting
   every stride-th window only (detects duplicated passages of length
   ≥ w + stride - 1 instead of ≥ w).
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


def _window_strings(toks: F.Column, w: int) -> F.Column:
    """Array of ``w``-token window strings (space-joined), whole-array.

    ``out[i] = toks[i] || ' ' || ... || toks[i+w-1]`` for
    ``i in 1..len-w+1``, built by binary doubling: power-of-two width
    arrays ``g_{2p}[i] = g_p[i] || ' ' || g_p[i+p]`` (one ``zip_with``
    each), then the binary decomposition of ``w`` composed the same way
    — O(log w) array passes per document instead of O(w) per position.
    Every intermediate is pre-sliced to the final ``len-w+1`` length so
    ``zip_with`` never pads.
    """
    if w == 1:
        return toks
    target = F.greatest(F.size(toks) - F.lit(w - 1), F.lit(0))
    join2 = lambda x, y: F.concat_ws(" ", x, y)  # noqa: E731
    pows = {1: toks}
    p = 1
    while p * 2 <= w:
        a = pows[p]
        n = F.greatest(F.size(a) - F.lit(p), F.lit(0))
        pows[p * 2] = F.zip_with(F.slice(a, 1, n), F.slice(a, p + 1, n), join2)
        p *= 2
    out = None
    offset = 0  # tokens already composed into `out`
    for pw in sorted(pows, reverse=True):
        if ((w - offset) & pw) == 0:
            continue  # not part of w's binary decomposition at this offset
        piece = F.slice(pows[pw], offset + 1, target)
        out = piece if out is None else F.zip_with(out, piece, join2)
        offset += pw
    return out


def window_occurrences(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    w: int = DEFAULT_WINDOW,
    stride: int = 1,
) -> DataFrame:
    """(key, pos, gh) — md5 of every ``stride``-th ``w``-token window.

    ``pos`` is the 1-based token index of the window start.  md5 is
    applied *after* striding so a stride-s scan hashes 1/s of the
    windows.
    """
    toks = _tokens(text_col)
    ws = _window_strings(toks, w)
    if stride == 1:
        hashed = F.transform(ws, lambda s: F.md5(s))
        pairs = F.posexplode(hashed).alias("p0", "gh")
        pos = (F.col("p0") * stride + 1).alias("pos")
    else:
        idx = F.sequence(F.lit(1), F.greatest(F.size(ws), F.lit(1)), F.lit(stride))
        hashed = F.transform(idx, lambda i: F.md5(F.element_at(ws, i)))
        pairs = F.posexplode(hashed).alias("p0", "gh")
        pos = (F.col("p0") * stride + 1).alias("pos")
    return (
        _parallelized(df, key_col)
        .where(F.size(toks) >= w)
        .select(F.col(key_col).alias("key"), pairs)
        .select("key", pos, "gh")
    )


def duplicated_window_spans(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    w: int = DEFAULT_WINDOW,
    min_count: int = 2,
    stride: int = 1,
) -> DataFrame:
    """Maximal removable spans: (key, span_start, span_end, n_windows).

    A window is removable when its exact text occurs >= ``min_count``
    times corpus-wide AND it is not the globally-first occurrence
    (min ``(key, pos)``) — so exactly one copy of every duplicated
    passage survives, including self-repeats within one document.
    Overlapping/adjacent removable windows merge into one span
    ``[span_start, span_end]`` (1-based token indices, inclusive).
    """
    occ = window_occurrences(df, text_col, key_col, w, stride)
    stats = occ.groupBy("gh").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct("key", "pos")).alias("canon"),
    )
    rem = (
        occ.join(stats.where(F.col("cnt") >= min_count), "gh")
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
    # (pos = prev + w is adjacent: [prev, prev+w-1] ++ [prev+w, ...]).
    win = Window.partitionBy("key").orderBy("pos")
    flagged = rem.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(win) > w, 1).otherwise(0),
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
) -> DataFrame:
    """Input plus ``text_dedup`` (spanned tokens removed, space-rejoined)
    and ``n_tokens_removed``.

    One left shuffle-join of the corpus against the per-doc span lists
    (span lists are output-sized << corpus-sized; AQE may broadcast when
    small, the plan never requires it); token filtering is a whole-array
    expression against the few spans of that document.
    """
    spans = duplicated_window_spans(df, text_col, key_col, w, min_count, stride)
    per_doc = spans.groupBy("key").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    ).withColumnRenamed("key", "__sd_key")
    toks = _tokens(text_col)
    indexed = F.transform(toks, lambda t, i: F.struct(t.alias("t"), (i + 1).alias("i")))
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] <= sp["span_end"]),
        ),
    )
    removed = F.aggregate(
        "__spans",
        F.lit(0).cast("long"),
        lambda acc, sp: acc + (sp["span_end"] - sp["span_start"] + F.lit(1)),
    )
    return (
        df.join(per_doc, F.col(key_col) == F.col("__sd_key"), "left")
        .withColumn(
            "text_dedup",
            F.when(F.col("__sd_key").isNull(), F.col(text_col)).otherwise(
                F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
            ),
        )
        .withColumn("n_tokens_removed", F.coalesce(removed, F.lit(0).cast("long")))
        .drop("__sd_key", "__spans")
    )
