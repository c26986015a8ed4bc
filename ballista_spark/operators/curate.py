"""End-to-end corpus curation: the standard web-scale training-data
recipe composed from this package's operators, in the canonical order the
public pipelines run it (C4's heuristics, CCNet's LM filter, Gopher's
repetition rules, RefinedWeb's dedup-first ordering):

0. URL blocklist filter           (operators.url.filter_blocked_domains —
                                   before any text work: the cheapest
                                   drop, and published pipelines
                                   (RefinedWeb/FineWeb + UT1) gate on
                                   the source domain first)
1. line-level boilerplate removal (operators.text.remove_boilerplate —
                                   first text stage, so dedup sees
                                   de-chromed text)
2. exact dedup                    (operators.dedup.exact_dedup)
3. near-dup MinHash LSH + cluster resolution, one survivor per cluster
                                  (minhash_lsh_pairs + resolve_duplicates)
3b. corpus-wide paragraph dedup   (operators.text.dedup_spans_corpus —
                                   keep-first; coarser than the window
                                   strip below, finer than whole-doc
                                   dedup, the RefinedWeb ordering)
4. exact substring dedup — repeated-passage strip, first occurrence kept
                                  (operators.substr.strip_duplicated_spans;
                                   after doc-level dedup so surviving docs
                                   don't donate removable windows, before
                                   the token band so emptied docs get
                                   dropped by the band)
5. heuristic gates: token-count band, duplicate-n-gram fraction,
   zlib compression-ratio band    (operators.text, operators.quality)
6. language filter                (operators.text.lang_id)
7. benchmark decontamination      (operators.decontam.decontaminate,
                                   + optional fuzzy MinHash pass via
                                   decontaminate_fuzzy)
8. LM perplexity filter           (operators.lm)
9. classifier quality filter      (operators.quality)
10. contiguous sequence packing   (operators.dataset.pack_contiguous)

Every stage is optional (None disables it).  Stage boundaries are
``localCheckpoint``-truncated: five of the stages self-join the corpus
(``df.join(f(df))`` — dedup resolution, decontamination, LM and
classifier scoring), so a naively chained logical plan DOUBLES per such
stage (~32x the MinHash literal-heavy subtree by the end) and the
driver dies rendering/optimizing the tree — measured as a driver OOM at
toy scale.  Checkpointing keeps every stage's plan constant-size at the
cost of materializing stage outputs in executor storage; a production
100 TB run should swap the boundary for a parquet write (same
discipline, durable, and resumable per stage).

``count_stages=True`` (the default, meant for interactive runs) also
runs one count job per enabled stage for the report; production runs
should pass ``count_stages=False`` and read counts off the final
write's metrics.  Every composed operator keeps its own scale contract
(no corpus-sized broadcasts, capped bucket expansion, two-level
prefix-sum packing).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballista_spark.operators.dataset import pack_contiguous
from ballista_spark.operators.decontam import decontaminate
from ballista_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    resolve_duplicates,
)
from ballista_spark.operators.lm import NgramLM, _tokens, ngram_lm_fit, perplexity_filter
from ballista_spark.operators.quality import LogRegModel, quality_classifier_score
from ballista_spark.operators.text import (
    dup_ngram_fraction,
    lang_id,
    remove_boilerplate,
)


class CurationReport(NamedTuple):
    """Result of :func:`curate_corpus`.

    ``docs``: the curated corpus (input columns, plus ``quality_prob``
    when a classifier ran).  ``packed``: the packed layout (or None).
    ``stage_counts``: surviving-document count after each enabled stage,
    in execution order (empty when ``count_stages=False``).
    """

    docs: DataFrame
    packed: DataFrame | None
    stage_counts: dict[str, int]


def curate_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    url_blocklist: DataFrame | Sequence[str] | None = None,
    url_col: str = "url",
    boilerplate_max_docs: int | None = None,
    boilerplate_delim: str = "\n",
    exact: bool = True,
    near_dup_threshold: float | None = 0.8,
    span_dedup_min_count: int | None = None,
    span_dedup_delim: str = "\n",
    substr_window: int | None = None,
    substr_min_count: int = 2,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    max_dup_ngram_fraction: float | None = None,
    compression_band: tuple[float, float] | None = None,
    languages: Sequence[str] | None = None,
    benchmark: DataFrame | None = None,
    max_contamination: float = 0.2,
    fuzzy_contamination_threshold: float | None = None,
    lm_model: NgramLM | None = None,
    max_ppl: float | None = None,
    lm_fit_n: int = 3,
    quality_model: LogRegModel | None = None,
    min_quality: float | None = None,
    pack_seq_len: int | None = None,
    count_stages: bool = True,
) -> CurationReport:
    """Run the curation chain over ``docs`` and return the survivors.

    Filters are applied in the documented stage order; a stage runs only
    when its controlling parameter is set (``near_dup_threshold=None``
    skips near-dup, ``benchmark=None`` skips decontamination,
    ``max_ppl=None`` skips the LM stage, ...).  When ``max_ppl`` is set
    but ``lm_model`` is None, a stupid-backoff model of order
    ``lm_fit_n`` is fit on the corpus as it stands at that stage (the
    CCNet in-domain convention is to pass a model fit on a trusted
    corpus instead).
    """
    counts: dict[str, int] = {}

    def advance(kept: DataFrame, stage: str) -> DataFrame:
        # truncate lineage at every stage boundary (see module docstring);
        # lazy unless counting, so a count-free run still defers execution
        kept = kept.localCheckpoint(eager=count_stages)
        if count_stages:
            counts[stage] = kept.count()
        return kept

    # the input is a bare scan — nothing to truncate, and checkpointing it
    # would materialize a full corpus copy in executor storage for free
    kept = docs
    if count_stages:
        counts["input"] = kept.count()

    # URL gate runs before any text work: one suffix equi-join, and every
    # downstream (CPU-heavy) stage sees only allowed-domain documents
    if url_blocklist is not None:
        from ballista_spark.operators.url import filter_blocked_domains

        kept = advance(
            filter_blocked_domains(kept, url_col, key_col, url_blocklist),
            "url_blocklist",
        )

    # boilerplate stripping runs FIRST (the C4 ordering): cleaning rewrites
    # the text, so dedup/gates/LM all see the de-chromed documents and two
    # pages differing only in navigation chrome deduplicate correctly
    if boilerplate_max_docs is not None:
        kept = advance(
            remove_boilerplate(
                kept, text_col, key_col,
                delim=boilerplate_delim, max_docs=boilerplate_max_docs,
            ).drop("n_spans", "n_kept"),
            "boilerplate",
        )

    if exact:
        kept = advance(
            exact_dedup(kept, text_col, key_col)
            .where("is_canonical")
            .drop("content_hash", "is_canonical"),
            "exact_dedup",
        )

    if near_dup_threshold is not None:
        pairs = minhash_lsh_pairs(
            kept, text_col, key_col, threshold=near_dup_threshold
        )
        kept = advance(
            resolve_duplicates(kept, pairs, key_col)
            .where("is_canonical")
            .drop("component", "is_canonical"),
            "near_dup",
        )

    # corpus-wide keep-first paragraph dedup: coarser than the window
    # strip (whole delimited spans), finer than doc-level dedup; rewrites
    # text, so NULL-text docs must ride through (n_spans is NULL exactly
    # for NULL input text — used to restore NULL instead of '')
    if span_dedup_min_count is not None:
        from ballista_spark.operators.text import dedup_spans_corpus

        kept = advance(
            dedup_spans_corpus(
                kept, text_col, key_col,
                delim=span_dedup_delim, min_count=span_dedup_min_count,
            )
            .withColumn(
                text_col,
                F.when(F.col("n_spans").isNull(), F.lit(None)).otherwise(
                    F.col(text_col)
                ),
            )
            .drop("n_spans", "n_kept")
            .where(F.col(text_col).isNull() | (F.trim(F.col(text_col)) != "")),
            "span_dedup",
        )

    # repeated-passage strip rewrites the text (like boilerplate removal)
    # rather than dropping documents — except docs the strip EMPTIES
    # (all-duplicated content), which are dropped here: the token band
    # below is optional, and an empty-text row must not reach the LM /
    # classifier / packing stages
    if substr_window is not None:
        from ballista_spark.operators.substr import strip_duplicated_spans

        kept = advance(
            strip_duplicated_spans(
                kept, text_col, key_col, w=substr_window, min_count=substr_min_count
            )
            .withColumn(text_col, F.col("text_dedup"))
            .drop("text_dedup", "n_tokens_removed")
            # NULL-preserving: the rest of the chain tolerates NULL text
            # (exact_dedup's NULL guard), so enabling substr_window must
            # not silently drop NULL-text docs — only strip-emptied ones
            .where(F.col(text_col).isNull() | (F.trim(F.col(text_col)) != "")),
            "substr_dedup",
        )

    # token accounting uses the SAME whitespace-run tokenizer as the LM,
    # classifier and BM25 stages (lm._tokens: trim + \\s+ + empty filter),
    # NOT text.token_count's oracle-facing single-space split — otherwise
    # a tab/newline-separated doc passes the band with count 1 and the
    # packed windows are sized from wrong counts
    if min_tokens is not None or max_tokens is not None:
        nt = F.size(_tokens(text_col))
        cond = F.lit(True)
        if min_tokens is not None:
            cond = cond & (nt >= min_tokens)
        if max_tokens is not None:
            cond = cond & (nt <= max_tokens)
        kept = advance(kept.where(cond), "token_band")

    if max_dup_ngram_fraction is not None:
        kept = advance(
            kept.where(dup_ngram_fraction(text_col) <= max_dup_ngram_fraction),
            "repetition",
        )

    # compressibility band: drops both tails (templated spam compresses
    # too well, binary/noise too poorly); NULL-ratio docs (NULL/empty
    # text) ride through, consistent with the chain's NULL tolerance
    if compression_band is not None:
        from ballista_spark.operators.quality import compression_ratio

        lo_cr, hi_cr = compression_band
        cr = compression_ratio(text_col)
        kept = advance(
            kept.where(cr.isNull() | ((cr >= lo_cr) & (cr <= hi_cr))),
            "compression",
        )

    if languages is not None:
        kept = advance(
            kept.where(lang_id(text_col).isin(list(languages))), "language"
        )

    if benchmark is not None:
        kept = advance(
            decontaminate(
                kept, benchmark, max_contamination, text_col, key_col
            ),
            "decontam",
        )
        # the fuzzy pass complements the exact one: whole-doc paraphrase
        # keeps jaccard high while its exact n-gram overlap fraction sinks
        if fuzzy_contamination_threshold is not None:
            from ballista_spark.operators.decontam import decontaminate_fuzzy

            kept = advance(
                decontaminate_fuzzy(
                    kept, benchmark, fuzzy_contamination_threshold,
                    text_col, key_col,
                ),
                "fuzzy_decontam",
            )

    if max_ppl is not None:
        model = lm_model or ngram_lm_fit(kept, text_col, n=lm_fit_n)
        kept = advance(
            perplexity_filter(kept, model, max_ppl, text_col, key_col), "lm_ppl"
        )

    if min_quality is not None:
        if quality_model is None:
            raise ValueError("min_quality requires quality_model")
        kept = advance(
            quality_classifier_score(
                kept, quality_model, text_col, key_col
            ).where(F.col("quality_prob") >= min_quality),
            "quality",
        )

    packed = None
    if pack_seq_len is not None:
        packed = pack_contiguous(
            kept.withColumn("__nt", F.size(_tokens(text_col))),
            "__nt",
            key_col,
            pack_seq_len,
        ).drop("__nt")
        if count_stages:
            mx = packed.agg(F.max("pack_last")).collect()[0][0]
            counts["packed_windows"] = 0 if mx is None else int(mx) + 1

    return CurationReport(kept, packed, counts)
