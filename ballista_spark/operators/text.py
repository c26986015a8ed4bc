"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Everything is a pure JVM Column expression (split / higher-order array
functions / integer arithmetic) so the operators whole-stage-codegen and
scale linearly — no Python UDFs.  The formulas are deliberately
integer/exact-division based so a SQL oracle can reproduce them bit-for-bit
on another engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "y"],
    "zh": ["de", "shi", "le"],
}

_M31 = 2_147_483_647  # 2^31 - 1
_PHI = 2_654_435_761  # Knuth multiplicative constant


def _tokens(text) -> F.Column:
    return F.split(F.trim(F.col(text) if isinstance(text, str) else text), " ")


#: Plan-build cost note (r10, guide §1/§4): every ``F.xxx`` Column call is
#: one or more py4j round-trips, and the composite metrics below chain
#: dozens of them — measured 30-80 ms of pure *driver-side expression
#: construction* per metric per query build (fingerprint 38 ms, quality
#: 80 ms), vs ~1 ms to hand the same expression to the SQL parser as ONE
#: string.  The hot operators therefore build their expression as SQL
#: text when given a plain column *name* (the common case) and fall back
#: to the Column API for Column inputs.  The two forms parse to identical
#: expression trees (literal suffixes ``L``/``D`` pin the same types the
#: Column API produced); tests assert exact result equality.


def _tokens_sql(name: str) -> str:
    return f"split(trim({name}), ' ')"


def token_count_sql(toks: str) -> str:
    """SQL text of :func:`token_count` over a token-array expression —
    callers that compute several metrics can materialize the array once
    and pass its column name (one tokenization instead of one per metric)."""
    return f"cast(size({toks}) as bigint)"


def token_count(text="text") -> F.Column:
    """Whitespace token count (BIGINT)."""
    if isinstance(text, str):
        return F.expr(token_count_sql(_tokens_sql(text)))
    return F.size(_tokens(text)).cast("bigint")


def _substr_count(padded: F.Column, needle: str) -> F.Column:
    """Non-overlapping substring occurrence count via replace-length."""
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def _stopword_hits_sql(name: str, words: list[str]) -> str:
    padded = f"concat(' ', trim({name}), ' ')"
    terms = " + ".join(
        f"cast((length(__pad) - length(replace(__pad, ' {w} ', ''))) / {len(w) + 2} as bigint)"
        for w in words
    )
    # one shared padded value via a lateral-style aggregate trick is not
    # available in a scalar expression; inline the padded expr per term
    # exactly as the Column form re-evaluates it (codegen CSEs it anyway)
    return f"(cast(0 as bigint) + {terms})".replace("__pad", padded)


def stopword_hits(text, words: list[str]) -> F.Column:
    """Count of token-bounded occurrences of any word in ``words``."""
    if isinstance(text, str):
        return F.expr(_stopword_hits_sql(text, words))
    padded = F.concat(F.lit(" "), F.trim(F.col(text) if isinstance(text, str) else text), F.lit(" "))
    out = F.lit(0).cast("bigint")
    for w in words:
        out = out + _substr_count(padded, f" {w} ")
    return out


def quality_score(text="text") -> F.Column:
    """Composite quality score in [0, ~2]: token-length sanity + stopword
    presence + length band.  Deterministic double arithmetic (exact integer
    inputs, one division per term)."""
    if isinstance(text, str):
        return F.expr(quality_score_sql(text, _tokens_sql(text)))
    col = text
    ntok = token_count(text)
    nchar = F.length(col).cast("bigint")
    avg_tok_len = (nchar - ntok + 1).cast("double") / ntok.cast("double")
    stop_ratio = stopword_hits(text, LANG_STOPWORDS["en"]).cast("double") / ntok.cast("double")
    len_band = (
        F.when((nchar >= 100) & (nchar <= 2000), F.lit(1.0))
        .when(nchar >= 50, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    tok_band = (
        F.when((avg_tok_len >= 3.0) & (avg_tok_len <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    )
    return len_band * 0.4 + tok_band * 0.3 + stop_ratio * 0.3


def quality_score_sql(text: str, toks: str) -> str:
    """SQL text of :func:`quality_score` over (text column, token-array
    expression) — see :func:`token_count_sql` for the materialize-once
    pattern."""
    ntok = f"{token_count_sql(toks)}"
    nchar = f"cast(length({text}) as bigint)"
    avg_tok_len = f"(cast((({nchar}) - ({ntok})) + 1L as double) / cast({ntok} as double))"
    stop_ratio = (
        f"(cast({_stopword_hits_sql(text, LANG_STOPWORDS['en'])} as double)"
        f" / cast({ntok} as double))"
    )
    len_band = (
        f"(CASE WHEN ({nchar}) >= 100L AND ({nchar}) <= 2000L THEN 1.0D"
        f" WHEN ({nchar}) >= 50L THEN 0.5D ELSE 0.0D END)"
    )
    tok_band = (
        f"(CASE WHEN {avg_tok_len} >= 3.0D AND {avg_tok_len} <= 10.0D"
        f" THEN 1.0D ELSE 0.5D END)"
    )
    return f"{len_band} * 0.4D + {tok_band} * 0.3D + {stop_ratio} * 0.3D"


def lang_id(text="text") -> F.Column:
    """Stopword-list language ID with fixed precedence tie-break (en > fr >
    de > es > zh).  Exact integer scores → deterministic prediction.

    Column-name inputs take the SQL-text construction path (one parse
    instead of ~60 py4j round-trips — see the module note above); the
    two forms parse to the same expression tree."""
    if isinstance(text, str):
        return F.expr(lang_id_sql(text))
    scores = {lang: stopword_hits(text, ws) for lang, ws in LANG_STOPWORDS.items()}
    order = list(LANG_STOPWORDS)
    expr = None
    for i, lang in enumerate(order):
        cond = None
        for other in order[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        for prev in order[:i]:
            c = scores[lang] > scores[prev]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(F.lit(order[0]))


def lang_id_sql(text: str) -> str:
    """SQL text of :func:`lang_id` over a text column name — the same
    precedence CASE chain the Column form builds."""
    scores = {
        lang: f"({_stopword_hits_sql(text, ws)})"
        for lang, ws in LANG_STOPWORDS.items()
    }
    order = list(LANG_STOPWORDS)
    whens = []
    for i, lang in enumerate(order):
        conds = [f"{scores[lang]} >= {scores[other]}" for other in order[i + 1 :]]
        conds += [f"{scores[lang]} > {scores[prev]}" for prev in order[:i]]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"CASE {' '.join(whens)} ELSE '{order[0]}' END"


def fingerprint(text="text") -> F.Column:
    """Position-weighted rolling document fingerprint (BIGINT).

    fp = SUM_i ((i * PHI + tokval(t_i)) mod M31) mod M31 with
    tokval = (len*65599 + 256*ascii(first) + ascii(last)) mod M31 — exact
    integer arithmetic reproducible in any ANSI SQL engine (the oracle
    recomputes it verbatim); order-aware yet commutative-sum based, so the
    aggregation parallelizes without an ordered fold."""
    if isinstance(text, str):
        return F.expr(fingerprint_sql(_tokens_sql(text)))
    toks = _tokens(text)
    terms = F.transform(
        toks,
        lambda x, i: (
            (i + 1) * F.lit(_PHI)
            + (
                F.length(x) * 65599
                + F.ascii(F.substring(x, 1, 1)) * 256
                + F.ascii(F.substring(x, -1, 1))
            )
            % _M31
        )
        % _M31,
    )
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (total % _M31).cast("bigint")


def fingerprint_sql(toks: str) -> str:
    """SQL text of :func:`fingerprint` over a token-array expression."""
    term = (
        f"((i + 1) * {_PHI}L + (length(x) * 65599 + "
        f"ascii(substring(x, 1, 1)) * 256 + ascii(substring(x, -1, 1)))"
        f" % {_M31}) % {_M31}L"
    )
    return (
        f"cast(aggregate(transform({toks}, (x, i) -> {term}),"
        f" cast(0 as bigint), (acc, x) -> acc + x) % {_M31}L as bigint)"
    )


def dup_ngram_fraction(text="text", n: int = 2) -> F.Column:
    """Within-document repetition: fraction of word n-grams that are
    repeats of an earlier n-gram (DOUBLE in [0, 1)).

    The Gopher/C4-style repetition quality filter — boilerplate and
    templated spam score high, prose scores near 0.  Computed as
    ``(total_ngrams - distinct_ngrams) / total_ngrams`` entirely in array
    expressions so it stays JVM-side and is reproducible bit-for-bit by a
    SQL oracle (exact integer counts, one final division).  The n-gram
    array is built from ``n`` whole-array slices zipped together — O(n)
    array passes per document — NOT a per-position ``transform`` over
    per-gram ``slice`` calls, which is O(L·n) allocations and measured 3.5×
    slower at sf0.1.  Documents with fewer than ``n`` tokens score 0.0.
    """
    if isinstance(text, str):
        return F.expr(dup_ngram_fraction_sql(_tokens_sql(text), n))
    toks = _tokens(text)
    m = (F.size(toks) - F.lit(n - 1)).cast("bigint")
    mc = F.greatest(m, F.lit(0)).cast("int")
    # grams[i] = toks[i] + " " + toks[i+1] + ... + toks[i+n-1]; all slices
    # share length mc, so zip_with never pads
    grams = F.slice(toks, 1, mc)
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, mc),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    dup = (F.size(grams) - F.size(F.array_distinct(grams))).cast("double")
    return F.when(m >= 1, dup / m.cast("double")).otherwise(F.lit(0.0))


def dup_ngram_fraction_sql(toks: str, n: int = 2) -> str:
    """SQL text of :func:`dup_ngram_fraction` over a token-array expression."""
    m_s = f"cast(size({toks}) - {n - 1} as bigint)"
    mc_s = f"cast(greatest({m_s}, 0L) as int)"
    grams_s = f"slice({toks}, 1, {mc_s})"
    for k in range(1, n):
        grams_s = (
            f"zip_with({grams_s}, slice({toks}, {k + 1}, {mc_s}),"
            f" (a, b) -> concat_ws(' ', a, b))"
        )
    dup_s = f"cast(size({grams_s}) - size(array_distinct({grams_s})) as double)"
    return (
        f"CASE WHEN {m_s} >= 1L THEN {dup_s} / cast({m_s} as double)"
        f" ELSE 0.0D END"
    )


#: GPT-2-ish pretokenizer classes: letter runs, digit runs, punctuation runs
BPE_TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^ a-zA-Z0-9]+"


def token_count_regex(text="text", pattern: str = BPE_TOKEN_PATTERN) -> F.Column:
    """BPE-style pretokenizer count (letter/digit/punct runs) — the
    "whitespace + BPE-ish regex" token counter; RE2-compatible pattern so
    SQL oracles reproduce it exactly."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("bigint")


#: RE2-compatible PII patterns (no backrefs/lookarounds, so Spark and any
#: SQL oracle agree): email, international-ish phone, IPv4.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": "\\+?[0-9][0-9()\\- ]{7,}[0-9]",
    "ipv4": "([0-9]{1,3}\\.){3}[0-9]{1,3}",
}


def redact_pii(text="text", patterns: dict[str, str] | None = None) -> F.Column:
    """Scrub PII-looking spans, replacing each with ``<CATEGORY>``.

    The C4-style pre-training scrub as a pure ``regexp_replace`` chain —
    JVM-side, codegen-friendly, and reproducible by any regex-capable SQL
    engine (patterns are RE2-compatible: no backreferences or lookarounds).
    Categories apply in dict order, so an email is redacted before its
    digits can match the phone pattern.
    """
    col = F.col(text) if isinstance(text, str) else text
    for name, pat in (patterns or PII_PATTERNS).items():
        col = F.regexp_replace(col, pat, f"<{name.upper()}>")
    return col


def normalize_for_dedup(text="text", strip_punct: bool = True) -> F.Column:
    """Canonical text for duplicate detection: lowercase, punctuation
    stripped (optional), whitespace runs collapsed to single spaces,
    trimmed — the standard pre-hash normalization (MinHashLSH pipelines à
    la RefinedWeb/SlimPajama normalize before shingling so case and
    punctuation variants of the same passage deduplicate together).

    The strip is Unicode-aware: everything that is not a letter
    (``\\p{L}``), digit (``\\p{N}``) or whitespace becomes a space, so
    CJK/Cyrillic/Arabic/accented text survives normalization — an
    ASCII-only ``[^a-z0-9]`` strip would reduce every non-Latin document
    to the empty string and false-positive-dedup all of them together.

    Pure JVM expression chain, reproducible by any regex SQL engine
    (RE2 and Java regex agree on ``\\p{L}``/``\\p{N}``):
    ``dedup_ops(df.withColumn("norm", normalize_for_dedup()), "norm")``
    composes with every dedup operator (they all take ``text_col``).
    """
    col = F.lower(F.col(text) if isinstance(text, str) else text)
    if strip_punct:
        col = F.regexp_replace(col, "[^\\p{L}\\p{N}\\s]", " ")
    return F.trim(F.regexp_replace(col, "\\s+", " "))


def _delim_pattern(delim: str) -> F.Column:
    """Literal delimiter as a split() pattern: ``F.split`` takes a Java
    regex, so a delimiter like '.' or '|' must be \\Q-quoted or it
    matches every character and destroys the text (the reassembly side,
    ``concat_ws``, is literal — the two must agree)."""
    return F.lit("\\Q" + delim + "\\E")


def dedup_lines_within(text="text", delim: str = "\n") -> F.Column:
    """Text with repeated lines/spans removed WITHIN the document (first
    occurrence kept, order preserved) — C4's within-page line dedup, the
    cheap in-row complement to the cross-document
    :func:`remove_boilerplate` (which needs a corpus-wide span-frequency
    shuffle; this is a pure map-side array expression).

    Empty spans are kept as-is (they are structure, not content).
    """
    col = F.col(text) if isinstance(text, str) else text
    spans = F.split(col, _delim_pattern(delim), -1)
    # one left fold appending first-seen spans: the spans expression is
    # referenced ONCE (an indexed-filter formulation would capture it in
    # the lambda and re-evaluate the split per element — the
    # interpreted-HOF trap BASELINE.md documents)
    first = F.aggregate(
        spans,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.trim(s) == "") | ~F.array_contains(acc, s),
            F.concat(acc, F.array(s)),
        ).otherwise(acc),
    )
    # NULL propagates (concat_ws alone would turn NULL text into '')
    return F.when(col.isNull(), F.lit(None)).otherwise(F.concat_ws(delim, first))


def chunk_documents(
    df,
    text_col: str = "text",
    key_col: str = "doc_id",
    chunk_tokens: int = 256,
    overlap: int = 32,
):
    """Split documents into overlapping fixed-token-budget chunks — the
    document→passage step before embedding/indexing in a retrieval
    pipeline (each chunk becomes one vector; ``overlap`` keeps answers
    that straddle a boundary findable from both sides).

    Returns (key, chunk_id, chunk_start, n_chunk_tokens, chunk_text):
    0-based ``chunk_id`` in document order, ``chunk_start`` the 1-based
    token index, chunks of ``chunk_tokens`` whitespace-run tokens
    starting every ``chunk_tokens - overlap`` tokens; the last chunk may
    be shorter, and a final window adding only already-covered tokens is
    not emitted.  Empty documents yield no chunks.

    Map-only (tokenize + per-doc window expansion + posexplode): no
    shuffle, no state — embarrassingly parallel at any corpus size.  The
    token array lands in a materialized column first so the per-chunk
    ``slice`` lambdas index an attribute, not re-evaluate the tokenizer
    expression (BASELINE.md's interpreted-HOF lesson).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks_expr = F.filter(
        F.split(F.trim(F.col(text_col)), "\\s+"), lambda t: F.length(t) > 0
    )
    base = df.select(
        F.col(key_col).alias("key"), toks_expr.alias("__toks")
    ).where(F.size("__toks") > 0)
    toks = F.col("__toks")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)), F.lit(step)
    )
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("start"),
            F.slice(toks, i, chunk_tokens).alias("ts"),
        ),
    )
    return base.select(
        "key", F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        "key",
        "chunk_id",
        F.col("c.start").alias("chunk_start"),
        F.size("c.ts").cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", "c.ts").alias("chunk_text"),
    )


#: common sentence-internal abbreviations the splitter must not break
#: after (finite alternation — Java lookbehind requires bounded width)
_ABBREV = "Mr|Mrs|Ms|Dr|Prof|Sr|Jr|St|vs|etc|approx|No|Fig|Eq|al|Inc|Ltd|Co|Corp"
#: split AFTER terminal punctuation (+ optional closing quote/bracket),
#: at whitespace, BEFORE an uppercase/digit/opening-quote start; never
#: after a known abbreviation or a single initial ("J. Smith").
#: Decimal points are safe implicitly: no whitespace follows them.
_SENT_SPLIT = (
    rf"(?<=[.!?][\")\]']|[.!?])"
    rf"(?<!\b(?:{_ABBREV})\.)(?<!\b[A-Z]\.)"
    rf"\s+(?=[A-Z0-9\"'(\[])"
)


def split_sentences(df, text_col: str = "text", key_col: str = "doc_id"):
    """(key, sentence_id, sentence) — rule-based sentence segmentation:
    split at whitespace following terminal punctuation (with optional
    closing quote/bracket) before an uppercase/digit start, guarded
    against common abbreviations and single initials.

    The pipeline's sentence-level unit for quality signals, sentence
    dedup and citation-span work.  Pure-JVM (one regex split + one
    posexplode), map-only, zero shuffle at any corpus size — the
    ``chunk_documents`` scale shape.  Empty documents yield no rows;
    surrounding whitespace is trimmed per sentence.
    """
    sents = F.split(F.col(text_col), _SENT_SPLIT)
    return (
        df.select(F.col(key_col).alias("key"), sents.alias("__s"))
        .select("key", F.posexplode("__s").alias("sentence_id", "sentence"))
        .withColumn("sentence", F.trim("sentence"))
        .where(F.length("sentence") > 0)
    )


def span_doc_frequencies(df, text_col: str = "text", key_col: str = "doc_id",
                         delim: str = "\n"):
    """Global document frequency per text span (line/paragraph).

    Splits each document on ``delim``, keeps each distinct non-empty span
    once per document, and counts how many distinct documents contain it —
    the statistic behind line-level boilerplate removal (the C4/RefinedWeb
    step that strips navigation chrome, cookie banners and headers that
    repeat across pages).  Returns (span, n_docs).

    Scale shape: one explode + one hash-groupBy shuffle keyed by the span;
    map-side partial counts shrink the shuffle to ~one row per distinct
    span.  ``array_distinct`` before the explode keeps a span that repeats
    *within* one document from inflating its document frequency.
    """
    spans = F.array_distinct(F.split(F.col(text_col), _delim_pattern(delim), -1))
    return (
        df.select(F.col(key_col).alias("key"), F.explode(spans).alias("span"))
        .where(F.trim(F.col("span")) != "")
        .groupBy("span")
        .agg(F.count("*").alias("n_docs"))
    )


def remove_boilerplate(df, text_col: str = "text", key_col: str = "doc_id",
                       delim: str = "\n", max_docs: int = 2):
    """Line-level boilerplate removal: drop every span (line/paragraph)
    that occurs in ``max_docs`` or more distinct documents, and reassemble
    each document's surviving spans in their original order.

    Returns the input columns with ``text_col`` replaced by the cleaned
    text plus ``n_spans``/``n_kept`` counters.  Documents whose spans are
    all boilerplate come back with empty text (filter on ``n_kept`` to
    drop them).  Deterministic: span order is preserved via ``posexplode``
    + an in-row ``array_sort`` on (pos, span) structs — no window, no
    global ordering.

    Scale shape (100 TB): the frequent-span set is joined with a LEFT
    ANTI *shuffle* join on the span text — it is corpus-derived and must
    never be explicitly broadcast (AQE upgrades to broadcast when it
    actually measures small, the common case since boilerplate is by
    definition a small set of high-frequency spans).  Reassembly is one
    hash-groupBy shuffle keyed by the document — three shuffles total,
    each keyed differently, none order-sensitive.
    """
    freq = (
        span_doc_frequencies(df, text_col, key_col, delim)
        .where(F.col("n_docs") >= max_docs)
        .select("span")
    )
    parts = df.select(
        F.col(key_col).alias("key"),
        F.posexplode(F.split(F.col(text_col), _delim_pattern(delim), -1)).alias("pos", "span"),
    ).where(F.trim(F.col("span")) != "")
    kept = (
        parts.join(freq, "span", "left_anti")
        .groupBy("key")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "span"))).alias("ps"),
        )
        .select(
            "key",
            F.concat_ws(
                delim, F.transform(F.col("ps"), lambda s: s.getField("span"))
            ).alias("__clean"),
            F.size("ps").cast("bigint").alias("n_kept"),
        )
    )
    totals = df.select(
        F.col(key_col).alias("key"),
        F.size(
            F.filter(
                F.split(F.col(text_col), _delim_pattern(delim), -1),
                lambda s: F.trim(s) != "",
            )
        ).cast("bigint").alias("n_spans"),
        *[F.col(c) for c in df.columns if c not in (text_col, key_col)],
    )
    other = [c for c in df.columns if c not in (text_col, key_col)]
    return (
        totals.join(kept, "key", "left")
        .select(
            F.col("key").alias(key_col),
            F.coalesce(F.col("__clean"), F.lit("")).alias(text_col),
            *other,
            "n_spans",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


def dedup_spans_corpus(df, text_col: str = "text", key_col: str = "doc_id",
                       delim: str = "\n", min_count: int = 2):
    """Corpus-wide span (line/paragraph) dedup keeping the globally-first
    occurrence — the RefinedWeb/Dolma paragraph-dedup semantics: a span
    occurring ``min_count``+ times keeps exactly ONE copy (min
    ``(key, pos)``) and loses the rest, so quoted/syndicated paragraphs
    deduplicate while the original survives.  Complements
    :func:`remove_boilerplate`, which drops *every* copy of a frequent
    span (chrome removal), and the within-document
    :func:`dedup_lines_within` (map-side, no corpus state).

    Returns the input columns with ``text_col`` rebuilt from surviving
    spans plus ``n_spans``/``n_kept``.  Occurrences are counted per
    occurrence (a span repeated twice inside one document deduplicates
    against itself), matching operators/substr.py's window semantics.

    Scale shape (100 TB): one explode + ONE span-keyed shuffle computing
    (count, canonical-first) via groupBy + join-back — the skew-safe
    form (a navigation line in 1e8 documents streams through the
    hash-aggregate and an AQE-splittable join; a Window over the span
    would buffer the hot span's whole partition, the substr.py lesson).
    The explicit ``repartition(span)`` lets both consumers reuse ONE
    exchange.  Reassembly is one doc-keyed shuffle with in-row
    ``array_sort`` — no global ordering anywhere.
    """
    parts = df.select(
        F.col(key_col).alias("key"),
        F.posexplode(
            F.split(F.col(text_col), _delim_pattern(delim), -1)
        ).alias("pos", "span"),
    ).where(F.trim(F.col("span")) != "").repartition("span")
    dup = (
        parts.groupBy("span")
        .agg(
            F.count("*").alias("__cnt"),
            F.min(F.struct("key", "pos")).alias("__canon"),
        )
        .where(F.col("__cnt") >= min_count)
        .select("span", "__canon")
    )
    kept_parts = (
        parts.join(dup, "span", "left")
        .where(
            F.col("__canon").isNull()
            | (
                (F.col("key") == F.col("__canon.key"))
                & (F.col("pos") == F.col("__canon.pos"))
            )
        )
        .select("key", "pos", "span")
    )
    kept = (
        kept_parts.groupBy("key")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "span"))).alias("ps"))
        .select(
            "key",
            F.concat_ws(
                delim, F.transform(F.col("ps"), lambda s: s.getField("span"))
            ).alias("__clean"),
            F.size("ps").cast("bigint").alias("n_kept"),
        )
    )
    other = [c for c in df.columns if c not in (text_col, key_col)]
    totals = df.select(
        F.col(key_col).alias("key"),
        F.size(
            F.filter(
                F.split(F.col(text_col), _delim_pattern(delim), -1),
                lambda s: F.trim(s) != "",
            )
        ).cast("bigint").alias("n_spans"),
        *[F.col(c) for c in other],
    )
    return (
        totals.join(kept, "key", "left")
        .select(
            F.col("key").alias(key_col),
            F.coalesce(F.col("__clean"), F.lit("")).alias(text_col),
            *other,
            "n_spans",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


def pii_hit_counts(text="text", patterns: dict[str, str] | None = None) -> F.Column:
    """Per-category PII match counts as a struct — the audit twin of
    :func:`redact_pii` (count before you scrub; a corpus where 30% of
    documents carry emails needs different handling than one with 0.1%)."""
    col = F.col(text) if isinstance(text, str) else text
    fields = [
        F.size(F.regexp_extract_all(col, F.lit(pat), 0)).alias(name)
        for name, pat in (patterns or PII_PATTERNS).items()
    ]
    return F.struct(*fields)


# ---------------------------------------------------------------------------
# keyword / banned-term screening (round 7)

#: word characters for keyword matching: Unicode letters/digits (the
#: normalize_for_dedup discipline — "don't" matches "don t"? no: the
#: apostrophe splits, and the TERM is normalized with the same rule, so
#: both sides agree)
_WORD_SPLIT_RE = r"[^\p{L}\p{N}]+"


def _keyword_words(col) -> F.Column:
    return F.filter(
        F.split(F.lower(col), _WORD_SPLIT_RE, -1), lambda w: w != ""
    )


def keyword_hits(
    df,
    terms,
    text_col: str = "text",
    key_col: str = "doc_id",
):
    """(key, term, n_occurrences) for every banned-term occurrence —
    the blocklist screen every curation pipeline runs (toxic words,
    boilerplate phrases, site-specific spam markers).

    Matching is word-boundary exact and case/punctuation-insensitive:
    both sides lowercase and split on non-letter/digit runs, so the
    phrase term "Free  Money!!" matches "free money" and never matches
    inside "freemoney".  Multi-word phrases are matched as word
    n-grams of exactly the phrase length.

    Spark-first scale shape — NOT a per-row regex alternation (which
    re-compiles a 10k-term pattern into the hot path): documents
    explode into word n-grams only for the phrase LENGTHS that occur in
    the term list (1..L distinct lengths, known driver-side from one
    tiny action), then ONE broadcast equi-join against the normalized
    term table and ONE groupBy.  Term lists are dimension-sized
    (thousands); documents never collect.

    ``terms`` is a list[str] or a single-column DataFrame.
    """
    spark = df.sparkSession
    py_terms: list | None = None
    if not isinstance(terms, DataFrame):
        py_terms = list(terms)
        terms = spark.createDataFrame([(t,) for t in py_terms], "term string")
    else:
        terms = terms.select(F.col(terms.columns[0]).alias("term"))
    norm_terms = (
        terms.select(
            F.concat_ws(" ", _keyword_words(F.col("term"))).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    if py_terms is not None and all(
        isinstance(t, str) and t.isascii() for t in py_terms
    ):
        # plain ASCII list input (the common case): the distinct phrase
        # lengths are derivable driver-side with zero Spark jobs — on
        # ASCII, [^\p{L}\p{N}]+ is exactly [^A-Za-z0-9]+ and Java/Python
        # lowercase agree, so this reproduces the collect() below
        # bit-for-bit (guide §1.2: the lengths probe was a blocking
        # driver job paid on every plan build)
        import re as _re

        normed = {
            " ".join(w for w in _re.split(r"[^A-Za-z0-9]+", t.lower()) if w)
            for t in py_terms
        }
        normed.discard("")
        lengths = sorted({t.count(" ") + 1 for t in normed})
    else:
        lengths = [
            int(r["n"])
            for r in norm_terms.select(
                F.size(F.split(F.col("term"), " ")).alias("n")
            )
            .distinct()
            .collect()
        ]
    if not lengths:
        return df.sparkSession.createDataFrame(
            [], f"key {df.schema[key_col].dataType.simpleString()}, "
                "term string, n_occurrences bigint"
        )
    words = df.select(
        F.col(key_col).alias("key"), _keyword_words(F.col(text_col)).alias("__w")
    )
    def _grams_of(n: int) -> F.Column:
        # NB: a factory, not a default-arg lambda — a TWO-parameter
        # transform lambda flips Spark to the (element, index) calling
        # convention and the second arg silently becomes the index
        return F.when(
            F.size("__w") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("__w") - n),
                lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i + 1, n)),
            ),
        ).otherwise(F.array())

    gram_arrays = [_grams_of(n) for n in sorted(lengths)]
    grams = words.select(
        "key", F.explode(F.flatten(F.array(*gram_arrays))).alias("term")
    )
    return (
        grams.join(F.broadcast(norm_terms), "term")
        .groupBy("key", "term")
        .agg(F.count("*").alias("n_occurrences"))
    )


def filter_keyword_clean(
    df,
    terms,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hits: int = 0,
):
    """Documents whose total banned-term occurrence count is <=
    ``max_hits`` (default: zero tolerance) — :func:`keyword_hits`
    + one aggregation + one anti/semi join back on the key."""
    hits = (
        keyword_hits(df, terms, text_col=text_col, key_col=key_col)
        .groupBy("key")
        .agg(F.sum("n_occurrences").alias("__h"))
        .where(F.col("__h") > max_hits)
        .select(F.col("key").alias(key_col))
    )
    return df.join(hits, key_col, "left_anti")
