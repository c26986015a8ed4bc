"""Unigram-LM tokenizer training + Viterbi encoding (Kudo 2018, the
SentencePiece "unigram" model) — the second real-world tokenizer family
next to :mod:`ballista_spark.operators.bpe`, sharing its scale
architecture: the corpus influences training ONLY through the
word-frequency table, so the distributed stage is the same single
map-side-combinable word-count aggregation, and EM runs driver-side
over the bounded table.

Algorithm (public: Kudo 2018 "Subword Regularization", the
SentencePiece trainer):

1. *Seed vocabulary*: every substring (length ≤ ``max_piece_len``) of
   every table word, weighted by word count; capped to
   ``seed_factor × vocab_size`` by weight, single characters always
   kept (they guarantee every word stays segmentable).
2. *EM*: the E-step computes each piece's expected count over ALL
   segmentations of each word by lattice forward–backward (exact
   posteriors, not Viterbi-hard counts), weighted by word frequency;
   the M-step renormalizes into piece log-probabilities.
3. *Pruning*: repeat EM then drop the lowest-expected-count pieces
   (never single chars) by ``prune_factor`` per round until
   ``vocab_size`` remains.  (SentencePiece prunes by exact
   likelihood-loss; expected-count pruning is the documented
   simplification — the pieces that carry no posterior mass are the
   ones SP's loss ranks lowest to first order.)
4. *Encode*: per-word Viterbi (max-log-prob segmentation; ties broken
   toward fewer pieces, then lexicographically — deterministic), as a
   map-only Arrow-batched pandas UDF with a per-batch word memo,
   exactly like ``bpe_encode``.

Scale: driver cost is O(table × word_len × max_piece_len) per EM
iteration — corpus-size-independent; the piece table (≤ vocab_size
rows) ships in the UDF closure.  Unknown characters fall back to
``unk_logp`` per char, so encoding never fails.

No counterpart in the reference engine; part of the training-data-
pipeline mandate (SURVEY §2 pipeline group).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from ballista_spark.operators.bpe import _word_counts
from ballista_spark.operators.text import BPE_TOKEN_PATTERN

#: log-probability charged per UNKNOWN character (far below any real
#: piece so unk is only used when no known segmentation exists)
UNK_LOGP = -30.0


class UnigramModel(NamedTuple):
    """A fitted unigram-LM tokenizer: ``pieces`` = (piece string,
    logp double); scalars replay the training config at encode time."""

    pieces: DataFrame
    lowercase: bool
    pattern: str
    unk_logp: float


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == -math.inf:
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _expected_counts(
    word: str,
    weight: float,
    logp: dict[str, float],
    max_piece_len: int,
    unk_logp: float,
) -> dict[str, float]:
    """Exact E-step posteriors for one word: expected count of each piece
    over all segmentations, via lattice forward-backward.

    ``alpha[i]``/``beta[i]`` are log marginals of the prefix/suffix
    lattices; a piece spanning (j, i) contributes
    ``weight * exp(alpha[j] + logp + beta[i] - alpha[n])``.  Unknown
    single characters participate with ``unk_logp`` (charged to no
    piece) so every word has probability mass."""
    n = len(word)
    edges = []  # (j, i, piece or None, lp)
    for j in range(n):
        known_single = word[j] in logp
        for i in range(j + 1, min(j + max_piece_len, n) + 1):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is not None:
                edges.append((j, i, piece, lp))
        if not known_single:
            edges.append((j, j + 1, None, unk_logp))
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    by_end: dict[int, list] = defaultdict(list)
    by_start: dict[int, list] = defaultdict(list)
    for e in edges:
        by_end[e[1]].append(e)
        by_start[e[0]].append(e)
    for i in range(1, n + 1):
        terms = [alpha[j] + lp for j, _, _, lp in by_end[i]]
        if terms:
            alpha[i] = _logsumexp(terms)
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        terms = [lp + beta[i] for _, i, _, lp in by_start[j]]
        if terms:
            beta[j] = _logsumexp(terms)
    total = alpha[n]
    out: dict[str, float] = defaultdict(float)
    if total == -math.inf:  # pragma: no cover - unk edges prevent this
        return out
    for j, i, piece, lp in edges:
        if piece is not None:
            out[piece] += weight * math.exp(alpha[j] + lp + beta[i] - total)
    return out


def _viterbi(
    word: str,
    logp: dict[str, float],
    max_piece_len: int,
    unk_logp: float,
) -> list[str]:
    """Best segmentation: max total log-prob, ties toward fewer pieces,
    then lexicographically smaller piece sequence (deterministic)."""
    n = len(word)
    # best[i] = (score, n_pieces, pieces tuple) for word[:i]
    best: list = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = []
        for j in range(max(0, i - max_piece_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = unk_logp
                else:
                    continue
            s, k, ps = best[j]
            cand.append((s + lp, k + 1, ps + (piece,)))
        if cand:
            # min over (-score, n_pieces, pieces): highest score, then
            # fewest pieces, then lexicographically smallest piece tuple
            s, k, ps = min(cand, key=lambda c: (-c[0], c[1], c[2]))
            best[i] = (s, k, ps)
    return list(best[n][2])


def unigram_fit(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    num_em_iters: int = 2,
    prune_factor: float = 0.75,
    seed_factor: int = 4,
    min_count: int = 2,
    max_word_vocab: int = 1_000_000,
    lowercase: bool = True,
    pattern: str = BPE_TOKEN_PATTERN,
    unk_logp: float = UNK_LOGP,
) -> UnigramModel:
    """Learn a unigram-LM piece table from a corpus (one distributed
    word-count pass; see the module docstring).  Deterministic: the word
    table is cap-ordered (count desc, word asc), EM is order-independent
    arithmetic, and pruning ties break lexicographically."""
    wc = (
        _word_counts(df, text_col, lowercase, pattern)
        .where(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_word_vocab)
    )
    table = [(r["word"], float(r["count"])) for r in wc.collect()]
    # seed: substring counts, single chars always kept
    sub_w: dict[str, float] = defaultdict(float)
    for w, c in table:
        for j in range(len(w)):
            for i in range(j + 1, min(j + max_piece_len, len(w)) + 1):
                sub_w[w[j:i]] += c
    chars = {p for p in sub_w if len(p) == 1}
    multi = sorted(
        (p for p in sub_w if len(p) > 1),
        key=lambda p: (-sub_w[p], p),
    )[: max(0, seed_factor * vocab_size - len(chars))]
    vocab = chars | set(multi)
    total_w = sum(sub_w[p] for p in vocab)
    logp = {p: math.log(sub_w[p] / total_w) for p in vocab}

    def em_round(logp: dict[str, float]) -> dict[str, float]:
        exp: dict[str, float] = defaultdict(float)
        for w, c in table:
            for p, e in _expected_counts(
                w, c, logp, max_piece_len, unk_logp
            ).items():
                exp[p] += e
        total = sum(exp.values())
        log_total = math.log(total) if total > 0 else 0.0
        floor = math.log(1e-12)
        # log(e) - log(total), not log(e/total): the quotient underflows
        # to 0.0 for tiny posteriors and log() then domain-errors
        return {
            p: (
                max(math.log(exp[p]) - log_total, floor)
                if exp.get(p, 0.0) > 0
                else floor
            )
            for p in logp
        }

    while True:
        for _ in range(num_em_iters):
            logp = em_round(logp)
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = max(0, vocab_size - sum(1 for p in logp if len(p) == 1))
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * prune_factor))
        ranked = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (-logp[p], p),
        )[:keep]
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in set(ranked)}
    spark = df.sparkSession
    pieces = spark.createDataFrame(
        sorted(logp.items()), "piece string, logp double"
    )
    return UnigramModel(
        pieces=pieces, lowercase=lowercase, pattern=pattern, unk_logp=unk_logp
    )


def unigram_encode(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Append ``out_col``: array<string> of Viterbi-best pieces.  Map-only
    (no shuffle); the piece table ships in the UDF closure; NULL text →
    NULL tokens."""
    import re

    logp = {r["piece"]: r["logp"] for r in model.pieces.collect()}
    max_len = max((len(p) for p in logp), default=1)
    unk, lowercase = model.unk_logp, model.lowercase
    rx = re.compile(model.pattern)

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(text):
            if text is None:
                return None
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in rx.findall(text):
                toks = memo.get(w)
                if toks is None:
                    toks = _viterbi(w, logp, max_len, unk)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(one)

    return df.withColumn(out_col, encode(F.col(text_col)))


def unigram_encode_ids(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    out_col: str = "token_ids",
    oov_id: int = -1,
) -> DataFrame:
    """Like :func:`unigram_encode` but maps pieces to ids — the piece
    table's lexicographic order IS the id space (deterministic across
    fits of the same corpus).  Unknown single characters get ``oov_id``.
    Map-only, mirroring ``bpe_encode_ids``."""
    ids = {
        r["piece"]: i
        for i, r in enumerate(model.pieces.orderBy("piece").collect())
    }

    @F.pandas_udf("array<long>")
    def to_ids(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda ts: None
            if ts is None
            else [ids.get(t, oov_id) for t in ts]
        )

    tmp = "__uni_toks"
    return (
        unigram_encode(df, model, text_col, tmp)
        .withColumn(out_col, to_ids(F.col(tmp)))
        .drop(tmp)
    )
