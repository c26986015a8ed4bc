"""Distributed WordPiece tokenizer training + encoding — the third
tokenizer family next to BPE (`operators/bpe.py`) and unigram-LM
(`operators/unigram.py`), completing the set the major model lineages
train with (BERT-family vocabularies are WordPiece).

Algorithm (public: Schuster & Nakajima 2012; the HuggingFace-tokenizers
trainer variant): identical mechanics to BPE — repeatedly merge the best
adjacent symbol pair over the word-frequency table — but the selection
score is the likelihood ratio ``count(pair) / (count(left) ·
count(right))`` instead of raw pair count, and non-word-initial symbols
carry the ``##`` continuation prefix.  Encoding is greedy
longest-match-first per word with an ``[UNK]`` fallback.

Scale design — the BPE story verbatim: corpus → word counts is ONE
map-side-combinable shuffle; the merge loop runs driver-side over the
min_count/max_word_vocab-bounded word table, so training cost scales
with the word-table size, never corpus bytes; encoding is a map-only
Arrow-batched pandas UDF whose vocab closure is vocab_size entries.

Determinism: pair scores are ratios of integers, so best-pair selection
compares CROSS-MULTIPLIED integer products (``c1·l2·r2`` vs
``c2·l1·r1``) — no float ties — with the lexicographically smaller pair
winning exact ties.  Two fits of the same corpus under the same config
are byte-identical regardless of partitioning (pinned by the randomized
naive-recount mirror in tests/test_wordpiece.py, the test style that
caught a real sub-threshold-selection bug in the BPE trainer).

The selection loop re-scans the live pair table per merge (O(#pairs)
per merge): WordPiece scores depend on THREE counts, so the BPE heap's
lazy invalidation does not carry over soundly — a symbol-count change
invalidates every heap entry touching that symbol.  The pair table is
bounded by the word table, which is bounded twice (module docstring of
bpe.py), so the scan stays driver-cheap at any corpus size.

No counterpart in the reference engine (no tokenizer surface in
`rust/core/proto/ballista.proto`); training-data-pipeline mandate.
"""

from __future__ import annotations

from collections import defaultdict
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from ballista_spark.operators.bpe import _word_counts
from ballista_spark.operators.text import BPE_TOKEN_PATTERN

#: continuation prefix for non-word-initial symbols (BERT convention)
CONT = "##"
UNK = "[UNK]"


class WordPieceModel(NamedTuple):
    """A fitted WordPiece tokenizer: ``vocab`` (token_id, token) with
    alphabet symbols first then merge products in learned order; scalars
    replay the training config at encode time."""

    vocab: DataFrame
    unk: str
    lowercase: bool
    pattern: str
    max_chars_per_word: int


def _wp_symbols(word: str) -> list[str]:
    return [word[0]] + [CONT + ch for ch in word[1:]]


def _merge_symbol(a: str, b: str) -> str:
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def _wp_merge_loop(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int,
) -> list[str]:
    """Driver-side WordPiece merge loop; returns merge-product tokens in
    learned order.  Incremental pair/symbol counts (BPE-style index),
    full-scan exact-integer selection per merge (module docstring)."""
    words = [_wp_symbols(w) for w, _ in word_counts if w]
    counts = [c for (w, c) in word_counts if w]
    pair_count: dict[tuple[str, str], int] = defaultdict(int)
    sym_count: dict[str, int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        c = counts[i]
        for s in syms:
            sym_count[s] += c
        for p in zip(syms, syms[1:]):
            pair_count[p] += c
            pair_words[p].add(i)
    products: list[str] = []
    for _ in range(num_merges):
        best, bc, bl, br = None, 0, 1, 1
        for p, c in pair_count.items():
            if c < min_pair_count:
                continue
            l, r = sym_count[p[0]], sym_count[p[1]]
            if best is None:
                better = True
            else:
                lhs, rhs = c * bl * br, bc * l * r  # c/(l·r) vs bc/(bl·br)
                better = lhs > rhs or (lhs == rhs and p < best)
            if better:
                best, bc, bl, br = p, c, l, r
        if best is None:
            break
        new_sym = _merge_symbol(*best)
        products.append(new_sym)
        for i in list(pair_words[best]):
            syms, c = words[i], counts[i]
            for s in syms:
                sym_count[s] -= c
            for p in zip(syms, syms[1:]):
                pair_count[p] -= c
                if pair_count[p] <= 0:
                    del pair_count[p]
                pair_words[p].discard(i)
            merged, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    merged.append(new_sym)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            words[i] = merged
            for s in merged:
                sym_count[s] += c
            for p in zip(merged, merged[1:]):
                pair_count[p] += c
                pair_words[p].add(i)
        sym_count = defaultdict(int, {s: c for s, c in sym_count.items() if c > 0})
    return products


def wordpiece_fit(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_count: int = 2,
    min_pair_count: int = 2,
    max_word_vocab: int = 1_000_000,
    lowercase: bool = True,
    pattern: str = BPE_TOKEN_PATTERN,
    unk: str = UNK,
    max_chars_per_word: int = 100,
) -> WordPieceModel:
    """Learn a WordPiece vocabulary from a corpus (one distributed
    pass + a bounded driver merge loop — module docstring)."""
    wc = (
        _word_counts(df, text_col, lowercase, pattern)
        .where(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_word_vocab)
    )
    table = [(r["word"], r["count"]) for r in wc.collect()]
    products = _wp_merge_loop(table, num_merges, min_pair_count)
    alphabet = sorted(
        {w[0] for w, _ in table if w}
        | {CONT + ch for w, _ in table for ch in w[1:]}
    )
    tokens = [unk] + alphabet + products
    vocab_df = df.sparkSession.createDataFrame(
        list(enumerate(tokens)), "token_id bigint, token string"
    )
    return WordPieceModel(
        vocab=vocab_df,
        unk=unk,
        lowercase=lowercase,
        pattern=pattern,
        max_chars_per_word=max_chars_per_word,
    )


def wordpiece_tokenize_word(
    word: str, vocab: set, unk: str, max_chars: int
) -> list[str]:
    """Greedy longest-match-first tokenization of one word (the BERT
    WordPiece algorithm): repeatedly take the longest vocab prefix
    (``##``-prefixed after the first piece); any dead end → [unk]."""
    if len(word) > max_chars:
        return [unk]
    pieces, start = [], 0
    while start < len(word):
        end, cur = len(word), None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = CONT + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_encode(
    df: DataFrame,
    model: WordPieceModel,
    text_col: str = "text",
    out_col: str = "wp_tokens",
) -> DataFrame:
    """Append ``out_col``: array<string> of WordPiece tokens.  Map-only
    (no shuffle): the vocab set ships in the UDF closure with a
    per-batch word memo; NULL text → NULL tokens."""
    import re

    vocab = {r["token"] for r in model.vocab.collect()}
    unk, lowercase, max_chars = model.unk, model.lowercase, model.max_chars_per_word
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
                    toks = wordpiece_tokenize_word(w, vocab, unk, max_chars)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(one)

    return df.withColumn(out_col, encode(F.col(text_col)))
