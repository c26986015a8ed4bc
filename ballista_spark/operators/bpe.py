"""Distributed BPE tokenizer training + encoding.

The reference engine ships no tokenizer trainer; this is one of the
beyond-parity LLM-pipeline operators (SURVEY §2 "training-data
pipeline" group, next to the token-count / LM / quality stages).  The
algorithm is the public Sennrich et al. 2016 byte-pair-encoding
procedure as productionized by the SentencePiece / HuggingFace
trainers: BPE merges depend on the corpus ONLY through its word-
frequency table, so the distributed part of training is exactly one
map-side-combinable aggregation and the merge loop runs driver-side
over a bounded vocabulary table.

Scale design (the 100 TB story):

- ``bpe_fit`` stage 1 is ``explode(regexp_extract_all(...))`` →
  ``groupBy(word).count()`` — ONE corpus-sized shuffle with partial
  aggregation; nothing else ever touches the full corpus.
- The word table collected to the driver is bounded twice: rows below
  ``min_count`` drop (they cannot influence any merge above the same
  threshold), and a deterministic top-``max_word_vocab`` cap
  (frequency desc, word asc) bounds driver memory even on an
  adversarial corpus.  By Heaps' law a real 100 TB crawl has far fewer
  distinct frequent words than the default cap.
- The merge loop is corpus-size-independent: O(affected words) per
  merge via an incremental pair index (the same trick as the HF
  trainer); cost scales with the word-table size and ``num_merges``,
  never with corpus bytes.
- ``bpe_encode`` is map-only: the merge-rank table (≤ ``num_merges``
  entries — KB-sized) rides inside an Arrow-batched pandas UDF
  closure, with a per-batch word→tokens memo so Zipf-distributed text
  pays the merge replay once per distinct word per batch.

No counterpart in the reference (its closest surface is the SQL
function corpus, `rust/core/src/execution/...`); this module exists for
the training-data-pipeline mandate.
"""

from __future__ import annotations

from collections import defaultdict
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from ballista_spark.operators.text import BPE_TOKEN_PATTERN

#: End-of-word marker appended as a trailing symbol to every word
#: (classic Sennrich formulation — lets merges distinguish word-final
#: from word-internal contexts and makes decoding unambiguous).
EOW = "</w>"


class BPEModel(NamedTuple):
    """A fitted BPE tokenizer.

    ``merges``: (rank bigint, left string, right string) — the learned
    merge sequence, rank 0 first.  ``vocab``: (token_id bigint, token
    string) — alphabet symbols first (sorted), then merge products in
    rank order.  Scalars replay the training config at encode time.
    """

    merges: DataFrame
    vocab: DataFrame
    eow: str
    lowercase: bool
    pattern: str


def _word_counts(
    df: DataFrame, text_col: str, lowercase: bool, pattern: str
) -> DataFrame:
    """(word, n) — the single distributed stage of BPE training."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    words = F.explode(F.regexp_extract_all(col, F.lit(pattern), 0))
    return df.select(words.alias("word")).groupBy("word").count()


def _merge_loop(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int,
    eow: str,
) -> list[tuple[str, str]]:
    """Driver-side Sennrich merge loop over the bounded word table.

    Incremental: a merge re-scans only the words that contain the merged
    pair (tracked by the pair→words index), so each iteration costs
    O(words touched), not O(table).  Best-pair selection is a
    lazy-invalidation max-heap — stale entries (count changed since
    push) are discarded on pop, so selection is O(log heap) amortized
    instead of an O(#pairs) scan per merge; at a production-sized
    1M-word table × 32k merges the scan would dominate training.  The
    heap order (count desc, then lexicographically smaller pair) IS the
    deterministic tie-break, pinned by the randomized mirror tests.
    """
    import heapq

    words: list[list[str]] = [list(w) + [eow] for w, _ in word_counts]
    counts = [c for _, c in word_counts]
    pair_count: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        c = counts[i]
        for a, b in zip(syms, syms[1:]):
            pair_count[(a, b)] += c
            pair_words[(a, b)].add(i)
    heap = [(-c, p) for p, c in pair_count.items() if c >= min_pair_count]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        if pair_count.get(best, 0) != -negc:
            continue  # stale entry — count changed since this push
        merges.append(best)
        new_sym = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        for i in list(pair_words[best]):
            syms, c = words[i], counts[i]
            for a, b in zip(syms, syms[1:]):
                pair_count[(a, b)] -= c
                touched.add((a, b))
                if pair_count[(a, b)] <= 0:
                    del pair_count[(a, b)]
                pair_words[(a, b)].discard(i)
            merged, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    merged.append(new_sym)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            words[i] = merged
            for a, b in zip(merged, merged[1:]):
                pair_count[(a, b)] += c
                touched.add((a, b))
                pair_words[(a, b)].add(i)
        for p in touched:
            c = pair_count.get(p, 0)
            if c >= min_pair_count:
                heapq.heappush(heap, (-c, p))
    return merges


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_count: int = 2,
    min_pair_count: int = 2,
    max_word_vocab: int = 1_000_000,
    lowercase: bool = True,
    eow: str = EOW,
    pattern: str = BPE_TOKEN_PATTERN,
) -> BPEModel:
    """Learn a BPE merge table from a corpus (one distributed pass).

    See the module docstring for the scale argument.  Determinism: the
    word-table cap orders by (count desc, word asc) and the merge loop
    tie-breaks lexicographically, so two fits of the same corpus under
    the same config produce byte-identical models regardless of
    partitioning.
    """
    wc = (
        _word_counts(df, text_col, lowercase, pattern)
        .where(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_word_vocab)
    )
    table = [(r["word"], r["count"]) for r in wc.collect()]
    merges = _merge_loop(table, num_merges, min_pair_count, eow)
    alphabet = sorted({ch for w, _ in table for ch in w} | {eow})
    tokens = alphabet + [a + b for a, b in merges]
    spark = df.sparkSession
    merges_df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank bigint, left string, right string",
    )
    vocab_df = spark.createDataFrame(
        list(enumerate(tokens)), "token_id bigint, token string"
    )
    return BPEModel(
        merges=merges_df,
        vocab=vocab_df,
        eow=eow,
        lowercase=lowercase,
        pattern=pattern,
    )


def _apply_merges(
    word: str, ranks: dict[tuple[str, str], int], eow: str
) -> list[str]:
    """Tokenize one word by replaying merges in learned-rank order
    (merging the lowest-ranked pair present, repeatedly — equivalent to
    replaying the full merge sequence, the standard encode algorithm)."""
    syms = list(word) + [eow]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        new_sym = best_pair[0] + best_pair[1]
        merged, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best_pair:
                merged.append(new_sym)
                j += 2
            else:
                merged.append(syms[j])
                j += 1
        syms = merged
    return syms


def bpe_encode(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: array<string> of BPE tokens for ``text_col``.

    Map-only (no shuffle): the rank table is ≤ ``num_merges`` entries
    and ships in the UDF closure; a per-batch word→tokens memo makes the
    per-row cost ~one dict lookup per word on Zipf text.  NULL text →
    NULL tokens (matches the engine-wide NULL-preservation convention).
    """
    import re

    ranks = {
        (r["left"], r["right"]): r["rank"] for r in model.merges.collect()
    }
    eow, lowercase = model.eow, model.lowercase
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
                    toks = _apply_merges(w, ranks, eow)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(one)

    return df.withColumn(out_col, encode(F.col(text_col)))


def bpe_encode_ids(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "token_ids",
    oov_id: int = -1,
) -> DataFrame:
    """Like :func:`bpe_encode` but maps tokens to vocab ids.

    Symbols outside the training alphabet (characters the word table
    never saw) get ``oov_id``.  Implemented as encode + a JVM-side map
    lookup over a broadcast-sized vocab literal — the id mapping never
    becomes a join."""
    vocab = {r["token"]: r["token_id"] for r in model.vocab.collect()}

    @F.pandas_udf("array<long>")
    def to_ids(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda ts: None
            if ts is None
            else [vocab.get(t, oov_id) for t in ts]
        )

    tmp = "__bpe_toks"
    return (
        bpe_encode(df, model, text_col, tmp)
        .withColumn(out_col, to_ids(F.col(tmp)))
        .drop(tmp)
    )


def bpe_decode(tokens: list[str], eow: str = EOW) -> str:
    """Driver-side inverse of the per-word tokenization: concatenate and
    split on the end-of-word marker.  Lossy exactly where the
    pre-tokenizer is (original inter-word spacing is normalized to one
    space) — ``bpe_decode(encode(t)) == ' '.join(pretokens(t))``."""
    joined = "".join(tokens)
    return " ".join(w for w in joined.split(eow) if w)
