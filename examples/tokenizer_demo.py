"""Runnable BPE tokenizer pipeline demo over the synthetic testdata.

    python examples/tokenizer_demo.py [sf_dir]

Trains a BPE merge table on the documents corpus (one distributed
word-count pass + driver-side merge loop), persists it through
model_io, reloads it, tokenizes the corpus map-only, and packs the
token counts into fixed training sequences — the fit → save → load →
encode → pack path a training-data pipeline runs.  Defaults to
/root/testdata/sf0.001 (~500 docs, a few seconds).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_spark.operators.bpe import bpe_encode, bpe_encode_ids, bpe_fit
    from ballista_spark.operators.dataset import pack_contiguous, write_packed_shards
    from ballista_spark.operators.model_io import load_model, save_model
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="tokenizer_demo")
    docs = load_table(spark, sf_dir, "documents")

    model = bpe_fit(docs, num_merges=300, min_count=2)
    n_merges, n_vocab = model.merges.count(), model.vocab.count()
    print(f"fit: {n_merges} merges, vocab {n_vocab}")

    path = os.path.join(tempfile.gettempdir(), "bpe_demo_model")
    save_model(model, path)
    model = load_model(spark, path)
    print(f"persisted + reloaded from {path}")

    toks = bpe_encode(docs, model).select(
        "doc_id", F.size("bpe_tokens").alias("n_tokens")
    )
    stats = toks.agg(
        F.sum("n_tokens").alias("total"), F.avg("n_tokens").alias("avg")
    ).collect()[0]
    print(f"encoded: {stats['total']} BPE tokens, avg {stats['avg']:.1f}/doc")

    packed = pack_contiguous(toks, "n_tokens", "doc_id", seq_len=2048)
    n_packs = packed.agg(F.countDistinct("pack_first")).collect()[0][0]
    print(f"packed into {n_packs} sequences of 2048 BPE tokens")

    shard_path = os.path.join(tempfile.gettempdir(), "bpe_demo_shards")
    shards = write_packed_shards(
        bpe_encode_ids(docs, model), shard_path, seq_len=2048, seqs_per_shard=4
    )
    print(f"wrote {shards.count()} materialized 2048-token windows "
          f"to {shard_path} (shard-partitioned parquet)")

    from ballista_spark.operators.unigram import unigram_encode, unigram_fit

    uni = unigram_fit(docs, vocab_size=n_vocab, min_count=2)
    utoks = unigram_encode(docs, uni).select(
        F.sum(F.size("unigram_tokens")).alias("total")
    ).collect()[0]["total"]
    print(f"unigram-LM at the same vocab budget: {utoks} tokens "
          f"(BPE {stats['total']})")

    from ballista_spark.operators.wordpiece import wordpiece_encode, wordpiece_fit

    wp = wordpiece_fit(docs, num_merges=int(n_merges), min_count=2)
    wrow = wordpiece_encode(docs, wp).select(
        F.sum(F.size("wp_tokens")).alias("total"),
        F.sum(
            F.size(F.filter("wp_tokens", lambda t: t == F.lit(wp.unk)))
        ).alias("unk"),
    ).collect()[0]
    print(f"wordpiece at the same merge budget: {wrow['total']} tokens, "
          f"{wrow['unk']} [UNK] (BPE {stats['total']})")
    spark.stop()


if __name__ == "__main__":
    main()
