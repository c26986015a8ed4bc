"""End-to-end pretraining dataset build over the synthetic testdata —
the full path a 100 TB pipeline runs, composed from the engine's
operators:

    curate (dedup → gates → decontamination)
      → train a BPE tokenizer on the survivors
      → encode to token ids (map-only)
      → materialize fixed-length training windows as sharded parquet
      → publish the corpus data card + tokenizer-quality report

    python examples/pretrain_dataset_demo.py [sf_dir]

Defaults to /root/testdata/sf0.001 (~500 docs, under a minute).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_spark.operators.bpe import bpe_encode_ids, bpe_fit
    from ballista_spark.operators.curate import curate_corpus
    from ballista_spark.operators.dataset import write_packed_shards
    from ballista_spark.operators.report import corpus_report, tokenizer_report
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="pretrain_dataset_demo")
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0").limit(200)

    # 1. curation: dedup, token band, repetition gate, decontamination
    rep = curate_corpus(
        docs,
        near_dup_threshold=0.8,
        min_tokens=5,
        max_dup_ngram_fraction=0.9,
        benchmark=bench,
        max_contamination=0.99,
    )
    for stage, n in rep.stage_counts.items():
        print(f"  curate/{stage}: {n} docs survive")
    kept = rep.docs

    # 1a. banned-term screen (round 7): zero-tolerance blocklist pass —
    # word/phrase terms through the broadcast n-gram join
    from ballista_spark.operators.text import filter_keyword_clean

    before = kept.count()
    kept = filter_keyword_clean(kept, ["casino bonus", "xxx"])
    print(f"  curate/keyword_screen: {kept.count()} docs survive "
          f"({before - kept.count()} screened)")

    # 1b. leakage-safe held-out split: the split key is the DEDUP
    # CLUSTER (exact-dup content hash here), so near-identical documents
    # can never straddle train/val — then a quality curriculum orders
    # the training slice (clean first).
    from ballista_spark.operators.dataset import curriculum_order, group_split
    from ballista_spark.operators.quality import char_entropy

    keyed = kept.withColumn("__grp", F.md5(F.coalesce("text", F.lit(""))))
    split = group_split(keyed, ["__grp"], weights=(0.9, 0.1),
                        names=("train", "val")).drop("__grp")
    counts = {r.split: r["count"] for r in split.groupBy("split").count().collect()}
    print(f"  split: {counts}")
    train = split.where("split = 'train'").drop("split")
    train = curriculum_order(
        train.withColumn("q", char_entropy("text")), "q", ["doc_id"], n_stages=3
    ).drop("q")
    kept = train

    # 1c. data contract: the curated corpus must hold its invariants
    # BEFORE any training artifact derives from it (one aggregation
    # pass for the row-level checks; enforce raises naming failures)
    from ballista_spark.operators.validate import (
        enforce,
        not_null,
        row_count,
        unique,
    )

    kept = enforce(
        kept, [row_count(1), not_null("text"), unique("doc_id")]
    )
    print("contract: row_count/not_null(text)/unique(doc_id) all hold")

    # 2. tokenizer trained on the CURATED corpus (never the raw one)
    model = bpe_fit(kept, num_merges=300, min_count=2)
    print(f"tokenizer: {model.merges.count()} merges, "
          f"vocab {model.vocab.count()}")

    # 3. encode + 4. materialize 2048-token windows, 4 windows/shard
    shard_path = os.path.join(tempfile.gettempdir(), "pretrain_demo_shards")
    shards = write_packed_shards(
        bpe_encode_ids(kept, model), shard_path, seq_len=2048,
        seqs_per_shard=4,
    )
    print(f"shards: {shards.count()} windows -> {shard_path}")

    # 5. release artifacts: data card + tokenizer report
    card = corpus_report(kept).collect()
    for r in card:
        print(f"  card[{r['source']}]: docs={r['n_docs']} "
              f"tokens={r['n_tokens']}")
    tok_rep = tokenizer_report(
        bpe_encode_ids(kept, model, out_col="token_ids"), "token_ids"
    ).collect()
    for r in tok_rep:
        print(f"  tokenizer[{r['source']}]: fertility={r['fertility']:.2f} "
              f"bytes/token={r['bytes_per_token']:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
