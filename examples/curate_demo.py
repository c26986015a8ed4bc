"""Runnable end-to-end curation demo over the synthetic testdata.

    python examples/curate_demo.py [sf_dir]

Composes the full training-data recipe (dedup -> gates -> decontamination
-> LM perplexity -> packing) via :func:`ballista_spark.operators.curate.
curate_corpus` and prints the per-stage survivor table plus a packed-
layout sample.  Defaults to /root/testdata/sf0.001 (~500 docs, a few
seconds); pass a bigger sf dir to watch the same plan scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_spark.operators.curate import curate_corpus
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curate_demo")
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0").limit(200)

    report = curate_corpus(
        docs,
        near_dup_threshold=0.8,
        substr_window=20,  # repeated-passage strip (Lee et al. ExactSubstr)
        min_tokens=5,
        max_dup_ngram_fraction=0.9,
        benchmark=bench,
        max_contamination=0.99,  # permissive: synthetic docs overlap heavily
        max_ppl=1e6,
        pack_seq_len=2048,
    )

    print(f"\n{'stage':<16}{'docs':>8}")
    for stage, n in report.stage_counts.items():
        print(f"{stage:<16}{n:>8}")

    print("\npacked layout sample (token-contiguous training windows):")
    report.packed.select(
        "doc_id", "source", "pack_first", "pack_last", "pack_offset"
    ).orderBy("pack_first", "pack_offset").show(10)
    spark.stop()


if __name__ == "__main__":
    main()
