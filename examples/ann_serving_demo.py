"""ANN serving demo: train a coarse quantizer, write the corpus as a
cell-partitioned IVF store, and run query batches that scan only their
probed cells' files (partition pruning as the index).

Usage::

    python examples/ann_serving_demo.py [sf_dir] [store_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main() -> None:
    from ballista_spark.operators.similarity import (
        ivf_store_topk,
        kmeans_fit,
        write_ivf_store,
    )
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bs_ivf_store"
    spark = get_spark(app_name="ann_serving_demo")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    print(f"corpus: {emb.count()} vectors")

    # one-off (re-run only when the quantizer retrains)
    cents = kmeans_fit(emb, 8, max_iters=3, spherical=True)
    write_ivf_store(emb, cents, store)
    print(f"store written cell-partitioned -> {store}")

    # per-query-batch serving path
    queries = emb.limit(5)
    hits = ivf_store_topk(spark, store, queries, cents, k=3, n_probe=2)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    [cells] = re.findall(r"PartitionFilters: \[cell#\d+ IN \(([0-9,]+)\)", plan)
    print(f"probed cells only: IN ({cells}) — other cells' files never opened")
    hits.show(15, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
