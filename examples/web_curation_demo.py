"""Web-curation demo for the round-5 operator wave: URL canonicalization
+ URL-level dedup, host link-graph PageRank as a quality prior, trained
language ID, and cluster-balanced embedding downsampling.

    python examples/web_curation_demo.py [sf_dir]

The synthetic testdata carries no URLs or links, so the demo derives a
deterministic URL per document and a host-to-host link graph from the
document ids — the point is the operator composition and the plan
shapes, not the data.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_spark.operators.classify import langid_fit, langid_predict
    from ballista_spark.operators.dedup import exact_dedup
    from ballista_spark.operators.graph import pagerank
    from ballista_spark.operators.similarity import (
        cluster_balanced_sample,
        cluster_sizes,
        kmeans_fit,
    )
    from ballista_spark.operators.url import canonicalize_url, url_host
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="web_curation_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")

    # 1. synthesize messy URLs, canonicalize, URL-dedup ---------------------
    page = (F.col("doc_id") / 2).cast("long")  # every 2 ids share a page
    urled = docs.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://Host"),
            F.pmod(F.xxhash64(page), F.lit(40)),
            F.lit(".Example.COM/p/"),
            page,
            F.lit("/?utm_source=feed&b=2&a=1"),
        ),
    ).withColumn("curl", canonicalize_url("url"))
    flagged = exact_dedup(urled, text_col="curl", key_col="doc_id")
    kept = flagged.where("is_canonical").drop("content_hash", "is_canonical")
    print(f"url dedup: {docs.count()} docs -> {kept.count()} canonical pages")

    # 2. host link graph -> PageRank quality prior --------------------------
    hosts = kept.select(url_host("url").alias("host")).distinct()
    edges = (
        hosts.alias("a")
        .crossJoin(hosts.alias("b"))
        .where(
            F.pmod(F.xxhash64(F.col("a.host"), F.col("b.host")), F.lit(7)) == 0
        )
        .select(F.col("a.host").alias("src"), F.col("b.host").alias("dst"))
    )
    ranks = pagerank(edges, max_iters=10)
    top = ranks.orderBy(F.col("rank").desc()).limit(5).collect()
    print("top hosts by pagerank:")
    for r in top:
        print(f"  {r.node:<28} {r.rank:.5f}")
    ranked = kept.withColumn("host", url_host("url")).join(
        ranks.withColumnRenamed("node", "host"), "host", "left"
    )

    # 3. trained language ID (fit on the labeled docs, annotate) ------------
    model = langid_fit(ranked, n_features=2**14, ngrams=(2, 3), n_iters=8)
    tagged = langid_predict(ranked, model)
    print("predicted language mix:")
    for r in tagged.groupBy("lang_pred").count().orderBy("lang_pred").collect():
        print(f"  {r.lang_pred}: {r['count']}")

    # 4. cluster-balanced embedding downsample ------------------------------
    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, max_iters=5, spherical=True)
    before = {r.cluster: r.n for r in cluster_sizes(emb, cents).collect()}
    sampled = cluster_balanced_sample(emb, cents, cap=25)
    after = {
        r.cluster: r.n
        for r in sampled.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    print("cluster occupancy before -> after cap=25:")
    for c in sorted(before):
        print(f"  cell {c}: {before[c]} -> {after.get(c, 0)}")

    spark.stop()


if __name__ == "__main__":
    main()
