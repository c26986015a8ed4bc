"""Incremental crawl-snapshot update demo: diff the new crawl against
the accepted corpus, screen only what changed, merge, and re-balance the
recipe — the steady-state loop of a production training-data pipeline
(full re-curation of 100 TB per crawl is the thing this avoids).

1. ``corpus_diff``          — what did crawl N+1 add/change/remove?
2. ``dedup_against``        — exact-screen the added/changed slice
                              against the accepted corpus
3. ``screen_against``       — fuzzy (MinHash) screen of the survivors
4. ``merge_upsert``         — apply the accepted updates
5. ``mixture_rates`` /
   ``mixture_sample``       — re-balance the merged corpus to the
                              target domain recipe
6. ``budget_sample``        — cap the training spend at a token budget

Usage::

    python examples/snapshot_update_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from ballista_spark.operators.dataset import corpus_diff, merge_upsert
    from ballista_spark.operators.dedup import dedup_against, screen_against
    from ballista_spark.operators.mixture import (
        budget_sample,
        mixture_rates,
        mixture_sample,
    )
    from ballista_spark.session import get_spark
    from ballista_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="snapshot_update_demo")
    spark.sparkContext.setLogLevel("ERROR")

    accepted = load_table(spark, sf_dir, "documents")

    # synthesize crawl N+1: some pages vanish, some get edited, some new
    # pages appear — two of the "new" pages are copies of accepted docs
    # (syndication), which the screens must reject
    edited = accepted.where("doc_id % 7 <> 0").withColumn(
        "text",
        F.when(
            F.expr("doc_id % 5 = 0"), F.concat("text", F.lit(" updated"))
        ).otherwise(F.col("text")),
    )
    plagiarized = (
        accepted.where("doc_id % 13 = 1")
        .limit(2)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    # genuinely-new pages: char-reversed text shares no shingles with
    # the accepted corpus, so the screens must admit all of them
    fresh = accepted.where("doc_id % 11 = 0").select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    crawl = edited.unionByName(plagiarized).unionByName(fresh)

    diff = corpus_diff(accepted, crawl, ["doc_id"])
    print("== snapshot diff ==")
    for r in diff.groupBy("diff_status").count().orderBy("diff_status").collect():
        print(f"  {r.diff_status:<8} {r['count']}")

    # ADDED pages are screened against the accepted corpus; CHANGED pages
    # are updates to documents we already accepted — they merge by key
    # (screening them would match their own previous version)
    added_keys = diff.where("diff_status = 'added'").select("doc_id")
    changed_keys = diff.where("diff_status = 'changed'").select("doc_id")
    additions = crawl.join(added_keys, "doc_id", "left_semi")
    updates = crawl.join(changed_keys, "doc_id", "left_semi")

    exact_ok = dedup_against(additions, accepted, "text")
    fuzzy_ok = screen_against(
        exact_ok, accepted, "text", "doc_id", near_dup_threshold=0.8
    )
    n_in, n_exact, n_fuzzy = additions.count(), exact_ok.count(), fuzzy_ok.count()
    print(f"additions {n_in} -> exact screen {n_exact} -> fuzzy screen {n_fuzzy}")
    assert n_fuzzy < n_in, "the planted syndicated copies must be screened"

    merged = merge_upsert(
        accepted, updates.unionByName(fuzzy_ok.drop("content_hash")), "doc_id"
    )
    print(f"accepted {accepted.count()} -> merged {merged.count()}")

    weights = {"src0": 4.0, "src1": 3.0, "src2": 2.0, "src3": 1.0}
    print("== mixture plan ==")
    for r in mixture_rates(merged, "source", weights, "n_chars").orderBy(
        "source"
    ).collect():
        print(
            f"  {r[0]:<6} observed={r.observed:>6} target={r.target_w:.3f} "
            f"rate={r.rate:.3f} epochs={r.epochs:.2f}"
        )
    mixed = mixture_sample(merged, "source", weights, ["doc_id"], "n_chars")
    budget = int(mixed.agg(F.sum("n_chars")).collect()[0][0] * 0.5)
    final = budget_sample(mixed, "n_chars", budget, ["doc_id"])
    spent = final.agg(F.sum("n_chars")).collect()[0][0]
    print(f"mixed {mixed.count()} docs -> budget {budget} chars -> "
          f"kept {final.count()} docs, {spent} chars")
    assert spent <= budget
    spark.stop()


if __name__ == "__main__":
    main()
