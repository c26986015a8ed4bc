"""Corpus-wide plan lint: build every graded query's executed plan and
fail on scale anti-patterns.  The per-operator plan gates in tests/
pin specific queries; this sweeps ALL 50 driver entries so a regression
in any of them (a join that degrades to a cartesian, a Python UDF
sneaking into a hot path, a filter that stops reaching the parquet
scan) is caught as one red line instead of surfacing at 100 TB.

Checks per entry (executed plan string, AQE-resolved):

- no ``CartesianProduct`` anywhere (the embedding brute-force baselines
  declare themselves via ALLOW_CARTESIAN — they are the documented
  ground-truth verifiers, constant-size query side);
- no ``BroadcastNestedLoopJoin`` except the declared brute-force
  entries (same list) — at scale a BNLJ over the corpus is a cartesian
  with better PR;
- no row-at-a-time ``BatchEvalPython`` (Python UDF) anywhere — the only
  sanctioned Python is Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas``, multimodal + PCA);
- every ``tpch_*`` entry's lineitem/orders scan carries at least one
  pushed filter or a pruned (non-*) ReadSchema — i.e. column pruning
  reached the scan.

Usage::

    python tools/planlint.py              # sf0.001 plans (fast, plan-only)
    SPARK_GRAFT_SF_DIR=... python tools/planlint.py

Exit code 1 on any violation; prints one line per entry.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: entries whose *documented semantics* are brute-force ground truth over
#: a constant-size query/benchmark side — a nested-loop there is the
#: operator, not an accident (see each builder's docstring)
ALLOW_CARTESIAN = {
    "ann_cosine_topk",      # exact top-k baseline: broadcast-query scan
    "dedup_embedding",      # brute-force cosine verifier + graded LSH path
    "dedup_ngram_jaccard",  # exact all-pairs verifier (shingle equi-join
                            # plus range condition -> BNLJ at tiny scale)
}

#: entries where a BroadcastNestedLoopJoin is the ONE-ROW-broadcast
#: pattern (crossJoin against a single packed aggregate row — constant
#: data volume regardless of corpus size) or an intentional CROSS JOIN:
ALLOW_BNLJ = ALLOW_CARTESIAN | {
    "ivf_ann_topk",         # packed-centroid one-row broadcast
                            # (_nearest_centroids map-only assignment)
    "pq_adc_topk",          # packed-codebook/LUT one-row broadcast
    "cov_join_types",       # the CROSS JOIN branch is one of the 7
                            # graded join types
    "cov_sketch_sampling",  # scalar one-row cross joins (corpus totals
                            # feeding DSIR ratios / packing offsets)
    "text_tfidf_top_terms",  # n_docs one-row broadcast (r11: the idf
                            # scalar rides the query instead of a
                            # driver-side count() job per build)
}


def lint(name: str, plan: str) -> list[str]:
    errs = []
    if "CartesianProduct" in plan and name not in ALLOW_CARTESIAN:
        errs.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_BNLJ:
        errs.append("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in plan:
        errs.append("row-at-a-time Python UDF (BatchEvalPython)")
    if name.startswith("tpch_"):
        # at least one scan must push a filter; q1-like full scans still
        # prune columns, so alternatively accept every ReadSchema being
        # genuinely narrow (every parquet scan prints ReadSchema, so its
        # mere presence proves nothing — count the fields; a truncated
        # "..." schema is by definition wide).  lineitem is 16 columns;
        # no TPC-H query needs 12+ from any one table.
        pushed = re.search(r"PushedFilters: \[(?!\])", plan)
        schemas = re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
        narrow = schemas and all(
            "..." not in s and s.count(",") + 1 < 12 for s in schemas
        )
        if not (pushed or narrow):
            errs.append("no pushed filters and a wide/truncated ReadSchema")
    return errs


def main() -> int:
    import __spark_entry__ as entry
    from ballista_spark.session import get_spark

    spark = get_spark(app_name="ballista_spark_planlint")
    spark.sparkContext.setLogLevel("ERROR")
    failures = total = 0
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            errs = lint(name, plan)
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            errs = [f"plan build failed: {exc}"]
        status = "ok" if not errs else "FAIL " + "; ".join(errs)
        print(f"{name:<24}{status}")
        total += 1
        failures += bool(errs)
    print(f"\n{total - failures}/{total} clean")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
