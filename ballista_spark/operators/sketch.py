"""Frequency sketches: exact heavy hitters via a Misra-Gries candidate
sweep + exact verification pass.

``groupBy(col).count()`` finds frequent items but shuffles one row per
DISTINCT value — at 100 TB a token/URL/n-gram column has billions of
distinct values and the shuffle is the whole job.  The classic fix
(Misra & Gries 1982; the "MG summary" of Agarwal et al., *Mergeable
Summaries*, PODS 2012) bounds per-partition state at ``k`` counters and
guarantees every item with global frequency > n/(k+1) survives the
sweep.  A second, exact pass counts ONLY the surviving candidates, so
the result is EXACT (not approximate) while both shuffles stay tiny:

1. *candidate sweep* — one Arrow-batched ``mapInPandas`` pass keeping a
   ``k``-entry MG summary per partition (batch-decrement variant: when
   the summary overflows, subtract the (k+1)-th largest count from all
   entries and drop the non-positive — each overflow event removes at
   least ``(k+1)·m`` total mass, so any entry's cumulative decrement is
   ≤ n_p/(k+1), the textbook MG bound).  Pigeonhole over partitions: an
   item with global count > φ·n has per-partition count > φ·n_p in at
   least one partition, hence survives that partition's summary when
   ``k ≥ 1/φ``.  Emitted rows: ≤ k per partition.
2. *exact pass* — semi-join the corpus on the deduplicated candidate
   set (AQE broadcasts it when it measures small; ≤ partitions·k rows
   by construction), then a map-side-combined count of candidates only,
   filtered at the exact threshold ``count > φ·n``.

The result equals ``GROUP BY col HAVING COUNT(*) > φ·n`` exactly (the
DuckDB twin in tests/test_sketch.py), at two bounded shuffles instead
of one distinct-cardinality-sized one.

The reference engine has no sketch operators (`rust/core/proto/
ballista.proto` — relational surface only); heavy hitters are how a
training-data pipeline finds runaway boilerplate tokens, hot URLs, and
skewed join keys worth salting (operators/partitioning.py).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_summary_func(col: str, k: int):
    """Per-partition batched Misra-Gries over Arrow record batches."""

    def summarize(batches):
        counts: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts(dropna=True)
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > k:
                vals = sorted(counts.values())
                m = vals[len(vals) - (k + 1)]  # (k+1)-th largest
                counts = {v: c - m for v, c in counts.items() if c > m}
        yield pd.DataFrame(
            {"value": list(counts.keys()), "est": list(counts.values())}
        )

    return summarize


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi: float,
    k: int | None = None,
) -> DataFrame:
    """(``col``, count) for every value with EXACT count > ``phi`` · n —
    identical to ``GROUP BY col HAVING COUNT(*) > phi*n`` (NULLs
    excluded), computed with bounded shuffles (module docstring).

    ``k`` (summary capacity) defaults to ``ceil(1/phi)`` — the smallest
    capacity with the survival guarantee; raise it to surface more
    *candidates* (the output is exact either way, ``k`` only controls
    which values reach the exact pass, and values below the threshold
    are filtered there regardless).
    """
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    if k is None:
        k = math.ceil(1.0 / phi)
    if k < math.ceil(1.0 / phi):
        raise ValueError(
            f"k={k} below ceil(1/phi)={math.ceil(1.0 / phi)} voids the "
            "Misra-Gries survival guarantee"
        )
    field = df.schema[col]
    schema = T.StructType(
        [
            T.StructField("value", field.dataType, True),
            T.StructField("est", T.LongType(), False),
        ]
    )
    src = df.select(F.col(col)).where(F.col(col).isNotNull())
    cand = (
        src.mapInPandas(_mg_summary_func(col, k), schema=schema)
        .select("value")
        .distinct()
        .withColumnRenamed("value", col)
    )
    n = src.count()
    return (
        src.join(cand, col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("count"))
        .where(F.col("count") > F.lit(float(phi)) * F.lit(float(n)))
    )
