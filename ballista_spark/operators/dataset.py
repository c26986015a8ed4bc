"""Dataset management operators: deterministic splits and merge-upsert.

Training-data pipelines need reproducible dataset surgery at 100 TB:

- :func:`hash_split` — content-hash train/val/test assignment.  Unlike
  ``DataFrame.randomSplit`` it is a pure projection: deterministic across
  runs/cluster sizes/partitionings, stable under re-execution, and requires
  no RNG state or shuffle.
- :func:`merge_upsert` — SCD-1 style MERGE emulation for plain parquet
  (no Delta in this environment): anti-join + union, one shuffle on the
  key.  The pattern the guide describes for CDC without a lakehouse format.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: resolution of the split lottery (1 ppm)
_SPLIT_DENOM = 1_000_000


def split_column(key_cols: Sequence[str], weights: Sequence[float],
                 names: Sequence[str], seed: str = "split") -> F.Column:
    """A deterministic split label derived from the row's key columns.

    ``weights`` need not sum to 1 (normalized); same key → same split,
    always, everywhere.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = float(sum(weights))
    ticket = F.pmod(
        F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols]),
        F.lit(_SPLIT_DENOM),
    )
    expr = None
    cum = 0.0
    for w, name in zip(weights, names):
        cum += w / total
        bound = int(cum * _SPLIT_DENOM)
        cond = ticket < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(F.lit(names[-1]))


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    seed: str = "split",
) -> DataFrame:
    """Attach a deterministic ``split`` column (train/val/test…)."""
    return df.withColumn("split", split_column(key_cols, weights, names, seed))


def merge_upsert(target: DataFrame, updates: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """MERGE (SCD-1): update rows present in ``updates``, keep the rest,
    insert new keys.  Equivalent to ``MERGE INTO … WHEN MATCHED THEN UPDATE
    WHEN NOT MATCHED THEN INSERT`` on row granularity."""
    keys = [key] if isinstance(key, str) else list(key)
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)
