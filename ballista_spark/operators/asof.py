"""As-of join — an operator Spark lacks natively, composed from built-ins.

Semantics (backward as-of): for each left row, attach the latest right row
with ``right.ts <= left.ts`` within the same key group — the standard
time-series point-in-time join (DuckDB/kdb ``ASOF JOIN``, pandas
``merge_asof``).

Implementation is the union-and-window composition (preference order (a) of
the custom-operator policy — no Pandas UDF needed):

1. tag left (probe) and right (reference) rows and union them;
2. window per key ordered by (ts, tag) with ``last_value(right_value,
   ignoreNulls=True)`` over rows unbounded-preceding..current — each left row
   sees the most recent right value at or before its timestamp;
3. keep the left rows.

Scale: one shuffle (window partition by key); no range explosion, no
cross join — at 100 TB this is a single sort-within-partitions pass, and
skewed keys are handled by AQE the same as any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join of ``left`` against ``right``.

    ``on``: ordering (timestamp) column present in both sides.
    ``by``: optional equi-key (e.g. user_id) present in both sides.
    ``value_cols``: right-side columns to attach (default: all non-key).
    """
    if value_cols is None:
        excluded = {on, by} if by else {on}
        value_cols = [c for c in right.columns if c not in excluded]

    keys = [by] if by else []
    lhs = left.withColumn("__tag", F.lit(1))
    rhs = right.select(
        *(keys + [on] + value_cols)
    ).withColumn("__tag", F.lit(0))

    # align schemas: left keeps its own columns; right value columns renamed
    renamed = [F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    rhs = rhs.select(*keys, on, "__tag", *renamed)
    lhs_cols = [c for c in left.columns]
    lhs = lhs.select(*lhs_cols, "__tag", *[F.lit(None).cast(t.dataType).alias(f"{c}{suffix}")
                                           for c, t in zip(value_cols,
                                                           [right.schema[c] for c in value_cols])])
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # reference rows (__tag=0) sort before probe rows at equal ts, so a right
    # row with ts == left.ts is visible to that left row
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("__tag") == 1).select(
        *lhs_cols,
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
