"""Range (interval) join — point-in-interval matching without the n² blowup.

Semantics: match each left row (point ``ts``) to right rows (intervals
``[start, end)``), optionally within an equi-key.  A naive inequality join
is a cross product per key; the scale path *bins* time into fixed-width
buckets, joins on (key, bin) — an equi-join Spark shuffles efficiently —
and applies the exact interval predicate as a post-filter.  Intervals
spanning multiple bins are exploded to one row per covered bin (bounded by
``max_bins``).

At 100 TB this is the standard trick: the bin join prunes candidates to
the same time neighborhood, the exact filter keeps correctness, and both
sides shuffle once on (key, bin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | None = None,
    bin_width: str = "1 hour",
    how: str = "inner",
    max_bins: int = 10_000,
) -> DataFrame:
    """Join points to half-open intervals [start, end) via bin-bucketing.

    ``bin_width`` is a SQL interval literal body (e.g. ``'1 hour'``); pick
    it near the typical interval length so most intervals cover 1-2 bins.

    ``how`` may be ``inner`` or ``left``: the exact interval predicate is
    part of the *join condition* (not a post-filter), so a left point whose
    bin candidates all fail the predicate is still emitted once,
    null-extended — true left-join semantics.  An interval spanning more
    than ``max_bins`` bins raises at execution time (silent truncation
    would silently drop matches).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    secs = F.unix_timestamp  # seconds resolution is enough for binning
    # bin id = floor(epoch_seconds / width_seconds); width from the interval
    # literal: cast (TIMESTAMP '1970-01-01' + interval) to seconds
    width_expr = F.expr(
        f"CAST(unix_timestamp(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL {bin_width}) AS BIGINT)"
    )

    p = points.withColumn("__bin", (secs(F.col(point_col)).cast("bigint") / width_expr).cast("bigint"))

    iv = (
        intervals.withColumn("__b0", (secs(F.col(start_col)).cast("bigint") / width_expr).cast("bigint"))
        .withColumn("__b1", (secs(F.col(end_col)).cast("bigint") / width_expr).cast("bigint"))
        .withColumn("__nbins", F.col("__b1") - F.col("__b0") + 1)
    )
    # fail loudly on runaway interval/bin-width mismatches — truncating the
    # bin range would silently lose every match past the cap
    iv = iv.withColumn(
        "__nbins",
        F.when(
            F.col("__nbins") > max_bins,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"range_join: interval spans more than max_bins={max_bins} "
                        f"bins of width '{bin_width}' — widen bin_width or raise "
                        "max_bins (interval covers "
                    ),
                    F.col("__nbins").cast("string"),
                    F.lit(" bins)"),
                )
            ).cast("bigint"),
        ).otherwise(F.col("__nbins")),
    )
    # malformed intervals (end < start → nbins <= 0) match no point under
    # half-open [start, end) semantics; drop them BEFORE the sequence —
    # sequence(b0, b0+nbins-1) with a negative nbins would silently generate
    # an unbounded *descending* phantom-bin range that bypasses the cap above
    iv = (
        iv.where(F.col("__nbins") >= 1)
        .withColumn(
            "__bin",
            F.explode(F.sequence(F.col("__b0"), F.col("__b0") + F.col("__nbins") - 1)),
        )
        .drop("__b0", "__b1", "__nbins")
    )

    # a point occupies exactly one bin, so it meets at most one exploded row
    # of each interval: with the exact predicate inside the join condition,
    # inner emits one row per true (point, interval) match and left
    # additionally emits one null-extended row per unmatched point.
    exact = (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    on = p["__bin"] == iv["__bin"]
    if by:
        on = on & (p[by] == iv[by])
    joined = p.join(iv, on & exact, how)
    # drop the duplicated right-side key column and both bin columns
    return joined.drop(iv["__bin"]).drop(p["__bin"]).drop(*([iv[by]] if by else []))
