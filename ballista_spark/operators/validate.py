"""Data-contract validation — declarative quality checks over a corpus,
compiled into the FEWEST possible passes (Deequ's architecture, stated
in Schelter et al. 2018 "Automating large-scale data quality
verification"): every row-level check becomes one conditional aggregate
in ONE ``agg()`` over the table; only uniqueness and referential
integrity get their own (unavoidable) shuffles.

This is the publish gate of the pipeline: a curated corpus lands in the
lakehouse only if its contract holds (`enforce`), and the report itself
is a DataFrame — writable next to the table as the data-quality record.

Scale: one scan + one map-side-combined aggregation for N row-level
checks (adding a check costs one expression, not one pass); uniqueness
is the two-phase exact count-distinct shape; referential integrity is
ONE anti-join counted (the dimension side is whatever the optimizer
picks — broadcast for small reference sets).  Nothing is collected but
the report rows (one per check).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "row_count",
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "matches_regex",
    "mean_between",
    "referential",
    "validate",
    "enforce",
    "ContractViolation",
]


class ContractViolation(RuntimeError):
    """Raised by :func:`enforce` with the failed checks listed."""


@dataclass(frozen=True)
class Check:
    kind: str
    name: str
    column: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: tuple | None = None
    pattern: str | None = None
    min_frac: float = 1.0
    other: DataFrame | None = None
    other_column: str | None = None


def row_count(lo: int = 1, hi: int | None = None) -> Check:
    """Total rows in [lo, hi] — the emptiness/explosion guard."""
    return Check("row_count", f"row_count[{lo},{hi or '∞'}]", lo=lo, hi=hi)


def not_null(column: str, max_null_frac: float = 0.0) -> Check:
    """NULL fraction of ``column`` ≤ ``max_null_frac``."""
    return Check(
        "not_null", f"not_null({column})", column=column,
        hi=max_null_frac,
    )


def unique(column: str) -> Check:
    """No duplicate values in ``column`` (NULLs don't count as dups —
    SQL UNIQUE semantics)."""
    return Check("unique", f"unique({column})", column=column)


def in_range(column: str, lo, hi) -> Check:
    """Every non-NULL value within [lo, hi]."""
    return Check("in_range", f"in_range({column})", column=column, lo=lo, hi=hi)


def accepted_values(column: str, values, min_frac: float = 1.0) -> Check:
    """≥ ``min_frac`` of non-NULL values inside the accepted set."""
    return Check(
        "accepted_values", f"accepted_values({column})", column=column,
        values=tuple(values), min_frac=min_frac,
    )


def matches_regex(column: str, pattern: str, min_frac: float = 1.0) -> Check:
    """≥ ``min_frac`` of non-NULL values matching ``pattern``."""
    return Check(
        "matches_regex", f"matches_regex({column})", column=column,
        pattern=pattern, min_frac=min_frac,
    )


def mean_between(column: str, lo: float, hi: float) -> Check:
    """Column mean within [lo, hi] — the cheap drift tripwire."""
    return Check("mean_between", f"mean_between({column})", column=column,
                 lo=lo, hi=hi)


def referential(column: str, other: DataFrame, other_column: str) -> Check:
    """Every non-NULL ``column`` value exists in ``other.other_column``
    (foreign-key integrity)."""
    return Check(
        "referential", f"referential({column})", column=column,
        other=other, other_column=other_column,
    )


def _observed_exprs(checks: list[Check]) -> list:
    """One conditional aggregate per row-level check — all of them ride
    a single agg() pass."""
    exprs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(checks):
        col = F.col(c.column) if c.column else None
        if c.kind == "not_null":
            e = F.sum(F.when(col.isNull(), 1).otherwise(0))
        elif c.kind == "in_range":
            e = F.sum(
                F.when(col.isNotNull() & ~col.between(c.lo, c.hi), 1).otherwise(0)
            )
            exprs.append(F.count(col).alias(f"__nn{i}"))
        elif c.kind == "accepted_values":
            e = F.sum(
                F.when(
                    col.isNotNull() & ~col.isin(*c.values), 1
                ).otherwise(0)
            )
            exprs.append(F.count(col).alias(f"__nn{i}"))
        elif c.kind == "matches_regex":
            e = F.sum(
                F.when(col.isNotNull() & ~col.rlike(c.pattern), 1).otherwise(0)
            )
            exprs.append(F.count(col).alias(f"__nn{i}"))
        elif c.kind == "mean_between":
            e = F.avg(col)
        elif c.kind == "row_count":
            e = F.count(F.lit(1))
        elif c.kind == "unique":
            # rides the shared pass too (r10): COUNT(col)/COUNT(DISTINCT col)
            # ignore NULLs exactly like the old where(isNotNull) second job,
            # so the report is identical with one data pass instead of two
            exprs.append(F.count(col).alias(f"__nn{i}"))
            e = F.countDistinct(col)
        else:  # referential needs its own anti-join pass
            continue
        exprs.append(e.alias(f"__c{i}"))
    return exprs


def validate(
    df: DataFrame, checks: list[Check]
) -> tuple[DataFrame, bool]:
    """Run the contract; returns ``(report, passed)``.  The report has
    one row per check: (check, column, observed, threshold, passed) —
    ``observed`` is the violation count (or the observed statistic for
    row_count/mean), stringly typed so heterogeneous checks share one
    schema."""
    spark = df.sparkSession
    checks = list(checks)
    agg_row = df.agg(*_observed_exprs(checks)).collect()[0]
    n = agg_row["__n"]
    rows = []
    for i, c in enumerate(checks):
        if c.kind == "row_count":
            ok = n >= (c.lo or 0) and (c.hi is None or n <= c.hi)
            rows.append((c.name, None, str(n), f"[{c.lo},{c.hi}]", ok))
        elif c.kind == "not_null":
            nulls = agg_row[f"__c{i}"] or 0
            frac = (nulls / n) if n else 0.0
            ok = frac <= (c.hi or 0.0)
            rows.append(
                (c.name, c.column, f"{nulls} nulls ({frac:.6f})",
                 f"frac<={c.hi}", ok)
            )
        elif c.kind in ("in_range", "accepted_values", "matches_regex"):
            bad = agg_row[f"__c{i}"] or 0
            nn = agg_row[f"__nn{i}"] or 0
            # NULLs neither pass nor fail: fractions are over the
            # NON-NULL values (vacuously ok on an all-NULL column —
            # pair with not_null to bound the NULL budget)
            frac_bad = (bad / nn) if nn else 0.0
            ok = (1.0 - frac_bad) >= c.min_frac
            rows.append(
                (c.name, c.column, f"{bad} violations ({frac_bad:.6f})",
                 f"ok_frac>={c.min_frac}", ok)
            )
        elif c.kind == "mean_between":
            mean = agg_row[f"__c{i}"]
            ok = mean is not None and c.lo <= mean <= c.hi
            rows.append(
                (c.name, c.column, f"mean={mean}", f"[{c.lo},{c.hi}]", ok)
            )
        elif c.kind == "unique":
            # exact distinct vs total (NULLs excluded per SQL), computed
            # in the shared single agg pass
            dups = (agg_row[f"__nn{i}"] or 0) - (agg_row[f"__c{i}"] or 0)
            ok = dups == 0
            rows.append((c.name, c.column, f"{dups} duplicate rows", "0", ok))
        elif c.kind == "referential":
            orphans = (
                df.select(F.col(c.column).alias("__k"))
                .where(F.col("__k").isNotNull())
                .join(
                    c.other.select(
                        F.col(c.other_column).alias("__k")
                    ).distinct(),
                    "__k",
                    "left_anti",
                )
                .count()
            )
            ok = orphans == 0
            rows.append((c.name, c.column, f"{orphans} orphans", "0", ok))
        else:  # pragma: no cover
            raise ValueError(f"unknown check kind {c.kind!r}")
    report = spark.createDataFrame(
        rows,
        "check string, column string, observed string, threshold string, "
        "passed boolean",
    )
    return report, all(r[4] for r in rows)


def enforce(df: DataFrame, checks: list[Check]) -> DataFrame:
    """The publish gate: returns ``df`` untouched when the contract
    holds, raises :class:`ContractViolation` naming every failed check
    otherwise."""
    report, ok = validate(df, checks)
    if not ok:
        failed = [
            f"{r['check']}: {r['observed']} (want {r['threshold']})"
            for r in report.collect()
            if not r["passed"]
        ]
        raise ContractViolation(
            "data contract failed: " + "; ".join(failed)
        )
    return df
