"""Query-corpus plumbing shared by the TPC-H / coverage / pipeline suites.

Each suite is a ``dict[name, Query]``.  A ``Query`` carries the Spark-side
implementation (SQL text or a DataFrame builder) and, when the semantics are
SQL-expressible, a DuckDB oracle SQL string used by the driver's correctness
gate (and by our own tests).

Hash-stability discipline (why the SQL below looks the way it does):
the driver compares Spark vs DuckDB results by value hash, so floating-point
aggregates must be *bit-identical* across engines.  Double summation is
order-dependent, so every money/quantity sum goes through
``CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)``:

- the per-row expression is IEEE-double arithmetic — deterministic and
  identical in both engines;
- the cast to DECIMAL(18,6) rounds to nearest; exact-halfway ties cannot
  occur at scale 6 (x.0000005 is not representable as a binary double);
- decimal summation is exact and order-independent;
- the final cast to DOUBLE is deterministic.

Integer-typed results are cast to BIGINT on both sides (DuckDB's SUM(int)
returns HUGEINT, EXTRACT returns BIGINT vs Spark's INT, …).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ballista_spark.sources.registry import TABLES, register_tables


@dataclass(frozen=True)
class Query:
    """One corpus entry.

    ``sql``     — Spark SQL text (run over the registered canonical tables), or
    ``builder`` — a (spark, sf_dir) -> DataFrame callable for DataFrame-API /
                  non-SQL operators.
    ``oracle``  — DuckDB SQL for the driver's correctness gate; None for
                  non-SQL-expressible ops (driver then does a rows-only check).
                  Defaults to ``sql`` when oracle_same_as_sql.
    """

    doc: str
    sql: str | None = None
    builder: Callable[[SparkSession, str], DataFrame] | None = None
    oracle: str | None = None
    oracle_same_as_sql: bool = True
    tables: tuple[str, ...] = field(default=TABLES)

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        if self.builder is not None:
            return self.builder(spark, sf_dir)
        register_tables(spark, sf_dir, self.tables)
        assert self.sql is not None
        return spark.sql(self.sql)

    def oracle_text(self) -> str | None:
        if self.oracle is not None:
            return self.oracle
        return self.sql if self.oracle_same_as_sql else None


def dec_sum(expr: str, alias: str | None = None) -> str:
    """Order-independent, engine-identical SUM over a double expression.

    The final ROUND(…, 2) (money granularity; identical half-away-from-zero
    decimal rounding in both engines) absorbs the one residual cross-engine
    divergence: at very large row counts a handful of per-row double→decimal
    casts can land on exact decimal halfway points where Spark's
    shortest-repr HALF_UP and DuckDB's binary-exact casts disagree, nudging
    the exact sums apart by ~1e-6.
    """
    s = f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(18,6))), 2) AS DOUBLE)"
    return f"{s} AS {alias}" if alias else s


def dec_avg(expr: str, alias: str | None = None) -> str:
    """Exact-sum / count, rounded to 6 decimals (same rationale as
    :func:`dec_sum` — the quotient inherits any sub-ulp sum divergence)."""
    s = (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), 6)"
    )
    return f"{s} AS {alias}" if alias else s


def big_sum(expr: str, alias: str | None = None) -> str:
    """SUM of an integer expression, pinned to BIGINT on both engines."""
    s = f"CAST(SUM({expr}) AS BIGINT)"
    return f"{s} AS {alias}" if alias else s


def year_of(expr: str) -> str:
    """EXTRACT(YEAR ...) pinned to BIGINT (Spark: INT, DuckDB: BIGINT)."""
    return f"CAST(EXTRACT(YEAR FROM {expr}) AS BIGINT)"


def _matching_paren(s: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at ``open_idx``."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced parens after {open_idx}: {s[open_idx:open_idx+80]}")


def spec_dialect(sql: str) -> str:
    """Strip the oracle hash-stability decimal casts, restoring plain TPC-H
    spec arithmetic: every ``CAST(x AS DECIMAL(18,6))`` becomes ``(x)``.

    The decimal-cast discipline exists solely so DuckDB and Spark produce
    bit-identical value hashes in the correctness gate; its *per-row*
    decimal128 arithmetic costs ~5× on aggregate-heavy queries vs native
    double sums (measured on q1: 2.5 s vs 0.45 s steady-state at sf0.1).
    The benchmark — like the reference, whose q1.sql sums raw doubles —
    times this dialect; the oracle corpus keeps the decimal form.  Residual
    ROUND/CAST-to-DOUBLE wrappers are per-*group* and cost nothing.  Purely
    mechanical (paren-matched), so the two dialects cannot drift
    structurally — tests assert value agreement within the documented
    rounding quanta.
    """
    suffix = " AS DECIMAL(18,6))"
    pos = 0
    while (i := sql.find("CAST(", pos)) != -1:
        close = _matching_paren(sql, i + len("CAST"))
        segment = sql[i : close + 1]
        if segment.endswith(suffix):
            expr = sql[i + len("CAST(") : close + 1 - len(suffix)]
            sql = sql[:i] + f"({expr})" + sql[close + 1 :]
            pos = i  # rescan from here: expr may contain nested casts
        else:
            pos = i + len("CAST(")
    return sql
