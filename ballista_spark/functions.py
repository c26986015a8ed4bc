"""Expression & function namespace with Ballista's declared surface.

Reference:
- scalar function wire enum (33 entries): ``ballista.proto:80-114``
- aggregate enum (MIN MAX SUM AVG COUNT): ``ballista.proto:121-127``
- Python function wrappers: ``python/src/functions.rs:9-171`` (adds ``ln``,
  ``concat``, ``array``, ``count_distinct``, ``case/when``)
- expression builders (alias/cast/between/isin/case): ``python/src/expression.rs``

Per SURVEY.md §7.3 we implement the *full declared* enum — including the
entries whose wire deserialization was broken in the reference
(asin/acos/concat/to_timestamp/array/nullif/date_trunc/md5,
``serde/logical_plan/from_proto.rs:898-923``) — the declared surface is the
spec.  Every function delegates to ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd): no Python UDFs on this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    # column/literal/expression builders
    "col", "lit", "alias", "cast", "when", "case",
    # math (ballista.proto:81-97)
    "sqrt", "sin", "cos", "tan", "asin", "acos", "atan", "exp",
    "log", "ln", "log2", "log10", "floor", "ceil", "round", "trunc",
    "abs", "signum",
    # string (ballista.proto:98-105)
    "octet_length", "concat", "lower", "upper", "trim", "ltrim", "rtrim",
    # date/time, misc (ballista.proto:106-109)
    "to_timestamp", "array", "nullif", "date_trunc",
    # hashes (ballista.proto:110-114)
    "md5", "sha224", "sha256", "sha384", "sha512",
    # aggregates (ballista.proto:121-127 + python count_distinct)
    "min", "max", "sum", "avg", "count", "count_distinct",
]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# --- builders (python/src/expression.rs:67-179) -----------------------------

col = F.col
lit = F.lit


def alias(expr: Column, name: str) -> Column:
    return _c(expr).alias(name)


def cast(expr: Column, to) -> Column:
    """CAST(expr AS type) — accepts Spark DataType or an Arrow alias string."""
    from ballista_spark.types import arrow_name_to_spark

    if isinstance(to, str):
        try:
            to = arrow_name_to_spark(to)
        except Exception:
            pass  # let Spark parse e.g. "decimal(10,2)" DDL itself
    return _c(expr).cast(to)


when = F.when


class case:  # noqa: N801 - mirrors the reference's builder name
    """CASE [expr] WHEN … THEN … [ELSE …] END builder.

    Mirrors the fluent builder in ``python/src/expression.rs:186-304``
    (``case(expr).when(v, then).otherwise(else_)``).
    """

    def __init__(self, expr=None):
        self._expr = _c(expr) if expr is not None else None
        self._col: Column | None = None

    def when(self, condition, value) -> "case":
        cond = (self._expr == F.lit(condition)) if self._expr is not None else condition
        self._col = F.when(cond, value) if self._col is None else self._col.when(cond, value)
        return self

    def otherwise(self, value) -> Column:
        if self._col is None:
            raise ValueError("case requires at least one when()")
        return self._col.otherwise(value)

    def end(self) -> Column:
        if self._col is None:
            raise ValueError("case requires at least one when()")
        return self._col


# --- math --------------------------------------------------------------------

sqrt = F.sqrt
sin = F.sin
cos = F.cos
tan = F.tan
asin = F.asin
acos = F.acos
atan = F.atan
exp = F.exp


def log(x) -> Column:
    """Natural log — DataFusion's LOG is ln (python/src/functions.rs maps both)."""
    return F.log(_c(x))


ln = log
log2 = F.log2
log10 = F.log10
floor = F.floor
ceil = F.ceil


def round(x, scale: int = 0) -> Column:  # noqa: A001 - reference name
    return F.round(_c(x), scale)


def trunc(x, scale: int = 0) -> Column:
    """Numeric truncation toward zero (Arrow's trunc kernel; Spark's TRUNC
    is date-only, so compose sign·floor(|x|·10^s)/10^s).  Valid for
    |x|·10^s < 2^63 — ample for the engine's numeric ranges."""
    c = _c(x).cast("double")
    p = F.lit(float(10 ** scale))
    return F.signum(c) * F.floor(F.abs(c) * p).cast("double") / p


abs = F.abs  # noqa: A001 - reference name
signum = F.signum

# --- string ------------------------------------------------------------------

octet_length = F.octet_length


def concat(*cols) -> Column:
    return F.concat(*[_c(c) for c in cols])


lower = F.lower
upper = F.upper
trim = F.trim
ltrim = F.ltrim
rtrim = F.rtrim

# --- date/time & misc --------------------------------------------------------

to_timestamp = F.to_timestamp


def array(*cols) -> Column:
    return F.array(*[_c(c) for c in cols])


def nullif(a, b) -> Column:
    return F.nullif(_c(a), _c(b))


def date_trunc(unit: str, ts) -> Column:
    return F.date_trunc(unit, _c(ts))


# --- hashes ------------------------------------------------------------------

md5 = F.md5


def sha224(x) -> Column:
    return F.sha2(_c(x), 224)


def sha256(x) -> Column:
    return F.sha2(_c(x), 256)


def sha384(x) -> Column:
    return F.sha2(_c(x), 384)


def sha512(x) -> Column:
    return F.sha2(_c(x), 512)


# --- aggregates (ballista.proto:121-127) ------------------------------------

min = F.min  # noqa: A001 - reference name
max = F.max  # noqa: A001 - reference name
sum = F.sum  # noqa: A001 - reference name
avg = F.avg
count = F.count


def count_distinct(*cols) -> Column:
    """COUNT(DISTINCT …) — exposed by the reference's Python API
    (``python/src/functions.rs:59-64``) though its wire serde forced
    distinct=false; here it is fully functional."""
    return F.countDistinct(*[_c(c) for c in cols])
