"""Cross-engine deterministic hashing for oracle-able operators.

``md5_long`` maps a string to a 60-bit BIGINT that any engine with md5 +
hex parsing reproduces bit-for-bit:

- Spark : ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to LONG
- DuckDB: ``CAST(CONCAT('0x', SUBSTR(MD5(x), 1, 15)) AS BIGINT)``
- Python: ``int(hashlib.md5(x.encode()).hexdigest()[:15], 16)``

15 hex digits = 60 bits keeps every downstream shift/chunk/band in
positive signed-64 territory (no sign-bit edge cases in either engine).
The same construction powers the deterministic sampling lottery
(operators/sampling.py, which compares the hex prefix lexicographically);
here the *integer* form feeds SimHash token hashing (operators/dedup.py)
and sign-LSH hyperplane derivation (operators/similarity.py), which is
what makes those operators driver-oracle-able.  xxhash64 is cheaper per
call but has no cross-engine twin; in both operators hashing is a small
fraction of runtime (the shuffles dominate), so the reproducible hash is
the default.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: width of the md5-derived hash (15 hex digits)
MD5_LONG_BITS = 60


def hex15_long(col: str | Column) -> Column:
    """First 15 hex digits of an md5-hex column as a 60-bit LONG — for
    callers that already hold the digest (operators/substr.py's
    content-sampled stride); :func:`md5_long` composes it with md5."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(c, 1, 15), 16, 10).cast("long")


def md5_long(col: str | Column) -> Column:
    """60-bit md5-derived hash of a string column as LONG (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return hex15_long(F.md5(c))


def md5_long_py(s: str) -> int:
    """Python twin of :func:`md5_long` (reference tests, derived constants)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_long_duckdb(expr: str) -> str:
    """DuckDB SQL twin of :func:`md5_long` over a varchar expression."""
    return f"CAST(CONCAT('0x', SUBSTR(MD5({expr}), 1, 15)) AS BIGINT)"
