"""Cross-engine parity of the md5-derived 60-bit hash — the foundation the
SimHash / LSH / sampling oracles stand on.  If Spark, DuckDB and Python
ever disagree on one value, every hash-dependent oracle comparison breaks,
so this is pinned directly, including unicode and edge strings."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ballista_spark.operators.hashing import (
    MD5_LONG_BITS,
    md5_long,
    md5_long_duckdb,
    md5_long_py,
)

EDGE = ["", " ", "hello", "a" * 1000, "Ünïcode ✓ 漢字", "\t\n", "0x", "'; --"]


def test_md5_long_three_engine_parity(spark):
    con = duckdb.connect()
    df = spark.createDataFrame([(v,) for v in EDGE], ["v"])
    got = {r["v"]: r["h"] for r in df.select("v", md5_long("v").alias("h")).collect()}
    for v in EDGE:
        expect = md5_long_py(v)
        assert got[v] == expect, v
        assert con.execute(f"SELECT {md5_long_duckdb('?')}", [v]).fetchone()[0] == expect, v
        assert 0 <= expect < (1 << MD5_LONG_BITS)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=64))
def test_md5_long_python_duckdb_property(duck, s):
    # surrogates can't round-trip through UTF-8; hashing contract is UTF-8
    try:
        s.encode("utf-8")
    except UnicodeEncodeError:
        pytest.skip("unpaired surrogate")
    expect = md5_long_py(s)
    assert duck.execute(f"SELECT {md5_long_duckdb('?')}", [s]).fetchone()[0] == expect
    assert 0 <= expect < (1 << MD5_LONG_BITS)


def test_hyperplane_values_are_md5_derived(duck):
    """The inlined LSH hyperplane constants equal the documented md5
    formula recomputed by DuckDB — proving the literals are derived, not
    arbitrary (and that an oracle could re-derive them in SQL)."""
    from ballista_spark.operators.similarity import _hyperplane_values

    vals = _hyperplane_values(8, plane=2, table=5)
    for i, v in enumerate(vals):
        d = duck.execute(
            f"SELECT ({md5_long_duckdb('?')} % 100000) / 100000.0 - 0.5",
            [f"t5p2:{i}"],
        ).fetchone()[0]
        assert v == d, (i, v, d)
        assert -0.5 <= v < 0.5
