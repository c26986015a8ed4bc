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


def test_lsh_bucket_sql_equals_column_construction(spark):
    """The parsed-SQL bucket array (the fast plan-build path) computes
    bit-identical buckets to the per-column lsh_signature construction —
    across non-default plane/table shapes including the wide-OR graded
    setting."""
    from pyspark.sql import functions as F

    from ballista_spark.operators.similarity import (
        _as_double,
        _lsh_bucket_array,
        lsh_signature,
    )
    from ballista_spark.sources.registry import load_table

    import os

    emb = load_table(
        spark, os.environ.get("BS_TEST_SF_DIR", "/root/testdata/sf0.001"), "embeddings"
    )
    base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    for n_planes, n_tables in ((4, 8), (2, 40), (16, 1)):
        old = base.select(
            "vec_id",
            F.array(
                *[
                    lsh_signature(F.col("v"), 64, n_planes, table=t) + F.lit(t << 32)
                    for t in range(n_tables)
                ]
            ).alias("b"),
        )
        new = base.select("vec_id", _lsh_bucket_array("v", 64, n_planes, n_tables).alias("b"))
        o = {r["vec_id"]: list(r["b"]) for r in old.collect()}
        n = {r["vec_id"]: list(r["b"]) for r in new.collect()}
        assert o == n, (n_planes, n_tables)


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
