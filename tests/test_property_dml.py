"""Property tests for the copy-on-write DML layer: random tables and
predicate stacks drive DELETE/UPDATE against a plain-Python row mirror —
the storage machinery (stats prune, exact probe, touch-only rewrite,
commit) must produce exactly the rows the mirror predicts, at every
file layout hypothesis invents.

One Spark table build per example would be minutes-slow; instead each
example builds a SMALL multi-file table (2-4 commits) and runs one
mutation, with hypothesis shrinking over the row/predicate content.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ballista_spark.sources.deltalog import (
    delete_from_delta_table,
    read_delta_table,
    update_delta_table,
    write_delta_table,
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # id
        st.sampled_from(["a", "b", "c", None]),    # cat
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-1e6, max_value=1e6)),
    ),
    min_size=1,
    max_size=16,
)
TRIPLE = st.one_of(
    st.tuples(st.just("id"),
              st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
              st.integers(min_value=-50, max_value=50)),
    st.tuples(st.just("cat"), st.sampled_from(["=", "!="]),
              st.sampled_from(["a", "b", "z"])),
    st.tuples(st.just("v"), st.just("is_null"), st.none()),
)
FILTERS = st.lists(TRIPLE, min_size=1, max_size=3)

_OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


def _key(t):
    """None-safe total order for (id, cat, v) tuples."""
    return (
        t[0],
        (t[1] is None, t[1] or ""),
        (t[2] is None, t[2] if t[2] is not None else 0.0),
    )


def _pred(row, filters):
    """SQL three-valued AND over the triples; None = unknown."""
    acc = True
    for col, op, val in filters:
        x = {"id": row[0], "cat": row[1], "v": row[2]}[col]
        if op == "is_null":
            term = x is None
        elif x is None:
            term = None
        else:
            term = _OPS[op](x, val)
        if term is False:
            return False
        if term is None:
            acc = None
    return acc


def _build(spark, tmp, rows, n_commits):
    path = str(tmp)
    chunk = max(1, len(rows) // n_commits)
    for i in range(0, len(rows), chunk):
        write_delta_table(
            spark.createDataFrame(
                rows[i : i + chunk], "id long, cat string, v double"
            ).coalesce(1),
            path,
        )
    return path


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS, filters=FILTERS, n_commits=st.integers(2, 3))
def test_delete_matches_row_mirror(spark, tmp_path_factory, rows, filters, n_commits):
    path = _build(
        spark, tmp_path_factory.mktemp("dml"), rows, n_commits
    )
    delete_from_delta_table(spark, path, filters)
    got = sorted(
        ((r["id"], r["cat"], r["v"]) for r in read_delta_table(spark, path).collect()),
        key=_key,
    )
    # SQL DELETE keeps rows whose predicate is FALSE or NULL
    want = sorted((r for r in rows if _pred(r, filters) is not True), key=_key)
    assert got == want


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS, filters=FILTERS, n_commits=st.integers(2, 3))
def test_update_matches_row_mirror(spark, tmp_path_factory, rows, filters, n_commits):
    path = _build(
        spark, tmp_path_factory.mktemp("dml"), rows, n_commits
    )
    update_delta_table(
        spark, path, {"v": "coalesce(v, 0.0) + 1000"}, filters
    )
    got = sorted(
        ((r["id"], r["cat"], r["v"]) for r in read_delta_table(spark, path).collect()),
        key=_key,
    )
    # SQL UPDATE applies only where the predicate is TRUE
    want = sorted(
        (
            (r[0], r[1], ((r[2] or 0.0) + 1000) if _pred(r, filters) is True else r[2])
            for r in rows
        ),
        key=_key,
    )
    assert got == want
