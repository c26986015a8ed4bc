"""Pin the staleness contract of the r10 plan caches (VERDICT r10 item 8).

``sources.registry.load_table`` caches *unresolved plans* per
(session, sf_dir, name) and ``operators.partitioning.probe_num_partitions``
caches the partition count per analyzed-plan semanticHash.  Both are
correct only while the source file layout is immutable within the
process — true for the driver's static scale-factor corpora, false in
general for tables the engine itself writes.  These tests document the
boundary: the caches serve exactly the static corpora, never a
self-written path, and hold plans/metadata rather than data.
"""

from __future__ import annotations

import glob
import os

from ballista_spark.sources.registry import TABLES, _CACHE_ATTR, load_table

SF_SMOKE = os.environ.get("BS_TEST_SF_DIR", "/root/testdata/sf0.001")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_table_cache_holds_plans_not_data(spark):
    """The cache entry is a DataFrame (a plan); materialization happens per
    action — two collects of a cached table run two scans of the files."""
    df1 = load_table(spark, SF_SMOKE, "nation")
    df2 = load_table(spark, SF_SMOKE, "nation")
    assert df1 is df2  # plan object cached...
    cache = getattr(spark, _CACHE_ATTR)
    assert (SF_SMOKE, "nation") in cache
    # ...but never pinned data: no storage level set on the cached frame
    assert df1.storageLevel.useMemory is False
    assert df1.storageLevel.useDisk is False


def test_load_table_serves_only_canonical_static_tables():
    """Every load_table call site in the package passes a canonical table
    name — no query path routes a self-written (lakehouse/bucketed) table
    through the plan cache.  A grep-level guard: call sites use string
    literals, so any new non-canonical route shows up here."""
    import re

    pat = re.compile(r"load_table\(\s*[\w.]+,\s*[\w.]+,\s*[\"'](\w+)[\"']")
    names = set()
    for path in glob.glob(
        os.path.join(REPO, "ballista_spark", "**", "*.py"), recursive=True
    ):
        with open(path) as f:
            names.update(pat.findall(f.read()))
    assert names  # the grep still matches something
    assert names <= set(TABLES), f"non-canonical load_table targets: {names - set(TABLES)}"


def test_no_query_path_writes_into_sf_dir():
    """The immutability assumption behind both plan caches: nothing under
    ballista_spark/queries writes into the scale-factor directory it
    reads.  Write sinks in the graded builders target temp dirs /
    warehouse paths, never ``sf_dir``."""
    import re

    # a .write/.writeTo chained onto something parameterized by sf_dir
    bad = re.compile(r"\.write.*sf_dir|sf_dir.*\.parquet\(.*mode|\.save\(\s*sf_dir")
    for path in glob.glob(os.path.join(REPO, "ballista_spark", "queries", "*.py")):
        with open(path) as f:
            for i, line in enumerate(f, 1):
                assert not bad.search(line), f"{path}:{i}: write into sf_dir? {line!r}"
