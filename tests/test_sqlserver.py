"""JDBC-over-the-wire smoke: a real external JDBC client (beeline) dials
the Thrift endpoint and gets the same answer as an in-process query —
the parity test for the reference's JDBC driver
(jvm/jdbc/src/main/java/org/ballistacompute/jdbc/Driver.java)."""

from __future__ import annotations

import os
import subprocess
import time

import pytest

from ballista_spark.server import beeline_path, start_sql_server
from tests.conftest import SF_SMOKE

PORT = 10641  # away from the 10000 default to dodge stray servers


@pytest.mark.skipif(beeline_path() is None, reason="no bundled beeline client")
def test_jdbc_client_round_trip(spark):
    import pyspark

    url = start_sql_server(spark, port=PORT, publish_sf_dir=SF_SMOKE)
    sql = (
        "SELECT c_mktsegment, COUNT(*) AS n FROM global_temp.customer "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )
    want = [(r.c_mktsegment, r.n) for r in spark.sql(sql).collect()]

    deadline = time.time() + 60
    last = None
    while time.time() < deadline:
        proc = subprocess.run(
            [beeline_path(), "-u", url, "--outputformat=tsv2", "-e", sql],
            capture_output=True,
            text=True,
            timeout=120,
            env=dict(os.environ, SPARK_HOME=os.path.dirname(pyspark.__file__)),
        )
        last = proc
        if proc.returncode == 0:
            break
        time.sleep(2)  # server may still be binding the port
    assert last is not None and last.returncode == 0, (last.stdout, last.stderr[-800:])

    rows = []
    lines = [l for l in last.stdout.splitlines() if "\t" in l]
    for line in lines[1:]:  # first tabbed line is the header
        seg, n = line.split("\t")
        rows.append((seg, int(n)))
    assert rows == want
