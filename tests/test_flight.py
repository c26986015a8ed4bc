"""Arrow Flight round-trips: registered tables and SQL results fetched
through a real grpc client (pyarrow.flight.connect) match direct
collection — the reference's Flight data plane
(rust/executor/src/flight_service.rs:90-133) in function."""

from __future__ import annotations

import json

import pytest

flight = pytest.importorskip("pyarrow.flight")

from ballista_spark.flight import start_flight_server  # noqa: E402
from ballista_spark.sources.registry import register_tables  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402


@pytest.fixture(scope="module")
def served(spark):
    register_tables(spark, SF_SMOKE)
    server = start_flight_server(spark, "grpc://127.0.0.1:0")
    client = flight.connect(f"grpc://127.0.0.1:{server.port}")
    yield spark, client
    client.close()
    server.shutdown()


def _fetch(client, request: dict):
    ticket = flight.Ticket(json.dumps(request).encode("utf-8"))
    return client.do_get(ticket).read_all()


def test_table_fetch_roundtrip(served):
    spark, client = served
    got = _fetch(client, {"table": "region"})
    want = spark.table("region").toArrow()
    assert got.schema.equals(want.schema)
    assert got.sort_by("r_regionkey").equals(want.sort_by("r_regionkey"))


def test_sql_fetch_roundtrip(served):
    spark, client = served
    sql = (
        "SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS q "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    got = _fetch(client, {"sql": sql})
    want = {r["l_returnflag"]: (r["n"], r["q"]) for r in spark.sql(sql).collect()}
    assert {
        f: (n, q)
        for f, n, q in zip(
            got["l_returnflag"].to_pylist(), got["n"].to_pylist(), got["q"].to_pylist()
        )
    } == want


def test_flight_info_schema_discovery(served):
    _, client = served
    desc = flight.FlightDescriptor.for_path("nation")
    info = client.get_flight_info(desc)
    assert {f.name for f in info.schema} >= {"n_nationkey", "n_name"}
    # the endpoint's ticket re-fetches the same table
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.num_rows > 0


def test_list_flights_enumerates_catalog(served):
    _, client = served
    names = set()
    for info in client.list_flights():
        names.add(info.descriptor.path[0].decode("utf-8"))
    assert {"region", "nation", "lineitem", "orders"} <= names


def test_bad_ticket_raises(served):
    import pyarrow as pa

    _, client = served
    with pytest.raises((flight.FlightServerError, pa.ArrowInvalid)):
        _fetch(client, {"bogus": 1})
