"""Network entry point (impala_cut_spark/server.py): the HS2-lifecycle
execute/fetch/close protocol over a real TCP socket — closing the §3
lifecycle stage the reference serves via thrift
(be/src/service/impala-hs2-server.cc)."""

from __future__ import annotations

import pytest

from impala_cut_spark.server import QueryClient, QueryServer
from impala_cut_spark.session import ImpalaSession
from impala_cut_spark.sources.catalog import register_views


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    register_views(spark, sf_dir)
    srv = QueryServer(ImpalaSession(spark))
    srv.serve_background()
    yield srv
    srv.shutdown()


@pytest.fixture()
def client(server):
    c = QueryClient(server.host, server.port)
    yield c
    c.close()


def test_ping(client):
    r = client.call(op="ping")
    assert r["ok"] and r["protocol"] == "jsonl-v1"


def test_query_roundtrip(client):
    cols, rows = client.query(
        "select n_name, n_nationkey from nation order by n_nationkey limit 5"
    )
    assert cols == ["n_name", "n_nationkey"]
    assert len(rows) == 5
    assert rows[0][1] == 0


def test_paged_fetch_drains_exactly_once(client):
    r = client.call(op="execute", sql="select o_orderkey from orders order by o_orderkey")
    h = r["handle"]
    total, pages = [], 0
    while True:
        fr = client.call(op="fetch", handle=h, max_rows=100)
        total.extend(fr["rows"])
        pages += 1
        if fr["eos"]:
            break
    client.call(op="close", handle=h)
    assert pages > 1  # really paged
    assert len(total) == len({tuple(r) for r in total})
    ks = [r[0] for r in total]
    assert ks == sorted(ks)


def test_impala_dialect_through_the_wire(client):
    """The server speaks the DIALECT surface, not plain Spark SQL."""
    cols, rows = client.query(
        "select n_nationkey DIV 5 as g, count(*) as n from nation group by 1 order by 1"
    )
    assert cols == ["g", "n"]
    assert rows[0] == [0, 5]


def test_error_is_reported_not_fatal(client):
    with pytest.raises(RuntimeError):
        client.query("select definitely_not_a_column from nation")
    # connection still usable afterwards
    cols, rows = client.query("select count(*) as n from region")
    assert rows[0][0] == 5


def test_set_and_options(client):
    client.call(op="set", key="explain_level", value="2")
    opts = client.call(op="options")["options"]
    assert opts.get("explain_level") == "2"


def test_unknown_handle(client):
    with pytest.raises(RuntimeError):
        client.call(op="fetch", handle=99999)


def test_timestamps_serialize(client):
    cols, rows = client.query("select min(ts) as t from events")
    assert isinstance(rows[0][0], str) and rows[0][0][:2] == "20"


def test_fetch_zero_max_rows_errors_not_hangs(client):
    """max_rows=0 must be a protocol error, not an eos-less empty page
    that hangs drain-until-eos clients (round-3 self-review)."""
    r = client.call(op="execute", sql="select r_regionkey from region")
    with pytest.raises(RuntimeError, match="max_rows"):
        client.call(op="fetch", handle=r["handle"], max_rows=0)
    client.call(op="close", handle=r["handle"])
