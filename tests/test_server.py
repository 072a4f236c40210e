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


# -- Beeswax protocol twin (impala-beeswax-server.cc operation names) --


def test_beeswax_query_fetch_lifecycle(client):
    """query → get_state → get_results_metadata → paged TSV fetch →
    close, the Beeswax lifecycle impala_shell drives (shell/
    impala_shell.py connects over beeswax in the reference)."""
    h = client.call(
        op="beeswax.query",
        sql="select n_nationkey, n_name from nation order by n_nationkey",
    )["handle"]
    assert client.call(op="beeswax.get_state", handle=h)["state"] == "FINISHED"
    md = client.call(op="beeswax.get_results_metadata", handle=h)["schema"]
    assert [c["name"] for c in md] == ["n_nationkey", "n_name"]
    assert all("type" in c for c in md)
    data, pages = [], 0
    while True:
        fr = client.call(op="beeswax.fetch", handle=h, fetch_size=10)
        data.extend(fr["data"])
        pages += 1
        if not fr["has_more"]:
            break
    client.call(op="beeswax.close", handle=h)
    assert pages > 1
    assert len(data) == 25
    # Beeswax wire shape: rows are tab-delimited ASCII strings
    assert data[0] == "0\tNATION_0"


def test_beeswax_execute_and_wait_and_echo(client):
    h = client.call(op="beeswax.executeAndWait", sql="select 1 as one")["handle"]
    fr = client.call(op="beeswax.fetch", handle=h, fetch_size=10)
    assert fr["data"] == ["1"] and not fr["has_more"]
    client.call(op="beeswax.close", handle=h)
    assert client.call(op="beeswax.echo", s="hello")["echo"] == "hello"


def test_beeswax_null_renders_as_NULL(client):
    h = client.call(op="beeswax.query", sql="select cast(null as int) as n, 'x' as s")["handle"]
    fr = client.call(op="beeswax.fetch", handle=h, fetch_size=2)
    assert fr["data"] == ["NULL\tx"]
    client.call(op="beeswax.close", handle=h)


def test_beeswax_start_over_not_implemented(client):
    h = client.call(op="beeswax.query", sql="select 1 as one")["handle"]
    with pytest.raises(RuntimeError, match="start over"):
        client.call(op="beeswax.fetch", handle=h, start_over=True)
    client.call(op="beeswax.close", handle=h)


def test_beeswax_invalid_handle(client):
    for bop in ("beeswax.fetch", "beeswax.get_results_metadata", "beeswax.get_state"):
        with pytest.raises(RuntimeError, match="Invalid query handle"):
            client.call(op=bop, handle=424242)


def test_beeswax_fetch_size_zero_is_clamped(client):
    """beeswax.fetch with fetch_size<=0 must not return an eos-less
    empty page (a drain-until-has_more client would spin forever); the
    jsonl twin now clamps to 1024 like the thrift server (round-4
    advice)."""
    h = client.call(op="beeswax.query", sql="select r_regionkey from region")["handle"]
    fr = client.call(op="beeswax.fetch", handle=h, fetch_size=0)
    assert len(fr["data"]) == 5 and fr["has_more"] is False
    client.call(op="beeswax.close", handle=h)
