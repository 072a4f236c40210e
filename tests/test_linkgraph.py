"""Link-graph operators (operators/linkgraph.py): codegen extraction,
host parsing, edge building, and the fixed-point integer PageRank —
checked against a pure-Python replay of the same bigint arithmetic
(the operator contract is bit-stability, so the test is equality, not
tolerance)."""

from __future__ import annotations

import pytest

from impala_cut_spark.operators.linkgraph import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    host_edges,
    host_rank,
    page_links,
    url_host,
)


def _ref_pagerank(edges: list[tuple[str, str]], iterations: int):
    """The update rule from host_rank's docstring in plain ints."""
    hosts = sorted({h for e in edges for h in e})
    n = len(hosts)
    out_deg = {h: 0 for h in hosts}
    for s, _ in edges:
        out_deg[s] += 1
    rank = {h: SCALE // n for h in hosts}
    for _ in range(iterations):
        dangling = sum(rank[h] for h in hosts if out_deg[h] == 0)
        contrib = {h: 0 for h in hosts}
        for s, d in edges:
            contrib[d] += rank[s] // out_deg[s]
        rank = {
            h: (
                (DAMP_DEN - DAMP_NUM) * (SCALE // n)
                + DAMP_NUM * (contrib[h] + dangling // n)
            )
            // DAMP_DEN
            for h in hosts
        }
    return rank, out_deg


class TestExtraction:
    def test_url_host_and_page_links(self, spark):
        import pyspark.sql.functions as F

        html = (
            '<html><a href="http://A.Example/x">1</a>'
            '<A HREF="https://b.example:8080/y?q=1">2</A>'
            '<a class="z" href="/relative">3</a>'
            '<a href="mailto:a@b.c">4</a>'
            '<a href="#frag">5</a>'
            '<a href="HTTPS://C.EXAMPLE/z#frag">6</a></html>'
        )
        df = spark.createDataFrame([(html,)], "html string")
        links = df.select(F.explode(page_links("html")).alias("href"))
        hosts = [
            r.h for r in links.select(url_host(F.col("href")).alias("h"))
            .collect()
        ]
        # relative / mailto / fragment-only → NULL; ports stay part of
        # the authority until the : cut
        assert hosts == ["a.example", "b.example", None, None, "c.example"]

    def test_host_edges_weights_and_self_loops(self, spark):
        rows = [
            ("h1", '<a href="http://h2/x">a</a><a href="http://h2/y">b</a>'),
            ("h1", '<a href="http://h1/self">s</a><a href="http://h3/z">c</a>'),
            ("h2", '<a href="http://h1/w">d</a>'),
        ]
        df = spark.createDataFrame(rows, "host string, html string")
        got = {
            (r.src_host, r.dst_host): r.n_links
            for r in host_edges(df).collect()
        }
        assert got == {("h1", "h2"): 2, ("h1", "h3"): 1, ("h2", "h1"): 1}


class TestHostRank:
    EDGES = [("a", "b"), ("a", "d"), ("b", "a"), ("c", "a")]

    def _spark_edges(self, spark):
        import pyspark.sql.functions as F

        return spark.createDataFrame(
            [(s, d, 1) for s, d in self.EDGES],
            "src_host string, dst_host string, n_links int",
        ).withColumn("n_links", F.col("n_links").cast("long"))

    @pytest.mark.parametrize("iterations", [1, 3])
    def test_matches_reference_bit_for_bit(self, spark, iterations):
        ref, out_deg = _ref_pagerank(self.EDGES, iterations)
        got = {
            r.host: (r.rank_micro, r.in_hosts, r.out_hosts)
            for r in host_rank(
                self._spark_edges(spark), iterations=iterations
            ).collect()
        }
        in_deg = {"a": 2, "b": 1, "c": 0, "d": 1}
        assert got == {
            h: (ref[h], in_deg[h], out_deg[h]) for h in ref
        }

    def test_partitioned_join_equals_broadcast(self, spark):
        e = self._spark_edges(spark)
        b = {r.host: r.rank_micro
             for r in host_rank(e, iterations=2).collect()}
        p = {r.host: r.rank_micro
             for r in host_rank(
                 e, iterations=2, broadcast_ranks=False).collect()}
        assert b == p

    def test_mass_conserved_to_floor_drift(self, spark):
        rows = host_rank(self._spark_edges(spark), iterations=3).collect()
        total = sum(r.rank_micro for r in rows)
        # each share/teleport floor-div loses < 1 unit per host per
        # iteration; bound generously
        assert 0 < SCALE - total < 4 * 3 * DAMP_DEN * 4
        # a (linked by b and c, incl. all of b's mass) outranks c
        # (linked by nobody)
        r = {x.host: x.rank_micro for x in rows}
        assert r["a"] > r["b"] > r["c"]
        assert r["c"] == min(r.values())
