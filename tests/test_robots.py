"""robots.txt (RFC 9309) + sitemap parsing (operators/robots.py):
group selection, longest-match precedence, wildcard/anchor patterns,
sitemap kinds, and the broadcast gate operator."""

from __future__ import annotations

import pytest

from impala_cut_spark.operators.robots import (
    parse_robots,
    robots_allowed,
    robots_gate,
    sitemap_entries,
    sitemap_extract,
)

POLICY = """\
# comment line
User-agent: trainbot
Disallow: /raw/
Allow: /raw/pub/
Crawl-delay: 2.5

User-agent: *
Disallow: /

Sitemap: http://a.example/sitemap.xml
"""


class TestParse:
    def test_group_selection_prefers_longest_token(self):
        r = parse_robots(POLICY, "trainbot-1.0")
        assert r["rules"] == [(False, "/raw/"), (True, "/raw/pub/")]
        assert r["crawl_delay"] == 2.5
        assert r["sitemaps"] == ["http://a.example/sitemap.xml"]
        # an unknown agent falls to the '*' group
        star = parse_robots(POLICY, "otherbot")
        assert star["rules"] == [(False, "/")]
        assert star["crawl_delay"] is None

    def test_consecutive_agents_share_group_and_new_group_splits(self):
        txt = ("User-agent: a\nUser-agent: b\nDisallow: /x\n"
               "User-agent: c\nDisallow: /y\n")
        assert parse_robots(txt, "b")["rules"] == [(False, "/x")]
        assert parse_robots(txt, "c")["rules"] == [(False, "/y")]

    def test_case_insensitive_keys_and_comments(self):
        txt = "USER-AGENT: Bot\nDISALLOW: /a # trailing comment\n"
        assert parse_robots(txt, "bot")["rules"] == [(False, "/a")]

    def test_rules_before_any_agent_ignored(self):
        assert parse_robots("Disallow: /\n", "bot")["rules"] == []


class TestMatch:
    RULES = [(False, "/raw/"), (True, "/raw/pub/")]

    @pytest.mark.parametrize(
        "path,allowed,octets",
        [
            ("/page/1", True, 0),     # nothing matches → allowed
            ("/raw/1", False, 5),
            ("/raw/pub/1", True, 9),
            ("/raw/pub", False, 5),   # prefix edge: no trailing slash
        ],
    )
    def test_longest_match(self, path, allowed, octets):
        assert robots_allowed(self.RULES, path) == (allowed, octets)

    def test_wildcard_and_anchor(self):
        rules = [(False, "/*.pdf$"), (True, "/docs/")]
        assert robots_allowed(rules, "/x/y.pdf") == (False, 5)
        assert robots_allowed(rules, "/x/y.pdf.html")[0] is True
        # both match, but the 6-literal-octet /docs/ allow outscores
        # the 5-octet wildcard disallow under longest-match
        assert robots_allowed(rules, "/docs/a.pdf") == (True, 6)
        # RFC example: equal-length allow/disallow → allow wins
        tie = [(False, "/page"), (True, "/page")]
        assert robots_allowed(tie, "/page/1")[0] is True

    def test_empty_disallow_matches_nothing(self):
        assert robots_allowed([(False, "")], "/any") == (True, 0)


class TestSitemap:
    NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

    def test_urlset_and_whitespace_strip(self):
        xml = (f"<urlset {self.NS}><url><loc> http://a/1 </loc>"
               "<lastmod>2026-01-02</lastmod><priority>0.8</priority>"
               "</url><url><loc>http://a/2</loc></url>"
               "<url><lastmod>2026-01-01</lastmod></url></urlset>")
        es = sitemap_entries(xml.encode())
        assert [e["loc"] for e in es] == ["http://a/1", "http://a/2"]
        assert es[0]["priority"] == "0.8" and es[1]["priority"] is None

    def test_sitemapindex_pointers(self):
        xml = (f"<sitemapindex {self.NS}><sitemap>"
               "<loc>http://a/sm1.xml</loc></sitemap></sitemapindex>")
        es = sitemap_entries(xml.encode())
        assert es == [{"kind": "index", "loc": "http://a/sm1.xml",
                       "lastmod": None, "priority": None}]

    def test_foreign_root_raises(self):
        with pytest.raises(ValueError, match="neither urlset"):
            sitemap_entries(b"<rss/>")

    def test_doctype_gate_applies(self):
        with pytest.raises(ValueError, match="DTD not allowed"):
            sitemap_entries(
                b'<!DOCTYPE x [<!ENTITY a "b">]>'
                b'<urlset xmlns="http://www.sitemaps.org/schemas/'
                b'sitemap/0.9"/>'
            )


class TestOperators:
    def test_gate_missing_robots_defaults_allowed(self, spark):
        urls = spark.createDataFrame(
            [(1, "a.example", "/raw/x"), (2, "b.example", "/raw/x")],
            "url_id bigint, host string, path string",
        )
        robots = spark.createDataFrame(
            [("a.example", POLICY)], "host string, robots_txt string"
        )
        rows = {r.url_id: r
                for r in robots_gate(urls, robots, "trainbot").collect()}
        assert rows[1].allowed is False and rows[1].crawl_delay == 2.5
        # no robots.txt row → the RFC's unreachable default: allowed
        assert rows[2].allowed is True and rows[2].crawl_delay is None

    def test_sitemap_extract_degrade(self, spark):
        xml = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/'
               '0.9"><url><loc>http://a/1</loc></url></urlset>')
        df = spark.createDataFrame(
            [(1, bytearray(xml.encode())), (2, b"<not xml")],
            "source_id bigint, payload binary",
        )
        rows = sorted(sitemap_extract(df).collect(),
                      key=lambda r: r.source_id)
        assert rows[0].parse_ok and rows[0].loc == "http://a/1"
        assert not rows[1].parse_ok


class TestFeeds:
    def test_rss_fields(self):
        from impala_cut_spark.operators.robots import feed_entries

        rss = (b'<rss version="2.0"><channel><title>My Feed</title>'
               b"<item><title>a</title><link>http://x/1</link>"
               b"<pubDate>Sun, 01 Feb 2026 00:00:00 GMT</pubDate>"
               b"<guid>g1</guid></item>"
               b"<item><title>b</title></item></channel></rss>")
        f = feed_entries(rss)
        assert f["kind"] == "rss" and f["feed_title"] == "My Feed"
        assert len(f["entries"]) == 2
        assert f["entries"][0]["link"] == "http://x/1"
        assert f["entries"][1]["link"] is None

    def test_atom_link_attribute(self):
        from impala_cut_spark.operators.robots import feed_entries

        atom = (b'<feed xmlns="http://www.w3.org/2005/Atom">'
                b"<title>A</title><entry><title>e</title>"
                b'<link href="http://y/1"/><updated>2026-02-01</updated>'
                b"<id>i1</id></entry></feed>")
        f = feed_entries(atom)
        assert f["kind"] == "atom"
        assert f["entries"][0]["link"] == "http://y/1"
        assert f["entries"][0]["entry_id"] == "i1"

    def test_foreign_root_and_doctype(self):
        from impala_cut_spark.operators.robots import feed_entries

        with pytest.raises(ValueError, match="neither rss nor atom"):
            feed_entries(b"<html/>")
        with pytest.raises(ValueError, match="DTD not allowed"):
            feed_entries(b'<!DOCTYPE r [<!ENTITY a "b">]><rss/>')

    def test_operator_degrade(self, spark):
        from impala_cut_spark.operators.robots import feed_extract

        rss = (b'<rss version="2.0"><channel><title>F</title>'
               b"<item><title>a</title></item></channel></rss>")
        df = spark.createDataFrame(
            [(1, bytearray(rss)), (2, b"plainly not xml <")],
            "source_id bigint, payload binary",
        )
        rows = sorted(feed_extract(df).collect(), key=lambda r: r.source_id)
        assert rows[0].parse_ok and rows[0].feed_title == "F"
        assert not rows[1].parse_ok


class TestHostileBounds:
    def test_many_star_pattern_is_linear(self):
        """The r12 hardening: a hostile many-star pattern must match
        in polynomial time (the iterative glob cannot backtrack
        catastrophically the way a regex translation could)."""
        import time

        rules = [(False, "/*a" * 40 + "zz$")]
        t0 = time.time()
        verdict = robots_allowed(rules, "/" + "a" * 2000)
        assert time.time() - t0 < 1.0
        assert verdict == (True, 0)  # no zz → no match → allowed

    def test_rule_and_pattern_caps(self):
        from impala_cut_spark.operators.robots import MAX_RULES

        # a disallow hidden past the rule cap must be ignored
        rules = [(True, f"/x{i}") for i in range(MAX_RULES)]
        rules.append((False, "/secret"))
        assert robots_allowed(rules, "/secret")[0] is True
        # an over-long pattern truncates rather than matching fully
        long_pat = "/" + "p" * 1000
        assert robots_allowed([(False, long_pat)], long_pat)[0] is False
        assert robots_allowed([(False, long_pat)], "/" + "p" * 255)[0] is False
