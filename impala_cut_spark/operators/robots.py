"""robots.txt (RFC 9309) and XML sitemap parsing — the crawl
politeness and discovery layer a web-scale ingestion pipeline runs
BEFORE fetching: which paths an agent may crawl, at what delay, and
which URLs a site advertises.

RFC 9309 semantics implemented exactly:

- **Group selection** (§2.2.1): the group whose ``User-agent`` line
  is the LONGEST case-insensitive match for the product token wins;
  ``*`` is the fallback.  Consecutive user-agent lines share one
  group; rules before any user-agent line are ignored.
- **Rule matching** (§2.2.2): longest-match wins — the rule with the
  most octets of matched pattern decides; an Allow and Disallow of
  equal length resolve to ALLOW.  ``*`` matches any octet sequence
  and ``$`` anchors the end; an empty Disallow matches nothing.
- Unknown directives are ignored (forward compatibility);
  ``crawl-delay`` and ``sitemap`` are collected (the de-facto
  extensions every crawler honors).

Sitemaps (sitemaps.org protocol): ``<urlset>`` documents yield one
row per ``<url>`` (loc, lastmod, priority); ``<sitemapindex>``
documents yield one POINTER row per child ``<sitemap>`` — recursion
is the fetcher's job (an index references remote files), so the
parser stays pure.  XML goes through the shared DOCTYPE-rejection
gate (`operators/office.guarded_xml`).

Scale: parsing and matching are Arrow-batched narrow maps.  The
intended join shape (`robots_gate`) broadcasts the per-host RULE
table (one compact row per host — millions at web scale) against the
URL volume (billions), so the URL side never shuffles; the match runs
executor-side at batch granularity.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

#: sitemap namespace (sitemaps.org schema)
_SM = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_robots(text: str, agent: str) -> dict:
    """robots.txt → the effective rule set for ``agent``:
    ``{rules: [(allow: bool, pattern: str), ...], crawl_delay:
    float | None, sitemaps: [str]}``.  Group selection per RFC 9309
    §2.2.1 (longest agent-token match, '*' fallback); sitemap lines
    are global (outside group semantics) per the de-facto standard."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list, float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list = []
    cur_delay: float | None = None
    sitemaps: list[str] = []
    open_group = False  # user-agent lines accumulate until a rule

    def _flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if open_group:
                _flush()
                open_group = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if cur_agents:
                open_group = True
                cur_rules.append((key == "allow", val))
        elif key == "crawl-delay":
            if cur_agents:
                open_group = True
                try:
                    cur_delay = float(val)
                except ValueError:
                    pass
        elif key == "sitemap":
            sitemaps.append(val)
    _flush()

    best: tuple[list, float | None] | None = None
    best_len = -1
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                if best_len < 0:
                    best = (rules, delay)
            elif agent_l.startswith(a) and len(a) > best_len:
                best, best_len = (rules, delay), len(a)
    rules, delay = best if best is not None else ([], None)
    return {"rules": rules, "crawl_delay": delay, "sitemaps": sitemaps}


#: hostile-input caps (RFC 9309 §2.4 allows implementation limits;
#: the major crawlers impose comparable ones): rules beyond MAX_RULES
#: are ignored, patterns truncate to MAX_PATTERN octets
MAX_RULES = 1000
MAX_PATTERN = 256


def _glob_match(pattern: str, path: str) -> bool:
    """RFC 9309 pattern match as an ITERATIVE two-pointer glob — '*'
    matches any octet run, a trailing '$' anchors the end — with
    guaranteed O(len(pattern)·len(path)) worst case (a hostile
    many-star pattern cannot trigger regex catastrophic
    backtracking).  Unanchored patterns are prefix matches, i.e. the
    pattern consumes any prefix of ``path``."""
    anchor = pattern.endswith("$")
    if anchor:
        pattern = pattern[:-1]
    else:
        pattern = pattern + "*"  # prefix semantics: trailing freedom
    pi = si = 0
    star_pi = star_si = -1
    while si < len(path):
        if pi < len(pattern) and (pattern[pi] == path[si]):
            pi += 1
            si += 1
        elif pi < len(pattern) and pattern[pi] == "*":
            star_pi, star_si = pi, si
            pi += 1
        elif star_pi >= 0:
            star_si += 1
            pi, si = star_pi + 1, star_si
        else:
            return False
    while pi < len(pattern) and pattern[pi] == "*":
        pi += 1
    return pi == len(pattern)


def robots_allowed(rules: list, path: str) -> tuple[bool, int]:
    """(allowed, matched_octets) for ``path`` under longest-match
    (§2.2.2): every matching rule scores the length of its pattern
    (minus wildcard/anchor metachars — the 'octets of the rule' the
    RFC counts); the longest wins, Allow winning exact ties.  No rule
    matching → allowed (0).  Hostile-policy bounds: only the first
    MAX_RULES rules are consulted and each pattern is truncated to
    MAX_PATTERN octets before matching."""
    verdict, best = True, -1
    for allow, pattern in rules[:MAX_RULES]:
        if pattern == "":
            continue  # empty pattern matches nothing
        pattern = pattern[:MAX_PATTERN]
        if _glob_match(pattern, path):
            score = len(pattern.replace("*", "").rstrip("$"))
            if score > best or (score == best and allow and not verdict):
                verdict, best = allow, score
    return verdict, max(best, 0)


def sitemap_entries(payload: bytes) -> list[dict]:
    """Sitemap XML → one dict per entry: ``kind`` 'url' for
    ``<urlset>`` children, 'index' for ``<sitemapindex>`` pointers;
    loc / lastmod / priority as written (priority only on urls)."""
    from impala_cut_spark.operators.office import guarded_xml

    root = guarded_xml(payload)
    tag = root.tag
    out: list[dict] = []
    if tag == f"{_SM}urlset":
        for u in root.iter(f"{_SM}url"):
            loc = u.find(f"{_SM}loc")
            lm = u.find(f"{_SM}lastmod")
            pr = u.find(f"{_SM}priority")
            if loc is None or not (loc.text or "").strip():
                continue
            out.append({
                "kind": "url",
                "loc": loc.text.strip(),
                "lastmod": lm.text.strip() if lm is not None and lm.text else None,
                "priority": pr.text.strip() if pr is not None and pr.text else None,
            })
    elif tag == f"{_SM}sitemapindex":
        for s in root.iter(f"{_SM}sitemap"):
            loc = s.find(f"{_SM}loc")
            lm = s.find(f"{_SM}lastmod")
            if loc is None or not (loc.text or "").strip():
                continue
            out.append({
                "kind": "index",
                "loc": loc.text.strip(),
                "lastmod": lm.text.strip() if lm is not None and lm.text else None,
                "priority": None,
            })
    else:
        raise ValueError("sitemap: root is neither urlset nor sitemapindex")
    return out


#: output schema of robots_gate — the per-URL admission verdict
ROBOTS_GATE_SCHEMA = (
    "url_id bigint, host string, path string, allowed boolean, "
    "matched_octets int, crawl_delay double"
)


def robots_gate(
    urls: DataFrame,
    robots: DataFrame,
    agent: str,
    url_id_col: str = "url_id",
) -> DataFrame:
    """Admission-gate every (host, path) URL row against its host's
    robots.txt for ``agent`` (ROBOTS_GATE_SCHEMA).  ``urls`` carries
    (url_id, host, path); ``robots`` carries (host, robots_txt).
    Hosts missing a robots row are fully allowed (the RFC's
    unreachable-robots default for 4xx).

    Scale: the robots side is broadcast (one row per HOST — small by
    construction) so the URL volume never shuffles; parse happens
    once per host row and matching runs Arrow-batched."""
    import pandas as pd
    from pyspark.sql import functions as F

    joined = urls.join(
        F.broadcast(robots.withColumnRenamed("host", "r_host")),
        urls.host == F.col("r_host"),
        "left",
    ).select(url_id_col, "host", "path", "robots_txt")

    def _gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, dict] = {}
        for pdf in batches:
            ids, hosts, paths, allowed, octets, delays = [], [], [], [], [], []
            for uid, host, path, rb in zip(
                pdf[url_id_col], pdf["host"], pdf["path"], pdf["robots_txt"]
            ):
                if rb is None:
                    ok, oc, dl = True, 0, None
                else:
                    r = cache.get(rb)
                    if r is None:
                        r = cache[rb] = parse_robots(rb, agent)
                    ok, oc = robots_allowed(r["rules"], path)
                    dl = r["crawl_delay"]
                ids.append(int(uid))
                hosts.append(host)
                paths.append(path)
                allowed.append(ok)
                octets.append(oc)
                delays.append(dl)
            yield pd.DataFrame({
                "url_id": pd.Series(ids, dtype="int64"),
                "host": pd.Series(hosts, dtype="object"),
                "path": pd.Series(paths, dtype="object"),
                "allowed": pd.Series(allowed, dtype="bool"),
                "matched_octets": pd.Series(octets, dtype="int32"),
                "crawl_delay": pd.Series(delays, dtype="float64"),
            })

    return joined.mapInPandas(_gate, ROBOTS_GATE_SCHEMA)


#: output schema of sitemap_extract — one row per sitemap entry
SITEMAP_SCHEMA = (
    "source_id bigint, kind string, loc string, lastmod string, "
    "priority string, parse_ok boolean"
)


def sitemap_extract(
    docs: DataFrame, id_col: str = "source_id", payload_col: str = "payload"
) -> DataFrame:
    """Sitemap payloads → one row per entry (SITEMAP_SCHEMA);
    malformed XML degrades to ONE parse_ok=false row per document.
    Arrow-batched narrow map, no shuffle."""
    import pandas as pd

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p) if p is not None else b""
                try:
                    for e in sitemap_entries(raw):
                        rows.append((int(sid), e["kind"], e["loc"],
                                     e["lastmod"], e["priority"], True))
                except ValueError:
                    rows.append((int(sid), None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["source_id", "kind", "loc", "lastmod",
                         "priority", "parse_ok"],
            )

    return docs.mapInPandas(_extract, SITEMAP_SCHEMA)


# -- RSS / Atom feeds ----------------------------------------------------------
#
# The third discovery surface after sitemaps and links: feeds
# advertise fresh URLs with timestamps — the incremental-crawl
# frontier source.  Both grammars parse through the same
# DOCTYPE-rejection gate.

#: Atom namespace (RFC 4287)
_ATOM = "{http://www.w3.org/2005/Atom}"


def feed_entries(payload: bytes) -> dict:
    """RSS 2.0 / Atom feed → ``{kind, feed_title, entries: [{title,
    link, ts, entry_id}]}``.  RSS: <channel><title> and per-<item>
    title/link/pubDate/guid.  Atom (RFC 4287): <feed><title> and
    per-<entry> title, the first <link href>, <updated>, <id>.
    Anything else raises (degrades at the operator layer)."""
    from impala_cut_spark.operators.office import guarded_xml

    root = guarded_xml(payload)
    entries: list[dict] = []
    if root.tag == "rss":
        ch = root.find("channel")
        if ch is None:
            raise ValueError("feed: rss without channel")
        t = ch.find("title")
        feed_title = t.text.strip() if t is not None and t.text else None
        for it in ch.iter("item"):
            def _txt(tag):
                e = it.find(tag)
                return e.text.strip() if e is not None and e.text else None
            entries.append({"title": _txt("title"), "link": _txt("link"),
                            "ts": _txt("pubDate"), "entry_id": _txt("guid")})
        return {"kind": "rss", "feed_title": feed_title, "entries": entries}
    if root.tag == f"{_ATOM}feed":
        t = root.find(f"{_ATOM}title")
        feed_title = t.text.strip() if t is not None and t.text else None
        for en in root.iter(f"{_ATOM}entry"):
            def _atxt(tag):
                e = en.find(f"{_ATOM}{tag}")
                return e.text.strip() if e is not None and e.text else None
            link = en.find(f"{_ATOM}link")
            entries.append({
                "title": _atxt("title"),
                "link": link.get("href") if link is not None else None,
                "ts": _atxt("updated"),
                "entry_id": _atxt("id"),
            })
        return {"kind": "atom", "feed_title": feed_title, "entries": entries}
    raise ValueError("feed: root is neither rss nor atom feed")


#: output schema of feed_extract — one row per feed entry
FEED_SCHEMA = (
    "source_id bigint, kind string, feed_title string, title string, "
    "link string, ts string, entry_id string, parse_ok boolean"
)


def feed_extract(
    docs: DataFrame, id_col: str = "source_id", payload_col: str = "payload"
) -> DataFrame:
    """Feed payloads → one row per entry (FEED_SCHEMA); malformed
    XML degrades to ONE parse_ok=false row per document.
    Arrow-batched narrow map, no shuffle."""
    import pandas as pd

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p) if p is not None else b""
                try:
                    f = feed_entries(raw)
                    for e in f["entries"]:
                        rows.append((int(sid), f["kind"], f["feed_title"],
                                     e["title"], e["link"], e["ts"],
                                     e["entry_id"], True))
                except ValueError:
                    rows.append((int(sid), None, None, None, None, None,
                                 None, False))
            yield pd.DataFrame(
                rows,
                columns=["source_id", "kind", "feed_title", "title",
                         "link", "ts", "entry_id", "parse_ok"],
            )

    return docs.mapInPandas(_extract, FEED_SCHEMA)
