"""Robots-exclusion parsing + frontier gating vs a pure-Python REP oracle."""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from kgce.operators import robots


def _parse_oracle(files, agent="kgcebot"):
    out = []
    for host, text in files:
        groups = []  # (agents, rules)
        cur_agents, cur_rules, in_ua = [], [], False
        for line in re.split(r"\r?\n", text):
            line = re.sub(r"#.*$", "", line)
            m = re.match(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$", line)
            if not m:
                continue
            k, v = m.group(1).lower(), m.group(2)
            if k == "user-agent":
                if not in_ua:
                    if cur_agents:
                        groups.append((cur_agents, cur_rules))
                    cur_agents, cur_rules = [], []
                    in_ua = True
                cur_agents.append(v.lower())
            elif k in ("allow", "disallow"):
                if cur_agents:
                    in_ua = False
                    cur_rules.append((k == "allow", v))
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        spec = [
            2 if agent.lower() in ags else 1 if "*" in ags else 0
            for ags, _ in groups
        ]
        best = max(spec, default=0)
        if best == 0:
            continue
        for s, (_, rules) in zip(spec, groups):
            if s == best:
                out.extend((host, allow, v) for allow, v in rules if v != "")
    return sorted(out)


def _allowed_oracle(url, rules):
    sp = urlsplit(url)
    path = sp.path or "/"
    hits = [
        (len(p), allow)
        for host, allow, p in rules
        if host == sp.netloc.lower() and path.startswith(p)
    ]
    return max(hits)[1] if hits else True


FILES = [
    ("a.example", """
User-agent: *
Disallow: /private/
Allow: /private/press/
Disallow:

User-agent: kgcebot
User-agent: otherbot
Disallow: /beta/
Allow: /beta/ok
# comment line
Crawl-delay: 10
"""),
    ("b.example", "User-agent: *\r\nDisallow: /\r\nAllow: /pub"),
    ("c.example", "Disallow: /orphan-rule-before-any-group\n"),
    ("d.example", "User-agent: nobody\nDisallow: /\n"),
]

URLS = [
    "http://a.example/beta/ok/page",      # allow (longest, exact group)
    "http://a.example/beta/nope",         # disallow /beta/
    "http://a.example/private/press/x",   # * group rules NOT selected for kgcebot
    "http://a.example/",                  # no matching rule
    "http://b.example/pub/data",          # allow /pub beats / (longer)
    "http://b.example/secret",            # disallow /
    "http://b.example",                   # empty path -> '/' -> disallow
    "http://c.example/x",                 # orphan rules are void -> allowed
    "http://d.example/x",                 # no group for us or * -> allowed
    "http://e.example/x",                 # no robots at all -> allowed
]


def test_parse_robots_matches_oracle(spark):
    df = spark.createDataFrame(FILES, "host string, text string")
    got = sorted(
        (r.host, r.allow, r.path_prefix)
        for r in robots.parse_robots(df, agent="kgcebot").collect()
    )
    want = _parse_oracle(FILES, "kgcebot")
    assert got == want
    # exact-agent group selected for a.example, wildcard group dropped
    assert ("a.example", False, "/beta/") in got
    assert ("a.example", False, "/private/") not in got
    assert not any(h == "d.example" for h, _, _ in got)


def test_frontier_allowed_longest_match_and_defaults(spark):
    rules_df = robots.parse_robots(
        spark.createDataFrame(FILES, "host string, text string"), agent="kgcebot"
    )
    urls_df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = {r.url: r.allowed for r in robots.frontier_allowed(urls_df, rules_df).collect()}
    rules = _parse_oracle(FILES, "kgcebot")
    for u in URLS:
        assert got[u] == _allowed_oracle(u, rules), u
    assert got["http://a.example/beta/ok/page"] is True
    assert got["http://a.example/beta/nope"] is False
    assert got["http://a.example/private/press/x"] is True
    assert got["http://b.example/pub/data"] is True
    assert got["http://b.example"] is False


def test_wildcard_group_applies_when_no_exact(spark):
    df = spark.createDataFrame(FILES, "host string, text string")
    rules = robots.parse_robots(df, agent="strangerbot")
    got = sorted(
        (r.host, r.allow, r.path_prefix) for r in rules.collect()
    )
    assert got == _parse_oracle(FILES, "strangerbot")
    assert ("a.example", False, "/private/") in got
    assert not any(p == "/beta/" for _, _, p in got)  # exact group not ours


def test_sitemap_urls_and_parse(spark):
    files = FILES + [
        ("s.example", "User-agent: *\nDisallow: /x\nSitemap: http://s.example/map.xml\n"
                      "sitemap: http://s.example/map2.xml  # case-insensitive\n"),
    ]
    df = spark.createDataFrame(files, "host string, text string")
    got = sorted(
        (r.host, r.sitemap_url) for r in robots.sitemap_urls(df).collect()
    )
    assert got == [
        ("s.example", "http://s.example/map.xml"),
        ("s.example", "http://s.example/map2.xml"),
    ]

    xml_urlset = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://s.example/a</loc><lastmod>2026-01-02</lastmod></url>
  <url><loc>
      http://s.example/b
  </loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""
    xml_index = """<sitemapindex>
  <sitemap><loc>http://s.example/part1.xml</loc></sitemap>
  <sitemap><loc>http://s.example/part2.xml</loc><lastmod>2025-12-31</lastmod></sitemap>
</sitemapindex>"""
    sm = spark.createDataFrame(
        [("http://s.example/map.xml", xml_urlset),
         ("http://s.example/idx.xml", xml_index)],
        "sitemap_url string, xml string",
    )
    rows = {
        (r.sitemap_url, r.loc): (r.lastmod, r.is_index)
        for r in robots.parse_sitemap(sm).collect()
    }
    assert set(rows) == {
        ("http://s.example/map.xml", "http://s.example/a"),
        ("http://s.example/map.xml", "http://s.example/b"),
        ("http://s.example/idx.xml", "http://s.example/part1.xml"),
        ("http://s.example/idx.xml", "http://s.example/part2.xml"),
    }
    lm, isx = rows[("http://s.example/map.xml", "http://s.example/a")]
    assert lm is not None and not isx
    assert rows[("http://s.example/map.xml", "http://s.example/b")][0] is None
    assert rows[("http://s.example/idx.xml", "http://s.example/part1.xml")][1] is True


def test_assign_fetch_rounds_budget_and_determinism(spark):
    urls = [f"http://h{i % 3}.example/p{j}" for i in range(3) for j in range(7)]
    df = spark.createDataFrame([(u,) for u in sorted(set(urls))], "url string")
    out = robots.assign_fetch_rounds(df, per_host_budget=3).collect()
    from collections import Counter
    per_round_host = Counter((r.host, r.fetch_round) for r in out)
    assert max(per_round_host.values()) <= 3       # budget respected
    by_host = Counter(r.host for r in out)
    for (h, rnd), n in per_round_host.items():
        full_rounds = by_host[h] // 3
        assert n == (3 if rnd < full_rounds else by_host[h] % 3)
    # deterministic: rank within host by url
    again = robots.assign_fetch_rounds(df, per_host_budget=3).collect()
    assert {(r.url, r.fetch_round) for r in out} == {
        (r.url, r.fetch_round) for r in again
    }
    # round 0 exists for every host; a 7-url host needs 3 rounds
    assert sorted({r.fetch_round for r in out if r.host == "h0.example"}) == [0, 1, 2]


def test_frontier_allowed_packed_equals_grouped(spark):
    rules_df = robots.parse_robots(
        spark.createDataFrame(FILES, "host string, text string"), agent="kgcebot"
    )
    urls_df = spark.createDataFrame([(u,) for u in URLS], "url string")
    packed = robots.pack_rules(rules_df)
    got = {
        r.url: r.allowed
        for r in robots.frontier_allowed_packed(urls_df, packed).collect()
    }
    want = {
        r.url: r.allowed for r in robots.frontier_allowed(urls_df, rules_df).collect()
    }
    assert got == want
    assert len(got) == len(URLS)


def test_frontier_gate_streams(spark, tmp_path):
    """The packed gate is a stream-static join + narrow fold — applying
    it to a readStream yields exactly the batch rows (the grouped form
    cannot stream: it aggregates over the frontier)."""
    rules_df = robots.parse_robots(
        spark.createDataFrame(FILES, "host string, text string"), agent="kgcebot"
    )
    packed = robots.pack_rules(rules_df)
    in_dir, out_dir, ckpt = (
        str(tmp_path / d) for d in ("fr_in", "fr_out", "fr_ckpt")
    )
    urls_df = spark.createDataFrame([(u,) for u in URLS], "url string")
    urls_df.write.parquet(in_dir)
    stream = robots.frontier_allowed_packed(
        spark.readStream.schema("url string").parquet(in_dir), packed
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish within 300s"
    got = {
        (r.url, r.allowed) for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.url, r.allowed)
        for r in robots.frontier_allowed_packed(urls_df, packed).collect()
    }
    assert got == want and len(got) == len(URLS)


def test_next_frontier_composition(spark):
    from kgce import pipeline

    html1 = (
        b'<a href="http://A.example:80/ok?utm_source=x">fine</a>'
        b'<a href="http://a.example/private/x">blocked</a>'
        b'<a href="/rel1">r1</a><a href="/rel2">r2</a><a href="/rel3">r3</a>'
        b'<a href="#frag">skip</a>'
    )
    pages = spark.createDataFrame(
        [("http://seed.example/", None, html1, "seed", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    robots_txt = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\n")],
        "host string, text string",
    )
    known = spark.createDataFrame([("http://seed.example/rel1",)], "url string")
    out = pipeline.next_frontier(
        pages, robots_txt=robots_txt, per_host_budget=1, known_urls=known
    ).collect()
    urls = {r.url for r in out}
    # canonicalized (lowercase host, default port + tracking param gone)
    assert "http://a.example/ok" in urls
    # robots-blocked and already-known targets are gone; fragment dropped
    assert not any("/private/" in u for u in urls)
    assert "http://seed.example/rel1" not in urls
    assert {"http://seed.example/rel2", "http://seed.example/rel3"} <= urls
    # politeness: seed.example has 2 surviving urls, budget 1 -> 2 rounds
    rounds = sorted(r.fetch_round for r in out if r.host == "seed.example")
    assert rounds == [0, 1]


def test_next_frontier_host_rank_priority(spark):
    from kgce import pipeline

    html = (
        b'<a href="http://big.example/a">x</a>'
        b'<a href="http://tiny.example/b">y</a>'
        b'<a href="http://unknown.example/c">z</a>'
    )
    pages = spark.createDataFrame(
        [("http://seed.example/", None, html, "seed", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    ranks = spark.createDataFrame(
        [("big.example", 0.7), ("tiny.example", 0.1)], "node string, rank double"
    )
    out = {
        r.url: r.host_rank
        for r in pipeline.next_frontier(pages, host_ranks=ranks).collect()
    }
    assert out["http://big.example/a"] == 0.7
    assert out["http://tiny.example/b"] == 0.1
    assert out["http://unknown.example/c"] == 0.0  # unknown host -> last, not never
