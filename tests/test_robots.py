"""robots.txt parsing + longest-match URL admission (sparkrdf/robots.py)."""

from sparkrdf.robots import filter_allowed, parse_robots

BODY = """# crawl policy
User-agent: *
Disallow: /private
Allow: /private/pub
Disallow:

User-agent: evilbot
Disallow: /
"""


def _rules(spark):
    df = spark.createDataFrame([("h.org", BODY)], "host string, body string")
    return parse_robots(df)


def test_parse_groups_and_empty_disallow(spark):
    got = {(r.agent, r.allow, r.prefix) for r in _rules(spark).collect()}
    assert got == {
        ("*", False, "/private"),
        ("*", True, "/private/pub"),
        ("evilbot", False, "/"),
    }  # the empty Disallow: matches nothing and is dropped


def test_filter_longest_match_and_default_allow(spark):
    urls = spark.createDataFrame(
        [
            ("https://h.org/open",),            # no rule -> allowed
            ("https://h.org/private/x",),       # Disallow /private
            ("https://h.org/private/pub/x",),   # longer Allow wins
            ("https://other.org/private/x",),   # host without rules -> allowed
        ],
        "url string",
    )
    got = {r.url: r.allowed for r in filter_allowed(urls, _rules(spark)).collect()}
    assert got == {
        "https://h.org/open": True,
        "https://h.org/private/x": False,
        "https://h.org/private/pub/x": True,
        "https://other.org/private/x": True,
    }


def test_filter_agent_specific_group(spark):
    urls = spark.createDataFrame([("https://h.org/anything",)], "url string")
    got = filter_allowed(urls, _rules(spark), agent="EvilBot").collect()
    assert got[0].allowed is False  # Disallow: / in the evilbot group


def test_allow_beats_disallow_on_tie(spark):
    body = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    rules = parse_robots(
        spark.createDataFrame([("t.org", body)], "host string, body string")
    )
    urls = spark.createDataFrame([("https://t.org/a/x",)], "url string")
    assert filter_allowed(urls, rules).collect()[0].allowed is True


def test_multi_agent_group_shares_rules(spark):
    body = "User-agent: a\nUser-agent: b\nDisallow: /x\n\nUser-agent: c\nAllow: /y\n"
    rules = parse_robots(
        spark.createDataFrame([("m.org", body)], "host string, body string")
    )
    got = {(r.agent, r.allow, r.prefix) for r in rules.collect()}
    assert got == {
        ("a", False, "/x"),
        ("b", False, "/x"),
        ("c", True, "/y"),
    }  # consecutive User-agent lines open ONE group; its rules bind both


def test_rules_before_any_group_are_dropped(spark):
    body = "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n"
    rules = parse_robots(
        spark.createDataFrame([("o.org", body)], "host string, body string")
    )
    assert {(r.agent, r.prefix) for r in rules.collect()} == {("*", "/x")}


def test_specific_group_shadows_star(spark):
    # RFC 9309: the '*' group applies ONLY when no named group matches —
    # goodbot's group allows everything, so the '*' Disallow must not leak in
    body = "User-agent: *\nDisallow: /\n\nUser-agent: goodbot\nAllow: /\n"
    rules = parse_robots(
        spark.createDataFrame([("s.org", body)], "host string, body string")
    )
    urls = spark.createDataFrame([("https://s.org/a",)], "url string")
    assert filter_allowed(urls, rules, agent="GoodBot").collect()[0].allowed is True
    assert filter_allowed(urls, rules).collect()[0].allowed is False


def test_wildcard_and_anchor_matching(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"   # any path ending in .pdf
        "Disallow: /a/*/c\n"    # interior wildcard
        "Disallow: /lit.x\n"    # '.' is literal, must not match /litqx
    )
    rules = parse_robots(
        spark.createDataFrame([("w.org", body)], "host string, body string")
    )
    urls = spark.createDataFrame(
        [
            ("https://w.org/doc.pdf",),        # blocked by /*.pdf$
            ("https://w.org/doc.pdf?x=1",),    # $ anchor: NOT blocked
            ("https://w.org/a/b/c",),          # blocked by /a/*/c
            ("https://w.org/a/c",),            # '*' spans empty? no '/a//c' -> allowed
            ("https://w.org/lit.x",),          # blocked, literal match
            ("https://w.org/litqx",),          # '.' escaped -> allowed
        ],
        "url string",
    )
    got = {r.url: r.allowed for r in filter_allowed(urls, rules).collect()}
    assert got == {
        "https://w.org/doc.pdf": False,
        "https://w.org/doc.pdf?x=1": True,
        "https://w.org/a/b/c": False,
        "https://w.org/a/c": True,
        "https://w.org/lit.x": False,
        "https://w.org/litqx": True,
    }


def test_sitemap_urls_extraction(spark):
    from sparkrdf.weblinks import sitemap_urls

    body = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a/1</loc><lastmod>2025-01-02</lastmod></url>"
        "<url><loc> https://a/2 </loc></url>"
        "<url><lastmod>2025-01-03</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    df = spark.createDataFrame([("s.xml", body)], "path string, body string")
    got = {(r.loc, r.lastmod) for r in sitemap_urls(df).collect()}
    assert got == {("https://a/1", "2025-01-02"), ("https://a/2", None)}


def test_frontier_waves(spark):
    """weburl.frontier_waves: per-host 0-based arrival sequence and
    wave = seq // per_wave; deterministic by (host, url); hostless
    inputs drop; per_wave < 1 raises."""
    import pytest as _pytest

    from sparkrdf.weburl import frontier_waves

    urls = [(f"https://h{i % 3}.org/p{j}",) for i in range(3) for j in range(7)]
    urls.append(("not-a-url",))
    df = spark.createDataFrame(urls, "url string")
    out = frontier_waves(df, per_wave=3).collect()
    assert len(out) == 21  # hostless row dropped
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append((r.seq, r.wave, r.url))
    for rows in by_host.values():
        rows.sort()
        assert [s for s, _, _ in rows] == list(range(7))
        assert all(w == s // 3 for s, w, _ in rows)
        assert [u for _, _, u in rows] == sorted(u for _, _, u in rows)
    with _pytest.raises(ValueError, match="per_wave"):
        frontier_waves(df, per_wave=0)


def test_crawl_delays_group_selection(spark):
    """robots.crawl_delays: specific agent shadows '*', max over multiple
    delay lines, non-numeric drops, absent groups yield no row."""
    from sparkrdf.robots import crawl_delays

    body_a = ("User-agent: bot\nCrawl-delay: 2\n\n"
              "User-agent: *\nCrawl-delay: 10\nCrawl-delay: 7")
    body_b = "User-agent: *\nCrawl-delay: 5\nCrawl-delay: bogus"
    body_c = "User-agent: other\nDisallow: /x"  # no delay anywhere
    df = spark.createDataFrame(
        [("h1", body_a), ("h2", body_b), ("h3", body_c)],
        "host string, body string")
    bot = {r.host: r.delay for r in crawl_delays(df, agent="bot").collect()}
    assert bot == {"h1": 2.0, "h2": 5.0}
    star = {r.host: r.delay for r in crawl_delays(df).collect()}
    assert star == {"h1": 10.0, "h2": 5.0}


def test_sitemap_index_refs(spark):
    """weblinks.sitemap_index_refs: one row per <sitemap> block with
    optional lastmod; plain <url> blocks are NOT index refs."""
    from sparkrdf.weblinks import sitemap_index_refs

    idx = ("<sitemapindex><sitemap><loc>https://a/s1.xml</loc>"
           "<lastmod>2024-01-01</lastmod></sitemap>"
           "<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>")
    plain = "<urlset><url><loc>https://a/p</loc></url></urlset>"
    df = spark.createDataFrame(
        [("i", idx), ("p", plain)], "path string, body string")
    rows = sorted((r.path, r.loc, r.lastmod)
                  for r in sitemap_index_refs(df).collect())
    assert rows == [("i", "https://a/s1.xml", "2024-01-01"),
                    ("i", "https://a/s2.xml", None)]


def test_crawl_delays_adjacent_groups_not_merged(spark):
    """Review fix: Allow/Disallow lines between two User-agent runs keep
    the runs in SEPARATE groups — agent a's delay-free group must not
    inherit the '*' group's delay."""
    from sparkrdf.robots import crawl_delays

    body = "User-agent: a\nDisallow: /x\nUser-agent: *\nCrawl-delay: 5"
    df = spark.createDataFrame([("h1", body)], "host string, body string")
    assert crawl_delays(df, agent="a").collect() == []  # a's group: no delay
    star = {r.host: r.delay for r in crawl_delays(df).collect()}
    assert star == {"h1": 5.0}


def test_frontier_waves_uppercase_scheme(spark):
    """Review fix: an uppercase scheme (valid per RFC 3986) still
    extracts its host and gets scheduled."""
    from sparkrdf.weburl import frontier_waves

    df = spark.createDataFrame(
        [("HTTP://Example.org/p1",), ("https://example.org/p2",)],
        "url string")
    out = frontier_waves(df, per_wave=2).collect()
    assert len(out) == 2
    assert {r.host for r in out} == {"example.org"}


def test_frontier_waves_custom_url_col(spark):
    """A non-default url_col must work: the host expression is built over
    the post-alias column (regression: it referenced the original name,
    which is renamed away before withColumn runs)."""
    from sparkrdf.weburl import frontier_waves

    df = spark.createDataFrame(
        [("https://a.org/1",), ("https://a.org/2",), ("https://b.org/1",)],
        "page_url string",
    )
    out = frontier_waves(df, url_col="page_url", per_wave=2).collect()
    assert len(out) == 3
    assert {r.host for r in out} == {"a.org", "b.org"}
