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
