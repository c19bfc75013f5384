"""Web link-graph extraction: pages → anchors → host-level edge table.

The first structural artifact of a web corpus: every page's outbound
anchors, aggregated to a weighted host→host graph, ready for
:func:`sparkrdf.graphops.pagerank_directed` (host authority), spam-farm
detection (reciprocal-heavy hosts), or crawl frontier prioritization.

Everything is whole-stage codegen (regexp_extract_all over the raw HTML,
regexp host parsing, one hash aggregate); no Python touches the row path
and no join is involved at all — the graph build is a pure map + aggregate,
so it scales with input bytes, not graph shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ANCHOR_RE", "HOST_RE", "extract_links", "host_link_graph"]

#: double-quoted href anchors; captures the raw target URL
ANCHOR_RE = r'<a\s[^>]*href="([^"]+)"'
#: scheme-stripped authority of an absolute http(s) URL
HOST_RE = r"^https?://([^/]+)"


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → one (src, dst) row per anchor. ``html`` may be binary
    (cast to string — WARC payloads are bytes) or already text. Relative
    and non-http targets are kept verbatim; filter on dst_host IS NOT NULL
    downstream if only absolute links matter."""
    html = F.col(html_col).cast("string")
    return pages.select(
        F.col(url_col).alias("src"),
        F.explode(F.regexp_extract_all(html, F.lit(ANCHOR_RE), F.lit(1))).alias(
            "dst"
        ),
    )


def host_link_graph(links: DataFrame) -> DataFrame:
    """(src, dst) URL pairs → weighted host graph
    ``(src_host, dst_host, n_links)``, absolute-http(s) targets only,
    self-links (same host) dropped."""
    g = links.select(
        F.regexp_extract("src", HOST_RE, 1).alias("src_host"),
        F.regexp_extract("dst", HOST_RE, 1).alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    return (
        g.filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("n_links"))
    )


SITEMAP_LOC_RE = r"(?s)<url>(.*?)</url>"
_LOC_RE = r"<loc>\s*([^<\s]+)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*([^<\s]+)\s*</lastmod>"


def sitemap_urls(
    sitemaps: DataFrame, path_col: str = "path", body_col: str = "body"
) -> DataFrame:
    """Sitemap XML (sitemaps.org protocol) → one row per ``<url>`` entry:
    ``(path, loc, lastmod)`` — the crawl-discovery channel that complements
    anchor extraction (publishers list canonical URLs + change dates here;
    lastmod drives recrawl scheduling). ``lastmod`` is NULL when the entry
    omits it.

    Scale shape: same as :func:`extract_links` — whole-stage-codegen
    ``regexp_extract_all`` per ``<url>`` block + per-field extraction,
    zero Python, zero shuffle; entries without a ``<loc>`` drop.
    """
    entries = sitemaps.select(
        F.col(path_col).alias("path"),
        F.explode(
            F.regexp_extract_all(
                F.col(body_col).cast("string"), F.lit(SITEMAP_LOC_RE), F.lit(1)
            )
        ).alias("entry"),
    )
    return entries.select(
        "path",
        F.regexp_extract(F.col("entry"), _LOC_RE, 1).alias("loc"),
        F.when(
            F.regexp_extract(F.col("entry"), _LASTMOD_RE, 1) != "",
            F.regexp_extract(F.col("entry"), _LASTMOD_RE, 1),
        ).alias("lastmod"),
    ).filter(F.col("loc") != "")


#: <sitemap> blocks of a sitemapindex file (sitemaps.org protocol)
SITEMAP_REF_RE = r"(?s)<sitemap>(.*?)</sitemap>"


def sitemap_index_refs(
    sitemaps: DataFrame, path_col: str = "path", body_col: str = "body"
) -> DataFrame:
    """Sitemap INDEX files (``<sitemapindex><sitemap><loc>...``) → one row
    per referenced child sitemap: ``(path, loc, lastmod)`` — the recursion
    step of sitemap discovery (large publishers shard their URL lists
    behind an index; the crawler fetches the children and feeds them back
    through :func:`sitemap_urls`). Same codegen-only scale shape."""
    entries = sitemaps.select(
        F.col(path_col).alias("path"),
        F.explode(
            F.regexp_extract_all(
                F.col(body_col).cast("string"), F.lit(SITEMAP_REF_RE), F.lit(1)
            )
        ).alias("entry"),
    )
    return entries.select(
        "path",
        F.regexp_extract(F.col("entry"), _LOC_RE, 1).alias("loc"),
        F.when(
            F.regexp_extract(F.col("entry"), _LASTMOD_RE, 1) != "",
            F.regexp_extract(F.col("entry"), _LASTMOD_RE, 1),
        ).alias("lastmod"),
    ).filter(F.col("loc") != "")
