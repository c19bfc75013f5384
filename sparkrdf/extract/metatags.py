"""Page-metadata triples: <title> and <meta> tags → per-page statements.

The head-metadata channel (title, description, OpenGraph/Twitter cards) is
present on virtually every crawled page and costs nothing to extract — a
KG pipeline uses it for page-level facts (display name, canonical
description) and as entity-linking context. Emitted triples:

    (url, kg:prop/title, <title> text)
    (url, kg:prop/meta/{property-or-name}, content)   per <meta> tag
    (url, kg:prop/canonical, href)   from <link rel="canonical" ...>
                                     (the publisher's own dedup signal —
                                     feeds the url-canonicalization and
                                     url-dedup operators)

Scope mirrors the other extract/ modules: regex-level markup handling
(attribute order ``property=``/``name=`` before ``content=``, double
quotes), the well-formed subset head sections actually use.

Scale shape: one whole-stage-codegen projection per triple family
(``regexp_extract`` / ``regexp_extract_all`` + explode), unioned with
zero shuffles; empty matches drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KG_PROP = "http://kg.example.org/prop/"

TITLE_RE = r"(?s)<title[^>]*>(.*?)</title>"
META_RE = r'<meta\s[^>]*(?:property|name)="([^"]+)"[^>]*content="([^"]*)"'
CANONICAL_RE = r'<link\s[^>]*rel="canonical"[^>]*href="([^"]+)"'


def meta_triples(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Extract ``(url, s, p, o)`` rows (subject = the page url) from the
    page's title and meta tags."""
    html = F.col(html_col).cast("string")
    base = pages.select(F.col(url_col).alias("url"), html.alias("h"))
    titles = base.select(
        "url",
        F.regexp_extract(F.col("h"), TITLE_RE, 1).alias("o"),
    ).filter(F.col("o") != "")
    title_rows = titles.select(
        "url",
        F.col("url").alias("s"),
        F.lit(KG_PROP + "title").alias("p"),
        F.trim(F.col("o")).alias("o"),
    )
    metas = base.select(
        "url",
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(F.col("h"), F.lit(META_RE), F.lit(1)),
                F.regexp_extract_all(F.col("h"), F.lit(META_RE), F.lit(2)),
            )
        ).alias("kv"),
    )
    meta_rows = metas.select(
        "url",
        F.col("url").alias("s"),
        F.concat(F.lit(KG_PROP + "meta/"), F.col("kv.0")).alias("p"),
        F.col("kv.1").alias("o"),
    )
    canon_rows = (
        base.select(
            "url", F.regexp_extract(F.col("h"), CANONICAL_RE, 1).alias("o")
        )
        .filter(F.col("o") != "")
        .select(
            "url",
            F.col("url").alias("s"),
            F.lit(KG_PROP + "canonical").alias("p"),
            "o",
        )
    )
    return title_rows.unionByName(meta_rows).unionByName(canon_rows)
