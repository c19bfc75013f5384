"""HTML <table> → triples: relational fact extraction from web pages.

Web tables are the densest relational facts a crawl carries (WebTables,
Cafarella et al. VLDB 2008); a KG-construction pipeline that stops at
running-text NER leaves them behind. This extractor turns every
header-rowed table on a page into per-row entity statements:

    subject  = page url + '#' + the row's FIRST cell (the key column —
               web tables lead with the entity name)
    predicate = kg:prop/{header text} for each NON-key column
    object    = the cell text, as a literal

Scope mirrors sparkrdf/extract/html_text.py: regex-level markup handling
(plain ``<th>``/``<td>`` cells, no nested tables), which is exactly the
well-formed subset a crawler's own renderer emits; a production deployment
swaps in a real HTML parser behind the same row schema.

Scale shape: the whole extraction is ONE whole-stage-codegen projection —
``regexp_extract_all`` pulls tables, then rows, then cells, and
``posexplode``/``arrays_zip`` pair headers with cells; no Python touches
the row path, no shuffle happens at all until a downstream consumer asks
for one. Malformed tables (row arity ≠ header arity, headerless, single
column) drop per-row, never poisoning the page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KG_PROP = "http://kg.example.org/prop/"

_TABLE_RE = r"(?s)<table[^>]*>(.*?)</table>"
_TR_RE = r"(?s)<tr[^>]*>(.*?)</tr>"
_TH_RE = r"(?s)<th[^>]*>(.*?)</th>"
_TD_RE = r"(?s)<td[^>]*>(.*?)</td>"


def table_triples(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Extract ``(url, s, p, o)`` rows from every header-rowed HTML table.

    ``html`` may be binary (cast to string, like the link extractor). Rows
    whose cell count differs from the header count are dropped (ragged
    markup); tables need ≥ 2 header columns (a key column plus at least one
    value column) to emit anything.
    """
    html = F.col(html_col).cast("string")
    tables = pages.select(
        F.col(url_col).alias("url"),
        F.explode(F.regexp_extract_all(html, F.lit(_TABLE_RE), F.lit(1))).alias(
            "t"
        ),
    )
    with_parts = tables.select(
        "url",
        F.regexp_extract_all(F.col("t"), F.lit(_TH_RE), F.lit(1)).alias("headers"),
        F.regexp_extract_all(F.col("t"), F.lit(_TR_RE), F.lit(1)).alias("trs"),
    ).filter(F.size("headers") >= 2)
    rows = with_parts.select(
        "url",
        "headers",
        F.explode("trs").alias("tr"),
    ).select(
        "url",
        "headers",
        F.regexp_extract_all(F.col("tr"), F.lit(_TD_RE), F.lit(1)).alias("cells"),
    ).filter(F.size("cells") == F.size("headers"))
    keyed = rows.select(
        "url",
        F.concat(F.col("url"), F.lit("#"), F.trim(F.element_at("cells", 1))).alias(
            "s"
        ),
        F.explode(
            F.arrays_zip(
                F.slice("headers", 2, F.size("headers") - 1),
                F.slice("cells", 2, F.size("cells") - 1),
            )
        ).alias("hc"),
    )
    return keyed.select(
        "url",
        "s",
        F.concat(F.lit(KG_PROP), F.trim(F.col("hc.0"))).alias("p"),
        F.trim(F.col("hc.1")).alias("o"),
    )
