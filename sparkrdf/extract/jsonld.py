"""JSON-LD (<script type="application/ld+json">) → triples.

JSON-LD is the dominant structured-data carrier on the modern web (the
schema.org channel search engines actually consume); a crawl-scale KG
pipeline gets cleaner facts from it than from any NLP stage. This
extractor handles the flat-object core of the format:

    subject   = the block's ``@id``, else ``{url}#jsonld{block_index}``
    ``@type``  → one ``rdf:type`` triple, the type IRI resolved against
                 the block's ``@context`` (string contexts only)
    other keys → ``(subject, {context}/{key}, value)`` literals

Nested objects/arrays ride through as their raw JSON text (the same
"serialized dict" convention the PGT property collapse uses — revivable
downstream); invalid JSON blocks drop silently (crawl reality), never
poisoning the page. ``@``-keyword keys other than ``@type`` are metadata,
not facts, and are skipped.

Scale shape: whole-stage codegen end to end — ``regexp_extract_all`` for
the script blocks, the built-in ``from_json`` (map<string,string>, which
stringifies any value shape) for parsing, two explodes, zero Python and
zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrdf import terms as T

DEFAULT_VOCAB = "http://kg.example.org/prop"

_LDJSON_RE = r'(?s)<script[^>]*type="application/ld\+json"[^>]*>(.*?)</script>'


def jsonld_triples(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Extract ``(url, s, p, o)`` rows from every JSON-LD block on a page."""
    html = F.col(html_col).cast("string")
    blocks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(html, F.lit(_LDJSON_RE), F.lit(1))).alias(
            "idx", "block"
        ),
    )
    parsed = blocks.select(
        "url",
        "idx",
        F.from_json(F.col("block"), "map<string,string>").alias("m"),
    ).filter(F.col("m").isNotNull())
    ctx = F.regexp_replace(
        F.coalesce(F.col("m")["@context"], F.lit(DEFAULT_VOCAB)), r"/+$", ""
    )
    subj = F.coalesce(
        F.col("m")["@id"],
        F.concat(F.col("url"), F.lit("#jsonld"), F.col("idx").cast("string")),
    )
    kv = parsed.select(
        "url",
        subj.alias("s"),
        ctx.alias("ctx"),
        F.explode("m").alias("k", "v"),
    ).filter((~F.col("k").startswith("@")) | (F.col("k") == "@type"))
    return kv.select(
        "url",
        "s",
        F.when(F.col("k") == "@type", F.lit(T.RDF_TYPE))
        .otherwise(F.concat(F.col("ctx"), F.lit("/"), F.col("k")))
        .alias("p"),
        F.when(
            F.col("k") == "@type", F.concat(F.col("ctx"), F.lit("/"), F.col("v"))
        )
        .otherwise(F.col("v"))
        .alias("o"),
    )
