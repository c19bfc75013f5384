"""Export direction: property-graph tables → RDF statements.

Reference semantics (arango_rdf/main.py:229-657, 1830-2173):
- vertex doc → term: ``_rdftype``-driven reconstruction; URIRef with missing
  ``_uri`` gets a synthesized IRI ``{graph_ns}/{col}#{key}``
  (main.py:1938-1974);
- edge doc → statement ``(term(_from), _uri, term(_to))`` via two joins
  against the union of vertex tables (the reference does per-row point
  lookups for dangling references, main.py:2018-2059 — in Spark both lookups
  are one join each);
- PGT vertex properties unpack back into datatype-property statements
  (main.py:1976-1999), recursing into lists/dicts per the configured list
  conversion mode (handled in sparkrdf.lists).

Join strategy at scale: the vertex side is keyed by ``collection/_key`` (the
same key the edges reference), so both resolutions are equi-joins that AQE
can plan as broadcast (small graphs) or sort-merge with pruned columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrdf.ttl import STATEMENT_COLUMNS


def _term_lookup(vertices: DataFrame, graph_ns: str) -> DataFrame:
    """(doc_id -> term) lookup table from the vertex tables."""
    synth_uri = F.concat(
        F.lit(graph_ns), F.lit("/"), F.col("collection"), F.lit("#"), F.col("_key")
    )
    return vertices.select(
        F.concat(F.col("collection"), F.lit("/"), F.col("_key")).alias("doc_id"),
        F.col("_rdftype").alias("kind"),
        F.when(F.col("_rdftype") == "URIRef", F.coalesce(F.col("_uri"), synth_uri))
        .when(F.col("_rdftype") == "BNode", F.col("_key"))
        .otherwise(F.col("_value"))
        .alias("id"),
        F.col("_lang").alias("lang"),
        F.col("_datatype").alias("datatype"),
    ).dropDuplicates(["doc_id"])


def edges_to_statements(
    vertices: DataFrame, edges: DataFrame, graph_ns: str = "http://www.arangodb.com"
) -> DataFrame:
    """Edge tables → statement rows (reference __process_adb_edge, main.py:1875-1936)."""
    terms = _term_lookup(vertices, graph_ns)
    s_terms = terms.select(
        F.col("doc_id").alias("_from"),
        F.col("kind").alias("s_kind"),
        F.col("id").alias("s"),
    )
    o_terms = terms.select(
        F.col("doc_id").alias("_to"),
        F.col("kind").alias("o_kind"),
        F.col("id").alias("o"),
        F.col("lang").alias("o_lang"),
        F.col("datatype").alias("o_datatype"),
    )
    out = (
        edges.select("_from", "_to", "_uri", "_sub_graph_uri")
        .join(s_terms, "_from", "inner")
        .join(o_terms, "_to", "inner")
        .select(
            "s_kind",
            "s",
            F.col("_uri").alias("p"),
            "o_kind",
            "o",
            "o_lang",
            "o_datatype",
            F.col("_sub_graph_uri").alias("sub_graph"),
        )
    )
    return out.select(*STATEMENT_COLUMNS)
