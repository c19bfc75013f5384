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


def _with_optional_cols(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return df


def _term_lookup(vertices: DataFrame, graph_ns: str) -> DataFrame:
    """(doc_id -> term) lookup table from the vertex tables."""
    vertices = _with_optional_cols(vertices, ["_uri", "_value", "_lang", "_datatype"])
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


def pgt_vertices_to_statements(
    vertices: DataFrame,
    graph_ns: str = "http://www.arangodb.com",
    list_conversion_mode: str = "static",
    dict_conversion_mode: str = "static",
) -> DataFrame:
    """PGT vertex property documents → datatype-property statements
    (reference __process_adb_vertex / __unpack_adb_doc, main.py:1830-1999,
    list modes __adb_val_to_rdf_val main.py:2101-2173).

    - each JSON property (label → value) becomes ``(term, p_uri, Literal)``;
      the predicate IRI is recovered from the Property collection's
      label → _uri map (main.py:372-379), falling back to
      ``{graph_ns}/{label}``;
    - value typing mirrors rdflib Literal inference: int → xsd:integer,
      float → xsd:double, bool → xsd:boolean, str → plain literal;
    - ``static`` list mode: one statement per element, recursing into nested
      lists (structure is flattened — faithful to the reference);
      ``serialize``: one statement with the JSON text as a string literal.

    The per-row JSON unpack runs in an Arrow-batched mapInPandas (export is a
    row-expansion over opaque JSON — not expressible as built-in columns).
    """
    import json as _json

    import pandas as pd

    # broadcast label -> predicate IRI map from the Property collection
    prop_map_rows = (
        vertices.filter(F.col("collection") == "Property")
        .select("_label", "_uri")
        .dropDuplicates(["_label"])
        .collect()
    )
    prop_map = {r["_label"]: r["_uri"] for r in prop_map_rows if r["_uri"]}
    xsd = "http://www.w3.org/2001/XMLSchema#"

    vertices = _with_optional_cols(vertices, ["_uri", "properties"])
    src = vertices.select("collection", "_key", "_uri", "_rdftype", "properties").filter(
        F.col("properties").isNotNull()
    )

    def unpack(batches):
        for pdf in batches:
            out = []
            # dict records: itertuples mangles underscore-prefixed columns
            for r in pdf.to_dict("records"):
                if r["_rdftype"] == "URIRef":
                    s_kind, s = "URIRef", (
                        r["_uri"] or f"{graph_ns}/{r['collection']}#{r['_key']}"
                    )
                else:
                    s_kind, s = "BNode", r["_key"]
                props = _json.loads(r["properties"])

                def emit_val(p_uri, v):
                    if isinstance(v, bool):
                        out.append((s_kind, s, p_uri, "Literal", "true" if v else "false", None, xsd + "boolean"))
                    elif isinstance(v, int):
                        out.append((s_kind, s, p_uri, "Literal", str(v), None, xsd + "integer"))
                    elif isinstance(v, float):
                        out.append((s_kind, s, p_uri, "Literal", repr(v), None, xsd + "double"))
                    elif isinstance(v, str):
                        out.append((s_kind, s, p_uri, "Literal", v, None, None))
                    elif isinstance(v, list):
                        if list_conversion_mode == "serialize":
                            out.append(
                                (s_kind, s, p_uri, "Literal", _json.dumps(v), None, None)
                            )
                        else:  # static: flatten recursively (main.py:2129-2156)
                            for el in v:
                                emit_val(p_uri, el)
                    elif isinstance(v, dict):
                        if dict_conversion_mode == "serialize":
                            out.append(
                                (s_kind, s, p_uri, "Literal", _json.dumps(v), None, None)
                            )
                        # static dict mode mints BNodes (main.py:2158-2169) — TODO
                    elif v is None:
                        pass

                for label, val in props.items():
                    p_uri = prop_map.get(label, f"{graph_ns}/{label}")
                    emit_val(p_uri, val)
            yield pd.DataFrame(
                out,
                columns=["s_kind", "s", "p", "o_kind", "o", "o_lang", "o_datatype"],
            )

    schema = (
        "s_kind string, s string, p string, o_kind string, o string, "
        "o_lang string, o_datatype string"
    )
    stmts = src.mapInPandas(unpack, schema)
    return stmts.withColumn("sub_graph", F.lit(None).cast("string")).select(
        *STATEMENT_COLUMNS
    )


def pgt_to_statements(
    vertices: DataFrame,
    edges: DataFrame,
    graph_ns: str = "http://www.arangodb.com",
    **modes,
) -> DataFrame:
    """Full PGT export: edge statements ∪ property statements."""
    return edges_to_statements(vertices, edges, graph_ns).unionByName(
        pgt_vertices_to_statements(vertices, graph_ns, **modes)
    )
