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

import pandas as pd  # module-level so pandas_udf type hints resolve
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
    vertices: DataFrame,
    edges: DataFrame,
    graph_ns: str = "http://www.arangodb.com",
    reify_property_edges: bool = True,
    include_adb_e_key_statements: bool = False,
) -> DataFrame:
    """Edge tables → statement rows (reference __process_adb_edge, main.py:1875-1936).

    An edge with property data, or one referenced by another edge's
    ``_from``/``_to`` (edge-of-edge), cannot be a plain triple — it is
    re-reified (main.py:1919-1934, 2061-2099): the base triple is replaced by
    4 reification statements about ``edge_uri = {_uri}#{_key}``, and the edge
    properties attach to that URI. The edge-reference detection is a semi-join
    of endpoint ids against the edge table's own (collection/_key) ids — the
    reference does this with per-row point lookups.
    """
    edges = _with_optional_cols(edges, ["properties", "_sub_graph_uri"])
    # materialize once: this function references `edges` four times and
    # `vertices` twice — without a barrier each reference re-executes the
    # full upstream transform DAG (and the optimizer re-analyzes a plan that
    # grows multiplicatively)
    vertices = vertices.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    terms = _term_lookup(vertices, graph_ns)

    # endpoints may reference other EDGES (flattened reification) — union the
    # edge docs into the term lookup as URIRef terms of their edge_uri
    edge_ids = edges.select(
        F.concat(F.col("collection"), F.lit("/"), F.col("_key")).alias("doc_id"),
        F.lit("URIRef").alias("kind"),
        F.concat(F.col("_uri"), F.lit("#"), F.col("_key")).alias("id"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("datatype"),
    )
    terms = terms.unionByName(edge_ids.join(terms, "doc_id", "left_anti"))

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
    resolved = (
        edges.select(
            "collection", "_key", "_from", "_to", "_uri", "_sub_graph_uri", "properties"
        )
        .join(s_terms, "_from", "inner")
        .join(o_terms, "_to", "inner")
    )

    if reify_property_edges:
        referenced = (
            edges.select(F.col("_from").alias("ref"))
            .unionByName(edges.select(F.col("_to").alias("ref")))
            .dropDuplicates()
        )
        own_id = F.concat(F.col("collection"), F.lit("/"), F.col("_key"))
        resolved = resolved.withColumn("own_id", own_id).join(
            referenced, resolved["_from"].isNotNull() & (own_id == referenced["ref"]), "left"
        )
        needs_reify = (
            F.col("properties").isNotNull()
            | F.col("ref").isNotNull()
            | F.lit(include_adb_e_key_statements)
        )
        resolved = resolved.withColumn("needs_reify", needs_reify).drop("ref", "own_id")
    else:
        resolved = resolved.withColumn("needs_reify", F.lit(False))

    plain = resolved.filter(~F.col("needs_reify")).select(
        "s_kind",
        "s",
        F.col("_uri").alias("p"),
        "o_kind",
        "o",
        "o_lang",
        "o_datatype",
        F.col("_sub_graph_uri").alias("sub_graph"),
    )

    reif = resolved.filter(F.col("needs_reify"))
    if reif.isEmpty():
        return plain.select(*STATEMENT_COLUMNS)

    edge_uri = F.concat(F.col("_uri"), F.lit("#"), F.col("_key"))
    from sparkrdf import terms as T

    def rstmt(p, o_kind, o, o_lang=None, o_dt=None):
        return [
            F.lit("URIRef").alias("s_kind"),
            edge_uri.alias("s"),
            F.lit(p).alias("p") if isinstance(p, str) else p.alias("p"),
            (F.lit(o_kind) if isinstance(o_kind, str) else o_kind).alias("o_kind"),
            o.alias("o"),
            (o_lang if o_lang is not None else F.lit(None).cast("string")).alias("o_lang"),
            (o_dt if o_dt is not None else F.lit(None).cast("string")).alias("o_datatype"),
            F.col("_sub_graph_uri").alias("sub_graph"),
        ]

    reified_stmts = (
        reif.select(*rstmt(T.RDF_TYPE, "URIRef", F.lit(T.RDF_STATEMENT)))
        .unionByName(reif.select(*rstmt(T.RDF_SUBJECT, F.col("s_kind"), F.col("s"))))
        .unionByName(reif.select(*rstmt(T.RDF_PREDICATE, "URIRef", F.col("_uri"))))
        .unionByName(
            reif.select(
                *rstmt(
                    T.RDF_OBJECT,
                    F.col("o_kind"),
                    F.col("o"),
                    F.col("o_lang"),
                    F.col("o_datatype"),
                )
            )
        )
    )
    if include_adb_e_key_statements:
        reified_stmts = reified_stmts.unionByName(
            reif.select(*rstmt(T.ADB_KEY_URI, "Literal", F.col("_key")))
        )

    # edge properties unpack as statements about the edge_uri
    prop_stmts = pgt_properties_to_statements(
        reif.select(
            F.lit("URIRef").alias("_rdftype"),
            edge_uri.alias("_uri"),
            F.col("collection"),
            F.col("_key"),
            F.col("properties"),
        ),
        _property_uri_map(vertices),
        graph_ns,
    )
    return (
        plain.unionByName(reified_stmts).unionByName(prop_stmts).select(*STATEMENT_COLUMNS)
    )


def _property_uri_map(vertices: DataFrame) -> dict[str, str]:
    """label → predicate IRI from the Property collection (main.py:372-379)."""
    rows = (
        vertices.filter(F.col("collection") == "Property")
        .select("_label", "_uri")
        .dropDuplicates(["_label"])
        .collect()
    )
    return {r["_label"]: r["_uri"] for r in rows if r["_uri"]}


def pgt_properties_to_statements(
    src: DataFrame,
    prop_map: dict[str, str],
    graph_ns: str = "http://www.arangodb.com",
    list_conversion_mode: str = "static",
    dict_conversion_mode: str = "static",
) -> DataFrame:
    """Unpack property-JSON documents → statements (reference
    __unpack_adb_doc main.py:1976-1999, __adb_val_to_rdf_val main.py:2101-2173).

    src columns: _rdftype, _uri, collection, _key, properties.

    - value typing mirrors rdflib Literal inference: int → xsd:integer,
      float → xsd:double, bool → xsd:boolean, str → plain literal;
    - list modes: ``static`` one statement per element, recursing (structure
      flattened — faithful); ``collection`` rebuilds rdf:first/rest chains;
      ``container`` rebuilds rdf:_n members; ``serialize`` emits the JSON
      text as a string literal;
    - dict modes: ``static`` mints a BNode + one statement per key;
      ``serialize`` emits JSON text;
    - minted BNode labels are deterministic (farmhash of subject|prop|path),
      unlike the reference's random rdflib BNodes — resumed exports produce
      identical graphs.

    Runs in an Arrow-batched mapInPandas (a row-expansion over opaque JSON).
    """
    import json as _json

    import pandas as pd

    from sparkrdf.hashing import farmhash_key
    from sparkrdf.terms import RDF_FIRST, RDF_NIL, RDF_REST, RDF_NS

    xsd = "http://www.w3.org/2001/XMLSchema#"
    src = src.filter(F.col("properties").isNotNull())

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

                def emit(sk, sv, p_uri, v, path):
                    if isinstance(v, bool):
                        out.append((sk, sv, p_uri, "Literal", "true" if v else "false", None, xsd + "boolean"))
                    elif isinstance(v, int):
                        out.append((sk, sv, p_uri, "Literal", str(v), None, xsd + "integer"))
                    elif isinstance(v, float):
                        out.append((sk, sv, p_uri, "Literal", repr(v), None, xsd + "double"))
                    elif isinstance(v, str):
                        out.append((sk, sv, p_uri, "Literal", v, None, None))
                    elif isinstance(v, list):
                        if list_conversion_mode == "serialize":
                            out.append((sk, sv, p_uri, "Literal", _json.dumps(v), None, None))
                        elif list_conversion_mode == "collection":
                            node = "x" + farmhash_key(f"{sv}|{path}|coll")
                            out.append((sk, sv, p_uri, "BNode", node, None, None))
                            for i, el in enumerate(v):
                                emit("BNode", node, RDF_FIRST, el, f"{path}.{i}")
                                if i == len(v) - 1:
                                    out.append(("BNode", node, RDF_REST, "URIRef", RDF_NIL, None, None))
                                else:
                                    nxt = "x" + farmhash_key(f"{sv}|{path}|coll|{i + 1}")
                                    out.append(("BNode", node, RDF_REST, "BNode", nxt, None, None))
                                    node = nxt
                        elif list_conversion_mode == "container":
                            node = "x" + farmhash_key(f"{sv}|{path}|cont")
                            out.append((sk, sv, p_uri, "BNode", node, None, None))
                            for i, el in enumerate(v, 1):
                                emit("BNode", node, f"{RDF_NS}_{i}", el, f"{path}.{i}")
                        else:  # static: flatten recursively (main.py:2129-2156)
                            for i, el in enumerate(v):
                                emit(sk, sv, p_uri, el, f"{path}.{i}")
                    elif isinstance(v, dict):
                        if dict_conversion_mode == "serialize":
                            out.append((sk, sv, p_uri, "Literal", _json.dumps(v), None, None))
                        else:  # static (main.py:2158-2169)
                            node = "x" + farmhash_key(f"{sv}|{path}|dict")
                            out.append((sk, sv, p_uri, "BNode", node, None, None))
                            for k2, v2 in v.items():
                                p2 = prop_map.get(k2, f"{graph_ns}/{k2}")
                                emit("BNode", node, p2, v2, f"{path}.{k2}")
                    elif v is None:
                        pass

                for label, val in props.items():
                    p_uri = prop_map.get(label, f"{graph_ns}/{label}")
                    emit(s_kind, s, p_uri, val, label)
            yield pd.DataFrame(
                out,
                columns=["s_kind", "s", "p", "o_kind", "o", "o_lang", "o_datatype"],
            )

    schema = (
        "s_kind string, s string, p string, o_kind string, o string, "
        "o_lang string, o_datatype string"
    )
    stmts = src.select("_rdftype", "_uri", "collection", "_key", "properties").mapInPandas(
        unpack, schema
    )
    return stmts.withColumn("sub_graph", F.lit(None).cast("string")).select(
        *STATEMENT_COLUMNS
    )


def pgt_vertices_to_statements(
    vertices: DataFrame,
    graph_ns: str = "http://www.arangodb.com",
    list_conversion_mode: str = "static",
    dict_conversion_mode: str = "static",
    include_adb_v_col_statements: bool = False,
    infer_type_from_adb_v_col: bool = False,
    include_adb_v_key_statements: bool = False,
) -> DataFrame:
    """PGT vertex property documents → datatype-property statements
    (reference __process_adb_vertex, main.py:1830-1873).

    **infer_type_from_adb_v_col** (main.py:1864-1865): emit
    ``term rdf:type <graph_ns/collection>`` for every vertex, deriving the
    class from the collection it lives in.

    **include_adb_v_key_statements** (main.py:1870-1871): emit
    ``term adb:key "_key"`` so a re-import reproduces the same document
    keys."""
    vertices = _with_optional_cols(vertices, ["_uri", "properties"])
    vertices = vertices.localCheckpoint(eager=True)  # referenced 2-3 times
    out = pgt_properties_to_statements(
        vertices.select("collection", "_key", "_uri", "_rdftype", "properties"),
        _property_uri_map(vertices),
        graph_ns,
        list_conversion_mode,
        dict_conversion_mode,
    )
    if infer_type_from_adb_v_col:
        from sparkrdf import terms as T

        type_stmts = vertices.filter(F.col("_rdftype") != "Literal").select(
            F.col("_rdftype").alias("s_kind"),
            F.coalesce(
                F.col("_uri"),
                F.when(F.col("_rdftype") == "BNode", F.col("_key")).otherwise(
                    F.concat(
                        F.lit(graph_ns), F.lit("/"), F.col("collection"),
                        F.lit("#"), F.col("_key"),
                    )
                ),
            ).alias("s"),
            F.lit(T.RDF_TYPE).alias("p"),
            F.lit("URIRef").alias("o_kind"),
            F.concat(F.lit(graph_ns), F.lit("/"), F.col("collection")).alias("o"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("sub_graph"),
        )
        out = out.unionByName(type_stmts.select(*STATEMENT_COLUMNS))
    if include_adb_v_col_statements:
        from sparkrdf import terms as T

        col_stmts = vertices.filter(F.col("_rdftype") != "Literal").select(
            F.col("_rdftype").alias("s_kind"),
            F.coalesce(
                F.col("_uri"),
                F.when(F.col("_rdftype") == "BNode", F.col("_key")).otherwise(
                    F.concat(
                        F.lit(graph_ns),
                        F.lit("/"),
                        F.col("collection"),
                        F.lit("#"),
                        F.col("_key"),
                    )
                ),
            ).alias("s"),
            F.lit(T.ADB_COL_URI).alias("p"),
            F.lit("Literal").alias("o_kind"),
            F.col("collection").alias("o"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("sub_graph"),
        )
        out = out.unionByName(col_stmts.select(*STATEMENT_COLUMNS))
    if include_adb_v_key_statements:
        from sparkrdf import terms as T

        key_stmts = vertices.filter(F.col("_rdftype") != "Literal").select(
            F.col("_rdftype").alias("s_kind"),
            F.coalesce(
                F.col("_uri"),
                F.when(F.col("_rdftype") == "BNode", F.col("_key")).otherwise(
                    F.concat(
                        F.lit(graph_ns), F.lit("/"), F.col("collection"),
                        F.lit("#"), F.col("_key"),
                    )
                ),
            ).alias("s"),
            F.lit(T.ADB_KEY_URI).alias("p"),
            F.lit("Literal").alias("o_kind"),
            F.col("_key").alias("o"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("sub_graph"),
        )
        out = out.unionByName(key_stmts.select(*STATEMENT_COLUMNS))
    return out


def pgt_to_statements(
    vertices: DataFrame,
    edges: DataFrame,
    graph_ns: str = "http://www.arangodb.com",
    **modes,
) -> DataFrame:
    """Full PGT export: edge statements ∪ property statements. Edge-side
    modes (``reify_property_edges``, ``include_adb_e_key_statements``) route
    to :func:`edges_to_statements`; the rest to
    :func:`pgt_vertices_to_statements`."""
    edge_modes = {
        k: modes.pop(k)
        for k in ("reify_property_edges", "include_adb_e_key_statements")
        if k in modes
    }
    return edges_to_statements(vertices, edges, graph_ns, **edge_modes).unionByName(
        pgt_vertices_to_statements(vertices, graph_ns, **modes)
    )


def _project_properties(df: DataFrame, attrs_by_col: dict) -> DataFrame:
    """Keep only the metagraph-listed attribute keys inside ``properties``
    per collection (reference KEEP projection, main.py:1767-1772). An empty
    attr set keeps the collection with no dynamic attributes."""
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    attrs_local = {k: set(v) for k, v in attrs_by_col.items()}

    @pandas_udf("string")
    def keep(col: pd.Series, props: pd.Series) -> pd.Series:
        out = []
        for c, p in zip(col, props):
            if p is None:
                out.append(None)
                continue
            want = attrs_local.get(c, set())
            d = {k: v for k, v in json.loads(p).items() if k in want}
            out.append(json.dumps(d, sort_keys=True) if d else None)
        return pd.Series(out, dtype="object")

    df = _with_optional_cols(df, ["properties"])
    return df.withColumn("properties", keep(F.col("collection"), F.col("properties")))


def _drop_properties(df: DataFrame, ignored: set) -> DataFrame:
    """UNSET projection (main.py:1774-1775): drop the listed attribute keys
    from every document's dynamic properties."""
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ignored_local = set(ignored)

    @pandas_udf("string")
    def drop(props: pd.Series) -> pd.Series:
        out = []
        for p in props:
            if p is None:
                out.append(None)
                continue
            d = {k: v for k, v in json.loads(p).items() if k not in ignored_local}
            out.append(json.dumps(d, sort_keys=True) if d else None)
        return pd.Series(out, dtype="object")

    df = _with_optional_cols(df, ["properties"])
    return df.withColumn("properties", drop(F.col("properties")))


def metagraph_to_statements(
    vertices: DataFrame,
    edges: DataFrame,
    metagraph: dict,
    explicit_metagraph: bool = True,
    ignored_attributes: set | None = None,
    graph_ns: str = "http://www.arangodb.com",
    **modes,
) -> DataFrame:
    """Metagraph-driven selective export (reference ``arangodb_to_rdf``,
    main.py:229-456).

    **metagraph**: ``{"vertexCollections": {col: {attr, ...}},
    "edgeCollections": {col: {attr, ...}}}`` — only the listed collections
    are exported. With **explicit_metagraph** (default, main.py:255-258)
    only the listed attributes survive inside each document's dynamic
    properties; reserved RDF attributes (``_uri``/``_value``/… — the fixed
    columns here) always survive, like the reference's SYSTEM+RESERVED KEEP
    list. **ignored_attributes** (main.py:306-312) drops the listed keys
    instead, and is mutually exclusive with **explicit_metagraph**
    (validated, main.py:315-317).
    """
    if explicit_metagraph and ignored_attributes:
        raise ValueError(
            "**ignored_attributes** cannot be used if **explicit_metagraph** is True"
        )

    v_cols = dict(metagraph.get("vertexCollections", {}))
    e_cols = dict(metagraph.get("edgeCollections", {}))

    v = vertices.filter(F.col("collection").isin(list(v_cols)))
    e = edges.filter(F.col("collection").isin(list(e_cols)))

    if explicit_metagraph:
        v = _project_properties(v, v_cols)
        e = _project_properties(e, e_cols)
    elif ignored_attributes:
        v = _drop_properties(v, ignored_attributes)
        e = _drop_properties(e, ignored_attributes)

    return pgt_to_statements(v, e, graph_ns, **modes)


def collections_to_statements(
    vertices: DataFrame,
    edges: DataFrame,
    v_cols: set,
    e_cols: set,
    ignored_attributes: set | None = None,
    graph_ns: str = "http://www.arangodb.com",
    **modes,
) -> DataFrame:
    """Collection-name selective export — the reference's
    ``arangodb_collections_to_rdf`` (main.py:458-561): a metagraph export
    with every listed collection taken whole (explicit_metagraph=False),
    optionally dropping **ignored_attributes**."""
    metagraph = {
        "vertexCollections": {c: set() for c in v_cols},
        "edgeCollections": {c: set() for c in e_cols},
    }
    return metagraph_to_statements(
        vertices,
        edges,
        metagraph,
        explicit_metagraph=False,
        ignored_attributes=ignored_attributes,
        graph_ns=graph_ns,
        **modes,
    )


def with_rdf_attribute_prefix(df: DataFrame, prefix: str = "_") -> DataFrame:
    """Rename the reserved RDF attribute columns (``_uri``, ``_value``,
    ``_rdftype``, ``_label``, ``_sub_graph_uri``, ``_lang``, ``_datatype``)
    to a custom prefix — the reference's ``rdf_attribute_prefix``
    constructor option (main.py:92/116-126). ``_key``/``_from``/``_to`` are
    ArangoDB system attributes and keep their names, like the reference."""
    if prefix == "_":
        return df
    for base in ("uri", "value", "rdftype", "label", "sub_graph_uri", "lang", "datatype"):
        old = f"_{base}"
        if old in df.columns:
            df = df.withColumnRenamed(old, f"{prefix}{base}")
    return df


def graph_to_statements(
    spark,
    base: str,
    name: str = "graph",
    ignored_attributes: set | None = None,
    graph_ns: str = "http://www.arangodb.com",
    **modes,
) -> DataFrame:
    """Whole-graph export driven by the graph's own manifest — the
    reference's ``arangodb_graph_to_rdf`` (main.py:563-657, which reads the
    collection list from the ArangoDB graph's edge definitions rather than
    taking one from the caller). Here the manifest written by
    :func:`sparkrdf.io.write_graph` plays that role: edge collections come
    from its ``edge_definitions``, vertex collections from its
    ``vertex_collections`` (which includes vertex-only collections such as
    Property/Class that never appear as edge endpoints)."""
    import json
    import posixpath

    from sparkrdf.fsutil import fs_read_text

    manifest_path = posixpath.join(base, f"{name}.manifest.json")
    manifest = json.loads(fs_read_text(spark, manifest_path))
    e_cols = set(manifest["edge_definitions"])
    v_cols = set(manifest["vertex_collections"])
    vertices = spark.read.parquet(posixpath.join(base, "vertices"))
    edges = spark.read.parquet(posixpath.join(base, "edges"))
    return collections_to_statements(
        vertices,
        edges,
        v_cols=v_cols,
        e_cols=e_cols,
        ignored_attributes=ignored_attributes,
        graph_ns=graph_ns,
        **modes,
    )
