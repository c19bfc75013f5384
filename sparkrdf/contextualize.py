"""M7 — Graph contextualization (feature-flagged, off by default, mirroring
the reference: main.py:667 ``contextualize_graph=False``).

Reference semantics (arango_rdf/main.py:3972-4130, wrappers 2389-2414 RPT /
3252-3276 PGT; setup 770-795 RPT / 1040-1065 PGT):

1. the vendored meta ontologies are UNIONED into the data graph
   (``__load_meta_ontology``), so meta statements are imported like data and
   the type/scope maps see both;
2. **untyped-predicate typing**: every predicate p with no ``(p, rdf:type,
   ?)`` statement gets an edge ``p --type--> rdf:Property``
   (main.py:4001-4017);
3. **domain/range inference**: for each statement whose predicate carries an
   ``rdfs:domain``/``rdfs:range`` scope, an untyped subject/object t gets an
   edge ``t --type--> class`` per scope class (main.py:4090-4106);
4. **domain/range introspection**: a typed subject/object t whose predicate p
   has NO declared scope of that kind (and p is not used inside the meta
   graph) yields ``p --rdfs:domain/range--> class`` per class of t
   (main.py:4108-4130).

Edge keys are ``hash(f"{from_key}-{pred_key}-{to_key}")`` like every other
edge. Collections: RPT → everything in ``{name}_Statement``; PGT → "type"
for type edges, "domain"/"range" for introspection edges, endpoints
"Property"/"Class" (inference _from uses the term's mapped collection).

Spark shape: three join/anti-join pipelines over the keyed statements —
no per-statement loop, no Python in the hot path beyond the shared farmhash
UDF. The scope and typed-subject sets derive from the same statement
DataFrame (predicate-filtered aggregates), so Catalyst reuses the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrdf import terms as T
from sparkrdf.hashing import farmhash_key, register_udfs

#: default location of the vendored meta ontologies (sparkrdf/meta/*.trig —
#: standard W3C RDF/RDFS/OWL/DC/XSD vocabularies; see meta/ATTRIBUTION.md).
#: Mirrors reference arango_rdf/main.py `load_meta_ontology` semantics.
META_DIR = os.environ.get(
    "SPARKRDF_META_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "meta"),
)


def load_meta_statements(spark, meta_dir: str | None = None) -> DataFrame | None:
    """Parse the vendored meta-ontology TriG files into a statements
    DataFrame (S2). Returns None when the directory is absent (the engine
    stays standalone; contextualization then runs over the data graph only).
    """
    from sparkrdf.ttl import parse_ttl_file, statements_df

    meta_dir = meta_dir or META_DIR
    if not os.path.isdir(meta_dir):
        import warnings

        warnings.warn(
            f"meta-ontology directory {meta_dir!r} is missing; "
            "contextualization will run over the data graph only "
            "(no meta-vocabulary union)",
            stacklevel=2,
        )
        return None
    rows: list = []
    for fn in sorted(os.listdir(meta_dir)):
        if fn.endswith((".trig", ".ttl")):
            try:
                rows.extend(parse_ttl_file(os.path.join(meta_dir, fn)))
            except ValueError:
                continue
    if not rows:
        return None
    return statements_df(spark, rows)


def predicate_scope(stmts: DataFrame) -> DataFrame:
    """C3 as a DataFrame: (pred, kind, cls) from rdfs:domain/range
    statements, blacklisting rdfs:Literal/Resource (main.py:3751-3823)."""
    blacklist = [T.RDFS_LITERAL, T.RDFS_RESOURCE]
    return (
        stmts.filter(F.col("p").isin(T.RDFS_DOMAIN, T.RDFS_RANGE))
        .select(
            F.col("s").alias("pred"),
            F.when(F.col("p") == T.RDFS_DOMAIN, "domain").otherwise("range").alias("kind"),
            F.col("o").alias("cls"),
        )
        .filter(~F.col("cls").isin(blacklist))
        .dropDuplicates()
    )


def _edge_schema_row(is_pgt: bool, name: str):
    """(collection expr builders) differ between RPT and PGT."""
    if is_pgt:
        return {
            "type_col": F.lit("type"),
            "class_col": "Class",
            "prop_col": "Property",
        }
    return {
        "type_col": F.lit(f"{name}_Statement"),
        "class_col": f"{name}_URIRef",
        "prop_col": f"{name}_URIRef",
    }


def contextualize_edges(
    keyed: DataFrame,
    name: str,
    is_pgt: bool,
    meta_stmts: DataFrame | None = None,
) -> DataFrame:
    """Extra edges per §M7 over the keyed statement stream.

    ``keyed`` must carry s/p/o, s_kind/o_kind, s_key/p_key/o_key, sub_graph,
    and (PGT) s_col/o_col. Returns rows in the shared EDGE_COLUMNS schema
    (collection,_key,_from,_to,_uri,_label,_rdftype,_sub_graph_uri,
    properties[,s_col,o_col for PGT edge-def accumulation]).
    """
    farmhash_udf, edge_key_udf = register_udfs()
    cols = _edge_schema_row(is_pgt, name)

    type_key = F.lit(farmhash_key(T.RDF_TYPE))
    prop_key = F.lit(farmhash_key(T.RDF_PROPERTY))
    dom_key = F.lit(farmhash_key(T.RDFS_DOMAIN))
    rng_key = F.lit(farmhash_key(T.RDFS_RANGE))

    typed = (
        keyed.filter(F.col("p") == T.RDF_TYPE).select(F.col("s").alias("t")).dropDuplicates()
    )
    scope = predicate_scope(keyed).withColumn("cls_key", farmhash_udf(F.col("cls")))

    # ---- 2. untyped predicates → p --type--> rdf:Property ------------------
    preds = (
        keyed.groupBy("p", "p_key")
        .agg(F.min("sub_graph").alias("sub_graph"))
        .join(typed.withColumnRenamed("t", "p"), "p", "left_anti")
    )
    p_type_edges = preds.select(
        cols["type_col"].alias("collection"),
        edge_key_udf(F.col("p_key"), type_key, prop_key).alias("_key"),
        F.concat(F.lit(cols["prop_col"] + "/"), F.col("p_key")).alias("_from"),
        F.concat(F.lit(cols["class_col"] + "/"), prop_key).alias("_to"),
        F.lit(T.RDF_TYPE).alias("_uri"),
        F.lit("type").alias("_label"),
        F.lit("URIRef").alias("_rdftype"),
        F.col("sub_graph").alias("_sub_graph_uri"),
    )

    # ---- statement sides: (t, t_kind, t_key, t_col, p, p_key, kind, sg) ----
    s_col_expr = (
        F.col("s_col")
        if is_pgt
        else F.when(F.col("s_kind") == "BNode", F.lit(f"{name}_BNode")).otherwise(
            F.lit(f"{name}_URIRef")
        )
    )
    o_col_expr = (
        F.col("o_col")
        if is_pgt
        else F.when(F.col("o_kind") == "BNode", F.lit(f"{name}_BNode")).otherwise(
            F.lit(f"{name}_URIRef")
        )
    )
    subj_side = keyed.select(
        F.col("s").alias("t"),
        F.col("s_key").alias("t_key"),
        s_col_expr.alias("t_col"),
        "p",
        "p_key",
        F.lit("domain").alias("kind"),
        "sub_graph",
    )
    obj_side = keyed.filter(F.col("o_kind") != "Literal").select(
        F.col("o").alias("t"),
        F.col("o_key").alias("t_key"),
        o_col_expr.alias("t_col"),
        "p",
        "p_key",
        F.lit("range").alias("kind"),
        "sub_graph",
    )
    sides = subj_side.unionByName(obj_side)

    # ---- 3. DR inference: untyped t inherits scope classes -----------------
    inference = sides.join(typed, "t", "left_anti").join(
        scope.withColumnRenamed("pred", "p"), ["p", "kind"], "inner"
    )
    inf_edges = inference.select(
        cols["type_col"].alias("collection"),
        edge_key_udf(F.col("t_key"), type_key, F.col("cls_key")).alias("_key"),
        F.concat(F.col("t_col"), F.lit("/"), F.col("t_key")).alias("_from"),
        F.concat(F.lit(cols["class_col"] + "/"), F.col("cls_key")).alias("_to"),
        F.lit(T.RDF_TYPE).alias("_uri"),
        F.lit("type").alias("_label"),
        F.lit("URIRef").alias("_rdftype"),
        F.col("sub_graph").alias("_sub_graph_uri"),
    )

    # ---- 4. DR introspection: typed t, unscoped p → p --domain/range--> cls
    # type_map = explicit ∪ inferred classes per term (main.py:3881-3895)
    explicit_types = (
        keyed.filter((F.col("p") == T.RDF_TYPE) & (F.col("o_kind") != "Literal"))
        .select(F.col("s").alias("t"), F.col("o").alias("cls"))
        .dropDuplicates()
    )
    inferred_types = (
        sides.join(typed, "t", "left_anti")
        .join(scope.withColumnRenamed("pred", "p"), ["p", "kind"], "inner")
        .select("t", "cls")
        .dropDuplicates()
    )
    type_map = explicit_types.unionByName(inferred_types).dropDuplicates()
    type_map = type_map.withColumn("cls_key", farmhash_udf(F.col("cls")))

    meta_preds = (
        meta_stmts.select(F.col("p")).dropDuplicates()
        if meta_stmts is not None
        else None
    )
    unscoped = sides.join(
        scope.withColumnRenamed("pred", "p").select("p", "kind").dropDuplicates(),
        ["p", "kind"],
        "left_anti",
    )
    if meta_preds is not None:
        unscoped = unscoped.join(meta_preds, "p", "left_anti")
    introspection = unscoped.join(type_map, "t", "inner")
    dr_col = (
        F.col("kind") if is_pgt else F.lit(f"{name}_Statement")
    )
    dr_uri = F.when(F.col("kind") == "domain", F.lit(T.RDFS_DOMAIN)).otherwise(
        F.lit(T.RDFS_RANGE)
    )
    dr_key = F.when(F.col("kind") == "domain", dom_key).otherwise(rng_key)
    intro_edges = introspection.select(
        dr_col.alias("collection"),
        edge_key_udf(F.col("p_key"), dr_key, F.col("cls_key")).alias("_key"),
        F.concat(F.lit(cols["prop_col"] + "/"), F.col("p_key")).alias("_from"),
        F.concat(F.lit(cols["class_col"] + "/"), F.col("cls_key")).alias("_to"),
        dr_uri.alias("_uri"),
        F.col("kind").alias("_label"),
        F.lit("URIRef").alias("_rdftype"),
        F.col("sub_graph").alias("_sub_graph_uri"),
    )

    out = (
        p_type_edges.unionByName(inf_edges)
        .unionByName(intro_edges)
        .withColumn("properties", F.lit(None).cast("string"))
        .dropDuplicates(["collection", "_key"])
    )
    if is_pgt:
        # s_col/o_col feed PGT's edge-definition aggregation (M4)
        out = out.withColumn(
            "s_col", F.regexp_extract(F.col("_from"), r"^([^/]+)/", 1)
        ).withColumn("o_col", F.regexp_extract(F.col("_to"), r"^([^/]+)/", 1))
    return out
