"""PGT — property-graph transformation as a DataFrame program.

Reference pipeline (arango_rdf/main.py:855-1195):
1. blacklist removal: drop ``? rdf:type rdf:List|Bag|Seq`` (main.py:2451-2489)
2. ``adb:key`` / ``adb:collection`` controller statements extracted
3. collection mapping on the *pre-flatten* graph (main.py:1071-1096 →
   write_adb_col_statements) — see sparkrdf.mapping
4. reified-triple flattening (main.py:1102-1110) — see sparkrdf.reify
5. list routing + assembly (main.py:1116-1172) — see sparkrdf.lists
6. literal statements collapse into JSON properties on the subject document
   (scalar → list promotion on repeats, serialized-JSON revival,
   main.py:2763-2784); non-literal statements become edges in collections
   named by the predicate local name (main.py:2958-3029)
7. edge definitions accumulate (e_col → from/to collection sets)

Output tables (FIXTURES.md §3): vertices / edges / edge_definitions.

Scale notes: term collection resolution is two equi-joins against the
mapping table (shuffle on term id — unavoidable global association);
property collapse is one groupBy per owner; everything else is narrow.
Hot predicates (rdf:type) are Zipf-heavy — edges are written partitioned by
collection with AQE coalescing; dedup keys are uniformly-distributed hashes
so the dedup shuffle does not skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrdf import terms as T
from sparkrdf.hashing import register_udfs
from sparkrdf.lists import assemble_lists, split_list_statements
from sparkrdf.mapping import collection_mapping, extract_adb_col_statements
from sparkrdf.reify import flatten_reified
from sparkrdf.rpt import GraphTables, extract_adb_key_statements

_BLACKLIST_TYPES = [T.RDF_NS + "List", T.RDF_NS + "Bag", T.RDF_NS + "Seq"]

VERTEX_COLUMNS = [
    "collection",
    "_key",
    "_uri",
    "_label",
    "_rdftype",
    "_sub_graph_uri",
    "properties",
]
EDGE_COLUMNS = [
    "collection",
    "_key",
    "_from",
    "_to",
    "_uri",
    "_label",
    "_rdftype",
    "_sub_graph_uri",
    "properties",
]


def _value_fragment(o, dt):
    """Typed JSON fragment for a literal property value, including the
    serialized-list revival rule (main.py:2763-2770): a literal that parses
    as a JSON list/dict becomes that structure."""
    revived = F.when(
        o.rlike(r"^\s*[\[{]") & F.get_json_object(o, "$").isNotNull(),
        F.get_json_object(o, "$"),
    )
    return F.coalesce(revived, T.literal_value_json(o, dt))


def pgt_transform(
    stmts: DataFrame,
    name: str,
    resource_collection: str | None = None,
    controller=None,
    contextualize_graph: bool = False,
    meta_stmts: DataFrame | None = None,
    uri_map: DataFrame | None = None,
    predicate_collection: str | None = None,
) -> dict[str, DataFrame]:
    """**controller**: optional ``mapping.BestClassController`` subclass
    overriding the best-class rule (reference controller.py:12-94).

    **contextualize_graph** (M7, off by default like the reference
    main.py:861): unions **meta_stmts** into the data and emits
    untyped-predicate typing, DR inference, and DR introspection edges
    (main.py:3972-4130) in collections "type"/"domain"/"range".

    **predicate_collection** (main.py:867/1007-1011, 1055-1056): route ALL
    edges into this single edge collection instead of one collection per
    predicate label (``_label`` keeps the label, so label-filtered
    migrations still work) — with ``resource_collection`` this is the LPG
    model (:func:`lpg_transform`)."""
    if resource_collection is not None and uri_map is not None:
        # reference main.py raises the same mutual exclusion for
        # resource_collection_name + uri_map_collection_name
        # (test_main.py:5408-5417)
        raise ValueError(
            "Cannot specify both uri_map and resource_collection."
        )
    farmhash_udf, edge_key_udf = register_udfs()
    unknown = f"{name}_UnknownResource"

    # 1. blacklist
    data = stmts.filter(
        ~((F.col("p") == T.RDF_TYPE) & F.col("o").isin(_BLACKLIST_TYPES))
    )
    # 2. controller statements
    keys_df, data = extract_adb_key_statements(data)
    overrides, data = extract_adb_col_statements(data)
    # ONE probe pass answers both data-dependent branches (same rationale as
    # rpt_transform: an empty adb:key table would still drag the whole
    # statement stream through two sort-merge joins, and flatten_reified
    # would pay this same pass for its own fast path anyway)
    probe = stmts.agg(
        F.count(
            F.when((F.col("p") == T.ADB_KEY_URI) & (F.col("o_kind") == "Literal"), 1)
        ).alias("n_keys"),
        F.count(
            F.when((F.col("p") == T.RDF_TYPE) & (F.col("o") == T.RDF_STATEMENT), 1)
        ).alias("n_reif"),
    ).first()
    if probe["n_keys"] == 0:
        keys_df = None
    if contextualize_graph and meta_stmts is not None:
        # meta ontologies are imported like data and the mapping sees them
        # (main.py:1055 __load_meta_ontology before write_adb_col_statements)
        data = data.unionByName(meta_stmts, allowMissingColumns=True)
        has_reified = None  # the union may add reified statements — re-probe
    else:
        has_reified = probe["n_reif"] > 0
    # 3. mapping (pre-flatten graph, like the reference); uri_map preloads
    # prior-import collection assignments (main.py:1283-1291)
    mapping = collection_mapping(
        data, overrides, resource_collection, controller, uri_map
    )
    # 4. flatten reified triples
    data, reified_map = flatten_reified(data, keys_df, has_reified=has_reified)
    # 5. list routing + assembly
    normal, list_data, heads = split_list_statements(data)
    fragments, members = assemble_lists(list_data, heads)

    # member resources re-enter the stream as synthetic statements
    member_stmts = (
        heads.join(members, "root", "inner")
        .select(
            "s_kind",
            "s",
            "p",
            F.col("member_kind").alias("o_kind"),
            F.col("member").alias("o"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("o_datatype"),
            "sub_graph",
            F.lit(None).cast("string").alias("reified_subject"),
            F.lit(None).cast("string").alias("e_key_override"),
        )
    )
    work = normal.unionByName(member_stmts)

    # 6. term resolution: keys (farmhash + adb:key override) and collections.
    # One struct UDF call hashes all three term columns per batch (literal
    # objects are nulled before the UDF — PGT collapses them into vertex
    # attributes, so their keys are never needed and never computed).
    from sparkrdf.hashing import register_term_keys_udf

    term_keys_udf = register_term_keys_udf()
    keyed = work.withColumn(
        "_tk",
        term_keys_udf(
            F.col("s"),
            F.col("p"),
            F.when(F.col("o_kind") != "Literal", F.col("o")),
        ),
    )
    keyed = (
        keyed.withColumn("s_key0", F.col("_tk.s_key"))
        .withColumn("p_key", F.col("_tk.p_key"))
        .withColumn("o_key0", F.col("_tk.o_key"))
        .drop("_tk")
    )
    if keys_df is not None:
        s_over = keys_df.select(
            F.col("id").alias("s"), F.col("custom_key").alias("s_custom")
        )
        o_over = keys_df.select(
            F.col("id").alias("o"), F.col("custom_key").alias("o_custom")
        )
        # no broadcast hints: adb:key overrides grow with the corpus (the
        # flagship workload pins one per document) — AQE picks the strategy.
        keyed = (
            keyed.join(s_over, "s", "left")
            .join(o_over, "o", "left")
            .withColumn("s_key", F.coalesce("s_custom", "s_key0"))
            .withColumn(
                "o_key",
                F.when(F.col("o_kind") != "Literal", F.coalesce("o_custom", "o_key0")),
            )
            .drop("s_custom", "o_custom", "s_key0", "o_key0")
        )
    else:
        keyed = (
            keyed.withColumn("s_key", F.col("s_key0"))
            .withColumn(
                "o_key",
                F.when(F.col("o_kind") != "Literal", F.col("o_key0")),
            )
            .drop("s_key0", "o_key0")
        )

    # collection joins (mapping + reified map); literals get no collection
    m_s = mapping.select(F.col("id").alias("s"), F.col("collection").alias("s_map"))
    m_o = mapping.select(F.col("id").alias("o"), F.col("collection").alias("o_map"))
    m_p = mapping.select(F.col("id").alias("p"), F.col("collection").alias("p_map"))
    # mapping and reified maps are data-sized too (mapping covers every
    # typed term; reified map grows with reified statement count): no hints.
    keyed = keyed.join(m_s, "s", "left").join(m_o, "o", "left").join(m_p, "p", "left")
    if reified_map is not None:
        # a reified statement's edge lives in the collection named after its
        # predicate label — or in the single predicate collection (LPG)
        r_col = (
            F.lit(predicate_collection)
            if predicate_collection is not None
            else F.col("p_label")
        )
        r_s = reified_map.select(
            F.col("x").alias("s"), F.col("e_key").alias("s_rkey"), r_col.alias("s_rcol")
        )
        r_o = reified_map.select(
            F.col("x").alias("o"), F.col("e_key").alias("o_rkey"), r_col.alias("o_rcol")
        )
        keyed = keyed.join(r_s, "s", "left").join(r_o, "o", "left")
    else:
        for c in ("s_rkey", "s_rcol", "o_rkey", "o_rcol"):
            keyed = keyed.withColumn(c, F.lit(None).cast("string"))
    if resource_collection is not None:
        # everything except Class/Property maps to the resource collection
        s_map = F.when(F.col("s_map").isin("Class", "Property"), F.col("s_map")).otherwise(
            F.lit(resource_collection)
        )
        o_map = F.when(F.col("o_map").isin("Class", "Property"), F.col("o_map")).otherwise(
            F.lit(resource_collection)
        )
    else:
        s_map = F.coalesce("s_map", F.lit(unknown))
        o_map = F.coalesce("o_map", F.lit(unknown))

    keyed = (
        keyed.withColumn("s_col", F.coalesce("s_rcol", s_map))
        .withColumn("s_key", F.coalesce("s_rkey", F.col("s_key")))
        .withColumn(
            "o_col", F.when(F.col("o_kind") != "Literal", F.coalesce("o_rcol", o_map))
        )
        .withColumn(
            "o_key",
            F.when(F.col("o_kind") != "Literal", F.coalesce("o_rkey", F.col("o_key"))),
        )
        .withColumn("p_col", F.coalesce("p_map", F.lit(unknown)))
        .withColumn("p_label", T.adb_label(F.col("p")))
        .withColumn("s_reified", F.col("s_rkey").isNotNull())
        .withColumn("o_reified", F.col("o_rkey").isNotNull())
        .drop("s_map", "o_map", "p_map", "s_rcol", "s_rkey", "o_rcol", "o_rkey")
    )
    keyed.cache()

    lit = keyed.filter(F.col("o_kind") == "Literal")
    nonlit = keyed.filter(F.col("o_kind") != "Literal")

    # --- vertices: term docs from every non-literal, non-reified position ---
    subj_docs = keyed.filter(~F.col("s_reified")).select(
        F.col("s_col").alias("collection"),
        F.col("s_key").alias("_key"),
        F.col("s").alias("id"),
        F.col("s_kind").alias("kind"),
    )
    pred_docs = keyed.select(
        F.col("p_col").alias("collection"),
        F.col("p_key").alias("_key"),
        F.col("p").alias("id"),
        F.lit("URIRef").alias("kind"),
    )
    obj_docs = nonlit.filter(~F.col("o_reified")).select(
        F.col("o_col").alias("collection"),
        F.col("o_key").alias("_key"),
        F.col("o").alias("id"),
        F.col("o_kind").alias("kind"),
    )
    # subjects AND predicates of list-head statements get term docs even when
    # the statement itself becomes a property (reference processes s_meta and
    # p_meta before routing to list assembly, main.py:2632-2679)
    head_pred = (
        heads.select(F.col("p").alias("id"))
        .dropDuplicates()
        .withColumn("kind", F.lit("URIRef"))
        .withColumn("_key", farmhash_udf(F.col("id")))
        .join(mapping, "id", "left")
        .select(
            F.coalesce("collection", F.lit(unknown)).alias("collection"),
            "_key",
            "id",
            "kind",
        )
    )
    head_subj = (
        heads.select(F.col("s").alias("id"), F.col("s_kind").alias("kind"))
        .dropDuplicates(["id"])
        .withColumn("_key", farmhash_udf(F.col("id")))
    )
    if keys_df is not None:
        head_subj = (
            head_subj.join(
                keys_df.select(F.col("id"), F.col("custom_key")), "id", "left"
            )
            .withColumn("_key", F.coalesce("custom_key", F.col("_key")))
            .drop("custom_key")
        )
    head_subj = head_subj.join(mapping, "id", "left").select(
        F.coalesce("collection", F.lit(unknown)).alias("collection"),
        "_key",
        "id",
        "kind",
    )

    term_docs = (
        subj_docs.unionByName(pred_docs)
        .unionByName(obj_docs)
        .unionByName(head_subj)
        .unionByName(head_pred)
        .dropDuplicates(["collection", "_key"])
    )
    vertices_base = term_docs.select(
        "collection",
        "_key",
        F.when(F.col("kind") == "URIRef", F.col("id")).alias("_uri"),
        F.when(F.col("kind") == "URIRef", T.adb_label(F.col("id")))
        .otherwise(F.lit(""))
        .alias("_label"),
        F.col("kind").alias("_rdftype"),
    )

    # --- properties: literal collapse (M2) + assembled list fragments ---
    lit_props = lit.select(
        F.col("s_col").alias("collection"),
        F.col("s_key").alias("_key"),
        F.col("p_label").alias("prop"),
        _value_fragment(F.col("o"), F.col("o_datatype")).alias("frag"),
        F.col("sub_graph"),
    )
    head_props = (
        heads.join(fragments, "root", "inner")
        .filter(F.col("fragment").isNotNull())
        .join(
            head_subj.select("id", "collection", "_key").withColumnRenamed("id", "s"),
            "s",
            "inner",
        )
        .select(
            "collection",
            "_key",
            T.adb_label(F.col("p")).alias("prop"),
            F.col("fragment").alias("frag"),
            F.col("sub_graph"),
        )
    )
    all_props = lit_props.unionByName(head_props)
    per_prop = all_props.groupBy("collection", "_key", "prop").agg(
        F.sort_array(F.collect_list("frag")).alias("frags"),
        F.max("sub_graph").alias("sg"),
    )
    per_owner = (
        per_prop.withColumn(
            "kv",
            F.concat(
                # (?s): property keys can carry U+0085/U+2028/U+2029, which
                # Jackson leaves raw and Java-regex '.' won't cross without
                # DOTALL — the anchored match would silently yield ''.
                F.regexp_extract(F.to_json(F.struct(F.col("prop").alias("k"))), r'(?s)^\{"k":(.*)\}$', 1),
                F.lit(":"),
                F.when(F.size("frags") == 1, F.element_at("frags", 1)).otherwise(
                    F.concat(F.lit("["), F.concat_ws(",", "frags"), F.lit("]"))
                ),
            ),
        )
        .groupBy("collection", "_key")
        .agg(
            F.concat(
                F.lit("{"), F.concat_ws(",", F.sort_array(F.collect_list("kv"))), F.lit("}")
            ).alias("properties"),
            F.max("sg").alias("_sub_graph_uri"),
        )
    )

    vertices = (
        vertices_base.join(per_owner, ["collection", "_key"], "left")
        .select(*VERTEX_COLUMNS)
    )

    # --- edges (M3): every non-literal statement; e_col = predicate label,
    # or the single predicate collection in LPG mode ---
    e_col = (
        F.lit(predicate_collection)
        if predicate_collection is not None
        else F.col("p_label")
    )
    edges_base = nonlit.select(
        e_col.alias("collection"),
        F.coalesce(
            F.col("e_key_override"),
            edge_key_udf(F.col("s_key"), F.col("p_key"), F.col("o_key")),
        ).alias("_key"),
        F.concat(F.col("s_col"), F.lit("/"), F.col("s_key")).alias("_from"),
        F.concat(F.col("o_col"), F.lit("/"), F.col("o_key")).alias("_to"),
        F.col("p").alias("_uri"),
        F.col("p_label").alias("_label"),
        F.lit("URIRef").alias("_rdftype"),
        F.col("sub_graph").alias("_sub_graph_uri"),
        F.col("s_col"),
        F.col("o_col"),
    ).dropDuplicates(["collection", "_key"])

    # flattened-statement literal properties land on the edge document
    edge_props = per_owner.withColumnRenamed("properties", "e_props").withColumnRenamed(
        "_sub_graph_uri", "e_sg"
    )
    edges = (
        edges_base.join(edge_props, ["collection", "_key"], "left")
        .select(
            "collection",
            "_key",
            "_from",
            "_to",
            "_uri",
            "_label",
            "_rdftype",
            F.coalesce("_sub_graph_uri", "e_sg").alias("_sub_graph_uri"),
            F.col("e_props").alias("properties"),
            "s_col",
            "o_col",
        )
    )

    if contextualize_graph:
        from sparkrdf.contextualize import contextualize_edges

        ctx = contextualize_edges(keyed, name, is_pgt=True, meta_stmts=meta_stmts)
        if predicate_collection is not None:
            # LPG: contextualization edges route to the single edge
            # collection like every other statement (main.py:1055-1056)
            ctx = ctx.withColumn("collection", F.lit(predicate_collection))
        edges = edges.unionByName(ctx).dropDuplicates(["collection", "_key"])

    # --- edge definitions (M4) ---
    edge_definitions = edges.groupBy(F.col("collection").alias("edge_collection")).agg(
        F.sort_array(F.collect_set("s_col")).alias("from_cols"),
        F.sort_array(F.collect_set("o_col")).alias("to_cols"),
    )

    return GraphTables(
        {
            "vertices": vertices,
            "edges": edges.drop("s_col", "o_col"),
            "edge_definitions": edge_definitions,
        },
        cached=[keyed],
    )


def lpg_transform(
    stmts: DataFrame,
    name: str,
    resource_collection: str = "Node",
    predicate_collection: str = "Edge",
    **pgt_kwargs,
) -> dict[str, DataFrame]:
    """RDF → Labeled Property Graph: the reference's
    ``rdf_to_arangodb_by_lpg`` (main.py:1587-1652) — a PGT run where all
    resources land in one vertex collection (Class/Property pins kept) and
    all statements in one edge collection carrying the predicate as
    ``_label``. Follow with ``migrate.migrate_edges_to_attributes(...,
    edge_label="type")`` to fold rdf:type edges into a vertex attribute, as
    the reference recommends."""
    if not resource_collection:
        raise ValueError("resource_collection is required")
    if not predicate_collection:
        raise ValueError("predicate_collection is required")
    return pgt_transform(
        stmts,
        name,
        resource_collection=resource_collection,
        predicate_collection=predicate_collection,
        **pgt_kwargs,
    )
