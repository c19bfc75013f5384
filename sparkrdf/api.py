"""Reference-shaped facade: one class with the public method surface of
``arango_rdf.ArangoRDF`` (main.py:121-1655), re-expressed over Spark.

A user of the reference switches by replacing ``ArangoRDF(db)`` with
``SparkRDF(spark)`` and rdflib Graphs / ArangoDB collections with their
Spark-native equivalents:

- an rdflib ``Graph``          → a statements DataFrame
  (``sparkrdf.ttl.STATEMENT_COLUMNS``: s_kind, s, p, o_kind, o, o_lang,
  o_datatype, sub_graph — parse fixtures via :func:`sparkrdf.ttl.parse_ttl`)
- an ArangoDB graph            → ``{"vertices", "edges", "edge_definitions"}``
  DataFrames (persist with :func:`sparkrdf.io.write_graph`)
- server-side batched imports  → Spark writes (the ``batch_size`` /
  ``overwrite_graph`` / ``**adb_import_kwargs`` knobs of the reference are
  ArangoDB-client concerns and intentionally absent)

Every method documents the reference method it mirrors (file:line). The
class holds no state beyond the session and default controller — unlike the
reference there is no in-place mutation of the input graph (main.py:692-694
warns rdf_graph is modified; DataFrames are immutable plans).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from sparkrdf.hashing import farmhash_key, fingerprint64


def _as_statements(df: DataFrame, value_col: str, pred_uri: str) -> DataFrame:
    """(id, value) controller table → statement-shaped rows
    (``?id <pred_uri> "value"``), mirroring the reference methods that
    return controller statements as an RDFGraph."""
    from pyspark.sql import functions as F

    from sparkrdf.ttl import STATEMENT_COLUMNS

    return df.select(
        F.lit("URIRef").alias("s_kind"),
        F.col("id").alias("s"),
        F.lit(pred_uri).alias("p"),
        F.lit("Literal").alias("o_kind"),
        F.col(value_col).alias("o"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("sub_graph"),
    ).select(*STATEMENT_COLUMNS)


class SparkRDF:
    """Spark-first equivalent of ``arango_rdf.ArangoRDF`` (main.py:121)."""

    def __init__(self, spark: SparkSession, controller=None, rdf_attribute_prefix: str = "_"):
        from sparkrdf.mapping import BestClassController

        if controller is not None and not isinstance(controller, BestClassController):
            # reference __init__ raises TypeError on a non-ArangoRDFController
            # (main.py:149-151, test_main.py:30-38)
            raise TypeError(
                "controller must be a BestClassController instance, got "
                f"{type(controller).__name__}"
            )
        self.spark = spark
        self.controller = controller
        self._rdf_attribute_prefix = rdf_attribute_prefix

    # -- properties (main.py:195-227) --------------------------------------
    @property
    def rdf_attribute_prefix(self) -> str:
        """Prefix marking reserved RDF attributes in exported docs
        (main.py:195-197)."""
        return self._rdf_attribute_prefix

    # -- RDF → property graph ----------------------------------------------
    def rdf_to_arangodb_by_rpt(
        self,
        name: str,
        stmts: DataFrame,
        contextualize_graph: bool = False,
        flatten_reified_triples: bool = True,
        use_hashed_literals_as_keys: bool = True,
    ) -> dict:
        """RPT (main.py:663-849): every statement an edge between term
        vertices. Returns {"vertices", "edges", "edge_definitions"}."""
        from sparkrdf.rpt import rpt_transform

        return rpt_transform(
            stmts,
            name,
            flatten_reified_triples=flatten_reified_triples,
            contextualize_graph=contextualize_graph,
            meta_stmts=self.load_meta_ontology() if contextualize_graph else None,
            use_hashed_literals_as_keys=use_hashed_literals_as_keys,
        )

    def rdf_to_arangodb_by_pgt(
        self,
        name: str,
        stmts: DataFrame,
        adb_col_statements: DataFrame | None = None,
        contextualize_graph: bool = False,
        resource_collection_name: str | None = None,
        predicate_collection_name: str | None = None,
        uri_map: DataFrame | None = None,
        controller=None,
    ) -> dict:
        """PGT (main.py:855-1235): literals collapse onto vertex documents,
        object properties become per-predicate edge collections via the
        Collection Mapping Process.

        **adb_col_statements** (main.py:898-906): extra
        ``?v adb:collection "Col"`` statements steering the mapping —
        unioned into the stream; the transform's own extractor picks them
        up, and like the reference they must not also appear in-graph."""
        from pyspark.sql import functions as F

        from sparkrdf.pgt import pgt_transform
        from sparkrdf.terms import ADB_COL_URI

        if adb_col_statements is not None:
            in_graph = stmts.filter(F.col("p") == ADB_COL_URI).limit(1).count()
            if in_graph:
                # reference: "Cannot be used in conjunction with collection
                # statements in rdf_graph" (main.py:903-905)
                raise ValueError(
                    "adb_col_statements cannot be combined with adb:collection "
                    "statements already present in the statements DataFrame"
                )
            stmts = stmts.unionByName(adb_col_statements)
        return pgt_transform(
            stmts,
            name,
            resource_collection=resource_collection_name,
            controller=controller or self.controller,
            contextualize_graph=contextualize_graph,
            meta_stmts=self.load_meta_ontology() if contextualize_graph else None,
            uri_map=uri_map,
            predicate_collection=predicate_collection_name,
        )

    def rdf_to_arangodb_by_lpg(
        self,
        name: str,
        stmts: DataFrame,
        resource_collection_name: str = "Node",
        predicate_collection_name: str = "Edge",
    ) -> dict:
        """LPG (main.py:1587-1655): single Node/Edge collections."""
        from sparkrdf.pgt import lpg_transform

        return lpg_transform(
            stmts,
            name,
            resource_collection=resource_collection_name,
            predicate_collection=predicate_collection_name,
        )

    def write_adb_col_statements(
        self,
        stmts: DataFrame,
        adb_col_statements: DataFrame | None = None,
        controller=None,
    ) -> DataFrame:
        """Run ONLY the Collection Mapping Process and return its result as
        ``?v adb:collection "Col"`` statements (main.py:1237-1336) — the
        standalone preview of what PGT would decide, reusable as the
        **adb_col_statements** input of :meth:`rdf_to_arangodb_by_pgt`."""
        from sparkrdf.mapping import collection_mapping, extract_adb_col_statements
        from sparkrdf.terms import ADB_COL_URI

        if adb_col_statements is not None:
            stmts = stmts.unionByName(adb_col_statements)
        overrides, data = extract_adb_col_statements(stmts)
        mapping = collection_mapping(
            data, overrides=overrides, controller=controller or self.controller
        )
        return _as_statements(mapping, "collection", ADB_COL_URI)

    # -- property graph → RDF ----------------------------------------------
    def arangodb_to_rdf(
        self,
        name: str,
        vertices: DataFrame,
        edges: DataFrame,
        metagraph: dict,
        explicit_metagraph: bool = True,
        ignored_attributes: set | None = None,
        **modes,
    ) -> DataFrame:
        """Metagraph-driven selective export (main.py:229-456). ``name``
        mirrors the reference's graph-name argument; the namespace it minted
        document IRIs under is carried by the docs' ``_uri`` columns."""
        from sparkrdf.export import metagraph_to_statements

        return metagraph_to_statements(
            vertices,
            edges,
            metagraph,
            explicit_metagraph=explicit_metagraph,
            ignored_attributes=ignored_attributes,
            **modes,
        )

    def arangodb_collections_to_rdf(
        self,
        name: str,
        vertices: DataFrame,
        edges: DataFrame,
        v_cols: set,
        e_cols: set,
        ignored_attributes: set | None = None,
        **modes,
    ) -> DataFrame:
        """Whole-collection export (main.py:458-561)."""
        from sparkrdf.export import collections_to_statements

        return collections_to_statements(
            vertices, edges, v_cols, e_cols,
            ignored_attributes=ignored_attributes, **modes,
        )

    def arangodb_graph_to_rdf(
        self, name: str, base: str, ignored_attributes: set | None = None, **modes
    ) -> DataFrame:
        """Whole-graph export driven by the persisted graph's own manifest
        (main.py:563-657 reads the collection list from the ArangoDB graph's
        edge definitions; here the ``write_graph`` manifest plays that
        role)."""
        from sparkrdf.export import graph_to_statements

        return graph_to_statements(
            self.spark, base, name=name,
            ignored_attributes=ignored_attributes, **modes,
        )

    # -- migrations ----------------------------------------------------------
    def migrate_unknown_resources(
        self, name: str, vertices: DataFrame, edges: DataFrame, uri_map: DataFrame
    ) -> dict:
        """Re-home ``{name}_UnknownResource`` docs whose collection is now
        known via the URI map, rewriting edge endpoints (main.py:1338-1454)."""
        from sparkrdf.migrate import migrate_unknown_resources

        return migrate_unknown_resources(vertices, edges, uri_map, name)

    def migrate_edges_to_attributes(
        self,
        vertices: DataFrame,
        edges: DataFrame,
        edge_collections: list[str],
        attribute_name: str,
        **kwargs,
    ) -> DataFrame:
        """Fold traversal-target labels into an array attribute
        (main.py:1456-1585)."""
        from sparkrdf.migrate import migrate_edges_to_attributes

        return migrate_edges_to_attributes(
            vertices, edges, edge_collections, attribute_name, **kwargs
        )

    # -- controller-statement utilities --------------------------------------
    def extract_adb_col_statements(self, stmts: DataFrame) -> DataFrame:
        """``?v adb:collection "Col"`` statements of **stmts**, statement-
        shaped like the reference's returned RDFGraph (main.py:2179-2197);
        :func:`sparkrdf.mapping.extract_adb_col_statements` additionally
        hands back the remainder when removal matters."""
        from sparkrdf.mapping import extract_adb_col_statements
        from sparkrdf.terms import ADB_COL_URI

        overrides, _rest = extract_adb_col_statements(stmts)
        return _as_statements(overrides, "collection", ADB_COL_URI)

    def extract_adb_key_statements(self, stmts: DataFrame) -> DataFrame:
        """``?v adb:key "k"`` statements of **stmts** (main.py:2199-2216)."""
        from sparkrdf.rpt import extract_adb_key_statements
        from sparkrdf.terms import ADB_KEY_URI

        keys, _rest = extract_adb_key_statements(stmts)
        return _as_statements(keys, "custom_key", ADB_KEY_URI)

    # -- scalar utilities (main.py:1657-1724) --------------------------------
    def rdf_id_to_adb_key(self, rdf_id: str, custom_key: str | None = None) -> str:
        """FarmHash document key for an RDF id (main.py:1657-1678). The
        reference consults its adb:key statement registry via ``rdf_term``;
        here the caller passes any custom key directly (the distributed path
        coalesces them column-wise, rpt.py:144-163)."""
        return custom_key if custom_key is not None else farmhash_key(rdf_id)

    def hash(self, rdf_id: str) -> str:
        """str(FarmHash Fingerprint64) — main.py:1680-1707."""
        return str(fingerprint64(rdf_id))

    def rdf_id_to_adb_label(self, rdf_id: str) -> str:
        """URI suffix after the last '/', '#' or ':' (main.py:1709-1724);
        the column-wise twin is :func:`sparkrdf.terms.adb_label`."""
        return re.split("/|#|:", rdf_id)[-1] or rdf_id

    # -- query surface ---------------------------------------------------
    def query(self, stmts: DataFrame, sparql: str, **kwargs) -> DataFrame:
        """Run a SPARQL SELECT/ASK/CONSTRUCT string against a statements
        DataFrame. The reference itself queries through rdflib's
        ``Graph.query`` (its test suite does exactly this) or hand-written
        AQL (main.py:1383-1408); this is the Spark-native equivalent —
        delegates to :func:`sparkrdf.sparql.sparql_query`, one Catalyst
        plan per query."""
        from sparkrdf.sparql import sparql_query

        return sparql_query(stmts, sparql, **kwargs)

    def update(self, stmts: DataFrame, sparql: str, **kwargs) -> DataFrame:
        """Apply a SPARQL 1.1 Update string (INSERT/DELETE DATA, DELETE
        WHERE, DELETE/INSERT WHERE) and return the NEW statements
        DataFrame — functional graph maintenance the caller materializes
        through the idempotent-merge sink (sparkrdf.io) or a streaming
        foreachBatch; delegates to :func:`sparkrdf.sparql.sparql_update`."""
        from sparkrdf.sparql import sparql_update

        return sparql_update(stmts, sparql, **kwargs)

    # -- RDF document ingestion -----------------------------------------------
    def read_rdf(self, path: str, format: str | None = None) -> DataFrame:
        """Read one RDF document file into a statements DataFrame — the
        facade twin of the reference's ``rdflib.Graph().parse(file)`` step
        that precedes every ``rdf_to_arangodb_*`` call.  ``format`` is
        inferred from the extension when omitted: ``.ttl/.turtle → turtle``,
        ``.trig → trig``, ``.nt/.nq/.nquads → nquads``,
        ``.rdf/.owl/.xml → xml``, ``.jsonld/.json → json-ld``
        (rdflib's own extension map).  For bulk
        crawl-scale ingestion use the distributed per-row readers instead
        (:func:`sparkrdf.rdfxml.rdfxml_statements`, the pages pipeline)."""
        from sparkrdf.rdfxml import parse_rdfxml
        from sparkrdf.ttl import parse_nquads, parse_ttl_file, statements_df

        if format is None:
            ext = path.rsplit(".", 1)[-1].lower()
            format = {
                "ttl": "turtle", "turtle": "turtle", "trig": "trig",
                "nt": "nquads", "nq": "nquads", "nquads": "nquads",
                "rdf": "xml", "owl": "xml", "xml": "xml",
                "jsonld": "json-ld", "json": "json-ld",
            }.get(ext)
            if format is None:
                raise ValueError(f"read_rdf: cannot infer format from {path!r}")
        if format in ("turtle", "trig"):
            rows = parse_ttl_file(path)
        elif format == "nquads":
            with open(path, encoding="utf-8") as f:
                rows = parse_nquads(f.read())
        elif format == "xml":
            with open(path, encoding="utf-8") as f:
                rows = parse_rdfxml(f.read(), base=f"file://{path}")
        elif format == "json-ld":
            from sparkrdf.jsonldoc import parse_jsonld

            with open(path, encoding="utf-8") as f:
                rows = parse_jsonld(f.read())
        else:
            raise ValueError(f"read_rdf: unknown format {format!r}")
        return statements_df(self.spark, rows)

    def write_rdf(self, stmts: DataFrame, path: str,
                  format: str | None = None) -> None:
        """Serialize a statements DataFrame to one RDF document file — the
        writer twin of :meth:`read_rdf` (the reference's
        ``Graph.serialize(destination=...)``). Extension-inferred format:
        turtle/trig (prefix-compressed), nquads (driver-collected single
        file; use :func:`sparkrdf.ttl.write_nquads` for the distributed
        multi-part writer), xml, json-ld."""
        from sparkrdf.jsonldoc import serialize_jsonld
        from sparkrdf.rdfxml import serialize_rdfxml
        from sparkrdf.ttl import nquads_lines, serialize_turtle

        if format is None:
            ext = path.rsplit(".", 1)[-1].lower()
            format = {
                "ttl": "turtle", "turtle": "turtle", "trig": "turtle",
                "nt": "nquads", "nq": "nquads", "nquads": "nquads",
                "rdf": "xml", "owl": "xml", "xml": "xml",
                "jsonld": "json-ld", "json": "json-ld",
            }.get(ext)
            if format is None:
                raise ValueError(f"write_rdf: cannot infer format from {path!r}")
        if format == "turtle":
            text = serialize_turtle(stmts)
        elif format == "nquads":
            text = "\n".join(r.value for r in nquads_lines(stmts).collect())
            if text:
                text += "\n"
        elif format == "xml":
            text = serialize_rdfxml(stmts)
        elif format == "json-ld":
            text = serialize_jsonld(stmts)
        else:
            raise ValueError(f"write_rdf: unknown format {format!r}")
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)

    # -- meta ontologies -----------------------------------------------------
    def load_meta_ontology(self, meta_dir: str | None = None) -> DataFrame | None:
        """Vendored OWL/RDF/RDFS meta-ontology statements (the reference's
        ``__load_meta_ontology``, main.py:1776-1804, fed by its ``meta/``
        TriG files; ours are vendored at ``sparkrdf/meta/``)."""
        from sparkrdf.contextualize import load_meta_statements

        return load_meta_statements(self.spark, meta_dir)
