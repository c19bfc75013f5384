"""SparkRDF facade: the reference's public method surface (main.py:121-1724)
delegating to the Spark-native modules. Each test pins that a facade call is
equivalent to the underlying transform — the switch path for a reference
user is the facade, so its glue (flag plumbing, statement reshaping,
mutual-exclusion checks) needs its own coverage."""

import pytest
from pyspark.sql import functions as F

from sparkrdf.api import SparkRDF
from sparkrdf.ttl import STATEMENT_COLUMNS, parse_ttl_file, statements_df
from tests.conftest import ref_case


def _stmts(spark, name):
    return statements_df(spark, parse_ttl_file(ref_case(name)))


def _edge_keys(g):
    return {r["_key"] for r in g["edges"].select("_key").collect()}


def test_controller_type_check(spark):
    with pytest.raises(TypeError, match="BestClassController"):
        SparkRDF(spark, controller=object())


def test_rpt_facade_matches_transform(spark):
    from sparkrdf.rpt import rpt_transform

    stmts = _stmts(spark, "cases/1.ttl")
    via_api = SparkRDF(spark).rdf_to_arangodb_by_rpt("Api", stmts)
    direct = rpt_transform(stmts, "Api")
    assert _edge_keys(via_api) == _edge_keys(direct)
    assert via_api["vertices"].count() == direct["vertices"].count()


def test_pgt_facade_with_adb_col_statements(spark):
    adb = SparkRDF(spark)
    stmts = _stmts(spark, "cases/1.ttl")
    # steer one resource into a custom collection through the separate
    # adb_col_statements graph (reference main.py:898-906)
    subj = stmts.filter(F.col("s_kind") == "URIRef").select("s").first()["s"]
    steer = spark.createDataFrame(
        [("URIRef", subj, "http://www.arangodb.com/collection",
          "Literal", "Steered", None, None, None)],
        ", ".join(f"{c} string" for c in STATEMENT_COLUMNS),
    )
    g = adb.rdf_to_arangodb_by_pgt("Api", stmts, adb_col_statements=steer)
    steered = g["vertices"].filter(
        (F.col("collection") == "Steered") & (F.col("_uri") == subj)
    )
    assert steered.count() == 1

    # mutual exclusion with in-graph adb:collection statements
    with pytest.raises(ValueError, match="adb_col_statements"):
        adb.rdf_to_arangodb_by_pgt(
            "Api", stmts.unionByName(steer), adb_col_statements=steer
        )


def test_write_adb_col_statements_feeds_back(spark):
    """The standalone mapping preview (main.py:1237) reproduces PGT's own
    collection decisions when fed back in."""
    adb = SparkRDF(spark)
    stmts = _stmts(spark, "cases/2_1.ttl")
    preview = adb.write_adb_col_statements(stmts)
    assert preview.columns == list(STATEMENT_COLUMNS)
    assert preview.count() > 0

    baseline = adb.rdf_to_arangodb_by_pgt("Api2", stmts)
    steered = adb.rdf_to_arangodb_by_pgt("Api2", stmts, adb_col_statements=preview)
    base_map = {
        r["_uri"]: r["collection"]
        for r in baseline["vertices"].select("_uri", "collection").collect()
        if r["_uri"]
    }
    steer_map = {
        r["_uri"]: r["collection"]
        for r in steered["vertices"].select("_uri", "collection").collect()
        if r["_uri"]
    }
    assert steer_map == base_map


def test_lpg_facade(spark):
    g = SparkRDF(spark).rdf_to_arangodb_by_lpg("ApiL", _stmts(spark, "cases/1.ttl"))
    v_cols = {r["collection"] for r in g["vertices"].select("collection").collect()}
    # resources land in Node; Class/Property pins are kept as their own
    # collections (reference main.py:1587-1652, test_main.py:5584-5653)
    assert "Node" in v_cols and v_cols <= {"Node", "Class", "Property"}
    assert {r["collection"] for r in g["edges"].select("collection").collect()} == {
        "Edge"
    }


def test_graph_export_roundtrip(spark, tmp_path):
    """write_graph → facade arangodb_graph_to_rdf: the manifest-driven
    whole-graph export (main.py:563-657) through the facade."""
    from sparkrdf.compare import round_trip_diff
    from sparkrdf.export import edges_to_statements
    from sparkrdf.io import write_graph

    adb = SparkRDF(spark)
    stmts = _stmts(spark, "cases/1.ttl")
    g = adb.rdf_to_arangodb_by_rpt("ApiG", stmts)
    base = str(tmp_path / "apig")
    write_graph(g, base, run_id="t", name="ApiG")
    out = adb.arangodb_graph_to_rdf("ApiG", base)
    # RPT graph export must reproduce the input statements exactly
    d = round_trip_diff(stmts, out)
    assert not d["missing"] and not d["extra"]
    # and match the in-memory export path
    direct = edges_to_statements(g["vertices"], g["edges"])
    assert out.count() == direct.count()


def test_collections_export_facade(spark):
    adb = SparkRDF(spark)
    g = adb.rdf_to_arangodb_by_pgt("ApiC", _stmts(spark, "cases/1.ttl"))
    v_cols = {r["collection"] for r in g["vertices"].select("collection").collect()}
    e_cols = {r["collection"] for r in g["edges"].select("collection").collect()}
    out = adb.arangodb_collections_to_rdf(
        "ApiC", g["vertices"], g["edges"], v_cols, e_cols
    )
    assert out.count() > 0
    assert out.columns == list(STATEMENT_COLUMNS)


def test_scalar_utils(spark):
    from sparkrdf.hashing import fingerprint64

    adb = SparkRDF(spark)
    assert adb.hash("http://example.com/Person") == str(
        fingerprint64("http://example.com/Person")
    )
    assert adb.rdf_id_to_adb_key("x") == adb.hash("x")
    assert adb.rdf_id_to_adb_key("x", custom_key="K7") == "K7"
    # main.py:1709 examples
    assert adb.rdf_id_to_adb_label("http://example.com/Person") == "Person"
    assert adb.rdf_id_to_adb_label("http://example.com/Person#Bob") == "Bob"
    assert adb.rdf_id_to_adb_label("http://example.com/Person:Bob") == "Bob"


def test_extract_controller_statements_shapes(spark):
    adb = SparkRDF(spark)
    stmts = _stmts(spark, "cases/7.ttl")  # carries adb:collection overrides
    cols = adb.extract_adb_col_statements(stmts)
    assert cols.columns == list(STATEMENT_COLUMNS)
    assert cols.filter(
        F.col("p") == "http://www.arangodb.com/collection"
    ).count() == cols.count()

    keyed = _stmts(spark, "key.ttl")
    keys = adb.extract_adb_key_statements(keyed)
    assert keys.columns == list(STATEMENT_COLUMNS)
    assert keys.count() > 0


def test_load_meta_ontology(spark):
    meta = SparkRDF(spark).load_meta_ontology()
    assert meta is not None and meta.count() > 0


def test_query_string_surface(spark):
    adb = SparkRDF(spark)
    stmts = _stmts(spark, "cases/7.ttl")
    out = adb.query(stmts, "SELECT ?s ?o WHERE { ?s ?p ?o } LIMIT 5")
    assert out.columns == ["s", "o"] and len(out.collect()) == 5
    ask = adb.query(stmts, "ASK { ?s ?p ?o }")
    assert [tuple(r) for r in ask.collect()] == [(True,)]


def test_read_rdf_formats(spark, tmp_path):
    """read_rdf dispatches on extension/format and yields the identical
    statement set across turtle, nquads, and RDF/XML renderings (the
    facade twin of rdflib Graph.parse feeding rdf_to_arangodb_*)."""
    from sparkrdf.api import SparkRDF
    from sparkrdf.rdfxml import serialize_rdfxml
    from sparkrdf.ttl import nquads_lines, parse_ttl, statements_df

    src = """
@prefix ex: <http://example.com/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:a ex:name "Sam"@en ; ex:age "3"^^xsd:integer ; ex:knows ex:b .
"""
    rows = parse_ttl(src)
    df = statements_df(spark, rows)
    ttl_p = tmp_path / "g.ttl"
    ttl_p.write_text(src, encoding="utf-8")
    nq_p = tmp_path / "g.nq"
    nq_p.write_text(
        "\n".join(r.value for r in nquads_lines(df).collect()), encoding="utf-8")
    xml_p = tmp_path / "g.rdf"
    xml_p.write_text(serialize_rdfxml(rows), encoding="utf-8")

    adapter = SparkRDF(spark)
    expect = set(rows)
    for p in (ttl_p, nq_p, xml_p):
        got = {tuple(r) for r in adapter.read_rdf(str(p)).collect()}
        assert got == expect, p

    import pytest as _pytest

    with _pytest.raises(ValueError, match="infer"):
        adapter.read_rdf(str(tmp_path / "g.unknown"))


def test_write_rdf_read_rdf_symmetry(spark, tmp_path):
    """write_rdf → read_rdf is the identity across all four formats
    (bnode-free fixture; the writer twin of Graph.serialize)."""
    from sparkrdf.api import SparkRDF
    from sparkrdf.ttl import parse_ttl, statements_df

    src = """
@prefix ex: <http://e.com/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:a ex:name "Sam"@en ; ex:age "3"^^xsd:integer ; ex:knows ex:b .
"""
    rows = parse_ttl(src)
    df = statements_df(spark, rows)
    adapter = SparkRDF(spark)
    for ext in ("ttl", "nq", "rdf", "jsonld"):
        p = tmp_path / f"g.{ext}"
        adapter.write_rdf(df, str(p))
        got = {tuple(r) for r in adapter.read_rdf(str(p)).collect()}
        assert got == set(rows), ext

    import pytest as _pytest

    with _pytest.raises(ValueError, match="infer"):
        adapter.write_rdf(df, str(tmp_path / "g.unknown"))
