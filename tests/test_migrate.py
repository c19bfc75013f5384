"""C9/C10 migration tests (reference test_main.py:5067-5329, 5594-5816)."""

from pyspark.sql import functions as F

from sparkrdf.migrate import migrate_edges_to_attributes, migrate_unknown_resources
from sparkrdf.pgt import pgt_transform
from sparkrdf.ttl import parse_ttl, statements_df


def test_migrate_unknown_resources(spark):
    """cases/2_2-shaped graph: URs move to their URI-mapped collection and
    edge endpoints are rewritten (main.py:1338-1454)."""
    rows = parse_ttl(
        "@prefix ex: <http://e.c/> . ex:Martin ex:mentorJoe ex:Joe ."
    )
    out = pgt_transform(statements_df(spark, rows), "M")
    v = out["vertices"].localCheckpoint(eager=True)
    e = out["edges"].localCheckpoint(eager=True)
    ur = {r["_label"]: r["_key"] for r in v.collect() if r["collection"] == "M_UnknownResource"}
    assert set(ur) == {"Martin", "Joe"}

    uri_map = spark.createDataFrame(
        [(ur["Martin"], "Person")], "_key string, collection string"
    )
    migrated = migrate_unknown_resources(v, e, uri_map, "M")
    v2 = {r["_label"]: r for r in migrated["vertices"].collect()}
    assert v2["Martin"]["collection"] == "Person"
    assert v2["Joe"]["collection"] == "M_UnknownResource"  # unmapped stays
    e2 = migrated["edges"].collect()[0]
    assert e2["_from"] == f"Person/{ur['Martin']}"
    assert e2["_to"] == f"M_UnknownResource/{ur['Joe']}"


def test_migrate_edges_to_attributes(spark):
    """LPG _type arrays: collect type-edge target labels onto vertices
    (main.py:1456-1581; test_main.py:5736-5758)."""
    rows = parse_ttl(
        """@prefix ex: <http://e.c/> .
        ex:a a ex:T1 . ex:a a ex:T2 . ex:b a ex:T1 ."""
    )
    out = pgt_transform(statements_df(spark, rows), "L", resource_collection="Node")
    v = out["vertices"].localCheckpoint(eager=True)
    e = out["edges"].localCheckpoint(eager=True)
    with_types = migrate_edges_to_attributes(v, e, ["type"], "_type", max_depth=1)
    m = {r["_label"]: r["_type"] for r in with_types.collect()}
    assert m["a"] == ["T1", "T2"]  # sorted labels
    assert m["b"] == ["T1"]
    assert m["T1"] == []  # classes have no outbound type edges


def test_migrate_edges_depth_2(spark):
    """max_depth=2 walks type + subClassOf chains."""
    rows = parse_ttl(
        """@prefix ex: <http://e.c/> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        ex:a a ex:T1 . ex:T1 rdfs:subClassOf ex:Super ."""
    )
    out = pgt_transform(statements_df(spark, rows), "L2")
    v = out["vertices"].localCheckpoint(eager=True)
    e = out["edges"].localCheckpoint(eager=True)
    with_types = migrate_edges_to_attributes(
        v, e, ["type", "subClassOf"], "_type", max_depth=2
    )
    m = {r["_label"]: r["_type"] for r in with_types.collect()}
    assert m["a"] == ["Super", "T1"]
