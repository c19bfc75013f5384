"""LPG model (reference rdf_to_arangodb_by_lpg, main.py:1587-1652 +
test_main.py:5584-5653): one Node collection for resources, one Edge
collection for every statement, predicate kept as _label; rdf:type folded
into a vertex attribute via label-filtered migrate_edges_to_attributes."""

import pytest

from sparkrdf.hashing import farmhash_key
from sparkrdf.migrate import migrate_edges_to_attributes
from sparkrdf.pgt import lpg_transform
from sparkrdf.ttl import parse_ttl, statements_df
from tests.conftest import ref_case

EX = "http://example.com/"

TTL = """
@prefix ex: <http://example.com/> .
ex:Alice a ex:Person .
ex:Alice ex:name "Alice" .
ex:Alice ex:age 25 .
ex:Bob a ex:Person .
ex:Bob ex:name "Bob" .
ex:Bob ex:age 30 .
ex:Alice ex:friend ex:Bob .
"""


def test_lpg_basic(spark):
    """Node=2 (Alice, Bob with literal props), Edge=3 (2x type + friend);
    migrate folds the type targets into _type (test_main.py:5584-5631)."""
    stmts = statements_df(spark, parse_ttl(TTL))
    out = lpg_transform(stmts, "Test")
    v = out["vertices"].collect()
    e = out["edges"].collect()

    nodes = [r for r in v if r["collection"] == "Node"]
    assert len(nodes) == 2
    assert all(r["collection"] == "Edge" for r in e) and len(e) == 3
    assert sorted(r["_label"] for r in e) == ["friend", "type", "type"]
    # _type not present before migration
    assert all("properties" not in r or not (r["properties"] and "_type" in r["properties"]) for r in nodes)

    migrated = migrate_edges_to_attributes(
        out["vertices"], out["edges"], ["Edge"], "_type", edge_label="type"
    )
    typed = {
        r["_key"]: r["_type"]
        for r in migrated.collect()
        if r["collection"] == "Node"
    }
    alice, bob = farmhash_key(EX + "Alice"), farmhash_key(EX + "Bob")
    assert typed[alice] == ["Person"] and typed[bob] == ["Person"]


def test_lpg_case_12_1(spark):
    """Reified statement under LPG (test_main.py:5634-5653): Node=2,
    Edge=2, Class=1, Property=2, no per-predicate 'writer' collection;
    edge endpoints prefix in {Edge, Node} / {Class, Node}."""
    from sparkrdf.ttl import parse_ttl_file

    stmts = statements_df(spark, parse_ttl_file(ref_case("cases/12_1.ttl")))
    out = lpg_transform(stmts, "Test")
    v = out["vertices"].collect()
    e = out["edges"].collect()

    by_col = {}
    for r in v:
        by_col.setdefault(r["collection"], []).append(r)
    assert len(by_col.get("Node", [])) == 2
    assert len(by_col.get("Class", [])) == 1
    assert len(by_col.get("Property", [])) == 2
    assert "writer" not in by_col
    assert all(r["collection"] == "Edge" for r in e) and len(e) == 2
    for r in e:
        assert r["_from"].split("/")[0] in {"Edge", "Node"}
        assert r["_to"].split("/")[0] in {"Class", "Node"}


def test_lpg_requires_collections(spark):
    stmts = statements_df(spark, parse_ttl(TTL))
    with pytest.raises(ValueError):
        lpg_transform(stmts, "T", resource_collection="")
    with pytest.raises(ValueError):
        lpg_transform(stmts, "T", predicate_collection="")


def test_resource_collection_excludes_uri_map(spark):
    """Mutual exclusion mirrored from the reference
    (test_main.py:5408-5417): a single resource collection and a preloaded
    URI map are contradictory instructions."""
    import pytest

    from sparkrdf.pgt import pgt_transform
    from sparkrdf.ttl import parse_ttl, statements_df

    stmts = statements_df(
        spark, parse_ttl("@prefix ex: <http://e.com/> . ex:a ex:b ex:c .")
    )
    uri_map = spark.createDataFrame(
        [("http://e.com/a", "X")], "uri string, collection string"
    )
    with pytest.raises(ValueError, match="Cannot specify both"):
        pgt_transform(stmts, "V", resource_collection="Node", uri_map=uri_map)
