"""Two-import URI-map flow (reference test_main.py:5067-5329): a first
import records every term's collection in a URI map; a second import of new
statements about the same resources either (a) lands them in
UnknownResource and migrates afterwards, or (b) preloads the URI map so they
land correctly at once. Merge semantics via io.merge_by_key (D2)."""

import json

import pytest
from pyspark.sql import functions as F

from sparkrdf.hashing import farmhash_key
from sparkrdf.io import merge_by_key
from sparkrdf.migrate import migrate_unknown_resources, uri_map_from_vertices
from sparkrdf.pgt import pgt_transform
from sparkrdf.ttl import parse_ttl, statements_df

EX = "http://example.com/"

G1 = """
@prefix ex: <http://example.com/> .
ex:Alice a ex:Person .
ex:GreatBook a ex:Book .
"""

G2 = """
@prefix ex: <http://example.com/> .
ex:Alice ex:wrote ex:GreatBook .
ex:Alice ex:age 25 .
ex:GreatBook ex:title "The Great Novel" .
"""


@pytest.fixture(scope="module")
def g1_out(spark):
    out = pgt_transform(statements_df(spark, parse_ttl(G1)), "Test")
    return {k: v.localCheckpoint(eager=True) for k, v in out.items()}


def test_uri_map_contents(spark, g1_out):
    """URI map after import 1 has the 5 URI terms with their collections
    (test_main.py:5097-5106)."""
    umap = {r["_key"]: r["collection"] for r in uri_map_from_vertices(g1_out["vertices"]).collect()}
    assert umap[farmhash_key(EX + "Alice")] == "Person"
    assert umap[farmhash_key(EX + "GreatBook")] == "Book"
    assert umap[farmhash_key(EX + "Person")] == "Class"
    assert umap[farmhash_key(EX + "Book")] == "Class"
    assert umap[farmhash_key("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")] == "Property"
    assert len(umap) == 5


def test_second_import_without_map_then_migrate(spark, g1_out):
    """Import 2 without the map → UnknownResource; migrate_unknown_resources
    rewrites docs and edge endpoints (test_main.py:5108-5143)."""
    out2 = pgt_transform(statements_df(spark, parse_ttl(G2)), "Test")
    alice_k = farmhash_key(EX + "Alice")
    book_k = farmhash_key(EX + "GreatBook")

    v2 = {r["_key"]: r for r in out2["vertices"].collect()}
    assert v2[alice_k]["collection"] == "Test_UnknownResource"
    assert v2[book_k]["collection"] == "Test_UnknownResource"
    assert json.loads(v2[alice_k]["properties"])["age"] == 25
    wrote = [r for r in out2["edges"].collect() if r["collection"] == "wrote"][0]
    assert "UnknownResource/" in wrote["_from"] and "UnknownResource/" in wrote["_to"]

    migrated = migrate_unknown_resources(
        out2["vertices"],
        out2["edges"],
        uri_map_from_vertices(g1_out["vertices"]),
        "Test",
    )
    mv = {r["_key"]: r for r in migrated["vertices"].collect()}
    assert mv[alice_k]["collection"] == "Person"
    assert mv[book_k]["collection"] == "Book"
    assert not [
        r for r in migrated["vertices"].collect() if r["collection"] == "Test_UnknownResource"
    ]
    wrote2 = [r for r in migrated["edges"].collect() if r["collection"] == "wrote"][0]
    assert wrote2["_from"] == f"Person/{alice_k}"
    assert wrote2["_to"] == f"Book/{book_k}"

    # D2: merging import-2 vertices into import-1's preserves both docs'
    # attributes on the shared keys (upsert-merge, main.py:3935-3940)
    merged = merge_by_key(g1_out["vertices"], migrated["vertices"])
    ma = [r for r in merged.collect() if r["_key"] == alice_k and r["collection"] == "Person"]
    assert len(ma) == 1
    assert json.loads(ma[0]["properties"])["age"] == 25


def test_second_import_with_uri_map_preload(spark, g1_out):
    """Back-to-back with uri_map: no UnknownResource at all
    (test_main.py:5148-5190)."""
    umap = uri_map_from_vertices(g1_out["vertices"])
    out2 = pgt_transform(statements_df(spark, parse_ttl(G2)), "Test", uri_map=umap)
    v2 = {r["_key"]: r for r in out2["vertices"].collect()}
    alice_k = farmhash_key(EX + "Alice")
    book_k = farmhash_key(EX + "GreatBook")
    assert v2[alice_k]["collection"] == "Person"
    assert v2[book_k]["collection"] == "Book"
    assert not [r for r in v2.values() if r["collection"] == "Test_UnknownResource"]
    wrote = [r for r in out2["edges"].collect() if r["collection"] == "wrote"][0]
    assert wrote["_from"] == f"Person/{alice_k}"
    assert wrote["_to"] == f"Book/{book_k}"
    assert json.loads(v2[alice_k]["properties"])["age"] == 25
    assert json.loads(v2[book_k]["properties"])["title"] == "The Great Novel"
