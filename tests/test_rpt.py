"""RPT transformation tests, mirroring the reference's test assertions
(tests/test_main.py:45-1790): exact vertex/edge key membership, count
identities, and round-trip symmetric difference = empty."""

import pytest

from sparkrdf.compare import assert_round_trip
from sparkrdf.export import edges_to_statements
from sparkrdf.hashing import farmhash_key
from sparkrdf.rpt import rpt_transform
from sparkrdf.ttl import parse_ttl_file, statements_df
from tests.conftest import ref_case

EX = "http://example.com/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _load(spark, name):
    return statements_df(spark, parse_ttl_file(ref_case(name)))


def test_rpt_case_1(spark):
    """Reference test_rpt_case_1 (test_main.py:45-84)."""
    stmts = _load(spark, "cases/1.ttl")
    out = rpt_transform(stmts, "T1")

    v = {r["_key"]: r for r in out["vertices"].collect()}
    e = {r["_key"]: r for r in out["edges"].collect()}

    alice, bob, person = (farmhash_key(EX + x) for x in ("alice", "bob", "Person"))
    typ, meets = farmhash_key(RDF_TYPE), farmhash_key(EX + "meets")

    assert set(v) == {alice, bob, person}
    assert all(r["collection"] == "T1_URIRef" for r in v.values())
    assert v[alice]["_label"] == "alice"
    # the three edge keys asserted by the reference (test_main.py:69-71)
    assert farmhash_key(f"{alice}-{typ}-{person}") in e
    assert farmhash_key(f"{bob}-{typ}-{person}") in e
    assert farmhash_key(f"{alice}-{meets}-{bob}") in e
    assert len(e) == 3

    assert_round_trip(stmts, edges_to_statements(out["vertices"], out["edges"]))


def test_rpt_literal_datatypes(spark):
    """cases/3_1 + 3_2: datatype / lang metadata on Literal vertices."""
    stmts = _load(spark, "cases/3_1.ttl")
    out = rpt_transform(stmts, "T31")
    lits = [r for r in out["vertices"].collect() if r["_rdftype"] == "Literal"]
    assert lits
    for r in lits:
        assert r["collection"] == "T31_Literal"
        assert r["_uri"] is None
        # lang wins over datatype; both never set simultaneously
        assert not (r["_lang"] and r["_datatype"])
    assert_round_trip(stmts, edges_to_statements(out["vertices"], out["edges"]))

    stmts2 = _load(spark, "cases/3_2.ttl")
    out2 = rpt_transform(stmts2, "T32")
    langs = {r["_value"]: r["_lang"] for r in out2["vertices"].collect() if r["_lang"]}
    assert langs == {"Book": "en", "Bog": "da"}
    assert_round_trip(stmts2, edges_to_statements(out2["vertices"], out2["edges"]))


def test_rpt_bnodes(spark):
    """cases/5 + bnode.ttl: BNode vertices have empty label, no uri."""
    stmts = _load(spark, "bnode.ttl")
    out = rpt_transform(stmts, "T5")
    bn = [r for r in out["vertices"].collect() if r["_rdftype"] == "BNode"]
    assert len(bn) == 2
    for r in bn:
        assert r["_label"] == "" and r["_uri"] is None
    assert_round_trip(stmts, edges_to_statements(out["vertices"], out["edges"]))


def test_rpt_named_graphs(spark):
    """cases/6: _sub_graph_uri lands on edges (test_main.py:2401-2474 analog)."""
    stmts = _load(spark, "cases/6.trig")
    out = rpt_transform(stmts, "T6")
    edges = out["edges"].collect()
    sgs = {r["_sub_graph_uri"] for r in edges}
    assert EX + "Graph1" in sgs and EX + "Graph2" in sgs
    # default-graph statement has no sub-graph
    assert None in sgs
    assert_round_trip(stmts, edges_to_statements(out["vertices"], out["edges"]))


def test_rpt_duplicate_triples_collapse(spark):
    """D3: duplicate (s,p,o) yields a single edge (same deterministic key)."""
    from sparkrdf.ttl import parse_ttl

    rows = parse_ttl(
        "@prefix ex: <http://e.c/> . ex:a ex:p ex:b . ex:a ex:p ex:b ."
    )
    stmts = statements_df(spark, rows)
    out = rpt_transform(stmts, "TD")
    assert out["edges"].count() == 1


def test_rpt_adb_key_override(spark):
    """key.ttl: adb:key statements override farmhash keys (test_main.py:4691-4733)."""
    stmts = _load(spark, "key.ttl")
    out = rpt_transform(stmts, "TK")
    keys = {r["_uri"]: r["_key"] for r in out["vertices"].collect() if r["_uri"]}
    assert keys["http://example.com/bob"] == "1"
    assert keys["http://example.com/alice"] == "2"
    assert keys["http://example.com/Person"] == "Person"
    # adb:key statements themselves are removed from the data graph
    assert not [r for r in out["edges"].collect() if r["_uri"].endswith("arangodb.com/key")]


def test_rpt_literal_key_is_lexical_hash(spark):
    """Literal keys hash the lexical form only (str(t), main.py:2280-2282)."""
    stmts = _load(spark, "cases/3_2.ttl")
    out = rpt_transform(stmts, "TL")
    lits = {r["_key"] for r in out["vertices"].collect() if r["_rdftype"] == "Literal"}
    assert farmhash_key("Book") in lits
    assert farmhash_key("Bog") in lits
