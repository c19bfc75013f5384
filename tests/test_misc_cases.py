"""Cases 2_3 / 2_4 / 5 (reference test_main.py:470-514, 2067-2178,
2357-2395): subPropertyOf objects stay unpinned (UnknownResource),
predicate pins beat explicit rdf:type classes, bnode objects become
UnknownResource docs carrying their literal properties."""

import json

from sparkrdf.hashing import farmhash_key

EX = "http://example.com/"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"


def test_pgt_case_2_3(pgt_case):
    """supervise (used as predicate) → Property; administer (only the object
    of subPropertyOf, never a predicate, never typed) → UnknownResource;
    the subPropertyOf statement itself becomes an edge."""
    name, stmts, out = pgt_case("cases/2_3.ttl")
    v = {r["_key"]: r for r in out["vertices"].collect()}
    e = {r["_key"]: r for r in out["edges"].collect()}

    person = farmhash_key(EX + "Person")
    supervise = farmhash_key(EX + "supervise")
    administer = farmhash_key(EX + "administer")
    jan, leo = farmhash_key(EX + "Jan"), farmhash_key(EX + "Leo")
    typ = farmhash_key(RDF_NS + "type")
    subprop = farmhash_key(RDFS_NS + "subPropertyOf")

    assert v[person]["collection"] == "Class"
    assert v[supervise]["collection"] == "Property"
    assert v[typ]["collection"] == "Property"
    assert v[jan]["collection"] == "Person"
    assert v[leo]["collection"] == "Person"
    assert v[administer]["collection"] == f"{name}_UnknownResource"

    sp = e[farmhash_key(f"{supervise}-{subprop}-{administer}")]
    assert sp["collection"] == "subPropertyOf"
    assert sp["_from"] == f"Property/{supervise}"
    # UNIQUE_NODES (7: Jan, Leo, Person, supervise, administer, rdf:type,
    # rdfs:subPropertyOf) / NON_LITERAL_STATEMENTS identities
    assert len(v) == 7 and len(e) == 4


def test_pgt_case_2_4(pgt_case):
    """friend is BOTH a predicate and explicitly typed ex:relation — the
    Property pin beats the type-derived class; no 'relation' vertex
    collection materializes (test_main.py:2152-2156)."""
    name, stmts, out = pgt_case("cases/2_4.ttl")
    v = {r["_key"]: r for r in out["vertices"].collect()}
    e = {r["_key"]: r for r in out["edges"].collect()}

    typ = farmhash_key(RDF_NS + "type")
    relation = farmhash_key(EX + "relation")
    friend = farmhash_key(EX + "friend")
    tom, chris = farmhash_key(EX + "Tom"), farmhash_key(EX + "Chris")

    te = e[farmhash_key(f"{friend}-{typ}-{relation}")]
    assert te["collection"] == "type"
    assert te["_from"] == f"Property/{friend}"
    assert te["_to"] == f"Class/{relation}"
    fe = e[farmhash_key(f"{tom}-{friend}-{chris}")]
    assert fe["collection"] == "friend"

    assert v[friend]["collection"] == "Property"
    assert not [r for r in v.values() if r["collection"] == "relation"]
    assert len(e) == 2


def test_pgt_case_5(pgt_case):
    """Bnode object of a non-literal statement: both bob and the bnode land
    in UnknownResource; the bnode's literal 'country' collapses onto its doc
    (test_main.py:2357-2395)."""
    name, stmts, out = pgt_case("cases/5.ttl")
    v = {r["_key"]: r for r in out["vertices"].collect()}
    e = list(out["edges"].collect())

    bob = farmhash_key(EX + "bob")
    ur = [r for r in v.values() if r["collection"] == f"{name}_UnknownResource"]
    assert len(ur) == 2
    assert v[bob]["collection"] == f"{name}_UnknownResource"
    bnode = [r for r in ur if r["_key"] != bob][0]
    assert bnode["_rdftype"] == "BNode"
    assert json.loads(bnode["properties"]) == {"country": "Canada"}

    # one 'nationality' edge bob → bnode; UNIQUE_NODES=4 (bob, bnode,
    # nationality, country), NON_LITERAL_STATEMENTS=1
    assert len(e) == 1 and e[0]["collection"] == "nationality"
    assert e[0]["_from"].endswith(bob) and e[0]["_to"].endswith(bnode["_key"])
    assert len(v) == 4


def test_rpt_case_5(rpt_case):
    """RPT keeps the bnode as a vertex and the literal as a Literal vertex:
    v = URIRefs(1) + BNodes(1) + Literals(1), e = 2 (test_main.py:470-514)."""
    name, stmts, out = rpt_case("cases/5.ttl")
    v = {r["_key"]: r for r in out["vertices"].collect()}
    e = {r["_key"]: r for r in out["edges"].collect()}

    bob = farmhash_key(EX + "bob")
    nationality = farmhash_key(EX + "nationality")
    country = farmhash_key(EX + "country")
    canada = farmhash_key("Canada")

    assert v[bob]["_rdftype"] == "URIRef"
    assert v[canada]["_rdftype"] == "Literal"
    bnodes = [r for r in v.values() if r["_rdftype"] == "BNode"]
    assert len(bnodes) == 1
    bn = bnodes[0]["_key"]
    assert farmhash_key(f"{bob}-{nationality}-{bn}") in e
    assert farmhash_key(f"{bn}-{country}-{canada}") in e
    assert len(v) == 3 and len(e) == 2


def test_rpt_case_2_3(rpt_case):
    """RPT: plain edges, all URIs become URIRef vertices
    (test_main.py:194-...)."""
    name, stmts, out = rpt_case("cases/2_3.ttl")
    v = {r["_key"] for r in out["vertices"].collect()}
    e = {r["_key"] for r in out["edges"].collect()}
    supervise = farmhash_key(EX + "supervise")
    administer = farmhash_key(EX + "administer")
    subprop = farmhash_key(RDFS_NS + "subPropertyOf")
    assert farmhash_key(f"{supervise}-{subprop}-{administer}") in e
    assert len(e) == 4
    # subjects/objects only (predicates get no vertex docs in plain RPT)
    assert administer in v and farmhash_key(EX + "Jan") in v
