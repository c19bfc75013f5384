"""M7 contextualization (reference main.py:3972-4130; off by default,
main.py:667/861): untyped-predicate typing, domain/range inference, and
domain/range introspection edges on both the RPT and PGT paths."""

import pytest

from sparkrdf import terms as T
from sparkrdf.contextualize import load_meta_statements
from sparkrdf.hashing import edge_key, farmhash_key
from sparkrdf.pgt import pgt_transform
from sparkrdf.rpt import rpt_transform
from sparkrdf.ttl import parse_ttl, statements_df

EX = "http://example.com/"
TYPE_K = farmhash_key(T.RDF_TYPE)
PROP_K = farmhash_key(T.RDF_PROPERTY)
DOM_K = farmhash_key(T.RDFS_DOMAIN)


def _stmts(spark, ttl):
    return statements_df(spark, parse_ttl(ttl))


def _edges(out):
    return {r["_key"]: r for r in out["edges"].collect()}


def test_rpt_untyped_predicate_property_edge(spark):
    """main.py:4001-4017: p with no rdf:type statement → p -type-> Property."""
    stmts = _stmts(spark, "@prefix ex: <http://example.com/> . ex:a ex:p ex:b .")
    out = rpt_transform(stmts, "CTX1", contextualize_graph=True)
    e = _edges(out)
    p_k = farmhash_key(EX + "p")
    key = edge_key(p_k, TYPE_K, PROP_K)
    assert key in e
    assert e[key]["_from"] == f"CTX1_URIRef/{p_k}"
    assert e[key]["_to"] == f"CTX1_URIRef/{PROP_K}"
    assert e[key]["_uri"] == T.RDF_TYPE
    # predicate + rdf:Property vertex docs materialize
    v = {r["_key"] for r in out["vertices"].collect()}
    assert p_k in v and PROP_K in v


def test_rpt_typed_predicate_no_property_edge(spark):
    """A predicate WITH a type statement is not re-typed."""
    ttl = """
    @prefix ex: <http://example.com/> .
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    ex:p a rdf:Property .
    ex:a ex:p ex:b .
    """
    out = rpt_transform(_stmts(spark, ttl), "CTX2", contextualize_graph=True)
    e = _edges(out)
    p_k = farmhash_key(EX + "p")
    # the explicit (p, type, Property) data edge exists with the normal
    # statement key; the synthetic edge for p collapses onto it (same key by
    # construction — idempotent). rdf:type itself is an untyped predicate in
    # this graph and correctly gains its own Property edge.
    explicit = edge_key(p_k, TYPE_K, PROP_K)
    assert explicit in e
    p_type_edges = [
        r for r in e.values() if r["_uri"] == T.RDF_TYPE and r["_from"].endswith(p_k)
    ]
    assert len(p_type_edges) == 1
    assert edge_key(TYPE_K, TYPE_K, PROP_K) in e  # rdf:type --type--> Property


def test_rpt_domain_inference(spark):
    """main.py:4090-4106: untyped subject of a domain-scoped predicate
    inherits the domain class."""
    ttl = """
    @prefix ex: <http://example.com/> .
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    ex:p rdfs:domain ex:C .
    ex:a ex:p ex:b .
    """
    out = rpt_transform(_stmts(spark, ttl), "CTX3", contextualize_graph=True)
    e = _edges(out)
    a_k, c_k = farmhash_key(EX + "a"), farmhash_key(EX + "C")
    key = edge_key(a_k, TYPE_K, c_k)
    assert key in e
    assert e[key]["_from"] == f"CTX3_URIRef/{a_k}"
    assert e[key]["_to"] == f"CTX3_URIRef/{c_k}"


def test_rpt_domain_introspection(spark):
    """main.py:4108-4130: typed subject + unscoped predicate → the predicate
    gains an rdfs:domain edge to the subject's class."""
    ttl = """
    @prefix ex: <http://example.com/> .
    ex:a a ex:C .
    ex:a ex:p ex:b .
    """
    out = rpt_transform(_stmts(spark, ttl), "CTX4", contextualize_graph=True)
    e = _edges(out)
    p_k, c_k = farmhash_key(EX + "p"), farmhash_key(EX + "C")
    key = edge_key(p_k, DOM_K, c_k)
    assert key in e
    assert e[key]["_uri"] == T.RDFS_DOMAIN
    assert e[key]["_label"] == "domain"


def test_pgt_contextualize_collections(spark):
    """PGT routing: type edges in 'type', introspection in 'domain'/'range',
    endpoints Property/Class (main.py:4064-4075)."""
    ttl = """
    @prefix ex: <http://example.com/> .
    ex:a a ex:C .
    ex:a ex:p ex:b .
    """
    out = pgt_transform(_stmts(spark, ttl), "CTXP", contextualize_graph=True)
    e = _edges(out)
    p_k, c_k = farmhash_key(EX + "p"), farmhash_key(EX + "C")

    prop_edge = e[edge_key(p_k, TYPE_K, PROP_K)]
    assert prop_edge["collection"] == "type"
    assert prop_edge["_from"] == f"Property/{p_k}"
    assert prop_edge["_to"] == f"Class/{PROP_K}"

    dom_edge = e[edge_key(p_k, DOM_K, c_k)]
    assert dom_edge["collection"] == "domain"
    assert dom_edge["_from"] == f"Property/{p_k}"
    assert dom_edge["_to"] == f"Class/{c_k}"

    # edge definitions include the contextualization collections
    defs = {r["edge_collection"]: r for r in out["edge_definitions"].collect()}
    assert "domain" in defs
    assert "Property" in defs["domain"]["from_cols"]
    assert "Class" in defs["domain"]["to_cols"]


def test_pgt_inference_uses_mapped_term_collection(spark):
    """The inference edge's _from uses the term's mapped collection."""
    ttl = """
    @prefix ex: <http://example.com/> .
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    ex:p rdfs:domain ex:C .
    ex:a ex:p ex:b .
    """
    out = pgt_transform(_stmts(spark, ttl), "CTXI", contextualize_graph=True)
    e = _edges(out)
    a_k, c_k = farmhash_key(EX + "a"), farmhash_key(EX + "C")
    inf = e[edge_key(a_k, TYPE_K, c_k)]
    assert inf["collection"] == "type"
    assert inf["_to"] == f"Class/{c_k}"
    # a is untyped but domain-inferred → the mapping assigns it class C
    assert inf["_from"] == f"C/{a_k}"


def test_meta_ontology_union(spark):
    """S2→M7: the vendored meta ontologies load and suppress introspection
    for predicates used inside the meta graph (main.py:4115-4117)."""
    meta = load_meta_statements(spark)
    if meta is None:
        pytest.skip("meta ontology dir not available")
    assert meta.count() > 100
    ttl = """
    @prefix ex: <http://example.com/> .
    ex:a a ex:C .
    ex:a ex:p ex:b .
    """
    out = rpt_transform(
        _stmts(spark, ttl), "CTXM", contextualize_graph=True, meta_stmts=meta
    )
    e = _edges(out)
    p_k, c_k = farmhash_key(EX + "p"), farmhash_key(EX + "C")
    # ex:p is NOT a meta predicate → introspection still fires
    assert edge_key(p_k, DOM_K, c_k) in e
    # rdfs:label IS used as a predicate inside the meta graph → introspection
    # is suppressed for it: its only rdfs:domain edge is the one DECLARED in
    # the ontology (label -domain-> rdfs:Resource), no synthetic p→class
    # edges from the typed meta subjects it annotates.
    label_k = farmhash_key(T.RDFS_NS + "label")
    label_domains = {
        r["_to"]
        for r in e.values()
        if r["_from"].endswith("/" + label_k) and r["_uri"] == T.RDFS_DOMAIN
    }
    assert label_domains == {f"CTXM_URIRef/{farmhash_key(T.RDFS_RESOURCE)}"}


def test_rpt_meta_graph_counts_and_round_trip(spark):
    """Mirror of reference test_rpt_meta (test_main.py:1796-1860): each
    vendored meta-ontology graph imports through RPT with vertex count ==
    distinct terms and edge count == distinct triples, and round-trips
    losslessly (subtract_graphs == ∅ both ways)."""
    import os

    from sparkrdf.compare import round_trip_diff
    from sparkrdf.contextualize import META_DIR
    from sparkrdf.export import edges_to_statements
    from sparkrdf.rpt import rpt_transform
    from sparkrdf.ttl import parse_ttl_file, statements_df

    for fn in sorted(os.listdir(META_DIR)):
        if not fn.endswith(".trig"):
            continue
        rows = parse_ttl_file(os.path.join(META_DIR, fn))
        terms = {(r[0], r[1]) for r in rows} | {(r[3], r[4]) for r in rows}
        stmts = statements_df(spark, rows)
        out = rpt_transform(stmts, "M" + fn.split(".")[0])
        assert out["vertices"].count() == len(terms), fn
        assert out["edges"].count() == len(set(rows)), fn
        if fn in ("adb.trig", "rdfs.trig"):  # full export parity on two
            d = round_trip_diff(
                stmts, edges_to_statements(out["vertices"], out["edges"])
            )
            assert not d["missing"] and not d["extra"], fn
        out.release()
