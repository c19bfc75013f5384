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


def test_rpt_case_8(spark):
    """Reference test_rpt_case_8 (test_main.py:601-677): the reified triple
    is flattened to its base edge keyed by the reified subject's key; the
    reification plumbing statements vanish; statements about the reified
    subject become edge-of-edge Statements; no vertex for the reified node."""
    stmts = _load(spark, "cases/8.ttl")
    out = rpt_transform(stmts, "T8")

    v = {r["_key"]: r for r in out["vertices"].collect()}
    e = {r["_key"]: r for r in out["edges"].collect()}

    alice, bob = farmhash_key(EX + "alice"), farmhash_key(EX + "bob")
    certainty = farmhash_key(EX + "certainty")
    lit05 = farmhash_key("0.5")
    x_key = farmhash_key("8_b1")  # the reified subject BNode's id

    # NUM_URIREFS=2 + NUM_LITERALS=1, no BNode vertex for the reified subject
    assert set(v) == {alice, bob, lit05}
    assert {r["_rdftype"] for r in v.values()} == {"URIRef", "Literal"}

    # NUM_TRIPLES=2: flattened base edge + the certainty edge-of-edge
    assert set(e) == {x_key, farmhash_key(f"{x_key}-{certainty}-{lit05}")}
    base = e[x_key]
    assert base["_uri"] == EX + "likes"
    assert base["_from"] == f"T8_URIRef/{alice}"
    assert base["_to"] == f"T8_URIRef/{bob}"
    meta = e[farmhash_key(f"{x_key}-{certainty}-{lit05}")]
    assert meta["_from"] == f"T8_Statement/{x_key}"
    assert meta["_to"] == f"T8_Literal/{lit05}"


def test_rpt_case_13_1(spark):
    """Reference test_rpt_case_13_1 (test_main.py:1061-1158): nested
    reification — the inner reified subject is itself the subject of the
    outer reified statement; both flatten, outer edges point at edges."""
    stmts = _load(spark, "cases/13_1.ttl")
    out = rpt_transform(stmts, "T13")

    v = {r["_key"]: r for r in out["vertices"].collect()}
    e = {r["_key"]: r for r in out["edges"].collect()}

    steve, ceo = farmhash_key(EX + "steve"), farmhash_key(EX + "CEO")
    book, journal = farmhash_key(EX + "book"), farmhash_key(EX + "journal")
    source = farmhash_key(EX + "source")
    inner = farmhash_key(EX + "steve_position_ceo")  # URIRef reified subject
    rows = stmts.filter(
        "p = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#predicate' "
        "and o = 'http://example.com/mentionedBy'"
    ).collect()
    outer = farmhash_key(rows[0]["s"])  # the outer BNode reified subject

    # NUM_URIREFS=4 (predicates and reified subjects emit no vertex docs)
    assert set(v) == {steve, ceo, book, journal}

    # NUM_TRIPLES=3
    assert set(e) == {inner, outer, farmhash_key(f"{outer}-{source}-{journal}")}
    assert e[inner]["_from"] == f"T13_URIRef/{steve}"
    assert e[inner]["_to"] == f"T13_URIRef/{ceo}"
    assert e[outer]["_from"] == f"T13_Statement/{inner}"
    assert e[outer]["_to"] == f"T13_URIRef/{book}"
    assert e[outer]["_uri"] == EX + "mentionedBy"
    s_j = e[farmhash_key(f"{outer}-{source}-{journal}")]
    assert s_j["_from"] == f"T13_Statement/{outer}"
    assert s_j["_to"] == f"T13_URIRef/{journal}"


def test_rpt_reified_adb_key_override(spark):
    """adb:key on a reified subject pins the flattened edge's key and the
    edge-of-edge references to it (test_main.py:656-677 second import)."""
    from sparkrdf.ttl import parse_ttl

    ttl = """
    @prefix ex: <http://example.com/> .
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    @prefix adb: <http://www.arangodb.com/> .
    ex:st a rdf:Statement ;
        rdf:subject ex:alice ;
        rdf:predicate ex:likes ;
        rdf:object ex:bob ;
        adb:key "42" ;
        ex:certainty "0.5" .
    """
    stmts = statements_df(spark, parse_ttl(ttl))
    out = rpt_transform(stmts, "TRK")
    e = {r["_key"]: r for r in out["edges"].collect()}
    certainty, lit05 = farmhash_key(EX + "certainty"), farmhash_key("0.5")
    assert "42" in e
    assert e["42"]["_uri"] == EX + "likes"
    meta_key = farmhash_key(f"42-{certainty}-{lit05}")
    assert meta_key in e
    assert e[meta_key]["_from"] == "TRK_Statement/42"


def test_rpt_flatten_disabled(spark):
    """flatten_reified_triples=False keeps the raw reification statements
    (reference main.py:668 flag)."""
    stmts = _load(spark, "cases/8.ttl")
    out = rpt_transform(stmts, "T8R", flatten_reified_triples=False)
    e = out["edges"].collect()
    uris = {r["_uri"] for r in e}
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#subject" in uris
    assert len(e) == 5


def test_rpt_unhashed_literal_keys(spark):
    """use_hashed_literals_as_keys=False (main.py:669/747/2321): equal
    lexical forms under different statements yield DISTINCT Literal
    vertices with per-occurrence keys; edges point at the respective
    occurrence vertex (no dangling _to); duplicate (s,p,o) statements
    still collapse; default True behavior is unchanged."""
    ttl = b"""
@prefix ex: <http://example.com/> .
ex:a ex:name "Sam" .
ex:b ex:name "Sam" .
ex:b ex:name "Sam" .
ex:c ex:nick "Sam" .
"""
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".ttl", delete=False) as f:
        f.write(ttl)
        path = f.name
    stmts = statements_df(spark, parse_ttl_file(path))

    # default: one shared Literal vertex keyed by the lexical hash
    out_t = rpt_transform(stmts, "UH1")
    lits_t = [r for r in out_t["vertices"].collect() if r["_rdftype"] == "Literal"]
    assert len(lits_t) == 1 and lits_t[0]["_key"] == farmhash_key("Sam")

    # False: one Literal vertex per distinct (s, p, literal) occurrence
    out_f = rpt_transform(stmts, "UH2", use_hashed_literals_as_keys=False)
    lits_f = [r for r in out_f["vertices"].collect() if r["_rdftype"] == "Literal"]
    assert len(lits_f) == 3
    assert len({r["_key"] for r in lits_f}) == 3
    assert all(r["_value"] == "Sam" for r in lits_f)
    assert farmhash_key("Sam") not in {r["_key"] for r in lits_f}

    edges = out_f["edges"].collect()
    assert len(edges) == 3  # duplicate ex:b statement collapsed
    lit_keys = {r["_key"] for r in lits_f}
    tos = {e["_to"].split("/", 1)[1] for e in edges}
    assert tos == lit_keys  # every edge resolves to an existing occurrence doc


def test_graph_tables_release(spark):
    """rpt_transform caches a shared intermediate; GraphTables.release()
    must drop it so long-lived sessions don't accumulate executor storage."""
    stmts = _load(spark, "cases/1.ttl")
    out = rpt_transform(stmts, "REL")
    cached = out._cached[0]
    out["vertices"].count()  # materialize -> cache populated
    assert cached.is_cached
    out.release()
    assert not cached.is_cached and out._cached == []

    # context-manager form
    with rpt_transform(stmts, "REL2") as out2:
        out2["edges"].count()
        handle = out2._cached[0]
        assert handle.is_cached
    assert not handle.is_cached
