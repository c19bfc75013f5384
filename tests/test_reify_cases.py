"""Reification-variant case corpus (reference cases 9-15_4), mirroring the
key-membership and count assertions of tests/test_main.py:683-1790 (RPT) and
:2711-4319 (PGT).

BNode keys are computed from our parser's ids (BNode identity is
parser-scoped; the reference likewise hashes str(BNode) of its own parse,
main.py:2280-2282), located structurally via the statement that identifies
the node — exactly how the reference tests do it
(``rdf_graph.value(predicate=..., object=...)``).
"""

import json

from pyspark.sql import functions as F

from sparkrdf.hashing import farmhash_key

EX = "http://example.com/"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def k(local: str) -> str:
    return farmhash_key(EX + local)


def _bnode_of(stmts, pred: str, obj: str) -> str:
    """key of the node x such that (x, pred, obj) — the rdflib
    ``graph.value(predicate=..., object=...)`` idiom."""
    rows = stmts.filter((F.col("p") == pred) & (F.col("o") == obj)).collect()
    assert len(rows) == 1, f"expected unique ({pred}, {obj}) statement"
    return farmhash_key(rows[0]["s"])


def _edges(out):
    return {r["_key"]: r for r in out["edges"].collect()}


def _verts(out):
    return {r["_key"]: r for r in out["vertices"].collect()}


# ---------------------------------------------------------------------------
# RPT
# ---------------------------------------------------------------------------


def test_rpt_case_9(rpt_case):
    """test_main.py:683-760: reified literal-object statement."""
    name, stmts, out = rpt_case("cases/9.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, RDF_NS + "type", RDF_NS + "Statement")
    assert set(v) == {k("mark"), farmhash_key("28"), farmhash_key("1")}
    assert set(e) == {x, farmhash_key(f"{x}-{k('certainty')}-{farmhash_key('1')}")}
    assert e[x]["_uri"] == EX + "age"
    assert e[x]["_to"] == f"{name}_Literal/{farmhash_key('28')}"


def test_rpt_case_10(rpt_case):
    """test_main.py:764-831: reified statement referenced as an OBJECT
    (edge-of-edge on the _to side) + 3 literal metadata edges."""
    name, stmts, out = rpt_case("cases/10.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, RDF_NS + "type", RDF_NS + "Statement")
    one, two, three = farmhash_key("1"), farmhash_key("2"), farmhash_key("3")

    assert set(v) == {k("alice"), k("mainPage"), k("bobshomepage"), one, two, three}
    assert len(e) == 5
    assert x in e
    src = e[farmhash_key(f"{k('bobshomepage')}-{k('source')}-{x}")]
    assert src["_to"] == f"{name}_Statement/{x}"
    for p_local, val in (("1", one), ("2", two), ("3", three)):
        assert farmhash_key(f"{x}-{k(p_local)}-{val}") in e


def test_rpt_case_11_1(rpt_case):
    """test_main.py:835-888: resource-valued statement metadata."""
    name, stmts, out = rpt_case("cases/11_1.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, RDF_NS + "type", RDF_NS + "Statement")
    assert set(v) == {k("alice"), k("mainPage"), k("bobshomepage")}
    assert set(e) == {x, farmhash_key(f"{x}-{k('source')}-{k('bobshomepage')}")}


def test_rpt_case_11_2(rpt_case):
    """test_main.py:892-947: reified + independent plain statement."""
    name, stmts, out = rpt_case("cases/11_2.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, RDF_NS + "type", RDF_NS + "Statement")
    assert set(v) == {k("alice"), k("bob"), k("alex"), farmhash_key("25")}
    assert set(e) == {
        x,
        farmhash_key(f"{k('alex')}-{k('age')}-{farmhash_key('25')}"),
        farmhash_key(f"{x}-{k('mentionedBy')}-{k('alex')}"),
    }


def test_rpt_case_12_1(rpt_case):
    """test_main.py:951-1003: extra rdf:type on the reified node survives
    flattening as an edge-of-edge (only `a rdf:Statement` is removed)."""
    name, stmts, out = rpt_case("cases/12_1.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, RDF_NS + "type", RDF_NS + "Statement")
    typ = farmhash_key(RDF_NS + "type")
    assert set(v) == {k("alice"), k("mainPage"), k("bobshomepage")}
    assert set(e) == {x, farmhash_key(f"{x}-{typ}-{k('bobshomepage')}")}


def test_rpt_case_12_2(rpt_case):
    """test_main.py:1007-1057: the reified PREDICATE is rdf:type itself."""
    name, stmts, out = rpt_case("cases/12_2.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, RDF_NS + "predicate", RDF_NS + "type")
    assert set(v) == {k("lara"), k("writer"), k("journal")}
    assert set(e) == {x, farmhash_key(f"{x}-{k('owner')}-{k('journal')}")}
    assert e[x]["_uri"] == RDF_NS + "type"


def test_rpt_case_13_2(rpt_case):
    """test_main.py:1162-1266: 3-deep nesting, innermost referenced by key."""
    name, stmts, out = rpt_case("cases/13_2.ttl")
    v, e = _verts(out), _edges(out)
    inner = farmhash_key(EX + "steve_position_ceo")
    mid = farmhash_key(EX + "book_mentioned_by_steve_position_ceo")
    outer = _bnode_of(stmts, RDF_NS + "subject", EX + "journal")

    assert set(v) == {k("steve"), k("CEO"), k("book"), k("journal")}
    assert set(e) == {inner, mid, outer}
    assert e[inner]["_from"] == f"{name}_URIRef/{k('steve')}"
    assert e[mid]["_from"] == f"{name}_URIRef/{k('book')}"
    assert e[mid]["_to"] == f"{name}_Statement/{inner}"
    assert e[outer]["_from"] == f"{name}_URIRef/{k('journal')}"
    assert e[outer]["_to"] == f"{name}_Statement/{mid}"


def test_rpt_case_14_1(rpt_case):
    """test_main.py:1270-1320: no reification — multi-valued literal
    predicate produces one edge per (s,p,o)."""
    name, stmts, out = rpt_case("cases/14_1.ttl")
    v, e = _verts(out), _edges(out)
    info, aau = farmhash_key("Info_Page"), farmhash_key("aau_page")
    assert set(v) == {k("college_page"), k("college_page_2"), info, aau}
    assert len(e) == 4
    assert farmhash_key(f"{k('college_page')}-{k('subject')}-{info}") in e
    assert farmhash_key(f"{k('college_page')}-{k('subject')}-{aau}") in e
    assert farmhash_key(f"{k('college_page')}-{k('link')}-{k('college_page_2')}") in e


def test_rpt_case_14_2(rpt_case):
    """test_main.py:1326-1398: TWO reifications of the same base triple keep
    distinct edges (keyed by their own reified subjects)."""
    name, stmts, out = rpt_case("cases/14_2.ttl")
    v, e = _verts(out), _edges(out)
    c05, c1 = farmhash_key("0.5"), farmhash_key("1")
    x1 = _bnode_of(stmts, EX + "certainty", "0.5")
    x2 = _bnode_of(stmts, EX + "certainty", "1")
    assert x1 != x2
    assert set(v) == {k("Mary"), k("Matt"), c05, c1}
    assert set(e) == {
        x1,
        x2,
        farmhash_key(f"{x1}-{k('certainty')}-{c05}"),
        farmhash_key(f"{x2}-{k('certainty')}-{c1}"),
    }
    assert e[x1]["_uri"] == e[x2]["_uri"] == EX + "likes"


def test_rpt_case_15_1(rpt_case):
    """test_main.py:1402-1473: two reifications, different metadata."""
    name, stmts, out = rpt_case("cases/15_1.ttl")
    v, e = _verts(out), _edges(out)
    c05, text = farmhash_key("0.5"), farmhash_key("text")
    x1 = _bnode_of(stmts, EX + "certainty", "0.5")
    x2 = _bnode_of(stmts, EX + "source", "text")
    assert set(v) == {k("Mary"), k("Matt"), c05, text}
    assert set(e) == {
        x1,
        x2,
        farmhash_key(f"{x1}-{k('certainty')}-{c05}"),
        farmhash_key(f"{x2}-{k('source')}-{text}"),
    }


def test_rpt_case_15_2(rpt_case):
    """test_main.py:1477-1552: reified statement + the SAME base triple in
    plain form — both kept, with different keys (reified-subject key vs
    hash(s-p-o))."""
    name, stmts, out = rpt_case("cases/15_2.ttl")
    v, e = _verts(out), _edges(out)
    c05 = farmhash_key("0.5")
    x = _bnode_of(stmts, EX + "certainty", "0.5")
    plain = farmhash_key(f"{k('Mary')}-{k('likes')}-{k('Matt')}")
    assert set(v) == {k("Mary"), k("Matt"), k("bar"), c05}
    assert set(e) == {
        x,
        plain,
        farmhash_key(f"{x}-{k('certainty')}-{c05}"),
        farmhash_key(f"{x}-{k('foo')}-{k('bar')}"),
    }


def test_rpt_case_15_3(rpt_case):
    """test_main.py:1556-1636: two reifications of the same base triple, one
    with no metadata at all — still two distinct edges."""
    name, stmts, out = rpt_case("cases/15_3.ttl")
    v, e = _verts(out), _edges(out)
    c05 = farmhash_key("0.5")
    x1 = _bnode_of(stmts, EX + "certainty", "0.5")
    xs = {
        farmhash_key(r["s"])
        for r in stmts.filter(
            (F.col("p") == RDF_NS + "type") & (F.col("o") == RDF_NS + "Statement")
        ).collect()
    }
    (x2,) = xs - {x1}
    assert set(v) == {k("Mary"), k("Matt"), k("bar"), c05}
    assert set(e) == {
        x1,
        x2,
        farmhash_key(f"{x1}-{k('certainty')}-{c05}"),
        farmhash_key(f"{x1}-{k('foo')}-{k('bar')}"),
    }


def test_rpt_case_15_4(rpt_case):
    """test_main.py:1640-1790: named-graph reification — the flattened edge
    inherits the graph of its `a rdf:Statement` declaration; cross-graph
    edge-of-edge reference."""
    name, stmts, out = rpt_case("cases/15_4.trig")
    v, e = _verts(out), _edges(out)
    g1, g2 = EX + "Graph1", EX + "Graph2"
    c05, c075, c1 = farmhash_key("0.5"), farmhash_key("0.75"), farmhash_key("1")
    bar = farmhash_key("bar")
    m05 = farmhash_key(EX + "mary_likes_matt_05")
    m075 = _bnode_of(stmts, EX + "certainty", "0.75")
    m1 = _bnode_of(stmts, EX + "certainty", "1")
    jsaid = _bnode_of(stmts, EX + "foo", "bar")

    assert set(v) == {k("John"), k("Mary"), k("Matt"), c05, c075, c1, bar}
    assert len(e) == 8

    assert e[m05]["_sub_graph_uri"] == g1
    assert e[farmhash_key(f"{m05}-{k('certainty')}-{c05}")]["_sub_graph_uri"] == g1
    assert e[m075]["_sub_graph_uri"] == g2
    assert e[farmhash_key(f"{m075}-{k('certainty')}-{c075}")]["_sub_graph_uri"] == g2
    assert e[m1]["_sub_graph_uri"] is None
    assert e[farmhash_key(f"{m1}-{k('certainty')}-{c1}")]["_sub_graph_uri"] is None
    assert e[jsaid]["_sub_graph_uri"] == g2
    assert e[jsaid]["_to"] == f"{name}_Statement/{m05}"


# ---------------------------------------------------------------------------
# PGT
# ---------------------------------------------------------------------------


def _props(row):
    return json.loads(row["properties"]) if row["properties"] else {}


def test_pgt_case_10(pgt_case):
    """test_main.py:2711-2800: literal metadata lands as edge-document
    properties; reified statement referenced as object."""
    name, stmts, out = pgt_case("cases/10.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, RDF_NS + "type", RDF_NS + "Statement")

    ur = f"{name}_UnknownResource"
    for t in ("alice", "mainPage", "bobshomepage"):
        assert v[k(t)]["collection"] == ur, t
    assert v[k("source")]["collection"] == "Property"
    assert v[k("writer")]["collection"] == "Property"
    # 8 unique nodes: 3 UR + Property{source, writer, 1, 2, 3}
    assert len(v) == 8

    writer_edge = e[x]
    assert writer_edge["collection"] == "writer"
    assert _props(writer_edge) == {"1": "1", "2": "2", "3": "3"}
    src = e[farmhash_key(f"{k('bobshomepage')}-{k('source')}-{x}")]
    assert src["collection"] == "source"
    assert src["_to"] == f"writer/{x}"
    assert len(e) == 2


def test_pgt_case_11_1(pgt_case):
    """test_main.py:2830-2935: resource-valued metadata becomes an edge from
    the flattened edge."""
    name, stmts, out = pgt_case("cases/11_1.ttl")
    e = _edges(out)
    x = _bnode_of(stmts, RDF_NS + "type", RDF_NS + "Statement")
    assert e[x]["collection"] == "writer"
    src = e[farmhash_key(f"{x}-{k('source')}-{k('bobshomepage')}")]
    assert src["collection"] == "source"
    assert src["_from"] == f"writer/{x}"
    assert len(e) == 2


def test_pgt_case_12_2(pgt_case):
    """test_main.py:3162-3268: reified rdf:type statement — flattened edge in
    collection 'type', metadata edge hangs off it."""
    name, stmts, out = pgt_case("cases/12_2.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, RDF_NS + "predicate", RDF_NS + "type")
    te = e[x]
    assert te["collection"] == "type"
    assert te["_to"] == f"Class/{k('writer')}"
    ow = e[farmhash_key(f"{x}-{k('owner')}-{k('journal')}")]
    assert ow["collection"] == "owner"
    assert ow["_from"] == f"type/{x}"


def test_pgt_case_14_2(pgt_case):
    """test_main.py:3610-3729: two reifications of one base triple → two
    'likes' edges, each with its own certainty property."""
    name, stmts, out = pgt_case("cases/14_2.ttl")
    e = _edges(out)
    x1 = _bnode_of(stmts, EX + "certainty", "0.5")
    x2 = _bnode_of(stmts, EX + "certainty", "1")
    assert e[x1]["collection"] == e[x2]["collection"] == "likes"
    assert _props(e[x1]) == {"certainty": 0.5}
    assert _props(e[x2]) == {"certainty": 1}
    assert len(e) == 2


def test_pgt_case_15_2(pgt_case):
    """test_main.py:3859-3986: reified + plain duplicate base triple — both
    edges exist in 'likes' with distinct keys."""
    name, stmts, out = pgt_case("cases/15_2.ttl")
    v, e = _verts(out), _edges(out)
    x = _bnode_of(stmts, EX + "certainty", "0.5")
    mary, likes, matt = k("Mary"), farmhash_key(EX + "likes"), k("Matt")
    plain = farmhash_key(f"{mary}-{likes}-{matt}")

    assert e[x]["collection"] == "likes"
    assert _props(e[x])["certainty"] == 0.5
    assert plain in e and e[plain]["collection"] == "likes"
    foo_edge = e[farmhash_key(f"{x}-{k('foo')}-{k('bar')}")]
    assert foo_edge["collection"] == "foo"
    assert foo_edge["_from"] == f"likes/{x}"
    assert len(e) == 3
    # UNIQUE_NODES = 6: UR{Mary, Matt, bar} + Property{likes, certainty, foo}
    assert len(v) == 6


def test_pgt_case_15_4(pgt_case):
    """test_main.py:4124-4319: named-graph reification on the PGT path."""
    name, stmts, out = pgt_case("cases/15_4.trig")
    e = _edges(out)
    g1, g2 = EX + "Graph1", EX + "Graph2"
    m05 = farmhash_key(EX + "mary_likes_matt_05")
    m075 = _bnode_of(stmts, EX + "certainty", "0.75")
    m1 = _bnode_of(stmts, EX + "certainty", "1")
    jsaid = _bnode_of(stmts, EX + "foo", "bar")

    assert e[m05]["_sub_graph_uri"] == g1
    assert _props(e[m05])["certainty"] == 0.5
    assert e[m075]["_sub_graph_uri"] == g2
    assert _props(e[m075])["certainty"] == 0.75
    assert e[m1]["_sub_graph_uri"] is None
    assert _props(e[m1])["certainty"] == 1
    assert e[jsaid]["_sub_graph_uri"] == g2
    assert e[jsaid]["_to"] == f"likes/{m05}"
    assert _props(e[jsaid])["foo"] == "bar"
    assert len(e) == 4


def test_rpt_case_14_3(rpt_case):
    """cases/14_3.trig — the one corpus file the reference's own suite skips
    (its list variant is commented '# BREAKS ArangoRDF'). Named-graph +
    multi-valued reification mix: a reified node with TWO rdf:object values
    flattens to the struct-MINIMUM component ("Info_Page" < "aau_page" —
    deterministic by _reified_spo, not an arbitrary dropDuplicates pick);
    the losing rdf:object statement is reification plumbing and vanishes."""
    name, stmts, out = rpt_case("cases/14_3.trig")
    v, e = _verts(out), _edges(out)
    g1, g2 = EX + "Graph1", EX + "Graph2"
    info, aau = farmhash_key("Info_Page"), farmhash_key("aau_page")
    bar, bar2 = farmhash_key("bar"), farmhash_key("bar2")
    b1 = _bnode_of(stmts, EX + "foo", "bar")
    b2 = _bnode_of(stmts, RDF_NS + "subject", EX + "college_page_3")
    b3 = _bnode_of(stmts, RDF_NS + "subject", EX + "college_page_4")

    # reified subjects emit no vertex docs; all terms incl. the Graph1-only
    # "aau_page" literal do
    assert set(v) == {
        k("college_page"), k("college_page_3"), k("college_page_4"),
        info, aau, bar, bar2,
    }
    assert len(e) == 7

    # plain Graph1 statements keep their named graph
    e1 = e[farmhash_key(f"{k('college_page')}-{k('subject')}-{info}")]
    e2 = e[farmhash_key(f"{k('college_page')}-{k('subject')}-{aau}")]
    assert e1["_sub_graph_uri"] == e2["_sub_graph_uri"] == g1

    # b1 flattens to (college_page, link, college_page_3) in Graph2, keyed by
    # the reified node; its foo metadata hangs off the Statement edge doc
    assert e[b1]["_uri"] == EX + "link"
    assert e[b1]["_from"] == f"{name}_URIRef/{k('college_page')}"
    assert e[b1]["_to"] == f"{name}_URIRef/{k('college_page_3')}"
    assert e[b1]["_sub_graph_uri"] == g2
    for lit in (bar, bar2):
        foo = e[farmhash_key(f"{b1}-{k('foo')}-{lit}")]
        assert foo["_from"] == f"{name}_Statement/{b1}"
        assert foo["_sub_graph_uri"] == g2

    # b2: single-valued default-graph reification
    assert e[b2]["_to"] == f"{name}_Literal/{info}"
    assert e[b2]["_sub_graph_uri"] is None

    # b3: multi-valued rdf:object — deterministic minimum wins, and NO edge
    # to the losing "aau_page" object exists anywhere off college_page_4
    assert e[b3]["_from"] == f"{name}_URIRef/{k('college_page_4')}"
    assert e[b3]["_to"] == f"{name}_Literal/{info}"
    assert not any(
        r["_from"].endswith(k("college_page_4")) and r["_to"].endswith(aau)
        for r in e.values()
    )


def test_pgt_case_14_3(pgt_case):
    """PGT over 14_3: literal reifications collapse into vertex attributes
    (multi-valued pick deterministic), the URIRef reification becomes the one
    edge carrying its statement metadata as properties."""
    name, stmts, out = pgt_case("cases/14_3.trig")
    docs = {r["_uri"]: r for r in out["vertices"].collect() if r["_uri"]}
    es = out["edges"].collect()

    assert json.loads(docs[EX + "college_page"]["properties"])["subject"] == [
        "Info_Page", "aau_page",
    ]
    assert json.loads(docs[EX + "college_page_3"]["properties"])["subject"] == "Info_Page"
    # multi-valued rdf:object: only the deterministic winner lands
    assert json.loads(docs[EX + "college_page_4"]["properties"])["subject"] == "Info_Page"

    assert len(es) == 1
    edge = es[0]
    assert edge["_label"] == "link"
    assert edge["_sub_graph_uri"] == EX + "Graph2"
    assert json.loads(edge["properties"])["foo"] == ["bar", "bar2"]
