"""RDF/XML reader/writer (sparkrdf/rdfxml.py) — grammar features, corpus
round-trips through the Turtle parser, and the distributed wrapper.

The reference parses RDF/XML via rdflib (arango_rdf main.py load_rdf family,
``Graph.parse(format="xml")``); here the parser is from scratch, so the
strongest available oracle is cross-format agreement: every vendored Turtle
fixture, serialized to RDF/XML and re-parsed, must yield the identical
statement set (modulo deterministic bnode relabeling).
"""

import glob
import os

import pytest

from sparkrdf.rdfxml import parse_rdfxml, rdfxml_statements, serialize_rdfxml
from sparkrdf.ttl import RDF_NS, XSD, parse_ttl_file

from conftest import REF_RDF_DIR

RDF = RDF_NS
EX = "http://example.org/"

DOC = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" xml:base="http://base.org/doc">
  <ex:Person rdf:about="#alice" ex:nick="Al">
    <ex:name xml:lang="en">Alice</ex:name>
    <ex:age rdf:datatype="{XSD}integer">30</ex:age>
    <ex:knows rdf:resource="{EX}bob"/>
    <ex:addr rdf:parseType="Resource">
      <ex:city>Springfield</ex:city>
    </ex:addr>
    <ex:pets rdf:parseType="Collection">
      <rdf:Description rdf:about="{EX}cat"/>
      <rdf:Description rdf:about="{EX}dog"/>
    </ex:pets>
    <ex:friend>
      <ex:Person rdf:nodeID="bob2">
        <ex:name>Bob</ex:name>
      </ex:Person>
    </ex:friend>
    <ex:claim rdf:ID="st1" rdf:resource="{EX}thing"/>
  </ex:Person>
  <rdf:Seq rdf:about="{EX}seq">
    <rdf:li>one</rdf:li>
    <rdf:li>two</rdf:li>
  </rdf:Seq>
</rdf:RDF>"""


def _norm(rows):
    """Bnode-label-agnostic normal form: (stmt set, distinct-bnode count)."""
    out, bn = set(), set()
    for (sk, s, p, ok, o, ol, od, g) in rows:
        if sk == "BNode":
            bn.add(s)
            s = "*"
        if ok == "BNode":
            bn.add(o)
            o = "*"
        out.add((sk, s, p, ok, o, ol, od, g))
    return out, len(bn)


def test_grammar_features():
    rows = parse_rdfxml(DOC, base="http://base.org/doc")
    s = set((r[0], r[1], r[2], r[3], r[4], r[5], r[6]) for r in rows)
    alice = "http://base.org/doc#alice"
    # typed node element → rdf:type; rdf:ID subject → base#ID
    assert ("URIRef", alice, RDF + "type", "URIRef", EX + "Person", None, None) in s
    # property attribute → plain literal (no lang: attr precedes xml:lang scope? no —
    # node-level lang applies; the fixture sets lang only on ex:name)
    assert ("URIRef", alice, EX + "nick", "Literal", "Al", None, None) in s
    # xml:lang literal, datatyped literal, resource object
    assert ("URIRef", alice, EX + "name", "Literal", "Alice", "en", None) in s
    assert ("URIRef", alice, EX + "age", "Literal", "30", None, XSD + "integer") in s
    assert ("URIRef", alice, EX + "knows", "URIRef", EX + "bob", None, None) in s
    # rdf:li counter
    assert ("URIRef", EX + "seq", RDF + "_1", "Literal", "one", None, None) in s
    assert ("URIRef", EX + "seq", RDF + "_2", "Literal", "two", None, None) in s
    # rdf:nodeID blank node is shared between definition and reference
    friends = [r for r in rows if r[2] == EX + "friend"]
    assert friends[0][3] == "BNode"
    bob = friends[0][4]
    assert ("BNode", bob, EX + "name", "Literal", "Bob", None, None) in s


def test_parse_type_resource_and_collection():
    rows = parse_rdfxml(DOC, base="http://base.org/doc")
    s = {(r[0], r[1], r[2], r[3], r[4]) for r in rows}
    # parseType=Resource: bnode object carrying the inner property
    addr = [r[4] for r in rows if r[2] == EX + "addr"][0]
    assert ("BNode", addr, EX + "city", "Literal", "Springfield") in s
    # parseType=Collection: well-formed rdf:first/rest chain ending in nil
    head = [r[4] for r in rows if r[2] == EX + "pets"][0]
    firsts = {r[1]: r[4] for r in rows if r[2] == RDF + "first"}
    rests = {r[1]: r[4] for r in rows if r[2] == RDF + "rest"}
    items = []
    node = head
    while node != RDF + "nil":
        items.append(firsts[node])
        node = rests[node]
    assert items == [EX + "cat", EX + "dog"]


def test_reification_via_property_id():
    rows = parse_rdfxml(DOC, base="http://base.org/doc")
    s = {(r[1], r[2], r[4]) for r in rows}
    st = "http://base.org/doc#st1"
    assert (st, RDF + "type", RDF + "Statement") in s
    assert (st, RDF + "subject", "http://base.org/doc#alice") in s
    assert (st, RDF + "predicate", EX + "claim") in s
    assert (st, RDF + "object", EX + "thing") in s
    # the reified statement itself is also asserted
    assert ("http://base.org/doc#alice", EX + "claim", EX + "thing") in s


def test_xml_literal_keeps_markup():
    doc = (f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">'
           f'<rdf:Description rdf:about="{EX}x">'
           f'<ex:m rdf:parseType="Literal">a <ex:b>c</ex:b> d</ex:m>'
           f'</rdf:Description></rdf:RDF>')
    (row,) = parse_rdfxml(doc)
    assert row[3] == "Literal" and row[6] == RDF + "XMLLiteral"
    assert "a " in row[4] and ">c</" in row[4] and " d" in row[4]


def test_nested_xml_base_scoping():
    doc = (f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" '
           f'xml:base="http://outer.org/a/b">'
           f'<rdf:Description rdf:about="rel1">'
           f'<ex:p rdf:resource="rel2" xml:base="http://inner.org/c/"/>'
           f'</rdf:Description></rdf:RDF>')
    (row,) = parse_rdfxml(doc)
    assert row[1] == "http://outer.org/a/rel1"
    assert row[4] == "http://inner.org/c/rel2"


def test_malformed_raises_value_error():
    with pytest.raises(ValueError, match="XML parse error"):
        parse_rdfxml("<rdf:RDF")
    with pytest.raises(ValueError, match="exclusive"):
        parse_rdfxml(
            f'<rdf:RDF xmlns:rdf="{RDF}"><rdf:Description rdf:about="{EX}x" '
            f'rdf:nodeID="y"/></rdf:RDF>')
    with pytest.raises(ValueError, match="exactly one node element"):
        parse_rdfxml(
            f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">'
            f'<rdf:Description rdf:about="{EX}x"><ex:p>'
            f'<rdf:Description/><rdf:Description/>'
            f'</ex:p></rdf:Description></rdf:RDF>')


# -- cross-format corpus agreement ------------------------------------------

# books.ttl is an intentionally-invalid fixture (bare `Writer` token);
# cases/10.ttl uses all-digit local names (http://example.com/1), which the
# RDF/XML grammar cannot form an element QName for — the writer raises, same
# as rdflib's XML serializer; container.ttl uses rdf:li as a DATA predicate,
# which is RDF/XML syntax and therefore also non-expressible.
_SKIP = {"books.ttl", "10.ttl", "container.ttl"}

_CORPUS = sorted(
    f for f in glob.glob(os.path.join(REF_RDF_DIR, "*.ttl"))
    + glob.glob(os.path.join(REF_RDF_DIR, "cases", "*.ttl"))
    + glob.glob(os.path.join(REF_RDF_DIR, "cases", "*.trig"))
    if os.path.basename(f) not in _SKIP
)


@pytest.mark.parametrize("path", _CORPUS, ids=lambda p: os.path.basename(p))
def test_corpus_round_trip_through_rdfxml(path):
    """Turtle fixture → serialize_rdfxml → parse_rdfxml = identity on the
    default-graph statement set (named-graph rows are out of the format)."""
    rows = [r for r in parse_ttl_file(path) if r[7] is None]
    xml = serialize_rdfxml(rows, default_graph_only=False)
    back = parse_rdfxml(xml, bnode_prefix="rx")
    assert _norm(back) == _norm(rows)


def test_writer_rejects_non_expressible():
    with pytest.raises(ValueError, match="rdf:li"):
        serialize_rdfxml([("URIRef", EX + "s", RDF + "li",
                           "Literal", "v", None, None, None)])
    with pytest.raises(ValueError, match="QName"):
        serialize_rdfxml([("URIRef", EX + "s", "http://example.com/1",
                           "Literal", "v", None, None, None)])
    with pytest.raises(ValueError, match="named-graph"):
        serialize_rdfxml([("URIRef", EX + "s", EX + "p",
                           "Literal", "v", None, None, EX + "g")])


# -- distributed wrapper ------------------------------------------------------


def test_rdfxml_statements_distributed(spark):
    good = (f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">'
            f'<ex:Thing rdf:about="#it"><ex:v>1</ex:v></ex:Thing></rdf:RDF>')
    df = spark.createDataFrame(
        [("http://h/a", good), ("http://h/b", "<broken")],
        "url string, xml string")
    out = rdfxml_statements(df).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append(r)
    # relative rdf:about resolves against the row's url (xml:base = url)
    a = by_url["http://h/a"]
    assert {r.s for r in a} == {"http://h/a#it"}
    assert {r.p for r in a} == {RDF + "type", EX + "v"}
    # broken doc → single error row, job survives
    b = by_url["http://h/b"]
    assert len(b) == 1 and b[0].p.endswith("parseError")


def test_rdfxml_statements_bnode_prefix_is_per_document(spark):
    doc = (f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">'
           f'<rdf:Description rdf:about="{EX}s"><ex:p rdf:parseType="Resource">'
           f'<ex:q>v</ex:q></ex:p></rdf:Description></rdf:RDF>')
    df = spark.createDataFrame(
        [("u1", doc), ("u2", doc)], "url string, xml string")
    out = rdfxml_statements(df).collect()
    bnodes = {r.s for r in out if r.s_kind == "BNode"}
    assert bnodes == {"bu1_0", "bu2_0"}  # deterministic, collision-free


def test_empty_xml_lang_cancels_inherited_language():
    """xml:lang="" is the standard way to CANCEL an inherited language —
    it must normalize to a NULL lang (xsd:string semantics), not survive
    as an empty string that downstream classifies as rdf:langString."""
    from sparkrdf.rdfxml import parse_rdfxml

    xml = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:p="http://e.org/" xml:lang="en">'
        '<rdf:Description rdf:about="http://e.org/s">'
        '<p:a>tagged</p:a>'
        '<p:b xml:lang="">untagged</p:b>'
        "</rdf:Description></rdf:RDF>"
    )
    rows = parse_rdfxml(xml)
    by_pred = {r[2]: r for r in rows}
    assert by_pred["http://e.org/a"][5] == "en"
    assert by_pred["http://e.org/b"][5] is None
