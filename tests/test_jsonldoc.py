"""Standalone JSON-LD document reader/writer (sparkrdf/jsonldoc.py) —
expansion-core grammar, cross-format corpus round-trips, distributed
wrapper.  The reference ingests this format via rdflib Graph.parse
(format="json-ld"); absent rdflib, the oracle is cross-format agreement
with the Turtle parser over the vendored corpus."""

import glob
import os

import pytest

from conftest import REF_RDF_DIR
from sparkrdf.jsonldoc import jsonld_statements, parse_jsonld, serialize_jsonld
from sparkrdf.ttl import RDF_NS, XSD, parse_ttl_file

RDF = RDF_NS
EX = "http://example.org/"

DOC = """{
  "@context": {
    "ex": "http://example.org/",
    "name": "ex:name",
    "knows": {"@id": "ex:knows", "@type": "@id"},
    "tags": {"@id": "ex:tags", "@container": "@list"},
    "@vocab": "http://vocab.org/",
    "@base": "http://base.org/",
    "@language": "en"
  },
  "@id": "alice",
  "@type": ["ex:Person", "Agent"],
  "name": "Alice",
  "age": {"@value": 30},
  "score": 1.5,
  "active": true,
  "knows": ["http://example.org/bob", "_:carol"],
  "tags": ["a", "b"],
  "friend": {"@type": "ex:Person", "name": {"@value": "Bob", "@language": "de"}},
  "ref": {"@id": "ex:thing"}
}"""


def _norm(rows):
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


def test_expansion_core():
    rows = parse_jsonld(DOC, bnode_prefix="x")
    s = {(r[0], r[1], r[2], r[3], r[4], r[5], r[6]) for r in rows}
    alice = "http://base.org/alice"  # @base applied to relative @id
    # @type: term-context AND @vocab expansion
    assert ("URIRef", alice, RDF + "type", "URIRef", EX + "Person", None, None) in s
    assert ("URIRef", alice, RDF + "type", "URIRef",
            "http://vocab.org/Agent", None, None) in s
    # term → compact-IRI definition expands through the prefix
    assert ("URIRef", alice, EX + "name", "Literal", "Alice", "en", None) in s
    # JSON natives: int / float (canonical double) / bool
    assert ("URIRef", alice, "http://vocab.org/age", "Literal", "30",
            None, XSD + "integer") in s
    assert ("URIRef", alice, "http://vocab.org/score", "Literal", "1.5E0",
            None, XSD + "double") in s
    assert ("URIRef", alice, "http://vocab.org/active", "Literal", "true",
            None, XSD + "boolean") in s
    # @type: "@id" coercion makes strings IRIs; _: labels keep the n_ prefix
    assert ("URIRef", alice, EX + "knows", "URIRef", EX + "bob", None, None) in s
    assert ("URIRef", alice, EX + "knows", "BNode", "xn_carol", None, None) in s
    # @language on a value object beats the context default
    bob = [r[4] for r in rows if r[2] == "http://vocab.org/friend"][0]
    assert ("BNode", bob, EX + "name", "Literal", "Bob", "de", None) in s
    # pure reference emits no extra node rows
    assert ("URIRef", alice, "http://vocab.org/ref", "URIRef",
            EX + "thing", None, None) in s


def test_list_container():
    rows = parse_jsonld(DOC, bnode_prefix="x")
    head = [r[4] for r in rows if r[2] == EX + "tags"][0]
    firsts = {r[1]: (r[4], r[5]) for r in rows if r[2] == RDF + "first"}
    rests = {r[1]: r[4] for r in rows if r[2] == RDF + "rest"}
    items, node = [], head
    while node != RDF + "nil":
        items.append(firsts[node])
        node = rests[node]
    assert items == [("a", "en"), ("b", "en")]


def test_named_graph():
    doc = ('{"@id": "http://g.org/g1", "@graph": '
           '[{"@id": "http://a.org/s", "http://p.org/p": "v"}]}')
    (row,) = parse_jsonld(doc)
    assert row[7] == "http://g.org/g1" and row[4] == "v"


def test_top_level_array_and_base_argument():
    doc = '[{"@id": "x", "http://p.org/p": {"@id": "y"}}]'
    (row,) = parse_jsonld(doc, base="http://base.org/dir/doc")
    assert row[1] == "http://base.org/dir/x"
    assert row[4] == "http://base.org/dir/y"


def test_unmappable_keys_drop_but_bad_json_raises():
    rows = parse_jsonld('{"@id": "http://a.org/s", "plainkey": "v"}')
    assert rows == []  # no @vocab, no context: key expands to nothing
    with pytest.raises(ValueError, match="invalid JSON"):
        parse_jsonld("{not json")
    with pytest.raises(ValueError, match="remote @context"):
        parse_jsonld('{"@context": "https://schema.org", "@id": "http://a/s"}')


_SKIP = {"books.ttl"}  # intentionally-invalid Turtle fixture

_CORPUS = sorted(
    f for f in glob.glob(os.path.join(REF_RDF_DIR, "*.ttl"))
    + glob.glob(os.path.join(REF_RDF_DIR, "cases", "*.ttl"))
    + glob.glob(os.path.join(REF_RDF_DIR, "cases", "*.trig"))
    if os.path.basename(f) not in _SKIP
)


@pytest.mark.parametrize("path", _CORPUS, ids=lambda p: os.path.basename(p))
def test_corpus_round_trip_through_jsonld(path):
    """Turtle/TriG fixture → serialize_jsonld → parse_jsonld = identity on
    the FULL statement set — JSON-LD is the one text format here that
    carries named graphs AND lists losslessly."""
    rows = parse_ttl_file(path)
    back = parse_jsonld(serialize_jsonld(rows), bnode_prefix="jx")
    assert _norm(back) == _norm(rows)


def test_jsonld_statements_distributed(spark):
    good = '{"@id": "#it", "@type": "http://e.org/T", "http://e.org/v": 1}'
    df = spark.createDataFrame(
        [("http://h/a", good), ("http://h/b", "{broken")],
        "url string, json string")
    out = jsonld_statements(df).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append(r)
    a = by_url["http://h/a"]
    # relative @id resolves against the row url (base = url)
    assert {r.s for r in a} == {"http://h/a#it"}
    assert {r.o_datatype for r in a} == {None, XSD + "integer"}
    b = by_url["http://h/b"]
    assert len(b) == 1 and b[0].p.endswith("parseError")


def test_read_rdf_jsonld(spark, tmp_path):
    from sparkrdf.api import SparkRDF
    from sparkrdf.ttl import parse_ttl

    src = '@prefix ex: <http://e.com/> .\nex:a ex:knows ex:b ; ex:n "x"@en .'
    rows = parse_ttl(src)
    p = tmp_path / "g.jsonld"
    p.write_text(serialize_jsonld(rows), encoding="utf-8")
    got = {tuple(r) for r in SparkRDF(spark).read_rdf(str(p)).collect()}
    assert got == set(rows)


def test_malformed_shapes_become_error_rows(spark):
    """Review fixes: non-string @id raises ValueError; a @context term
    cycle raises ValueError (not RecursionError); and in the distributed
    wrapper NO document shape can kill the job — every malformed body
    yields its error row."""
    with pytest.raises(ValueError, match="@id must be a string"):
        parse_jsonld('{"@id": 123, "http://p/v": 1}')
    with pytest.raises(ValueError, match="term cycle"):
        parse_jsonld('{"@context": {"a": "a"}, "@id": "urn:s", "a": "x"}')

    df = spark.createDataFrame(
        [("u1", '{"@id": 123}'),
         ("u2", '{"@context": {"a": "a"}, "@id": "urn:s", "a": "x"}'),
         ("u3", '{"@id": "urn:ok", "http://p/v": 1}')],
        "url string, json string")
    rows = jsonld_statements(df).collect()
    errs = {r.url for r in rows if r.p.endswith("parseError")}
    assert errs == {"u1", "u2"}
    assert any(r.s == "urn:ok" for r in rows)


def test_value_object_ignores_context_default_language():
    """Per JSON-LD expansion, @context @language applies only to PLAIN
    string values — an explicit {"@value": ...} object without its own
    @language yields a plain literal (rdflib agrees)."""
    from sparkrdf.jsonldoc import parse_jsonld

    doc = (
        '{"@context":{"@language":"en","p":"http://e.org/p","q":"http://e.org/q"},'
        '"@id":"http://e.org/s",'
        '"p":"plain",'
        '"q":{"@value":"explicit"}}'
    )
    rows = parse_jsonld(doc)
    by_pred = {r[2]: r for r in rows}
    # plain string inherits the default language
    assert by_pred["http://e.org/p"][5] == "en"
    # explicit value object does NOT
    assert by_pred["http://e.org/q"][5] is None
    # but its own @language still works
    doc2 = doc.replace('{"@value":"explicit"}',
                       '{"@value":"explicit","@language":"da"}')
    rows2 = parse_jsonld(doc2)
    assert {r[2]: r for r in rows2}["http://e.org/q"][5] == "da"
