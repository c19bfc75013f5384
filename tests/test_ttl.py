"""Vendored Turtle/TriG parser tests against the reference fixture corpus."""

import glob
import os

import pytest

from sparkrdf.ttl import parse_ttl, parse_ttl_file
from tests.conftest import REF_META_DIR, REF_RDF_DIR, ref_case

XSD = "http://www.w3.org/2001/XMLSchema#"


def test_basic_triples():
    rows = parse_ttl(
        """@prefix ex: <http://example.com/> .
        ex:alice a ex:Person ; ex:age 30 ; ex:name "Alice"@en ."""
    )
    assert (
        "URIRef",
        "http://example.com/alice",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "URIRef",
        "http://example.com/Person",
        None,
        None,
        None,
    ) in rows
    lit = [r for r in rows if r[4] == "30"][0]
    assert lit[6] == XSD + "integer"
    lang = [r for r in rows if r[4] == "Alice"][0]
    assert lang[5] == "en"


def test_collections_and_bnodes():
    rows = parse_ttl(
        """@prefix ex: <http://example.com/> .
        ex:L ex:contents ("one" "two") .
        ex:x ex:y [ ex:z 1 ] ."""
    )
    firsts = [r for r in rows if r[2].endswith("#first")]
    rests = [r for r in rows if r[2].endswith("#rest")]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(r[4].endswith("#nil") for r in rests)
    assert any(r[0] == "BNode" for r in rows)


def test_named_graphs_trig():
    rows = parse_ttl(
        """@prefix ex: <http://example.com/> .
        ex:g1 { ex:a ex:b ex:c . }
        ex:x ex:y ex:z ."""
    )
    in_g = [r for r in rows if r[7] == "http://example.com/g1"]
    default = [r for r in rows if r[7] is None]
    assert len(in_g) == 1 and len(default) == 1


def test_decimal_double_boolean():
    rows = parse_ttl(
        "@prefix ex: <http://e.c/> . ex:a ex:p 6.5, 1e3, true, \"0.5\"^^<http://www.w3.org/2001/XMLSchema#double> ."
    )
    dts = {r[4]: r[6] for r in rows}
    assert dts["6.5"] == XSD + "decimal"
    assert dts["1e3"] == XSD + "double"
    assert dts["true"] == XSD + "boolean"
    assert dts["0.5"] == XSD + "double"


@pytest.mark.parametrize(
    "fname",
    [
        "cases/1.ttl",
        "cases/4.ttl",
        "cases/6.trig",
        "cases/8.ttl",
        "cases/13_1.ttl",
        "cases/15_4.trig",
        "collection.ttl",
        "container.ttl",
        "key.ttl",
        "bnode.ttl",
    ],
)
def test_reference_fixture_parses(fname):
    rows = parse_ttl_file(ref_case(fname))
    assert rows
    for r in rows:
        assert r[0] in ("URIRef", "BNode")
        assert r[3] in ("URIRef", "BNode", "Literal")


def test_whole_reference_corpus():
    if not os.path.isdir(REF_RDF_DIR):
        pytest.skip("reference corpus not available")
    files = sorted(glob.glob(os.path.join(REF_RDF_DIR, "cases", "*.t*")))
    files += sorted(glob.glob(os.path.join(REF_META_DIR, "*.trig")))
    assert len(files) >= 27
    for f in files:
        assert parse_ttl_file(f), f


def test_serialize_turtle_round_trip(spark):
    """serialize_turtle → parse_ttl reproduces the exact statement set,
    including named graphs, langs, datatypes and prefix compression."""
    from sparkrdf.ttl import parse_ttl, serialize_turtle, statements_df

    src = """
@prefix ex: <http://example.com/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:a ex:name "Sam"@en .
ex:a ex:age "3"^^xsd:integer .
ex:a ex:knows ex:b .
ex:g1 { ex:b ex:name "J\\"x\\n" . }
_:n1 ex:knows ex:a .
"""
    def canon(rows):
        # bnode labels are parser-scoped (module docstring) — canonicalize
        # by first-occurrence order before comparing
        mapping = {}

        def m(kind, v):
            if kind != "BNode":
                return v
            return mapping.setdefault(v, f"c{len(mapping)}")

        return {
            (sk, m(sk, sv), p, ok, m(ok, ov), ol, od, sg)
            for sk, sv, p, ok, ov, ol, od, sg in sorted(rows)
        }

    rows = parse_ttl(src)
    stmts = statements_df(spark, sorted(set(rows)))
    text = serialize_turtle(
        stmts, {"ex": "http://example.com/", "xsd": "http://www.w3.org/2001/XMLSchema#"}
    )
    assert "ex:a ex:knows ex:b ." in text  # prefix compression happened
    assert canon(parse_ttl(text)) == canon(rows)


def test_write_nquads_lines(spark, tmp_path):
    """Distributed N-Quads: one valid line per statement, graph term only
    for named-graph rows, literals escaped."""
    from sparkrdf.ttl import nquads_lines, parse_ttl, statements_df

    src = """
@prefix ex: <http://example.com/> .
ex:a ex:name "line1\\nline2" .
ex:g { ex:a ex:knows ex:b . }
"""
    stmts = statements_df(spark, parse_ttl(src))
    lines = sorted(r["value"] for r in nquads_lines(stmts).collect())
    assert lines == [
        '<http://example.com/a> <http://example.com/knows> '
        '<http://example.com/b> <http://example.com/g> .',
        '<http://example.com/a> <http://example.com/name> "line1\\nline2" .',
    ]


# --- RDF-star (quoted triples + annotation syntax) ---

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_rdf_star_quoted_subject():
    rows = parse_ttl(
        "@prefix ex: <http://ex.org/> .\n"
        "<< ex:alice ex:knows ex:bob >> ex:certainty 0.9 .\n"
    )
    spo = {(r[1], r[2], r[4]) for r in rows}
    # unstar mapping: one reification node + the annotating statement
    node = next(r[1] for r in rows if r[2] == _RDF + "subject")
    assert (node, _RDF + "type", _RDF + "Statement") in spo
    assert (node, _RDF + "subject", "http://ex.org/alice") in spo
    assert (node, _RDF + "predicate", "http://ex.org/knows") in spo
    assert (node, _RDF + "object", "http://ex.org/bob") in spo
    assert (node, "http://ex.org/certainty", "0.9") in spo
    assert len(rows) == 5  # quoted triple itself is NOT asserted


def test_rdf_star_same_quoted_triple_is_one_term():
    rows = parse_ttl(
        "@prefix ex: <http://ex.org/> .\n"
        "<< ex:a ex:p ex:b >> ex:src ex:doc1 .\n"
        "<< ex:a ex:p ex:b >> ex:src ex:doc2 .\n"
        "ex:claim ex:about << ex:a ex:p ex:b >> .\n"
    )
    subj_nodes = {r[1] for r in rows if r[2] == _RDF + "subject"}
    assert len(subj_nodes) == 1  # referential transparency: one node
    # 4 reification rows + 2 src rows + 1 about row
    assert len(rows) == 7


def test_rdf_star_annotation_block_asserts_base_triple():
    rows = parse_ttl(
        "@prefix ex: <http://ex.org/> .\n"
        'ex:alice ex:age 30 {| ex:src ex:census ; ex:conf "high" |} .\n'
    )
    spo = {(r[1], r[2], r[4]) for r in rows}
    assert ("http://ex.org/alice", "http://ex.org/age", "30") in spo  # asserted
    node = next(r[1] for r in rows if r[2] == _RDF + "subject")
    assert (node, "http://ex.org/src", "http://ex.org/census") in spo
    assert (node, "http://ex.org/conf", "high") in spo
    assert len(rows) == 1 + 4 + 2


def test_rdf_star_quoted_triple_redefined_per_graph():
    # the same quoted triple annotated inside TWO TriG graphs: one shared
    # node, but the four defining reification quads must exist in BOTH
    # graphs — a consumer reading only g2 must still see the definition
    rows = parse_ttl(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:g1 { << ex:a ex:p ex:b >> ex:src ex:doc1 . }\n"
        "ex:g2 { << ex:a ex:p ex:b >> ex:src ex:doc2 . }\n"
    )
    subj_nodes = {r[1] for r in rows if r[2] == _RDF + "subject"}
    assert len(subj_nodes) == 1  # still one node document-wide
    for g in ("http://ex.org/g1", "http://ex.org/g2"):
        preds = sorted(r[2] for r in rows if r[7] == g)
        assert preds == sorted(
            [_RDF + "type", _RDF + "subject", _RDF + "predicate", _RDF + "object",
             "http://ex.org/src"]
        )
    assert len(rows) == 10  # (4 reification + 1 annotation) x 2 graphs


def test_rdf_star_nested_quoted_triple():
    rows = parse_ttl(
        "@prefix ex: <http://ex.org/> .\n"
        "<< << ex:a ex:p ex:b >> ex:saidBy ex:carol >> ex:conf 0.5 .\n"
    )
    # inner + outer reification (4 rows each) + 1 annotation row
    assert len(rows) == 9
    subj_of = {r[1]: r[4] for r in rows if r[2] == _RDF + "subject"}
    inner = [n for n, s in subj_of.items() if s == "http://ex.org/a"]
    outer = [n for n, s in subj_of.items() if s in subj_of and s != "http://ex.org/a"]
    assert len(inner) == 1 and len(outer) == 1
    assert subj_of[outer[0]] == inner[0]  # outer's subject IS the inner node


def test_rdf_star_literal_subject_raises():
    import pytest

    with pytest.raises(ValueError, match="subject cannot be a literal"):
        parse_ttl('<< "lit" <http://p> <http://o> >> <http://q> <http://r> .')


def test_rdf_star_flows_through_reify(spark):
    """Quoted triple → reification rows → flatten_reified collapses to the
    base edge with the annotation attached to the edge doc (the same
    pipeline the reference's reified-statement cases exercise)."""
    from sparkrdf.reify import flatten_reified
    from sparkrdf.ttl import statements_df

    rows = parse_ttl(
        "@prefix ex: <http://ex.org/> .\n"
        "<< ex:alice ex:knows ex:bob >> ex:certainty 0.9 .\n"
    )
    stmts = statements_df(spark, rows)
    flat, rmap = flatten_reified(stmts)
    assert rmap is not None
    got = {(r.s, r.p, r.o) for r in flat.collect()}
    assert ("http://ex.org/alice", "http://ex.org/knows", "http://ex.org/bob") in got
    # no reification plumbing rows survive
    assert not any(p.startswith(_RDF) and p != _RDF + "type" for _, p, _ in got)


def test_parse_nquads_round_trip(spark):
    """nquads_lines → parse_nquads is the identity on statement rows —
    including named graphs, bnode labels, langs, datatypes and escapes.
    (N-Quads is not a TriG subset, so parse_ttl cannot read it back.)"""
    from sparkrdf.ttl import nquads_lines, parse_nquads, parse_ttl, statements_df

    src = """
@prefix ex: <http://example.com/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:a ex:name "Sam"@en .
ex:a ex:age "3"^^xsd:integer .
ex:a ex:note "line\\nbreak \\"q\\"" .
ex:a ex:knows _:friend .
ex:g1 { ex:b ex:name "J" . }
"""
    rows = parse_ttl(src)
    lines = "\n".join(
        r.value for r in nquads_lines(statements_df(spark, rows)).collect()
    )
    assert set(parse_nquads(lines)) == set(rows)


def test_parse_nquads_rejects_malformed():
    from sparkrdf.ttl import parse_nquads

    import pytest as _pytest

    with _pytest.raises(ValueError, match="terminated"):
        parse_nquads('<http://a> <http://p> "v"')
    with _pytest.raises(ValueError, match="literal"):
        parse_nquads('<http://a> <http://p> <http://o> "g" .')
    with _pytest.raises(ValueError, match="predicate"):
        parse_nquads('<http://a> _:p <http://o> .')


def test_parse_nquads_uchar_in_iri():
    """Review fix: \\uXXXX escapes inside IRIREF tokenize and unescape
    (legal N-Triples UCHAR)."""
    from sparkrdf.ttl import parse_nquads

    (row,) = parse_nquads(
        '<http://ex.org/\\u00E9> <http://ex.org/p> "x" .')
    assert row[1] == "http://ex.org/é"
