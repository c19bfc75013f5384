"""Robustness: property-based round-trip identity (hypothesis), concurrent
independent imports (reference tests/test_main.py:5655-5698 semantics), and
manifest-driven graph export (arangodb_graph_to_rdf analog)."""

import threading

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkrdf.compare import assert_round_trip
from sparkrdf.export import edges_to_statements
from sparkrdf.rpt import rpt_transform
from sparkrdf.ttl import statements_df

EX = "http://example.com/"

_uri = st.integers(0, 6).map(lambda i: ("URIRef", f"{EX}r{i}"))
_bnode = st.integers(0, 3).map(lambda i: ("BNode", f"b{i}"))
_lit = st.tuples(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=12,
    ),
    st.sampled_from([None, "en", "da"]),
).map(lambda t: ("Literal", t[0], t[1]))
_pred = st.integers(0, 4).map(lambda i: f"{EX}p{i}")


def _to_row(s, p, o):
    if o[0] == "Literal":
        return (s[0], s[1], p, "Literal", o[1], o[2], None, None)
    return (s[0], s[1], p, o[0], o[1], None, None, None)


_stmt = st.tuples(st.one_of(_uri, _bnode), _pred, st.one_of(_uri, _bnode, _lit)).map(
    lambda t: _to_row(*t)
)


def _one_lang_per_lexical(rows):
    """Literal keys are the farmhash of the LEXICAL FORM only (matching the
    reference's default use_hashed_literals_as_keys=True, main.py:669/2321):
    the same lexical form under two different langs collapses into one
    Literal vertex there too, so a perfect round trip is only promised for
    graphs where each lexical form carries a single lang — enforce that on
    the generated input."""
    seen: dict = {}
    out = []
    for r in rows:
        if r[3] == "Literal":
            lang = seen.setdefault(r[4], r[5])
            r = r[:5] + (lang,) + r[6:]
        out.append(r)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_stmt, min_size=1, max_size=12))
def test_random_graph_round_trips(spark, rows):
    """Any plain statement set (URIRef/BNode subjects, arbitrary unicode
    literals with optional lang) survives RPT → export identically
    (bnode-wildcarded set identity, the reference's subtract_graphs gate)."""
    rows = _one_lang_per_lexical(rows)
    stmts = statements_df(spark, rows)
    out = rpt_transform(stmts, "HYP")
    exported = edges_to_statements(out["vertices"], out["edges"])
    assert_round_trip(stmts, exported)


def test_concurrent_independent_imports(spark):
    """Two transforms of DIFFERENT graphs run in parallel threads on one
    session and produce exactly the serial results (the reference's
    concurrency contract: independent imports only, flatten off —
    test_main.py:5655-5698; our transforms are pure functions, so the whole
    pipeline is thread-safe, not just the insert path)."""
    rows_a = [("URIRef", f"{EX}a{i}", f"{EX}pa", "URIRef", f"{EX}a{i+1}", None, None, None) for i in range(40)]
    rows_b = [("URIRef", f"{EX}b{i}", f"{EX}pb", "Literal", str(i), None, None, None) for i in range(40)]

    serial = {}
    for name, rows in (("CA", rows_a), ("CB", rows_b)):
        out = rpt_transform(
            statements_df(spark, rows), name, flatten_reified_triples=False
        )
        serial[name] = {r["_key"] for r in out["edges"].collect()}

    results, errors = {}, []

    def work(name, rows):
        try:
            out = rpt_transform(
                statements_df(spark, rows), name, flatten_reified_triples=False
            )
            results[name] = {r["_key"] for r in out["edges"].collect()}
        except Exception as e:  # pragma: no cover
            errors.append((name, e))

    threads = [
        threading.Thread(target=work, args=("CA", rows_a)),
        threading.Thread(target=work, args=("CB", rows_b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert results == serial


def test_manifest_driven_graph_export(spark, tmp_path):
    """write_graph → read_graph/graph_to_statements round-trip: the manifest
    decides which collections belong to the graph (main.py:563-657)."""
    from sparkrdf.io import graph_to_statements, read_graph, write_graph
    from sparkrdf.pgt import pgt_transform
    from sparkrdf.ttl import parse_ttl

    ttl = """
    @prefix ex: <http://example.com/> .
    ex:alice a ex:Person ; ex:meets ex:bob .
    ex:bob a ex:Person ; ex:name "Bob" .
    """
    stmts = statements_df(spark, parse_ttl(ttl))
    out = pgt_transform(stmts, "MDG")
    base = str(tmp_path / "g")
    manifest = write_graph(out, base, run_id="r1", name="MDG")
    assert "meets" in manifest["edge_definitions"]

    g = read_graph(spark, base, "MDG")
    assert g["manifest"]["graph"] == "MDG"
    assert set(g["edges"].select("collection").distinct().toPandas()["collection"]) == {
        "meets",
        "type",
    }

    exported = graph_to_statements(spark, base, "MDG")
    assert_round_trip(stmts, exported)


@settings(
    max_examples=25,
    deadline=None,
)
@given(
    st.lists(
        st.tuples(
            st.one_of(_uri, _bnode),
            _pred,
            st.one_of(_uri, _bnode, _lit),
            st.sampled_from([None, EX + "g1", EX + "g2"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_serialize_turtle_fuzz_round_trip(rows):
    """Property: serialize_turtle → parse_ttl is the identity on statement
    sets (modulo bnode relabeling) for arbitrary unicode literals, langs,
    and named graphs — pins the serializer's escaping against the parser.
    Driver-only (no Spark): serialize from a plain-row stand-in."""
    from sparkrdf.ttl import parse_ttl, serialize_turtle

    stmts = []
    for s, p, o, g in rows:
        base = _to_row(s, p, o)
        stmts.append(base[:7] + (g,))
    stmts = sorted(
        set(_one_lang_per_lexical(stmts)),
        key=lambda r: tuple(x or "" for x in r),
    )

    class _Rows:
        def select(self, *cols):
            return self

        def collect(self):
            return stmts

    text = serialize_turtle(_Rows(), {"ex": EX})
    got = set(parse_ttl(text))

    def canon(rws):
        mapping = {}

        def m(kind, v):
            if kind != "BNode":
                return v
            return mapping.setdefault(v, f"c{len(mapping)}")

        return {
            (sk, m(sk, sv), p, ok, m(ok, ov), ol, od, sg)
            for sk, sv, p, ok, ov, ol, od, sg in sorted(
                rws, key=lambda r: tuple(x or "" for x in r)
            )
        }

    assert canon(got) == canon(stmts)


# ---------------------------------------------------------------------------
# PGT round-trip fuzz (the PGT path has far more branch surface than RPT:
# collection mapping, literal collapse, list assembly, reified flattening)
# ---------------------------------------------------------------------------

_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_ADB_KEY = "http://www.arangodb.com/key"

_safe_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=1,
    max_size=10,
)
# canonical-lexical literal values only: PGT stores typed literals as JSON
# values (T4) and re-renders them on export, so "007"^^xsd:integer would
# round-trip as "7" — same lossiness as the reference's rdflib toPython()
_lit_value = st.one_of(
    _safe_text.map(lambda t: (t, None)),
    st.integers(-99, 99).map(lambda i: (str(i), _XSD + "integer")),
    st.booleans().map(lambda b: ("true" if b else "false", _XSD + "boolean")),
    st.sampled_from([0.5, -2.25, 3.125]).map(lambda f: (repr(f), _XSD + "double")),
)


@st.composite
def _pgt_graph(draw):
    rows = []
    # plain statements — ONE value per (s, p): the exporter cannot tell a
    # multi-valued property from an assembled rdf:Collection (both are JSON
    # lists), so under list_conversion_mode="collection" only single-valued
    # plain properties round-trip exactly (same ambiguity in the reference)
    seen_sp = set()
    for _ in range(draw(st.integers(2, 8))):
        s = f"{EX}s{draw(st.integers(0, 5))}"
        p = f"{EX}q{draw(st.integers(0, 3))}"
        if (s, p) in seen_sp:
            continue
        seen_sp.add((s, p))
        kind = draw(st.sampled_from(["uri", "lit", "type"]))
        if kind == "uri":
            rows.append(
                ("URIRef", s, p, "URIRef", f"{EX}o{draw(st.integers(0, 5))}",
                 None, None, None)
            )
        elif kind == "type":
            rows.append(
                ("URIRef", s, _RDF + "type", "URIRef",
                 f"{EX}Class{draw(st.integers(0, 2))}", None, None, None)
            )
        else:
            v, dt = draw(_lit_value)
            rows.append(("URIRef", s, p, "Literal", v, None, dt, None))
    # rdf:Collection lists (2+ elements: a 1-element chain imports as a
    # scalar property and exports as a plain statement — T9 promotion)
    for li in range(draw(st.integers(0, 2))):
        els = draw(st.lists(_lit_value, min_size=2, max_size=4))
        s, p = f"{EX}ls{li}", f"{EX}lp{li}"
        nodes = [f"list{li}n{j}" for j in range(len(els))]
        rows.append(("URIRef", s, p, "BNode", nodes[0], None, None, None))
        for j, (v, dt) in enumerate(els):
            rows.append(("BNode", nodes[j], _RDF + "first", "Literal", v, None, dt, None))
            if j + 1 < len(els):
                rows.append(
                    ("BNode", nodes[j], _RDF + "rest", "BNode", nodes[j + 1],
                     None, None, None)
                )
            else:
                rows.append(
                    ("BNode", nodes[j], _RDF + "rest", "URIRef", _RDF + "nil",
                     None, None, None)
                )
    # reified statements WITH metadata (metadata-less reification flattens
    # lossily by design — reference main.py:801-809) and with adb:key-pinned
    # x of the form pred#key, so the re-reified edge URI rebuilds identically
    for ri in range(draw(st.integers(0, 2))):
        p = f"{EX}q{draw(st.integers(0, 3))}"
        rs = f"{EX}s{draw(st.integers(0, 5))}"
        ro = f"{EX}o{draw(st.integers(0, 5))}"
        x = f"{p}#rk{ri}"
        rows += [
            ("URIRef", x, _RDF + "type", "URIRef", _RDF + "Statement", None, None, None),
            ("URIRef", x, _RDF + "subject", "URIRef", rs, None, None, None),
            ("URIRef", x, _RDF + "predicate", "URIRef", p, None, None, None),
            ("URIRef", x, _RDF + "object", "URIRef", ro, None, None, None),
            ("URIRef", x, _ADB_KEY, "Literal", f"rk{ri}", None, None, None),
            ("URIRef", x, f"{EX}meta", "Literal", f"m{ri}", None, None, None),
        ]
    return rows


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_pgt_graph())
def test_random_graph_pgt_round_trips(spark, rows):
    """Generated graphs mixing typed literals, rdf:Collection chains, and
    metadata-carrying reified statements survive pgt_transform →
    pgt_to_statements identically (bnode-wildcarded set identity + bnode
    count, the reference's subtract_graphs gate)."""
    from pyspark.sql import functions as F

    from sparkrdf.export import pgt_to_statements
    from sparkrdf.pgt import pgt_transform

    stmts = statements_df(spark, rows)
    out = pgt_transform(stmts, "HYPGT")
    exported = pgt_to_statements(
        out["vertices"], out["edges"], list_conversion_mode="collection"
    )
    clean = stmts.filter(F.col("p") != _ADB_KEY)
    assert_round_trip(clean, exported)
