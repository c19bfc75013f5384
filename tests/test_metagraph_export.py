"""Metagraph-driven selective export (reference arangodb_to_rdf
main.py:229-456: explicit metagraph KEEP projection, ignored-attributes UNSET
projection, and their mutual exclusion main.py:315-317)."""

import pytest
from pyspark.sql import functions as F

from sparkrdf.export import metagraph_to_statements
from sparkrdf.pgt import pgt_transform
from sparkrdf.ttl import parse_ttl, statements_df

EX = "http://example.com/"

TTL = """
@prefix ex: <http://example.com/> .
ex:alice a ex:Person ; ex:name "Alice" ; ex:age 30 ; ex:meets ex:bob .
ex:bob a ex:Person ; ex:name "Bob" ; ex:city "Oslo" .
ex:acme a ex:Company ; ex:name "Acme" .
"""


@pytest.fixture(scope="module")
def tables(spark):
    stmts = statements_df(spark, parse_ttl(TTL))
    out = pgt_transform(stmts, "MG")
    return {k: v.localCheckpoint(eager=True) for k, v in out.items()}


def _props_stmts(df):
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}


def test_explicit_metagraph_projects_collections_and_attrs(tables):
    mg = {
        "vertexCollections": {"Person": {"name"}},
        "edgeCollections": {"meets": set()},
    }
    out = metagraph_to_statements(tables["vertices"], tables["edges"], mg)
    triples = _props_stmts(out)
    preds = {p for _, p, _ in triples}
    # name survives, age/city projected away, Company collection excluded
    assert any(p.endswith("/name") for p in preds)
    assert not any(p.endswith("/age") for p in preds)
    assert not any(p.endswith("/city") for p in preds)
    assert not any("Acme" in o for _, _, o in triples)
    # the meets edge survives; type edges (collection 'type') were not listed
    assert any(p.endswith("/meets") for p in preds)
    assert not any(p.endswith("#type") for p in preds)


def test_ignored_attributes_unset(tables):
    mg = {
        "vertexCollections": {"Person": set(), "Company": set(), "Class": set(), "Property": set()},
        "edgeCollections": {"meets": set(), "type": set()},
    }
    out = metagraph_to_statements(
        tables["vertices"],
        tables["edges"],
        mg,
        explicit_metagraph=False,
        ignored_attributes={"age", "city"},
    )
    preds = {r["p"] for r in out.collect()}
    assert any(p.endswith("/name") for p in preds)
    assert not any(p.endswith("/age") for p in preds)
    assert not any(p.endswith("/city") for p in preds)


def test_explicit_xor_ignored_validation(tables):
    with pytest.raises(ValueError, match="ignored_attributes"):
        metagraph_to_statements(
            tables["vertices"],
            tables["edges"],
            {"vertexCollections": {}, "edgeCollections": {}},
            explicit_metagraph=True,
            ignored_attributes={"x"},
        )


def test_collections_to_statements_wrapper(tables):
    """arangodb_collections_to_rdf parity (main.py:458-561): whole
    collections by name, no attribute projection — all of Person's literal
    properties survive, Company and Class stay out, listed edges export."""
    from sparkrdf.export import collections_to_statements

    v, e = tables["vertices"], tables["edges"]
    # Property carries the predicate-URI map (without it, property URIs
    # fall back to the graph namespace, like the reference)
    out = collections_to_statements(v, e, {"Person", "Property"}, {"meets"})
    stmts = _props_stmts(out)
    assert (EX + "alice", EX + "name", "Alice") in stmts
    assert (EX + "alice", EX + "age", "30") in stmts
    assert (EX + "bob", EX + "city", "Oslo") in stmts
    assert (EX + "alice", EX + "meets", EX + "bob") in stmts
    assert not [t for t in stmts if t[0] == EX + "acme"]
    ns_only = collections_to_statements(v, e, {"Person"}, set())
    assert ("http://www.arangodb.com/name" in {t[1] for t in _props_stmts(ns_only)})



def test_graph_to_statements_manifest_driven(spark, tmp_path):
    """arangodb_graph_to_rdf parity (main.py:563-657): the export's
    collection list comes from the graph's own manifest, and the round-trip
    through write_graph + manifest-driven export preserves every statement."""
    from sparkrdf.compare import round_trip_diff
    from sparkrdf.export import graph_to_statements
    from sparkrdf.io import write_graph
    from sparkrdf.pgt import pgt_transform
    from sparkrdf.ttl import parse_ttl_file, statements_df
    from tests.conftest import ref_case

    stmts = statements_df(spark, parse_ttl_file(ref_case("cases/1.ttl")))
    out = pgt_transform(stmts, "GM")
    base = str(tmp_path / "g")
    write_graph(out, base, run_id="r1", name="GM")

    exported = graph_to_statements(spark, base, name="GM")
    d = round_trip_diff(stmts, exported)
    assert not d["missing"], d["missing"]
