"""Real-dataset round-trips over vendored arangodump fixtures — mirrors the
reference's test_game_of_thrones_graph (tests/test_main.py:4736-4927): ADB
native docs → RDF statements → RPT/PGT import → export → symmetric
difference must be empty, plus the reference's per-document statement
assertions and RPT collection-count math.

Fixtures: tests/data/adb/{got_dump,imdb_dump} (see ATTRIBUTION.md) — real
arangodump output with messy property shapes: bools, ints, floats,
float lists (Locations.coordinate), attribute names with spaces
("movie title"), per-document type drift (IMDB zip_code int or string),
and the envelope dump flavor (IMDB) next to the plain one (GoT).
"""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from sparkrdf import terms as T
from sparkrdf.adbdump import discover_collections, read_arangodump
from sparkrdf.compare import round_trip_diff
from sparkrdf.export import edges_to_statements, pgt_to_statements
from sparkrdf.pgt import pgt_transform
from sparkrdf.rpt import rpt_transform

DATA = os.path.join(os.path.dirname(__file__), "data", "adb")
GOT_DUMP = os.path.join(DATA, "got_dump")
IMDB_DUMP = os.path.join(DATA, "imdb_dump")
GOT_NS = "http://adb/GameOfThrones"
IMDB_NS = "http://adb/IMDB"

SYSTEM = {"_key", "_id", "_rev", "_from", "_to"}


def load_raw(dump_dir: str, col: str) -> list[dict]:
    """Driver-side raw-doc loader for assertion oracles (handles both dump
    flavors, like the Spark-side parser it cross-checks)."""
    paths = sorted(glob.glob(os.path.join(dump_dir, f"{col}_*.data.json*")))
    docs = []
    for path in paths:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                obj = json.loads(line)
                if "type" in obj and "data" in obj:
                    if obj["type"] != 2300:
                        continue
                    obj = obj["data"]
                docs.append(obj)
    return docs


def export_statements(spark, dump_dir, graph_ns):
    dump = read_arangodump(spark, dump_dir, graph_ns=graph_ns)
    stmts = pgt_to_statements(
        dump["vertices"],
        dump["edges"],
        graph_ns=graph_ns,
        infer_type_from_adb_v_col=True,
        include_adb_v_col_statements=True,
        include_adb_v_key_statements=True,
        include_adb_e_key_statements=True,
    ).localCheckpoint(eager=True)
    return dump, stmts


@pytest.fixture(scope="module")
def got(spark):
    dump, stmts = export_statements(spark, GOT_DUMP, GOT_NS)
    return dump, stmts, stmts.collect()


def test_got_dump_discovery():
    found = discover_collections(GOT_DUMP)
    assert found["Characters"]["kind"] == "vertex"
    assert found["Traits"]["kind"] == "vertex"
    assert found["Locations"]["kind"] == "vertex"
    assert found["ChildOf"]["kind"] == "edge"
    assert all(c["data_files"] for c in found.values())


def test_got_loader_property_fidelity(spark):
    """Types survive the dump parse: bools, ints, float lists (a JSON
    round-trip through Spark schema inference would widen per-column)."""
    dump = read_arangodump(spark, GOT_DUMP, graph_ns=GOT_NS)
    by_key = {
        r["_key"]: json.loads(r["properties"])
        for r in dump["vertices"].filter(F.col("collection") == "Characters").collect()
    }
    ned = by_key["NedStark"]
    assert ned["alive"] is True and isinstance(ned["age"], int) and ned["age"] == 41
    assert ned["traits"] == ["A", "H", "C", "N", "P"]
    loc = {
        r["_key"]: json.loads(r["properties"])
        for r in dump["vertices"].filter(F.col("collection") == "Locations").collect()
    }
    assert any(
        isinstance(p.get("coordinate"), list)
        and all(isinstance(x, float) for x in p["coordinate"])
        for p in loc.values()
    )
    edges = dump["edges"].collect()
    assert all(e["_uri"] == f"{GOT_NS}/ChildOf" for e in edges)
    raw = load_raw(GOT_DUMP, "ChildOf")
    assert len(edges) == len(raw)


def test_got_vertex_statements(got):
    """Reference test_main.py:4788-4809: every vertex doc emits its type,
    one statement per non-system attribute, and adb:col/adb:key rows."""
    _, _, rows = got
    triples = {(r["s"], r["p"], r["o"]) for r in rows}
    sp = {(r["s"], r["p"]) for r in rows}
    for v_col in ("Characters", "Traits", "Locations"):
        col_uri = f"{GOT_NS}/{v_col}"
        for doc in load_raw(GOT_DUMP, v_col):
            term = f"{GOT_NS}/{v_col}#{doc['_key']}"
            assert (term, T.RDF_TYPE, col_uri) in triples
            for k in doc:
                if k not in SYSTEM:
                    assert (term, f"{GOT_NS}/{k}") in sp, (term, k)
            assert (term, T.ADB_COL_URI, v_col) in triples
            assert (term, T.ADB_KEY_URI, doc["_key"]) in triples


def test_got_edge_statements(got):
    """Reference test_main.py:4811-4835: edges with metadata re-reify — 4
    reification statements + the metadata statement + adb:key."""
    _, _, rows = got
    triples = {(r["s"], r["p"], r["o"]) for r in rows}
    sp = {(r["s"], r["p"]) for r in rows}
    e_col_uri = f"{GOT_NS}/ChildOf"
    for doc in load_raw(GOT_DUMP, "ChildOf"):
        f_col, f_key = doc["_from"].split("/")
        t_col, t_key = doc["_to"].split("/")
        subject = f"{GOT_NS}/{f_col}#{f_key}"
        obj = f"{GOT_NS}/{t_col}#{t_key}"
        edge = f"{e_col_uri}#{doc['_key']}"
        meta = [k for k in doc if k not in SYSTEM]
        assert meta  # every GoT edge carries 'foo'
        for k in meta:
            assert (edge, f"{GOT_NS}/{k}") in sp
        assert (edge, T.RDF_TYPE, T.RDF_STATEMENT) in triples
        assert (edge, T.RDF_SUBJECT, subject) in triples
        assert (edge, T.RDF_PREDICATE, e_col_uri) in triples
        assert (edge, T.RDF_OBJECT, obj) in triples
        assert (edge, T.ADB_KEY_URI, doc["_key"]) in triples
        # the plain triple is REPLACED by the reification
        assert (subject, e_col_uri, obj) not in triples


def _clean(rows):
    """The reference's post-extraction rdf_graph: no adb:col / adb:key."""
    return [r for r in rows if r["p"] not in (T.ADB_COL_URI, T.ADB_KEY_URI)]


def test_got_rpt_counts(spark, got):
    """Reference test_main.py:4838-4868: RPT collection counts derived from
    the statement set (reified groups flatten 4→1; adb:key rows become key
    overrides, not edges)."""
    _, stmts, rows = got
    base = stmts.filter(F.col("p") != T.ADB_COL_URI)
    out = rpt_transform(base, "GoT")
    clean = _clean(rows)
    n_reified = sum(
        1 for r in clean if (r["p"], r["o"]) == (T.RDF_TYPE, T.RDF_STATEMENT)
    )
    assert out["edges"].count() == len(clean) - 3 * n_reified

    reified_subjects = {
        r["s"] for r in clean if (r["p"], r["o"]) == (T.RDF_TYPE, T.RDF_STATEMENT)
    }
    bnodes = {r["o"] for r in clean if r["o_kind"] == "BNode"}
    literals = {
        (r["o"], r["o_lang"], r["o_datatype"])
        for r in clean
        if r["o_kind"] == "Literal"
    }
    urirefs = set()
    for r in clean:
        if r["s"] in reified_subjects:
            continue
        if r["s_kind"] == "URIRef":
            urirefs.add(r["s"])
        if r["o_kind"] == "URIRef":
            urirefs.add(r["o"])
    by_col = {
        r["collection"]: r["n"]
        for r in out["vertices"].groupBy("collection").agg(F.count("*").alias("n")).collect()
    }
    assert by_col.get("GoT_BNode", 0) == len(bnodes)
    assert by_col.get("GoT_Literal", 0) == len(literals)
    assert by_col.get("GoT_URIRef", 0) == len(urirefs)


def test_got_rpt_round_trip(spark, got):
    """Reference test_main.py:4870-4873: export of the RPT import equals the
    original graph (adb:key overrides preserve document keys, so reified
    edge URIs rebuild identically)."""
    _, stmts, _ = got
    base = stmts.filter(F.col("p") != T.ADB_COL_URI)
    out = rpt_transform(base, "GoT")
    exported = edges_to_statements(out["vertices"], out["edges"], graph_ns=GOT_NS)
    clean_df = stmts.filter(
        ~F.col("p").isin(T.ADB_COL_URI, T.ADB_KEY_URI)
    )
    d = round_trip_diff(clean_df, exported)
    assert not d["missing"] and not d["extra"], d


def test_got_pgt_round_trip(spark, got):
    """Reference test_main.py:4877-4897: PGT import (adb:col mapping + key
    overrides inline) re-exports to the identical graph."""
    _, stmts, _ = got
    out = pgt_transform(stmts, "GoT")
    exported = pgt_to_statements(out["vertices"], out["edges"], graph_ns=GOT_NS)
    clean_df = stmts.filter(
        ~F.col("p").isin(T.ADB_COL_URI, T.ADB_KEY_URI)
    )
    d = round_trip_diff(clean_df, exported)
    assert not d["missing"] and not d["extra"], d


def test_imdb_rpt_round_trip(spark):
    """IMDB (envelope dump flavor, 65k reified rating edges, mixed-type
    attributes, attribute names with spaces) through RPT.

    Vertex adb:key statements are deliberately NOT exported here: IMDB
    reuses the same ``_key`` values across Users and Movies ("1", "2", ...),
    and RPT routes every URIRef into ONE ``{name}_URIRef`` collection — key
    overrides would collide exactly as a reference import into ArangoDB
    would (last-write-wins upsert). Edge keys stay on (unique, and needed so
    reified edge URIs ``ns/Ratings#<key>`` rebuild identically)."""
    dump = read_arangodump(spark, IMDB_DUMP, graph_ns=IMDB_NS)
    stmts = pgt_to_statements(
        dump["vertices"],
        dump["edges"],
        graph_ns=IMDB_NS,
        infer_type_from_adb_v_col=True,
        include_adb_e_key_statements=True,
    ).localCheckpoint(eager=True)
    clean_df = stmts.filter(F.col("p") != T.ADB_KEY_URI).localCheckpoint(eager=True)

    rpt = rpt_transform(stmts, "IMDB")
    d = round_trip_diff(
        clean_df, edges_to_statements(rpt["vertices"], rpt["edges"], graph_ns=IMDB_NS)
    )
    assert not d["missing"] and not d["extra"], {
        k: v[:5] if isinstance(v, list) else v for k, v in d.items()
    }


def test_imdb_pgt_round_trip(spark):
    """PGT keeps per-collection key namespaces (adb:col mapping), so the
    full flag set — including the vertex keys that collide under RPT —
    round-trips."""
    _, stmts = export_statements(spark, IMDB_DUMP, IMDB_NS)
    clean_df = stmts.filter(
        ~F.col("p").isin(T.ADB_COL_URI, T.ADB_KEY_URI)
    ).localCheckpoint(eager=True)

    pgt = pgt_transform(stmts, "IMDB")
    d = round_trip_diff(
        clean_df, pgt_to_statements(pgt["vertices"], pgt["edges"], graph_ns=IMDB_NS)
    )
    assert not d["missing"] and not d["extra"], {
        k: v[:5] if isinstance(v, list) else v for k, v in d.items()
    }


FRAUD_DUMP = os.path.join(DATA, "fraud_dump")
FRAUD_NS = "http://adb/Fraud"


def test_fraud_round_trips(spark):
    """Fraud dump (third real dataset): metadata-LESS edges (accountHolder)
    next to metadata-rich ones (transaction, Relationship), 17-digit float
    properties (rank), cross-collection vertex key reuse (account vs
    customer — v-key statements off, as with IMDB), and a meta-model
    (Class/Relationship) riding along as ordinary collections.

    Edge adb:key statements are attached ONLY to metadata-carrying edges
    (the reference's GoT test asserts them under edge_has_metadata,
    test_main.py:4820-4835): metadata-less edges round-trip as plain
    triples, metadata-rich ones re-reify with their original keys."""
    dump = read_arangodump(spark, FRAUD_DUMP, graph_ns=FRAUD_NS)
    assert set(dump["collections"]) == {
        "Class", "Relationship", "account", "accountHolder", "bank",
        "branch", "customer", "transaction",
    }
    stmts = pgt_to_statements(
        dump["vertices"],
        dump["edges"],
        graph_ns=FRAUD_NS,
        infer_type_from_adb_v_col=True,
        include_adb_v_col_statements=True,
    )
    # selective edge-key statements: only edges that reify (have metadata)
    key_stmts = (
        dump["edges"]
        .filter(F.col("properties").isNotNull())
        .select(
            F.lit("URIRef").alias("s_kind"),
            F.concat(F.col("_uri"), F.lit("#"), F.col("_key")).alias("s"),
            F.lit(T.ADB_KEY_URI).alias("p"),
            F.lit("Literal").alias("o_kind"),
            F.col("_key").alias("o"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("sub_graph"),
        )
    )
    stmts = stmts.unionByName(key_stmts).localCheckpoint(eager=True)
    base = stmts.filter(F.col("p") != T.ADB_COL_URI).localCheckpoint(eager=True)
    clean = base.filter(F.col("p") != T.ADB_KEY_URI)

    # float fidelity: rank survives repr -> xsd:double -> repr exactly
    ranks = {
        r["o"]
        for r in base.filter(F.col("p") == f"{FRAUD_NS}/rank").collect()
    }
    assert any("." in v and len(v) > 12 for v in ranks)

    rpt = rpt_transform(base, "Fraud")
    exported = edges_to_statements(rpt["vertices"], rpt["edges"], graph_ns=FRAUD_NS)
    d = round_trip_diff(clean, exported)
    assert not d["missing"] and not d["extra"], {
        k: v[:5] if isinstance(v, list) else v for k, v in d.items()
    }

    pgt = pgt_transform(stmts, "Fraud")
    exported2 = pgt_to_statements(pgt["vertices"], pgt["edges"], graph_ns=FRAUD_NS)
    d = round_trip_diff(clean, exported2)
    assert not d["missing"] and not d["extra"], {
        k: v[:5] if isinstance(v, list) else v for k, v in d.items()
    }


def _write_dump(dirpath, dump) -> None:
    """Serialize engine doc tables as an arangodump directory (plain JSONL
    flavor): one structure.json + one data file per collection."""
    os.makedirs(dirpath, exist_ok=True)
    for df, adb_type in ((dump["vertices"], 2), (dump["edges"], 3)):
        by_col: dict[str, list] = {}
        for r in df.collect():
            by_col.setdefault(r["collection"], []).append(r.asDict())
        for col, docs in by_col.items():
            with open(os.path.join(dirpath, f"{col}.structure.json"), "w") as f:
                json.dump({"parameters": {"name": col, "type": adb_type}}, f)
            with open(os.path.join(dirpath, f"{col}_0.data.json"), "w") as f:
                for d in docs:
                    doc = {
                        k: v
                        for k, v in d.items()
                        if k not in ("collection", "properties") and v is not None
                    }
                    if d.get("properties"):
                        doc.update(json.loads(d["properties"]))
                    f.write(json.dumps(doc, sort_keys=True) + "\n")


def test_named_graph_dump_round_trip(spark, tmp_path):
    """Quad provenance through the dump format: a TriG graph with named
    graphs → RPT docs (edges carry _sub_graph_uri) → serialized arangodump
    → read_arangodump → export — statements come back in their original
    named graphs (reference _sub_graph_uri round-trip, main.py:2401-2474
    test semantics), and the N-Quads sink renders the 4th term."""
    from sparkrdf.ttl import nquads_lines, parse_ttl, statements_df

    trig = (
        "@prefix ex: <http://ex.org/> .\n"
        "ex:g1 { ex:a ex:knows ex:b . }\n"
        "ex:g2 { ex:b ex:knows ex:c . ex:c ex:age 30 . }\n"
        "ex:a ex:likes ex:c .\n"
    )
    stmts = statements_df(spark, parse_ttl(trig))
    out = rpt_transform(stmts, "Quads")
    dump_dir = str(tmp_path / "dump")
    _write_dump(dump_dir, out)

    dump = read_arangodump(spark, dump_dir)
    back = edges_to_statements(dump["vertices"], dump["edges"])
    d = round_trip_diff(stmts, back)
    assert not d["missing"] and not d["extra"], d

    by_triple = {(r.s, r.p, r.o): r.sub_graph for r in back.collect()}
    assert by_triple[
        ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b")
    ] == "http://ex.org/g1"
    assert by_triple[
        ("http://ex.org/c", "http://ex.org/age", "30")
    ] == "http://ex.org/g2"
    assert by_triple[("http://ex.org/a", "http://ex.org/likes", "http://ex.org/c")] is None

    # the quad manifest sink renders the graph label as the 4th term
    lines = {r.value for r in nquads_lines(back).collect()}
    assert (
        "<http://ex.org/a> <http://ex.org/knows> <http://ex.org/b> "
        "<http://ex.org/g1> ." in lines
    )
    assert any(
        ln.endswith("<http://ex.org/c> .") and "likes" in ln for ln in lines
    )  # default-graph statement: triple form, no 4th term


def test_native_dump_meta_attrs_do_not_leak_into_properties(spark, tmp_path):
    """A native (non-RDF) doc with a user attribute NAMED like a meta attr
    keeps it as the column (round-trip fidelity beats property leakage);
    ordinary user attributes still land in properties."""
    dump_dir = str(tmp_path / "nd")
    os.makedirs(dump_dir)
    with open(os.path.join(dump_dir, "People.structure.json"), "w") as f:
        json.dump({"parameters": {"name": "People", "type": 2}}, f)
    with open(os.path.join(dump_dir, "People_0.data.json"), "w") as f:
        f.write(json.dumps({"_key": "p1", "name": "Ned", "age": 41}) + "\n")
    with open(os.path.join(dump_dir, "Knows.structure.json"), "w") as f:
        json.dump({"parameters": {"name": "Knows", "type": 3}}, f)
    with open(os.path.join(dump_dir, "Knows_0.data.json"), "w") as f:
        f.write(
            json.dumps(
                {"_key": "k1", "_from": "People/p1", "_to": "People/p1",
                 "weight": 2}
            )
            + "\n"
        )
    dump = read_arangodump(spark, dump_dir)
    v = dump["vertices"].collect()[0]
    assert v["_uri"] is None and v["_rdftype"] == "URIRef"
    assert json.loads(v["properties"]) == {"age": 41, "name": "Ned"}
    e = dump["edges"].collect()[0]
    assert e["_uri"] == "http://www.arangodb.com/Knows"
    assert e["_sub_graph_uri"] is None
    assert json.loads(e["properties"]) == {"weight": 2}
