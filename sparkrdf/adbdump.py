"""arangodump source: read ArangoDB dump directories into the engine's
property-graph document tables.

The reference imports from a LIVE ArangoDB over a cursor
(``ArangoRDF.arangodb_graph_to_rdf``, main.py:563-657, driven by
python-arango collections). The Spark-first equivalent reads the database's
offline dump format instead — ``<collection>_<hash>.data.json.gz`` JSONL
files plus ``<collection>*.structure.json`` manifests, as produced by
``arangodump`` — because at scale you read a snapshot from shared storage in
parallel, not a cursor from the database. Both dump flavors are handled:

- plain JSONL (``useEnvelope: false``): one document per line;
- envelope JSONL: ``{"type": 2300, "data": {...}}`` per line (type 2300 =
  document marker; 2302 = removal marker, skipped).

Documents come out in the engine's property-doc shape (the same columns
``pgt_transform`` produces and the export functions consume): system
attributes (``_key``/``_from``/``_to``) as columns, every other attribute
packed into the ``properties`` JSON string with Python-faithful types (ints
stay ints, floats floats — going through Spark's JSON schema inference would
widen them per column).

Scale shape: one ``spark.read.text`` per collection (gzip JSONL splits per
file — a real dump has many files per shard), one Arrow-batched mapInPandas
to parse, and a by-name union across collections. Nothing collects.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SYSTEM_ATTRS = ("_key", "_id", "_rev", "_from", "_to")

# RDF-provenance attributes an RPT/PGT export (this engine's or the
# reference's, main.py:1938-2099) stores ON the documents: these must come
# back as COLUMNS, not properties, or a dump round-trip loses term identity
# and named-graph (_sub_graph_uri) provenance (reference round-trips them,
# test_main.py:2401-2474)
VERTEX_META_ATTRS = ("_uri", "_rdftype", "_value", "_lang", "_datatype", "_label")
EDGE_META_ATTRS = ("_uri", "_label", "_sub_graph_uri", "_rdftype")

_VERTEX_TYPE = 2  # structure.json parameters.type
_EDGE_TYPE = 3

DOC_SCHEMA = (
    "collection string, _key string, _uri string, _rdftype string, "
    "_value string, _lang string, _datatype string, _label string, "
    "properties string"
)
EDGE_SCHEMA = (
    "collection string, _key string, _from string, _to string, _uri string, "
    "_label string, _sub_graph_uri string, properties string"
)


def discover_collections(dump_dir: str, include_system: bool = False) -> dict:
    """Scan an arangodump directory → ``{name: {"kind": "vertex"|"edge",
    "data_files": [...]}}`` from the ``.structure.json`` manifests. System
    collections (``_``-prefixed: _users, _graphs, ...) are skipped unless
    requested."""
    out: dict[str, dict] = {}
    for spath in sorted(glob.glob(os.path.join(dump_dir, "*.structure.json"))):
        with open(spath, encoding="utf-8") as f:
            params = json.load(f)["parameters"]
        name = params["name"]
        if name.startswith("_") and not include_system:
            continue
        kind = "edge" if params.get("type") == _EDGE_TYPE else "vertex"
        data_files = sorted(
            p
            for p in glob.glob(os.path.join(dump_dir, f"{name}_*.data.json*"))
            + glob.glob(os.path.join(dump_dir, f"{name}.data.json*"))
        )
        out[name] = {"kind": kind, "data_files": data_files}
    return out


def _parse_lines(collection: str, kind: str, graph_ns: str):
    """mapInPandas parser: JSONL (either dump flavor) → property-doc rows."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                if "type" in obj and "data" in obj:  # envelope flavor
                    if obj["type"] != 2300:
                        continue
                    obj = obj["data"]
                meta = EDGE_META_ATTRS if kind == "edge" else VERTEX_META_ATTRS
                props = {
                    k: v
                    for k, v in obj.items()
                    if k not in SYSTEM_ATTRS and k not in meta
                }
                pjson = json.dumps(props, sort_keys=True) if props else None
                if kind == "edge":
                    rows.append(
                        (
                            collection,
                            obj["_key"],
                            obj["_from"],
                            obj["_to"],
                            # RDF-origin edge docs carry their predicate IRI;
                            # native docs fall back to the collection IRI
                            obj.get("_uri") or f"{graph_ns}/{collection}",
                            obj.get("_label") or collection,
                            obj.get("_sub_graph_uri"),
                            pjson,
                        )
                    )
                else:
                    rows.append(
                        (
                            collection,
                            obj["_key"],
                            # _uri: native docs synthesize ns/col#key later
                            obj.get("_uri"),
                            obj.get("_rdftype") or "URIRef",
                            # lexical form; stringify defensively (a JSON
                            # number in a string Arrow column would raise)
                            None if obj.get("_value") is None else str(obj["_value"]),
                            obj.get("_lang"),
                            obj.get("_datatype"),
                            obj.get("_label"),
                            pjson,
                        )
                    )
            cols = (
                ["collection", "_key", "_from", "_to", "_uri", "_label",
                 "_sub_graph_uri", "properties"]
                if kind == "edge"
                else ["collection", "_key", "_uri", "_rdftype", "_value",
                      "_lang", "_datatype", "_label", "properties"]
            )
            yield pd.DataFrame(rows, columns=cols)

    return parse


def read_collection(
    spark,
    collection: str,
    data_files: list[str],
    kind: str = "vertex",
    graph_ns: str = "http://www.arangodb.com",
) -> DataFrame:
    """One dump collection → property-doc DataFrame (vertex or edge shape).

    Native ADB vertices become URIRef terms with no stored ``_uri`` (the
    export side synthesizes ``{graph_ns}/{collection}#{_key}``,
    main.py:1938-1974); edges carry the collection IRI as their predicate
    ``_uri`` like the reference's ``e_col_uri`` (test_main.py:4818)."""
    if not data_files:
        raise ValueError(f"collection {collection!r}: no data files")
    lines = spark.read.text(list(data_files))
    schema = EDGE_SCHEMA if kind == "edge" else DOC_SCHEMA
    return lines.mapInPandas(_parse_lines(collection, kind, graph_ns), schema)


def read_arangodump(
    spark,
    dump_dir: str,
    graph_ns: str = "http://www.arangodb.com",
    vertex_collections: list[str] | None = None,
    edge_collections: list[str] | None = None,
) -> dict:
    """Whole-dump loader → ``{"vertices": DF, "edges": DF, "collections":
    {...}}``. Collection kinds come from the structure manifests; pass
    explicit lists to load a subset (the reference's graph definition plays
    this role — its edge_definitions + orphan_collections,
    test_main.py:4736-4756)."""
    found = discover_collections(dump_dir)
    if vertex_collections is None:
        vertex_collections = [n for n, c in found.items() if c["kind"] == "vertex"]
    if edge_collections is None:
        edge_collections = [n for n, c in found.items() if c["kind"] == "edge"]
    missing = [n for n in (*vertex_collections, *edge_collections) if n not in found]
    if missing:
        raise ValueError(f"collections not in dump {dump_dir!r}: {missing}")

    def union_all(names, kind):
        dfs = [
            read_collection(spark, n, found[n]["data_files"], kind, graph_ns)
            for n in names
        ]
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    vertices = union_all(vertex_collections, "vertex") if vertex_collections else None
    edges = union_all(edge_collections, "edge") if edge_collections else None
    return {
        "vertices": vertices,
        "edges": edges,
        "collections": {
            n: found[n]["kind"] for n in (*vertex_collections, *edge_collections)
        },
    }
