"""Fixed gazetteer + mini-ontology for the extraction pipeline.

Plays the role of the reference's vendored meta-ontologies
(arango_rdf/meta/*.trig, loaded once and broadcast — main.py:3397-3424): a
small static dictionary shipped to every executor via broadcast, never
shuffled. Entities have canonical IRIs, a class, and one or more surface
forms; predicates have canonical IRIs keyed by label (the reference's
"Property label → IRI" uri_map, main.py:372-379).
"""

from __future__ import annotations

KG = "http://kg.example.org/"
ENT = KG + "entity/"
CLS = KG + "class/"
PROP = KG + "prop/"
PAGE = "http://cc.example.org/page/"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# (canonical_id, class, [surface forms])
ENTITIES: list[tuple[str, str, list[str]]] = [
    ("Ada_Lovelace", "Person", ["Ada Lovelace", "Countess Lovelace"]),
    ("Alan_Turing", "Person", ["Alan Turing", "Turing"]),
    ("Grace_Hopper", "Person", ["Grace Hopper", "Admiral Hopper"]),
    ("Edsger_Dijkstra", "Person", ["Edsger Dijkstra", "Dijkstra"]),
    ("Barbara_Liskov", "Person", ["Barbara Liskov", "Liskov"]),
    ("Tim_Berners-Lee", "Person", ["Tim Berners-Lee", "Berners-Lee"]),
    ("Arango_Labs", "Organization", ["Arango Labs"]),
    ("Apache_Foundation", "Organization", ["Apache Foundation"]),
    ("Acme_Analytics", "Organization", ["Acme Analytics"]),
    ("Web_Consortium", "Organization", ["Web Consortium"]),
    ("Berlin", "Place", ["Berlin"]),
    ("Copenhagen", "Place", ["Copenhagen"]),
    ("Paris", "Place", ["Paris"]),
    ("Cambridge", "Place", ["Cambridge"]),
    ("Zurich", "Place", ["Zurich"]),
    ("GraphDB", "Product", ["GraphDB", "graph database"]),
    ("SparkEngine", "Product", ["distributed engine"]),
]

# label -> canonical predicate IRI (broadcast canonicalization map); several
# raw labels canonicalize onto the same predicate — the reference's
# rdf_id_to_adb_label collapse generalized to a synonym map.
PREDICATES: dict[str, str] = {
    "mentions": PROP + "mentions",
    "refers_to": PROP + "mentions",
    "cites": PROP + "mentions",
    "located_in": PROP + "locatedIn",
    "works_at": PROP + "worksAt",
    "employer": PROP + "worksAt",
    "url": PROP + "url",
    "lang": PROP + "lang",
    "title": PROP + "title",
    "tokenCount": PROP + "tokenCount",
    "fetchedAt": PROP + "fetchedAt",
}


def entity_rows() -> list[tuple[str, str, str, str]]:
    """(surface, entity_iri, class_iri, entity_label) rows for broadcast join."""
    rows = []
    for eid, cls, surfaces in ENTITIES:
        for s in surfaces:
            rows.append((s, ENT + eid, CLS + cls, eid))
    return rows


def surfaces() -> list[str]:
    return [s for _, _, ss in ENTITIES for s in ss]
