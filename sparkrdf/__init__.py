"""sparkrdf — a from-scratch, PySpark-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of the reference
(ArangoDB-Community/ArangoRDF, studied at /root/reference) as declarative
Spark DataFrame programs:

- RPT ("RDF-topology preserving transformation"): every triple becomes an
  edge between term vertices (reference: arango_rdf/main.py:663-849).
- PGT ("property-graph transformation"): datatype properties collapse onto
  vertex documents, object properties become typed edge collections,
  collection mapping picks the vertex table per resource
  (reference: arango_rdf/main.py:855-1336).
- Export: property-graph tables back to RDF statements
  (reference: arango_rdf/main.py:229-657).
- A web-scale triple-extraction pipeline over Common-Crawl-style pages
  (html -> text -> mentions -> entity linking -> IRI minting -> predicate
  canonicalization -> RPT/PGT materialization), built only from
  DataFrame ops + vectorized Arrow/pandas UDFs.

Everything here is public-knowledge PySpark; no code is copied from the
reference — file:line citations in docstrings identify the *behavior* being
matched, not the implementation.
"""

__version__ = "0.1.0"

from sparkrdf.hashing import fingerprint64, farmhash_key  # noqa: F401
from sparkrdf.api import SparkRDF  # noqa: F401
from sparkrdf.sparql import sparql_query, sparql_update  # noqa: F401
from sparkrdf.rdfxml import parse_rdfxml, rdfxml_statements  # noqa: F401
from sparkrdf.jsonldoc import parse_jsonld, jsonld_statements  # noqa: F401
from sparkrdf.terms import skolemize, deskolemize  # noqa: F401
