"""Standalone JSON-LD document reader/writer → statement rows.

The reference ingests JSON-LD through ``rdflib.Graph.parse(format=
"json-ld")`` (arango_rdf main.py load_rdf family); the in-package
:mod:`sparkrdf.extract.jsonld` covers only the FLAT html-embedded blocks a
crawler scrapes.  This module is the document-grade reader: the JSON-LD 1.0
expansion + deserialization core (https://www.w3.org/TR/json-ld-api/),
from scratch on stdlib ``json``:

* ``@context``: term → IRI mappings, expanded term definitions
  (``@id`` / ``@type`` coercion incl. ``"@id"`` / ``@language`` /
  ``@container: @list``), compact IRIs (``ex:name``), ``@vocab``,
  ``@base``, ``@language`` default; remote (string-URL) contexts raise —
  no network in the engine,
* node objects: ``@id`` (``_:label`` blank nodes kept verbatim, relative
  IRIs resolved against ``@base``), ``@type`` (string or array),
  nested node objects (blank nodes minted deterministically), arrays,
* value objects ``{"@value", "@language", "@type"}`` and JSON natives
  (bool → xsd:boolean, int → xsd:integer, float → xsd:double canonical
  exponent form — the JSON-LD→RDF value rules),
* ``@list`` → rdf:first/rest chains, ``@graph`` (top-level and named:
  a node object with ``@id`` + ``@graph`` puts its contents in that
  named graph),
* keys that expand to no IRI are dropped (spec behavior), but a document
  that is not JSON at all raises ValueError (the distributed wrapper maps
  that to an error row).

Output rows use :data:`sparkrdf.ttl.STATEMENT_COLUMNS`.  Blank-node labels
are deterministic per parse — same contract as :mod:`sparkrdf.rdfxml`, so
the distributed wrapper's per-document url-derived prefixes make labels
collision-free across a 10^9-document crawl with zero coordination, and a
deterministic fixture's labels are ANSI-SQL-reproducible (the oracle
story).  ``serialize_jsonld`` writes the EXPANDED form (full-IRI keys, no
context) — the canonical interchange shape — enabling the cross-format
corpus round-trip test that stands in for an rdflib oracle.

Scale: one document per row inside ``mapInPandas`` — map-only, zero
shuffle; the expansion is pure per-document Python over Arrow batches,
exactly the pattern the north rule prescribes for non-relational decode
stages.
"""

from __future__ import annotations

import json
import re
from urllib.parse import urljoin

from sparkrdf.ttl import RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE, XSD

XSD_BOOLEAN = XSD + "boolean"
XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_KEYWORDS = {"@id", "@type", "@value", "@language", "@list", "@graph",
             "@context", "@vocab", "@base", "@container", "@set",
             "@index", "@reverse", "@nest", "@version"}


def _canonical_double(x: float) -> str:
    """xsd:double canonical lexical form (the JSON-LD→RDF rule for JSON
    numbers with a fractional part): mantissa with one leading digit,
    trailing zeros trimmed, 'E' exponent."""
    m, _, e = f"{x:.15E}".partition("E")
    m = m.rstrip("0")
    if m.endswith("."):
        m += "0"
    return f"{m}E{int(e)}"


class _Context:
    """One resolved @context scope (immutable; child scopes copy)."""

    __slots__ = ("terms", "vocab", "base", "language")

    def __init__(self, terms=None, vocab=None, base=None, language=None):
        self.terms = terms or {}
        self.vocab = vocab
        self.base = base
        self.language = language

    def child(self, ctx_value) -> "_Context":
        terms = dict(self.terms)
        vocab, base, language = self.vocab, self.base, self.language
        blocks = ctx_value if isinstance(ctx_value, list) else [ctx_value]
        for block in blocks:
            if block is None:
                terms, vocab, base, language = {}, None, None, None
                continue
            if isinstance(block, str):
                raise ValueError(
                    f"jsonld: remote @context {block!r} not supported "
                    "(no network in the engine — inline the context)")
            if not isinstance(block, dict):
                raise ValueError("jsonld: @context must be an object")
            if "@vocab" in block:
                vocab = block["@vocab"]
            if "@base" in block:
                base = block["@base"]
            if "@language" in block:
                language = block["@language"]
            for term, defn in block.items():
                if term.startswith("@"):
                    continue
                terms[term] = defn
        out = _Context(terms, vocab, base, language)
        # second pass: term values may themselves be compact IRIs
        return out

    def expand_iri(self, value: str, vocab_mode: bool = False,
                   _depth: int = 0) -> str | None:
        """Expand a term / compact IRI / relative IRI.  ``vocab_mode``
        applies @vocab (keys and @type values); otherwise @base applies.
        Returns None when no mapping exists (the key is then dropped)."""
        if not isinstance(value, str):
            raise ValueError(
                f"jsonld: IRI position expects a string, got {type(value).__name__}")
        if _depth > 10:
            # self- or mutually-referential term definitions would recurse
            # forever ({"a": "a"}); a ValueError keeps the distributed
            # wrapper's error-row contract
            raise ValueError(f"jsonld: @context term cycle expanding {value!r}")
        if value.startswith("@") and value in _KEYWORDS:
            return value
        if value in self.terms:
            defn = self.terms[value]
            iri = defn.get("@id") if isinstance(defn, dict) else defn
            if iri is None:
                # expanded term definition without @id: @vocab + term
                return self.vocab + value if self.vocab else None
            # term definitions may be compact IRIs themselves ("ex:name") —
            # and a compact IRI is indistinguishable from a scheme, so the
            # prefix-in-context check must run BEFORE the absolute-IRI one
            if ":" in iri and iri.split(":", 1)[0] in self.terms:
                return self.expand_iri(iri, vocab_mode=True, _depth=_depth + 1)
            return iri if _ABS_IRI.match(iri) else self.expand_iri(
                iri, vocab_mode=True, _depth=_depth + 1)
        if ":" in value:
            prefix, suffix = value.split(":", 1)
            if suffix.startswith("//"):
                return value  # already an absolute IRI like http://...
            if prefix in self.terms:
                defn = self.terms[prefix]
                ns = defn.get("@id") if isinstance(defn, dict) else defn
                if ns:
                    return ns + suffix
            if _ABS_IRI.match(value):
                return value  # urn:, mailto:, doi: ...
        if vocab_mode:
            return self.vocab + value if self.vocab else None
        if self.base:
            return urljoin(self.base, value)
        # no base: keep relative document IRIs verbatim (what the Turtle
        # reader does, and what makes baseless round-trips the identity)
        return value

    def term_def(self, key: str) -> dict:
        d = self.terms.get(key)
        return d if isinstance(d, dict) else {}


class JsonLdParser:
    """Single-document JSON-LD → statement tuples (deterministic bnodes)."""

    def __init__(self, text_or_obj, base: str | None = None,
                 bnode_prefix: str = "b"):
        if isinstance(text_or_obj, (str, bytes)):
            try:
                self.doc = json.loads(text_or_obj)
            except json.JSONDecodeError as e:
                raise ValueError(f"jsonld: invalid JSON: {e}") from e
        else:
            self.doc = text_or_obj
        self.base = base
        self.prefix = bnode_prefix
        self._n = 0
        self.rows: list[tuple] = []

    def _bnode(self) -> tuple:
        lbl = f"{self.prefix}{self._n}"
        self._n += 1
        return ("BNode", lbl)

    def _emit(self, s, p, o, graph):
        if o[0] == "Literal":
            self.rows.append((s[0], s[1], p, "Literal", o[1], o[2], o[3], graph))
        else:
            self.rows.append((s[0], s[1], p, o[0], o[1], None, None, graph))

    def parse(self) -> list[tuple]:
        ctx = _Context(base=self.base)
        doc = self.doc
        nodes = doc if isinstance(doc, list) else [doc]
        for node in nodes:
            self._node(node, ctx, graph=None)
        return self.rows

    def _id_term(self, value: str, ctx: _Context) -> tuple:
        if not isinstance(value, str):
            raise ValueError(
                f"jsonld: @id must be a string, got {type(value).__name__}")
        if value.startswith("_:"):
            # labeled bnodes ride under the per-parse prefix (distinct n_
            # namespace, same contract as rdfxml's rdf:nodeID) so the
            # distributed wrapper's per-document prefixes keep labels
            # collision-free across documents
            return ("BNode", f"{self.prefix}n_{value[2:]}")
        iri = ctx.expand_iri(value)
        if iri is None:
            raise ValueError(f"jsonld: cannot expand @id {value!r}")
        return ("URIRef", iri)

    def _node(self, node, ctx: _Context, graph: str | None) -> tuple:
        """Deserialize one node object; returns its subject term."""
        if not isinstance(node, dict):
            raise ValueError(f"jsonld: node object expected, got {type(node).__name__}")
        if "@context" in node:
            ctx = ctx.child(node["@context"])
        subj = (self._id_term(node["@id"], ctx) if "@id" in node
                else self._bnode())
        types = node.get("@type", [])
        for t in (types if isinstance(types, list) else [types]):
            iri = ctx.expand_iri(t, vocab_mode=True)
            if iri:
                self._emit(subj, RDF_TYPE, ("URIRef", iri), graph)
        if "@graph" in node:
            inner_graph = subj[1] if "@id" in node else graph
            contents = node["@graph"]
            for inner in (contents if isinstance(contents, list) else [contents]):
                self._node(inner, ctx, graph=inner_graph)
        for key, value in node.items():
            if key.startswith("@"):
                continue
            pred = ctx.expand_iri(key, vocab_mode=True)
            if pred is None or pred.startswith("@"):
                continue  # spec: keys that expand to no IRI are dropped
            defn = ctx.term_def(key)
            values = value if isinstance(value, list) else [value]
            if defn.get("@container") == "@list":
                self._emit(subj, pred, self._list(values, ctx, defn, graph), graph)
                continue
            for v in values:
                self._emit(subj, pred, self._value(v, ctx, defn, graph), graph)
        return subj

    def _list(self, items, ctx, defn, graph) -> tuple:
        cells = [self._bnode() for _ in items]
        head = cells[0] if cells else ("URIRef", RDF_NIL)
        for i, (cell, item) in enumerate(zip(cells, items)):
            self._emit(cell, RDF_FIRST, self._value(item, ctx, defn, graph), graph)
            rest = cells[i + 1] if i + 1 < len(cells) else ("URIRef", RDF_NIL)
            self._emit(cell, RDF_REST, rest, graph)
        return head

    def _value(self, v, ctx: _Context, defn: dict, graph) -> tuple:
        """One value → a term (literal, IRI, bnode, nested node, @list)."""
        if isinstance(v, dict):
            if "@value" in v:
                lex = v["@value"]
                dt = v.get("@type")
                lang = v.get("@language")
                if isinstance(lex, bool):
                    return ("Literal", "true" if lex else "false", None,
                            dt and ctx.expand_iri(dt, True) or XSD_BOOLEAN)
                if isinstance(lex, int):
                    return ("Literal", str(lex), None,
                            dt and ctx.expand_iri(dt, True) or XSD_INTEGER)
                if isinstance(lex, float):
                    return ("Literal", _canonical_double(lex), None,
                            dt and ctx.expand_iri(dt, True) or XSD_DOUBLE)
                if dt:
                    return ("Literal", str(lex), None, ctx.expand_iri(dt, True))
                # explicit value objects use ONLY their own @language: per
                # JSON-LD expansion the context default language applies to
                # plain string values, never to @value objects (rdflib
                # agrees) — no ctx.language fallback here
                return ("Literal", str(lex), lang, None)
            if "@list" in v:
                return self._list(v["@list"], ctx, {}, graph)
            if set(v) == {"@id"} or ("@id" in v and len(v) <= 2 and "@context" in v):
                # pure reference — no triples of its own
                if "@context" in v:
                    ctx = ctx.child(v["@context"])
                return self._id_term(v["@id"], ctx)
            return self._node(v, ctx, graph)
        # term-coerced strings
        t = defn.get("@type")
        if t == "@id" and isinstance(v, str):
            return self._id_term(v, ctx)
        if isinstance(v, bool):
            return ("Literal", "true" if v else "false", None, XSD_BOOLEAN)
        if isinstance(v, int):
            return ("Literal", str(v), None, XSD_INTEGER)
        if isinstance(v, float):
            return ("Literal", _canonical_double(v), None, XSD_DOUBLE)
        if v is None:
            raise ValueError("jsonld: null value outside @context")
        if t:
            return ("Literal", str(v), None, ctx.expand_iri(t, True))
        lang = defn.get("@language", ctx.language)
        return ("Literal", str(v), lang, None)


def parse_jsonld(text_or_obj, base: str | None = None,
                 bnode_prefix: str = "b") -> list[tuple]:
    """Parse one JSON-LD document → statement rows (STATEMENT_COLUMNS)."""
    return JsonLdParser(text_or_obj, base=base, bnode_prefix=bnode_prefix).parse()


# ---------------------------------------------------------------------------
# Writer: the EXPANDED form (full-IRI keys, no @context)
# ---------------------------------------------------------------------------


def serialize_jsonld(stmts) -> str:
    """Statement rows (DataFrame or row list) → expanded-form JSON-LD text.

    One node object per (graph, subject); named-graph rows render as
    ``{"@id": graph, "@graph": [...]}`` wrappers — JSON-LD is the one
    text format here that round-trips quads AND lists losslessly."""
    if hasattr(stmts, "collect"):
        rows = [tuple(r) for r in stmts.collect()]
    else:
        rows = [tuple(r) for r in stmts]

    def term_json(kind, v, lang=None, dt=None):
        if kind == "URIRef":
            return {"@id": v}
        if kind == "BNode":
            return {"@id": "_:" + v}
        out = {"@value": v}
        if lang:
            out["@language"] = lang
        elif dt:
            out["@type"] = dt
        return out

    by_graph: dict[str | None, dict] = {}
    graph_order: list[str | None] = []
    for (sk, s, p, ok, o, ol, od, g) in rows:
        if g not in by_graph:
            by_graph[g] = {}
            graph_order.append(g)
        nodes = by_graph[g]
        key = "_:" + s if sk == "BNode" else s
        node = nodes.setdefault(key, {"@id": key})
        if p == RDF_TYPE and ok == "URIRef":
            node.setdefault("@type", []).append(o)
        else:
            node.setdefault(p, []).append(term_json(ok, o, ol, od))

    top: list[dict] = []
    for g in graph_order:
        nodes = list(by_graph[g].values())
        if g is None:
            top.extend(nodes)
        else:
            top.append({"@id": g, "@graph": nodes})
    return json.dumps(top, ensure_ascii=False, indent=1)


# ---------------------------------------------------------------------------
# Distributed wrapper
# ---------------------------------------------------------------------------


def jsonld_statements(df, json_col: str = "json", url_col: str = "url",
                      keep_url: bool = True, on_error: str = "row"):
    """Parse a DataFrame of JSON-LD documents into statement rows, map-only.

    Identical contract to :func:`sparkrdf.rdfxml.rdfxml_statements`: one
    document per row inside ``mapInPandas`` (zero shuffle), ``url_col``
    doubles as ``@base`` and (sanitized) as the per-document blank-node
    prefix, malformed documents become a single
    ``(URIRef url, kgc:parseError, Literal message)`` row by default."""
    from pyspark.sql.types import StringType, StructField, StructType

    from sparkrdf.session import ensure_pyfiles
    from sparkrdf.ttl import STATEMENT_COLUMNS

    ensure_pyfiles(df.sparkSession)

    out_cols = (["url"] if keep_url else []) + STATEMENT_COLUMNS
    schema = StructType([StructField(c, StringType(), True) for c in out_cols])
    err_pred = "http://kg.example.org/prop/parseError"

    def run(batches):
        import pandas as pd

        from sparkrdf.jsonldoc import parse_jsonld  # executor-side import

        for pdf in batches:
            out = []
            for url, body in zip(pdf[url_col], pdf[json_col]):
                if isinstance(body, (bytes, bytearray)):
                    body = body.decode("utf-8", errors="replace")
                prefix = "b" + re.sub(r"\W+", "_", str(url)) + "_"
                try:
                    rows = parse_jsonld(body, base=str(url), bnode_prefix=prefix)
                except Exception as e:  # crawl contract: one bad page in a
                    # trillion must not kill the job — malformed shapes can
                    # surface as TypeError/RecursionError too, not only the
                    # parser's own ValueErrors
                    if on_error == "raise":
                        raise
                    rows = [("URIRef", str(url), err_pred,
                             "Literal", f"{type(e).__name__}: {e}",
                             None, None, None)]
                if keep_url:
                    out.extend((str(url),) + r for r in rows)
                else:
                    out.extend(rows)
            yield pd.DataFrame(out, columns=out_cols)

    return df.select(url_col, json_col).mapInPandas(run, schema)
