"""End-to-end triple extraction: pages table → statements DataFrame.

The flagship pipeline of BASELINE.json's north rule:
    pages(url, warc_ts, html, text, lang)
      → [html_text]  text (or verify the byte-identity invariant)
      → [ner]        dictionary mention detection (Arrow batches)
      → [link]       entity linking (broadcast gazetteer + cosine tie-break)
      → [mint]       page IRI minting (farmhash skolemization)
      → [canon]      predicate canonicalization (broadcast map)
      → statements   (s_kind, s, p, o_kind, o, o_lang, o_datatype, sub_graph)
      → [rpt/pgt]    vertex/edge table materialization (sparkrdf.rpt / .pgt)

Emitted triples per page:
    (page, rdf:type, cc:WebPage)
    (page, prop:url,        url literal)
    (page, prop:lang,       lang literal)
    (page, prop:fetchedAt,  warc_ts literal xsd:dateTime)
    (page, prop:tokenCount, whitespace token count, xsd:integer)
    (page, prop:mentions, entity)        per linked entity (deduped)
    (entity, rdf:type, class)            per distinct linked entity

Skew note: prop:mentions of the dominant entity is deliberately Zipf-heavy
(1% of pages share one entity). Everything downstream of linking keys on
(page, entity) — never on entity alone — so the hot entity never concentrates
a partition; the final dedup hashes uniformly. The gazetteer join is
broadcast, so the hot key never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrdf.extract.gazetteer import KG, PREDICATES, RDF_TYPE
from sparkrdf.extract.link import link_mentions
from sparkrdf.extract.mint import page_iri_col, with_page_iri
from sparkrdf.extract.ner import detect_mention_surfaces_jvm
from sparkrdf.ttl import STATEMENT_COLUMNS

XSD = "http://www.w3.org/2001/XMLSchema#"
CLS_WEBPAGE = KG + "class/WebPage"


def _stmt(s, p, o_kind, o, o_datatype=None):
    return [
        F.lit("URIRef").alias("s_kind"),
        s.alias("s"),
        p if not isinstance(p, str) else F.lit(p),
        F.lit(o_kind).alias("o_kind"),
        o.alias("o"),
        F.lit(None).cast("string").alias("o_lang"),
        (F.lit(o_datatype) if o_datatype else F.lit(None)).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("sub_graph"),
    ]


def extract_triples(spark, pages: DataFrame) -> DataFrame:
    """pages → statements DataFrame (see module docstring)."""
    pages = with_page_iri(pages)
    pages = pages.withColumn(
        "token_count", F.size(F.split(F.col("text"), r"\s+"))
    )
    p = PREDICATES

    # all per-page metadata statements in ONE projection + explode — a union
    # of 5 selects would rescan (and re-synthesize) the pages source 5 times
    def meta(pred, o_kind, o, dt=None):
        return F.struct(
            F.lit(pred).alias("p"),
            F.lit(o_kind).alias("o_kind"),
            o.alias("o"),
            (F.lit(dt) if dt else F.lit(None)).cast("string").alias("o_datatype"),
        )

    meta_arr = F.array(
        meta(RDF_TYPE, "URIRef", F.lit(CLS_WEBPAGE)),
        meta(p["url"], "Literal", F.col("url")),
        meta(p["lang"], "Literal", F.col("lang")),
        meta(
            p["fetchedAt"],
            "Literal",
            F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            XSD + "dateTime",
        ),
        meta(p["tokenCount"], "Literal", F.col("token_count").cast("string"), XSD + "integer"),
    )
    page_meta = pages.select(
        F.col("page_iri"), F.explode(meta_arr).alias("m")
    ).select(
        F.lit("URIRef").alias("s_kind"),
        F.col("page_iri").alias("s"),
        F.col("m.p").alias("p"),
        F.col("m.o_kind").alias("o_kind"),
        F.col("m.o").alias("o"),
        F.lit(None).cast("string").alias("o_lang"),
        F.col("m.o_datatype").alias("o_datatype"),
        F.lit(None).cast("string").alias("sub_graph"),
    )

    # JVM mention detection: the pipeline consumes only the DISTINCT
    # (url, surface) set — no offsets, no counts — so the regex runs inside
    # whole-stage codegen, the per-page dedup is a map-side array_distinct,
    # and mention detection contributes NO shuffle (detect_mentions_jvm's
    # (id, surface)-keyed aggregate existed only to produce the count;
    # detect_mentions stays the general offset-bearing operator)
    mentions = detect_mention_surfaces_jvm(pages)
    links = link_mentions(spark, mentions)
    # page_iri is a pure function of url (farmhash mint), so the mention
    # stream gets it as a projection — joining back to pages would shuffle
    # 6x the page count of mention rows for a value computable in place
    linked = links.withColumn("page_iri", page_iri_col(F.col("url")))
    # persist: both the mention statements and the entity-type statements
    # derive from this (small) set — without a barrier the whole NER+linking
    # chain re-executes per consumer. Project to the three consumed columns
    # first so the cached blocks (and both downstream scans) stay narrow.
    linked = linked.select("page_iri", "entity_iri", "class_iri").persist()

    mention_stmts = linked.select(
        *_stmt(
            F.col("page_iri"),
            F.lit(p["mentions"]).alias("p"),
            "URIRef",
            F.col("entity_iri"),
        )
    ).dropDuplicates(["s", "o"])

    entity_types = (
        linked.select("entity_iri", "class_iri")
        .dropDuplicates()
        .select(
            *_stmt(F.col("entity_iri"), F.lit(RDF_TYPE).alias("p"), "URIRef", F.col("class_iri"))
        )
    )

    return page_meta.unionByName(mention_stmts).unionByName(entity_types).select(
        *STATEMENT_COLUMNS
    )
