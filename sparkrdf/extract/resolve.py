"""Cross-document entity resolution over NER mentions.

The reference pipeline stops at per-document mention detection +
gazetteer linking (link.py); mentions whose surface is NOT in the
gazetteer stay un-clustered. This module adds the classic next step of
KG construction: resolve mention *forms* to canonical entities so that
"sort table" and a bare "table" inside the same document collapse to one
entity, then aggregate the corpus-wide entity table.

Rule set (deterministic, order-free — the standard suffix-coreference
heuristic used by rule-based coref systems):

1. normalize each surface: lowercase, collapse internal whitespace, trim.
2. within one document, a single-token form that equals the LAST token of
   some multi-token form in the same document is an anaphoric short form
   ("Lovelace" after "Ada Lovelace") and resolves to that longer form;
   ties (several long forms sharing the suffix) break to the
   lexicographically smallest long form, so resolution is deterministic.
3. every other form resolves to itself.
4. the entity key IS the resolved normalized form; per entity we report
   mention mass, document reach and the number of distinct raw forms.

Scale shape: one (doc, surface) aggregate feeds everything; the coref
step is a single equi-join keyed on (doc_id, last_token) — both sides are
already mention-granular (orders of magnitude smaller than text), the
key carries the document id so no global token key ever concentrates, and
the final entity table is one hash aggregate with map-side partials. No
Python crosses the row path; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_surface", "resolve_entities", "entity_table"]


def normalize_surface(col):
    """Lowercased, whitespace-collapsed, trimmed mention form."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def resolve_entities(mentions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mentions(id_col, surface, n) → + (form, entity_key).

    ``form`` is the normalized surface; ``entity_key`` is the resolved
    canonical form under the suffix-coreference rule above.
    """
    m = mentions.withColumn("form", normalize_surface(F.col("surface")))
    multis = (
        m.filter(F.col("form").contains(" "))
        .select(
            F.col(id_col),
            F.col("form").alias("long_form"),
            F.element_at(F.split(F.col("form"), " "), -1).alias("last_tok"),
        )
        .distinct()
    )
    # singles join multis on (doc, token); multi-token rows never match
    # (their form contains a space, last_tok never does) so one left join
    # covers both cases and coalesce falls back to self-resolution.
    joined = m.join(
        multis,
        on=[
            m[id_col] == multis[id_col],
            m["form"] == multis["last_tok"],
        ],
        how="left",
    ).select(m["*"], multis["long_form"])
    return joined.groupBy(id_col, "surface", "n", "form").agg(
        F.coalesce(F.min("long_form"), F.first("form")).alias("entity_key")
    )


def entity_table(mentions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide canonical entity table.

    → (entity_key, n_mentions, n_docs, n_forms): total attributed mention
    count, distinct-document reach, and how many distinct raw forms were
    folded into the entity (>1 ⇔ coreference actually merged something).
    """
    r = resolve_entities(mentions, id_col=id_col)
    return r.groupBy("entity_key").agg(
        F.sum("n").cast("long").alias("n_mentions"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.countDistinct("form").cast("long").alias("n_forms"),
    )
