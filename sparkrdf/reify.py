"""Reified-triple flattening (M5/M6) as joins — no recursion needed.

Reference (arango_rdf/main.py:3426-3529) walks reified statements recursively
because it is eager: an inner reified statement must be materialized before
the outer one references it. Declaratively, recursion is unnecessary — every
reified node x carries enough information to compute its own edge key
(``key(x)``) and edge collection (``label(rp)``), so arbitrary nesting
resolves in ONE pass of joins:

- components: x ⋈ rdf:subject ⋈ rdf:predicate ⋈ rdf:object
- flattened statement (rs, rp, ro) with ``e_key_override = key(x)``
  (main.py:2372-2374 RPT / 3011-3013 PGT: the edge reuses the reified
  subject's key so later statements about x attach to the same edge doc);
- the four reification statements are removed from the graph;
- ``reified_map`` (x → edge col/key) feeds term-metadata resolution so
  statements *about* x resolve to the edge document (main.py:2709-2711).

The named-graph of the flattened statement is the graph containing
``x a rdf:Statement`` (main.py:3485-3491).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkrdf import terms as T
from sparkrdf.hashing import register_udfs
from sparkrdf.mapping import _reified_spo


def flatten_reified(
    stmts: DataFrame,
    keys_df: DataFrame | None = None,
    has_reified: bool | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Returns (statements', reified_map) — reified_map is None when the
    graph contains no reified statements (fast path).

    statements' = non-reification statements ∪ flattened base statements,
    with two extra columns: ``reified_subject`` (null for normal rows) and
    ``e_key_override`` (the reified node's key).

    reified_map = (x, x_kind, e_key, p_label) for every flattened node.

    ``has_reified``: callers that already probed the stream (rpt/pgt
    transforms fold this into their combined controller probe) pass the
    answer to skip the extra pass here.
    """
    farmhash_udf, _ = register_udfs()

    # Fast path: a web-extraction corpus usually has ZERO reified statements,
    # and the flatten pipeline below costs ~6 passes/joins over the statement
    # stream. Probe with a full-parallelism aggregate, NOT limit(1): when no
    # row matches, CollectLimit scans the entire input anyway but does it in
    # incremental jobs of 1 → 4 → 16 partitions — on an uncached upstream
    # (the usual call pattern: extract_triples(...).persist() with no action
    # yet) that serializes the whole extraction materialization onto a
    # handful of tasks and was the single largest Amdahl term in the N→4N
    # scaling runs. The aggregate pays one full parallel pass, which the
    # persisted upstream absorbs as its materialization pass.
    if has_reified is None:
        has_reified = (
            stmts.filter(
                (F.col("p") == T.RDF_TYPE) & (F.col("o") == T.RDF_STATEMENT)
            ).count()
            > 0
        )
    if not has_reified:
        passthrough = stmts.withColumn(
            "reified_subject", F.lit(None).cast("string")
        ).withColumn("e_key_override", F.lit(None).cast("string"))
        return passthrough, None  # None ⇒ callers skip the reified joins too

    reif = _reified_spo(stmts).filter(
        F.col("rs").isNotNull() & F.col("rp").isNotNull() & F.col("ro").isNotNull()
    )

    e_key = farmhash_udf(F.col("x"))
    if keys_df is not None:
        # no broadcast hint (adb:key overrides are unbounded — AQE decides)
        over = keys_df.select(F.col("id").alias("x"), F.col("custom_key").alias("x_custom"))
        reif = reif.join(over, "x", "left")
        e_key = F.coalesce(F.col("x_custom"), e_key)

    reified_map = reif.select(
        "x",
        "x_kind",
        e_key.alias("e_key"),
        T.adb_label(F.col("rp")).alias("p_label"),
    )

    flattened = reif.select(
        F.col("rs_kind").alias("s_kind"),
        F.col("rs").alias("s"),
        F.col("rp").alias("p"),
        F.col("ro_kind").alias("o_kind"),
        F.col("ro").alias("o"),
        F.col("ro_lang").alias("o_lang"),
        F.col("ro_datatype").alias("o_datatype"),
        F.col("sub_graph"),
        F.col("x").alias("reified_subject"),
        e_key.alias("e_key_override"),
    )

    x_set = reif.select("x")
    is_reif_stmt = (
        ((F.col("p") == T.RDF_TYPE) & (F.col("o") == T.RDF_STATEMENT))
        | (F.col("p") == T.RDF_SUBJECT)
        | (F.col("p") == T.RDF_PREDICATE)
        | (F.col("p") == T.RDF_OBJECT)
    )
    # remove the 4 reification statements of every flattened x (anti-join on s)
    keep = stmts.filter(~is_reif_stmt).unionByName(
        stmts.filter(is_reif_stmt).join(x_set, stmts["s"] == x_set["x"], "left_anti"),
        allowMissingColumns=True,
    )
    remaining = keep.withColumn("reified_subject", F.lit(None).cast("string")).withColumn(
        "e_key_override", F.lit(None).cast("string")
    )
    return remaining.unionByName(flattened), reified_map
