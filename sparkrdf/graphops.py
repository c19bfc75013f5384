"""Graph analytics over knowledge-graph edge tables.

Operates on plain (src, dst) DataFrames — the co-mention graph built from
the NER stage, or any RPT/PGT edge table projected to its endpoints. These
are the analytics a KG user runs *after* construction (the reference stops
at construction; ArangoDB itself answers them with AQL graph traversals —
re-expressed here as joins so Catalyst distributes them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def comention_edges(
    mentions: DataFrame, doc_col: str = "doc_id", ent_col: str = "surface"
) -> DataFrame:
    """Undirected co-occurrence edges: entities mentioned in the same
    document, one row per distinct unordered pair ``(u < v)``.

    Scale shape: a per-document self-join on the doc key — work is bounded
    by (mentions-per-doc)², never corpus², and the doc key is the natural
    partition key (AQE splits the rare pathological doc). The distinct
    collapses duplicate pairs before any downstream algorithm sees them.
    """
    m = mentions.select(F.col(doc_col).alias("d"), F.col(ent_col).alias("e")).distinct()
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(b, (F.col("a.d") == F.col("b.d")) & (F.col("a.e") < F.col("b.e")))
        .select(F.col("a.e").alias("u"), F.col("b.e").alias("v"))
        .distinct()
    )


def triangles(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Enumerate all triangles of an undirected graph given as distinct
    ``src < dst`` pairs. Returns ``(a, b, c)`` with ``a < b < c``.

    Algorithm: node-iterator++ (Schank & Wagner) — every edge is oriented
    from its lower-(degree, id) endpoint to its higher one, wedges are built
    only at the low end, and a wedge closes iff its (b, c) pair exists as an
    oriented edge. Degree orientation is THE triangle-counting scale trick:
    per-vertex wedge work is bounded by the vertex's *oriented out-degree*
    (≤ √m on any graph), so a Zipf-hot hub — which a naive a<b ordering
    would hand all its wedges — generates none; its edges point INTO it.
    Three equi-joins, all on narrow key columns; no cartesian anywhere.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("deg").alias("dv")), "v")
    )
    # orientation key: (degree, id) lexicographic — total order, hub-proof
    ou = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    ov = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    oriented = ed.select(
        F.when(ou < ov, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(ou < ov, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(ou < ov, ov).otherwise(ou).alias("ord_hi"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.lo") == F.col("e2.lo")) & (F.col("e1.ord_hi") < F.col("e2.ord_hi")),
    ).select(
        F.col("e1.lo").alias("w"),
        F.col("e1.hi").alias("b"),
        F.col("e2.hi").alias("c"),
    )
    closing = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select(
        F.array_sort(F.array("w", "b", "c")).alias("t")
    )
    return tri.select(
        F.col("t")[0].alias("a"), F.col("t")[1].alias("b"), F.col("t")[2].alias("c")
    )


def degree_stats(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Per-vertex degree of an undirected distinct-pair edge list — the
    seed statistic for orientation, skew diagnosis and hub capping."""
    e = edges.select(F.col(src).alias("n")).unionAll(
        edges.select(F.col(dst).alias("n"))
    )
    return e.groupBy("n").agg(F.count("*").cast("long").alias("deg"))
