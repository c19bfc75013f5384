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


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """PageRank over an undirected distinct-pair edge list (each edge walks
    both ways). Returns ``(n, pr)`` with pr rounded to 6 d.p. so float
    summation order can never flip an oracle comparison.

    Scale shape: the directed edge+degree table is built once, repartitioned
    on its source key and persisted — each power iteration then shuffles
    ONLY the rank table (|V| narrow rows), never the edges. Ranks are
    eagerly localCheckpoint-ed per round to cut the O(iterations) lineage
    (the same discipline as dedupe.connected_components). Every vertex of an
    edge list has degree ≥ 1, so there is no dangling-mass correction and
    total rank stays 1.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    de = e.unionAll(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
    deg = de.groupBy("s").agg(F.count("*").cast("double").alias("dg"))
    out = de.join(deg, "s").repartition("s").persist()
    n_v = deg.count()
    base = (1.0 - damping) / n_v
    ranks = deg.select(F.col("s").alias("n"), F.lit(1.0 / n_v).alias("pr"))
    for _ in range(n_iter):
        ranks = (
            out.join(ranks, out["s"] == ranks["n"])
            .select(F.col("t"), (F.col("pr") / F.col("dg")).alias("c"))
            .groupBy("t")
            .agg((F.lit(base) + damping * F.sum("c")).alias("pr"))
            .withColumnRenamed("t", "n")
            .localCheckpoint(eager=True)
        )
    out.unpersist()
    return ranks.select("n", F.round("pr", 6).alias("pr"))


def degree_stats(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Per-vertex degree of an undirected distinct-pair edge list — the
    seed statistic for orientation, skew diagnosis and hub capping."""
    e = edges.select(F.col(src).alias("n")).unionAll(
        edges.select(F.col(dst).alias("n"))
    )
    return e.groupBy("n").agg(F.count("*").cast("long").alias("deg"))
