"""Post-import migrations (C9/C10): UnknownResource resolution and
edges→attributes propagation, as DataFrame programs.

Reference:
- ``migrate_unknown_resources`` (arango_rdf/main.py:1338-1454): AQL joins the
  ``{name}_UnknownResource`` collection against the URI-map collection on
  ``_key``; matched docs move to their mapped collection and every edge
  endpoint referencing them is rewritten. Here: one equi-join + two column
  rewrites (the reference's per-doc 1..1 traversal becomes a join of the
  edge table against the moved-doc map — no per-row graph probes).
- ``migrate_edges_to_attributes`` (main.py:1456-1581): an AQL traversal
  1..max_depth collecting a label list onto each start vertex (used for LPG
  ``_type`` arrays, tests/test_main.py:5594-5816). Here: iterated self-joins
  (BFS frontier per depth) + ``sort_array(collect_list(...))`` + a left join
  back onto the vertex table.

Scale: both are join-shaped; the UnknownResource map and class taxonomy are
small (broadcast), the edge rewrite is a shuffle on endpoint id — the same
key the edges already carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uri_map_from_vertices(vertices: DataFrame) -> DataFrame:
    """URI-map rows (_key, _uri, collection) from an import's vertex table —
    the Spark analog of the reference's URI-map collection upkeep
    (``uri_map_collection_name``, main.py:998-1008): one row per URI term
    recording where it landed, consumed by a later import's mapping preload
    or by :func:`migrate_unknown_resources`."""
    return (
        vertices.filter(F.col("_uri").isNotNull())
        .select("_key", "_uri", "collection")
        .dropDuplicates(["_key"])
    )


def migrate_unknown_resources(
    vertices: DataFrame,
    edges: DataFrame,
    uri_map: DataFrame,
    name: str,
) -> dict[str, DataFrame]:
    """Move UR docs to their mapped collection and rewrite edge endpoints.

    uri_map: (_key, collection) — the URI-map table.
    Returns {"vertices": ..., "edges": ..., "migrated": count_df}.
    """
    ur_col = f"{name}_UnknownResource"
    moves = (
        vertices.filter(F.col("collection") == ur_col)
        .select("_key")
        .join(uri_map.select("_key", F.col("collection").alias("new_col")), "_key", "inner")
        .withColumn("old_id", F.concat(F.lit(ur_col), F.lit("/"), F.col("_key")))
        .withColumn("new_id", F.concat(F.col("new_col"), F.lit("/"), F.col("_key")))
    )
    # moves = UR ∩ uri_map grows with the corpus — no broadcast hint
    moves_b = moves

    new_vertices = (
        vertices.join(moves_b.select("_key", "new_col"), "_key", "left")
        .withColumn(
            "collection",
            F.when(
                (F.col("collection") == ur_col) & F.col("new_col").isNotNull(),
                F.col("new_col"),
            ).otherwise(F.col("collection")),
        )
        .drop("new_col")
    )

    from_map = moves_b.select(F.col("old_id").alias("_from"), F.col("new_id").alias("nf"))
    to_map = moves_b.select(F.col("old_id").alias("_to"), F.col("new_id").alias("nt"))
    new_edges = (
        edges.join(from_map, "_from", "left")
        .join(to_map, "_to", "left")
        .withColumn("_from", F.coalesce("nf", F.col("_from")))
        .withColumn("_to", F.coalesce("nt", F.col("_to")))
        .drop("nf", "nt")
    )
    return {"vertices": new_vertices, "edges": new_edges, "moves": moves.select("_key", "new_col")}


def migrate_edges_to_attributes(
    vertices: DataFrame,
    edges: DataFrame,
    edge_collections: list[str],
    attribute_name: str,
    max_depth: int = 1,
    direction: str = "OUTBOUND",
    return_attr: str = "_label",
    edge_label: str | None = None,
) -> DataFrame:
    """Collect traversal-target labels into an array attribute on every start
    vertex (sorted, mirroring the reference's SORT v._label default).

    **edge_label** restricts the traversal to edges with that ``_label`` —
    the reference's ``filter_clause="e._label == '...'"`` (used with LPG's
    single edge collection, main.py:1610-1616).

    Returns the vertices DataFrame with ``attribute_name`` added
    (array<string>, empty list when no path — the reference writes [] too).
    """
    e = edges.filter(F.col("collection").isin(edge_collections))
    if edge_label is not None:
        e = e.filter(F.col("_label") == edge_label)
    e = e.select("_from", "_to")
    if direction == "INBOUND":
        e = e.select(F.col("_to").alias("_from"), F.col("_from").alias("_to"))
    elif direction == "ANY":
        e = e.unionByName(e.select(F.col("_to").alias("_from"), F.col("_from").alias("_to")))

    vid = F.concat(F.col("collection"), F.lit("/"), F.col("_key"))
    v_ids = vertices.select(vid.alias("vid"), F.col(return_attr).alias("val"))

    # BFS: frontier of (start, node) pairs, expanding max_depth times
    frontier = e.select(F.col("_from").alias("start"), F.col("_to").alias("node"))
    reached = frontier
    for _ in range(max_depth - 1):
        nxt = (
            frontier.join(
                e.select(F.col("_from").alias("node"), F.col("_to").alias("node2")),
                "node",
            )
            .select("start", F.col("node2").alias("node"))
        )
        frontier = nxt.join(reached, ["start", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        reached = reached.unionByName(frontier)

    labels = (
        reached.join(v_ids, reached["node"] == v_ids["vid"], "inner")
        .groupBy("start")
        .agg(F.sort_array(F.collect_list("val")).alias(attribute_name))
    )
    out = vertices.join(
        labels, vid == labels["start"], "left"
    ).drop("start")
    return out.withColumn(
        attribute_name, F.coalesce(F.col(attribute_name), F.array().cast("array<string>"))
    )
