"""Graph comparison: round-trip identity + precision/recall.

Mirrors the reference's correctness methodology (tests/conftest.py:115-187):
round-trips assert that the symmetric difference of the original and the
re-exported statement sets is empty. Blank-node labels are not stable across
the transformation (the reference re-mints them as hashed keys; rdflib mints
random ids on parse), so — like any RDF graph comparison — bnode-containing
statements are compared with the bnode positions wildcarded, plus a distinct
bnode-count identity. Non-bnode statements are compared exactly.

``precision_recall`` is the P/R ≥ 0.95 harness from BASELINE.md: computed
with ``exceptAll`` in both directions when given DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_rows(rows) -> tuple[set, int]:
    """Normalize statement rows: bnode labels -> '*'; return (set, n_bnodes)."""
    out = set()
    bnodes = set()
    for r in rows:
        s_kind, s, p, o_kind, o, o_lang, o_dt, sg = (
            r["s_kind"],
            r["s"],
            r["p"],
            r["o_kind"],
            r["o"],
            r["o_lang"],
            r["o_datatype"],
            r["sub_graph"],
        )
        if s_kind == "BNode":
            bnodes.add(s)
            s = "*"
        if o_kind == "BNode":
            bnodes.add(o)
            o = "*"
        out.add((s_kind, s, p, o_kind, o, o_lang, o_dt, sg))
    return out, len(bnodes)


#: above this many statements the diff stays distributed (exceptAll) instead
#: of collecting both sets to the driver — fixtures collect, bench-scale
#: graphs never do.
COLLECT_THRESHOLD = 100_000


def _norm_df(df: DataFrame) -> DataFrame:
    """Distributed bnode-wildcard normalization of a statements DataFrame."""
    return df.select(
        "s_kind",
        F.when(F.col("s_kind") == "BNode", F.lit("*")).otherwise(F.col("s")).alias("s"),
        "p",
        "o_kind",
        F.when(F.col("o_kind") == "BNode", F.lit("*")).otherwise(F.col("o")).alias("o"),
        "o_lang",
        "o_datatype",
        "sub_graph",
    ).dropDuplicates()


def _bnode_count(df: DataFrame) -> int:
    return (
        df.select(F.when(F.col("s_kind") == "BNode", F.col("s")).alias("b"))
        .unionByName(df.select(F.when(F.col("o_kind") == "BNode", F.col("o")).alias("b")))
        .filter(F.col("b").isNotNull())
        .distinct()
        .count()
    )


def round_trip_diff(original: DataFrame, exported: DataFrame) -> dict:
    """Symmetric difference between two statement DataFrames
    (bnode-wildcarded). Small graphs collect for readable diffs; above
    COLLECT_THRESHOLD the diff runs distributed via exceptAll and only the
    differing rows come back (bounded)."""
    n = original.count()
    if n > COLLECT_THRESHOLD:
        a, b = _norm_df(original), _norm_df(exported)
        missing = [tuple(r) for r in a.exceptAll(b).limit(1000).collect()]
        extra = [tuple(r) for r in b.exceptAll(a).limit(1000).collect()]
        return {
            "missing": sorted(missing),
            "extra": sorted(extra),
            "bnode_counts": (_bnode_count(original), _bnode_count(exported)),
        }
    a, a_bn = _norm_rows(original.collect())
    b, b_bn = _norm_rows(exported.collect())
    return {
        "missing": sorted(a - b),
        "extra": sorted(b - a),
        "bnode_counts": (a_bn, b_bn),
    }


def assert_round_trip(original: DataFrame, exported: DataFrame):
    d = round_trip_diff(original, exported)
    assert not d["missing"], f"missing from export: {d['missing'][:10]}"
    assert not d["extra"], f"extra in export: {d['extra'][:10]}"
    assert d["bnode_counts"][0] == d["bnode_counts"][1], d["bnode_counts"]


def precision_recall(emitted: DataFrame, golden: DataFrame) -> dict:
    """Distributed P/R on (subj, pred, obj)-shaped DataFrames via exceptAll.

    Columns are compared positionally-by-name; both inputs are deduplicated
    (statement *sets*, matching RDF semantics).
    """
    cols = golden.columns
    e = emitted.select(*cols).dropDuplicates()
    g = golden.dropDuplicates()
    n_e = e.count()
    n_g = g.count()
    fp = e.exceptAll(g).count()
    fn = g.exceptAll(e).count()
    tp = n_e - fp
    return {
        "precision": tp / n_e if n_e else 1.0,
        "recall": (n_g - fn) / n_g if n_g else 1.0,
        "emitted": n_e,
        "golden": n_g,
        "false_pos": fp,
        "false_neg": fn,
    }


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Symmetric delta between two KG snapshots → (…cols, change).

    The incremental-crawl primitive: given the triple sets materialized
    from two crawl batches, emit each triple present in exactly one of
    them, tagged ``'added'`` (new-only) or ``'removed'`` (old-only).
    Unchanged triples — the overwhelming majority between consecutive
    crawls — never appear in the output, so a downstream sink can apply
    the delta instead of rewriting the table (io.merge_by_key /
    MERGE INTO take exactly this shape).

    Columns are compared by name (the old snapshot is projected onto the
    new one's column list). Both sides deduplicate first: snapshots are
    statement SETS.

    Scale shape: two left-anti joins keyed on all columns — Spark plans
    each as one hash-partitioned exchange per side with no row expansion,
    and the union of the two anti-joins is linear in the delta size. No
    driver-side collection, no window, no skew-prone single key.
    """
    cols = new.columns
    o = old.select(*cols).dropDuplicates()
    n = new.dropDuplicates()
    added = n.join(o, cols, "left_anti").withColumn("change", F.lit("added"))
    removed = o.join(n, cols, "left_anti").withColumn("change", F.lit("removed"))
    return added.unionByName(removed)
