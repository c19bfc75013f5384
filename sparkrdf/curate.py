"""One-call corpus curation: the hygiene operators composed into the
standard pre-training cleanup pipeline.

    raw docs
      → quality filter   (Gopher rules — codegen predicate, no shuffle)
      → PII scrub        (regex redaction — codegen projection, no shuffle)
      → exact dedup      (normalized fingerprint, keep smallest id — ONE
                          shuffle, window over uniformly distributed md5)
      → deterministic split (hash of id — projection, no shuffle)

The pipeline shape is the point: the first three stages before the dedup
exchange are a single fused map over the scan (filter + scrub + fingerprint
in one whole-stage-codegen span), so at 100 TB the entire curation pass
costs exactly one shuffle — keyed on the fingerprint, which is md5-uniform
by construction (no skew, no salting needed). The split column is a pure
function of doc_id, so re-running curation after new data arrives never
moves an existing document across train/val/test (no leakage on re-runs).

Every stage is reproducible in ANSI SQL; the driver's DuckDB oracle checks
the composed pipeline end-to-end (``corpus_curate`` in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkrdf.textops import (
    fingerprint,
    hash_split,
    pii_scrub_col,
    quality_flags,
    token_count,
)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    **quality_kwargs,
) -> DataFrame:
    """Curate a raw document table → (doc_id, text, …passthrough…, fp,
    n_tokens, split) with quality-failing docs dropped, PII scrubbed,
    exact duplicates collapsed to the smallest id, and a leak-free
    deterministic split assigned. ``quality_kwargs`` forward to
    :func:`sparkrdf.textops.quality_flags` thresholds."""
    flags = quality_flags(F.col(text_col), **quality_kwargs)
    fail = None
    for c in flags.values():
        fail = c if fail is None else (fail | c)

    kept = docs.filter(~fail).withColumn(text_col, pii_scrub_col(F.col(text_col)))
    with_fp = kept.withColumn("fp", fingerprint(F.col(text_col)))

    # exact dedup: keep the smallest id per fingerprint. A window beats
    # groupBy-min + semi-join (one exchange instead of two); the partition
    # key is md5 output — uniform, skew-free at any scale.
    w = Window.partitionBy("fp").orderBy(F.col(id_col))
    dedup = (
        with_fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return hash_split(dedup, id_col=id_col, fractions=fractions).withColumn(
        "n_tokens", token_count(F.col(text_col)).cast("long")
    )


def cluster_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    fractions: dict[str, float] | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Contamination-safe split assignment: near-duplicate CLUSTERS stay in
    one split. Splitting by raw document id leaks whenever near-duplicates
    straddle the train/test boundary (the test set then contains
    paraphrases of training docs — Lee et al. 2022's core finding); the fix
    is to split on the cluster's canonical id so every near-dup family
    lands together.

    Pipeline: :func:`sparkrdf.dedupe.dedup_clusters` (LSH → exact verify →
    connected components) gives each clustered doc its canonical id; every
    other doc keys by itself; :func:`sparkrdf.textops.hash_split` assigns
    the split as a pure function of that key. Returns
    ``(id_col, split_key, split)``.

    Scale shape: the cluster table is bounded by the (tiny) verified pair
    set, so the join back to the corpus is broadcast-sized in practice and
    keyed on the uniform doc id either way; the split itself stays one
    codegen projection.
    """
    from sparkrdf.dedupe import dedup_clusters
    from sparkrdf.textops import hash_split

    clusters = dedup_clusters(
        docs, id_col=id_col, text_col=text_col, threshold=threshold
    )
    keyed = (
        docs.select(id_col)
        .join(clusters.select(id_col, "canonical_id"), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("canonical_id", F.col(id_col)).alias("split_key"),
        )
    )
    return hash_split(
        keyed, id_col="split_key", fractions=fractions, buckets=buckets
    ).select(id_col, "split_key", "split")
