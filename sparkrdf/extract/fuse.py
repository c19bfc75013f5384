"""Knowledge fusion: evidence aggregation over provenance-carrying triples.

Web-scale KG construction asserts the same fact from many pages; fusion
turns per-page assertions into one scored triple. This is the step after
extraction (pipeline.py) and resolution (resolve.py): group identical
(s, p, o) assertions, count independent provenances, and score each triple
by how much of its subject's total evidence supports it — the standard
"support / confidence" shape of truth-finding systems (Dong et al., 2014,
Knowledge Vault: confidence from the number of independent extractions).

Everything is exact-integer aggregation plus one final division, fully
mirrored by the DuckDB oracle; no floats accumulate across rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triple_support", "canonicalize_triples", "source_trust"]


def triple_support(
    assertions: DataFrame,
    prov_col: str = "doc",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Per-triple evidence scores over (provenance, s, p, o) assertions.

    Returns ``(s, p, o, n_prov, subj_prov, conf)``:

    - ``n_prov``   — distinct provenances asserting exactly this triple;
    - ``subj_prov`` — distinct provenances asserting ANYTHING about ``s``
      (the subject's total evidence mass);
    - ``conf``     — ``n_prov / subj_prov`` rounded to 9 d.p., the share of
      the subject's evidence that backs this particular fact.

    Scale shape: one (s,p,o)-keyed aggregate with map-side partials carries
    all the work; the per-subject mass is a second aggregate over the
    (already tiny) triple table, re-attached with an equi-join on ``s`` —
    never a window over the raw assertion stream. Duplicate assertions from
    one provenance collapse before anything shuffles. The deduped assertion
    table is materialized ONCE (eager localCheckpoint): both aggregates
    consume it, and assertions are typically a whole extraction subtree
    that would otherwise re-execute per consumer.
    """
    a = (
        assertions.select(
            F.col(prov_col).alias("prov"),
            F.col(s_col).alias("s"),
            F.col(p_col).alias("p"),
            F.col(o_col).alias("o"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    per_triple = a.groupBy("s", "p", "o").agg(
        F.count("*").cast("long").alias("n_prov")
    )
    per_subj = a.groupBy("s").agg(
        F.countDistinct("prov").cast("long").alias("subj_prov")
    )
    return per_triple.join(per_subj, "s").select(
        "s",
        "p",
        "o",
        "n_prov",
        "subj_prov",
        F.round(F.col("n_prov") / F.col("subj_prov"), 9).alias("conf"),
    )


def canonicalize_triples(
    triples: DataFrame,
    same_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Merge equivalent entities: rewrite a triple table through the
    transitive closure of an ``owl:sameAs``-style equivalence pair list.

    This is the canonicalization step of KG construction (after extraction
    and entity matching): ``same_pairs`` carries pairwise equivalences from
    whatever matcher produced them (suffix coreference, fuzzy name matching,
    an explicit sameAs predicate); equivalence is transitive, so the pairs
    are first closed into connected components (:func:`sparkrdf.dedupe.
    connected_components` — hash-to-min with pointer jumping, the same
    machinery the near-dup clusterer uses) and every entity maps to its
    component's MIN id. Subjects and objects are rewritten through that map
    and the rewritten triples deduplicate — assertions that only differed in
    which alias they named collapse into one canonical fact. Self-loops
    produced by merging both endpoints of an edge are kept (dropping them is
    a policy choice the caller can apply afterwards).

    Returns distinct ``(s, p, o)`` canonical triples.

    Scale shape: the pair list is matcher output — orders of magnitude
    smaller than the triple stream — so the canonical map (bounded by the
    nodes the pairs touch) broadcasts; the two rewrite joins are then
    map-side and the only shuffle over the triple stream is the final
    distinct, a hash aggregate with map-side partials. The triple table is
    never self-joined and never keyed by a skewed entity.
    """
    from sparkrdf.dedupe import connected_components

    comp = connected_components(same_pairs, id_a=id_a, id_b=id_b)
    # only non-identity entries matter for the rewrite; broadcast-sized
    cmap = F.broadcast(
        comp.filter(F.col("node") != F.col("component")).select(
            F.col("node"), F.col("component").alias("canon")
        )
    )
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    rewritten = (
        t.join(cmap.withColumnRenamed("node", "s"), "s", "left")
        .withColumnRenamed("canon", "s_canon")
        .join(cmap.withColumnRenamed("node", "o"), "o", "left")
        .withColumnRenamed("canon", "o_canon")
        .select(
            F.coalesce("s_canon", "s").alias("s"),
            "p",
            F.coalesce("o_canon", "o").alias("o"),
        )
    )
    return rewritten.distinct()


def source_trust(
    assertions: DataFrame,
    prov_col: str = "source",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    rounds: int = 2,
) -> DataFrame:
    """Joint source-reliability / fact-confidence scoring (truth discovery).

    The AverageLog fixed point (Pasternack & Roth 2010, "Knowing What to
    Believe"): a fact is believable when trustworthy sources assert it, and
    a source is trustworthy when its claims are believable — weighted by
    ``ln(1 + #claims)`` so prolific sources carry more evidence than
    one-shot ones (and so the iteration is not the degenerate all-ones
    average). With trust initialized to 1.0:

    - ``conf_i(f)  = round(avg over sources of trust_{i-1},      9)``
    - ``trust_i(s) = round(avg over claims of conf_i · ln(1+n_s), 9)``

    run ``rounds`` times, then a final confidence pass against the last
    trust table. Float discipline is stricter than 9 d.p. rounding alone:
    every score is a 9-d.p. value carried as an EXACT ×1e9 integer, each
    average is an exact BIGINT sum divided once (one IEEE op on identical
    integers in any engine, immune to partial-aggregation ordering), and
    only the ``ln`` weight touches transcendental floats — the same
    discipline the NPMI operator uses. This is what lets the DuckDB oracle
    unroll the identical iteration bit-for-bit.

    Returns ``(s, p, o, n_src, conf)`` — distinct-source support and the
    final confidence per fact.

    Scale shape: everything runs over the DISTINCT (source, fact) assertion
    table, which is persisted once; the trust table is bounded by the number
    of sources (domains/hosts — always broadcastable), so the per-round
    confidence aggregate is the only shuffle over assertion-sized data and
    it carries map-side partials. The conf→trust step shuffles the
    assertion table by fact key; both keys are the natural join keys and
    AQE's skew split covers a pathological hot fact.
    """
    a = (
        assertions.select(
            F.col(prov_col).alias("src"),
            F.col(s_col).alias("s"),
            F.col(p_col).alias("p"),
            F.col(o_col).alias("o"),
        )
        .distinct()
        .persist()
    )
    # a 9-d.p. score x rides as the exact integer round(x * 1e9); averages
    # are SUM(int)/(1e9 * COUNT) — exact sums, one deterministic division
    scaled = lambda col: F.round(col * 1e9, 0).cast("long")  # noqa: E731
    mean9 = lambda si, n: F.round(si / (n * 1e9), 9)  # noqa: E731
    try:
        src_n = a.groupBy("src").agg(F.count("*").cast("long").alias("n_claims"))
        trust = F.broadcast(
            src_n.select(
                "src", "n_claims", F.lit(10**9).cast("long").alias("trust_i")
            )
        )
        for _ in range(rounds):
            conf = (
                a.join(trust, "src")
                .groupBy("s", "p", "o")
                .agg(
                    scaled(mean9(F.sum("trust_i"), F.count(F.lit(1)))).alias("conf_i")
                )
            )
            trust = F.broadcast(
                a.join(conf, ["s", "p", "o"])
                .groupBy("src")
                .agg(F.sum("conf_i").alias("sum_i"), F.count(F.lit(1)).alias("n"))
                .join(src_n, "src")
                .select(
                    "src",
                    "n_claims",
                    scaled(
                        F.round(
                            (F.col("sum_i") / (F.col("n") * 1e9))
                            * F.log(F.lit(1.0) + F.col("n_claims")),
                            9,
                        )
                    ).alias("trust_i"),
                )
            )
        final = (
            a.join(trust, "src")
            .groupBy("s", "p", "o")
            .agg(
                F.countDistinct("src").cast("long").alias("n_src"),
                mean9(F.sum("trust_i"), F.count(F.lit(1))).alias("conf"),
            )
        )
        final = final.localCheckpoint(eager=True)
    finally:
        a.unpersist()
    return final
