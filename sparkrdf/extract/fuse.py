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

__all__ = ["triple_support"]


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
    one provenance collapse before anything shuffles.
    """
    a = assertions.select(
        F.col(prov_col).alias("prov"),
        F.col(s_col).alias("s"),
        F.col(p_col).alias("p"),
        F.col(o_col).alias("o"),
    ).distinct()
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
