"""IRI minting / skolemization.

Mirrors the reference's BNode→stable-key scheme (farmhash of the node's
string form, main.py:2280-2282): every page gets a deterministic IRI derived
from the farmhash fingerprint of its url, so re-crawls and resumed runs mint
identical subjects (idempotent MERGE). Pure Catalyst + the vectorized
farmhash UDF — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkrdf.extract.gazetteer import PAGE
from sparkrdf.hashing import register_udfs


def page_iri_col(url: Column) -> Column:
    farmhash_udf, _ = register_udfs()
    return F.concat(F.lit(PAGE), farmhash_udf(url))


def with_page_iri(pages: DataFrame) -> DataFrame:
    return pages.withColumn("page_iri", page_iri_col(F.col("url")))
