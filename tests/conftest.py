import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference RDF fixture files (read-only, data not code). Tests that need them
# skip when the directory is absent so the repo stays standalone.
REF_RDF_DIR = os.environ.get("SPARKRDF_REF_RDF_DIR", "/root/reference/tests/data/rdf")
REF_META_DIR = os.environ.get("SPARKRDF_REF_META_DIR", "/root/reference/arango_rdf/meta")


def ref_case(name: str) -> str:
    path = os.path.join(REF_RDF_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    return path


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        # one long-lived JVM serves the whole suite; transforms cache
        # intermediates, so size the heap for accumulation and clear the SQL
        # cache in the memoized fixtures (see pgt_case/rpt_case)
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("sparkrdf-tests")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _clear_sql_cache(spark):
    """Drop cached plans after every test so the session-long JVM doesn't
    accumulate each transform's keyed.cache(). Cheap no-op when nothing is
    cached; the memoized fixture outputs are localCheckpointed RDD blocks
    and survive."""
    yield
    spark.catalog.clearCache()


@pytest.fixture(scope="session")
def pgt_case(spark):
    """Memoized, materialized PGT transform per fixture case. Graph name is
    derived from the case file ('G<case>'). Saves minutes of repeated
    transform work across test files."""
    from sparkrdf.pgt import pgt_transform
    from sparkrdf.ttl import parse_ttl_file, statements_df

    cache: dict = {}

    def get(case: str):
        if case not in cache:
            import re

            name = "G" + re.sub(r"\W+", "_", case.rsplit(".", 1)[0])
            stmts = statements_df(spark, parse_ttl_file(ref_case(case)))
            out = pgt_transform(stmts, name)
            out = {k: v.localCheckpoint(eager=True) for k, v in out.items()}
            cache[case] = (name, stmts, out)
        return cache[case]

    return get


@pytest.fixture(scope="session")
def rpt_case(spark):
    """Memoized, materialized RPT transform per fixture case (name 'R<case>')."""
    from sparkrdf.rpt import rpt_transform
    from sparkrdf.ttl import parse_ttl_file, statements_df

    cache: dict = {}

    def get(case: str):
        if case not in cache:
            import re

            name = "R" + re.sub(r"\W+", "_", case.rsplit(".", 1)[0])
            stmts = statements_df(spark, parse_ttl_file(ref_case(case)))
            out = rpt_transform(stmts, name)
            out = {k: v.localCheckpoint(eager=True) for k, v in out.items()}
            cache[case] = (name, stmts, out)
        return cache[case]

    return get
