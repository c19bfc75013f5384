"""Physical-plan scale guards.

At 100 TB the adb:key override table, the reified-statement map, the
collection mapping, and the list-subject sets all grow linearly with the
corpus — none of them may be broadcast-HINTED (a hint forces the broadcast
regardless of size and OOMs the driver at scale; VERDICT r1 W3).

The check: with both static and adaptive autoBroadcastJoinThreshold set to
-1, a hint is the ONLY thing that can produce a BroadcastExchange in the
initial plan. Zero BroadcastExchange ⇒ zero forced broadcasts; AQE remains
free to broadcast genuinely small sides at runtime when thresholds are on.
"""

import pytest
from pyspark.sql import functions as F

from sparkrdf.pgt import pgt_transform
from sparkrdf.rpt import rpt_transform
from sparkrdf.ttl import parse_ttl, statements_df


@pytest.fixture()
def no_broadcast(spark):
    old_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
    if old_aqe is not None:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def _corpus_with_per_doc_keys(spark, n=200):
    """Statements where EVERY subject carries an adb:key override (the
    flagship dockg workload shape, dockg.py:104-113), plus one reified
    statement and one rdf list so every join under test is exercised."""
    rows = []
    for i in range(n):
        s = f"http://example.com/doc{i}"
        rows.append(("URIRef", s, "http://www.arangodb.com/key", "Literal", f"k{i}", None, None, None))
        rows.append(("URIRef", s, "http://example.com/cites", "URIRef", f"http://example.com/doc{(i + 1) % n}", None, None, None))
        rows.append(("URIRef", s, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "URIRef", "http://example.com/Document", None, None, None))
    extra = parse_ttl(
        """
        @prefix ex: <http://example.com/> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        ex:st a rdf:Statement ;
            rdf:subject ex:doc0 ; rdf:predicate ex:cites ; rdf:object ex:doc1 ;
            ex:certainty "0.9" .
        ex:doc0 ex:tags ( "a" "b" ) .
        """
    )
    return statements_df(spark, rows + list(extra))


def _assert_no_broadcast_exchange(df, what):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, (
        f"{what}: forced broadcast found in plan despite thresholds=-1 "
        f"(a data-sized side is broadcast-hinted)\n{plan[:4000]}"
    )


def test_rpt_plan_has_no_forced_broadcast(no_broadcast):
    spark = no_broadcast
    stmts = _corpus_with_per_doc_keys(spark)
    out = rpt_transform(stmts, "PLAN")
    _assert_no_broadcast_exchange(out["vertices"], "rpt vertices")
    _assert_no_broadcast_exchange(out["edges"], "rpt edges")


def test_pgt_plan_has_no_forced_broadcast(no_broadcast):
    spark = no_broadcast
    stmts = _corpus_with_per_doc_keys(spark)
    out = pgt_transform(stmts, "PLAN")
    _assert_no_broadcast_exchange(out["vertices"], "pgt vertices")
    _assert_no_broadcast_exchange(out["edges"], "pgt edges")


def test_pgt_per_doc_keys_still_correct(spark):
    """With per-document adb:keys the override must actually apply (the keys
    join is exercised, not just planned)."""
    stmts = _corpus_with_per_doc_keys(spark, n=50)
    out = pgt_transform(stmts, "PK")
    v = {r["_uri"]: r["_key"] for r in out["vertices"].collect() if r["_uri"]}
    assert v["http://example.com/doc7"] == "k7"
    assert v["http://example.com/doc49"] == "k49"
