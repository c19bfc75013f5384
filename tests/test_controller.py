"""Pluggable best-class controller (reference controller.py:12-94): the
default rule is pure-Catalyst; a user subclass overrides the tie-break and
runs Arrow-batched."""

from sparkrdf.hashing import farmhash_key
from sparkrdf.mapping import BestClassController
from sparkrdf.pgt import pgt_transform
from sparkrdf.ttl import parse_ttl, statements_df

EX = "http://example.com/"

TTL = """
@prefix ex: <http://example.com/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
ex:Deep rdfs:subClassOf ex:Shallow .
ex:s1 a ex:Apple ;
      a ex:Zucchini .
ex:s2 a ex:Deep ;
      a ex:Shallow .
"""


class LexicographicLast(BestClassController):
    """Ignores the tree entirely: always the lexicographically-last class."""

    def identify_best_class(self, term_id, class_set, depths):
        return sorted(class_set)[-1]


def _cols(out):
    return {r["_uri"]: r["collection"] for r in out["vertices"].collect() if r["_uri"]}


def test_default_rule(spark):
    stmts = statements_df(spark, parse_ttl(TTL))
    cols = _cols(pgt_transform(stmts, "CD"))
    assert cols[EX + "s1"] == "Apple"  # no candidate in tree → lexic. min
    assert cols[EX + "s2"] == "Deep"  # deepest in tree wins


def test_custom_controller_overrides_tiebreak(spark):
    stmts = statements_df(spark, parse_ttl(TTL))
    cols = _cols(pgt_transform(stmts, "CC", controller=LexicographicLast()))
    assert cols[EX + "s1"] == "Zucchini"
    assert cols[EX + "s2"] == "Shallow"


def test_default_controller_instance_matches_builtin(spark):
    """Passing the BASE controller instance must not change results (it is
    recognized as the default rule and stays on the Catalyst path)."""
    stmts = statements_df(spark, parse_ttl(TTL))
    a = _cols(pgt_transform(stmts, "CA"))
    b = _cols(pgt_transform(stmts, "CB", controller=BestClassController()))
    assert a == b


def test_bad_controller_type_raises(spark):
    """Mirror of reference test_constructor (test_main.py:30-38): a
    non-controller object is a TypeError, not a silent misbehavior."""
    import pytest

    from sparkrdf.mapping import collection_mapping
    from sparkrdf.ttl import parse_ttl, statements_df

    stmts = statements_df(
        spark, parse_ttl("@prefix ex: <http://e.com/> . ex:a a ex:T .")
    )
    with pytest.raises(TypeError, match="BestClassController"):
        collection_mapping(stmts, controller=object())
