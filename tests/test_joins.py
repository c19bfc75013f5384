"""Temporal joins (sparkrdf/joins.py): as-of and banded range join."""

from pyspark.sql import functions as F

from sparkrdf.joins import asof_join, range_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _asof(spark, lrows, rrows):
    left = _df(spark, lrows, "k long, lid long, l_us long")
    right = _df(spark, rrows, "k long, rid long, r_us long")
    out = asof_join(
        left, right, on=["k"], left_us="l_us", right_us="r_us",
        right_cols=["rid", "r_us"], tiebreak="rid",
    )
    return {r.lid: (r.rid, r.r_us) for r in out.collect()}


def test_asof_basic_backward(spark):
    got = _asof(
        spark,
        [(1, 10, 100), (1, 11, 250)],
        [(1, 90, 50), (1, 91, 200), (1, 92, 300)],
    )
    assert got == {10: (90, 50), 11: (91, 200)}


def test_asof_inclusive_equal_ts(spark):
    # right row at EXACTLY the left timestamp matches (<=)
    got = _asof(spark, [(1, 10, 100)], [(1, 90, 100)])
    assert got == {10: (90, 100)}


def test_asof_no_preceding_right_gives_nulls(spark):
    got = _asof(spark, [(1, 10, 100)], [(1, 90, 150)])
    assert got == {10: (None, None)}


def test_asof_tiebreak_greatest_wins(spark):
    # two rights at the same ts: greatest rid is the deterministic match
    got = _asof(spark, [(1, 10, 100)], [(1, 90, 80), (1, 95, 80), (1, 93, 80)])
    assert got == {10: (95, 80)}


def test_asof_keys_isolated(spark):
    got = _asof(
        spark,
        [(1, 10, 100), (2, 20, 100)],
        [(1, 90, 50), (2, 91, 60)],
    )
    assert got == {10: (90, 50), 20: (91, 60)}


def test_asof_preserves_left_row_count(spark):
    left = _df(spark, [(1, i, i * 10) for i in range(50)], "k long, lid long, l_us long")
    right = _df(spark, [(1, 900 + i, i * 25) for i in range(20)], "k long, rid long, r_us long")
    out = asof_join(left, right, ["k"], "l_us", "r_us", ["rid"], "rid")
    assert out.count() == 50


def _pairs(spark, lrows, rrows, gap):
    left = _df(spark, lrows, "a_id long, a_us long")
    right = _df(spark, rrows, "b_id long, b_us long")
    out = range_join(left, right, "a_us", "b_us", gap)
    return sorted((r.a_id, r.b_id) for r in out.collect())


def test_range_join_within_gap(spark):
    got = _pairs(spark, [(1, 1000)], [(2, 500), (3, 2100), (4, 1999)], 1000)
    assert got == [(1, 2), (1, 4)]


def test_range_join_boundary_inclusive(spark):
    assert _pairs(spark, [(1, 1000)], [(2, 2000)], 1000) == [(1, 2)]
    assert _pairs(spark, [(1, 1000)], [(2, 2001)], 1000) == []


def test_range_join_across_bucket_boundary(spark):
    # 999_999 and 1_000_001 sit in adjacent buckets (width 1e6) but are
    # 2 us apart — the neighbor-band replication must catch the pair
    assert _pairs(spark, [(1, 999_999)], [(2, 1_000_001)], 1_000_000) == [(1, 2)]


def test_range_join_no_duplicate_pairs(spark):
    # a right row lands in 3 bands; each qualifying pair must appear once
    lrows = [(i, i * 100) for i in range(40)]
    rrows = [(1000 + i, i * 100 + 5) for i in range(40)]
    got = _pairs(spark, lrows, rrows, 300)
    assert len(got) == len(set(got))
    # oracle: brute force
    expect = sorted(
        (a, b)
        for a, au in lrows
        for b, bu in rrows
        if abs(au - bu) <= 300
    )
    assert got == expect


def test_range_join_with_key(spark):
    left = _df(spark, [(1, 7, 100)], "a_id long, k long, a_us long")
    right = _df(
        spark, [(2, 7, 150), (3, 8, 150)], "b_id long, k long, b_us long"
    )
    out = range_join(left, right, "a_us", "b_us", 100, on=["k"])
    assert [(r.a_id, r.b_id) for r in out.collect()] == [(1, 2)]
