"""Graph analytics (sparkrdf/graphops.py) and event sessionization
(sparkrdf/eventops.py) on hand-built inputs with known answers."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparkrdf.eventops import sessionize, sessionize_stream
from sparkrdf.graphops import comention_edges, degree_stats, pagerank, triangles

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
T0_US = 1_704_067_200 * 1_000_000  # epoch micros of T0 (session tz is UTC)


def _events(spark, rows):
    """rows: (event_id, user_id, minutes_after_T0, value)"""
    return spark.createDataFrame(
        [
            (eid, T0 + dt.timedelta(minutes=m), uid, "click", v, "{}")
            for eid, uid, m, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _sessions(spark, rows, **kw):
    out = sessionize(_events(spark, rows), **kw).collect()
    return {
        (r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us, r.value_cents)
        for r in out
    }


def test_sessionize_gap_boundary(spark):
    # exactly 30 min of idle does NOT open a session (condition is strict >)
    s = _sessions(
        spark,
        [(0, 1, 0, 1.0), (1, 1, 30, 2.0), (2, 1, 60.0001, 4.0)],
    )
    assert set(s) == {(1, 1), (1, 2)}
    n, start, end, cents = s[(1, 1)]
    assert (n, cents) == (2, 300)
    assert end - start == 30 * 60 * 1_000_000
    assert s[(1, 2)][0] == 1 and s[(1, 2)][3] == 400


def test_sessionize_per_user_independent(spark):
    s = _sessions(
        spark,
        [(0, 1, 0, 1.0), (1, 2, 1, 1.5), (2, 1, 90, 2.0), (3, 2, 2, 0.25)],
    )
    # user 1: two sessions (90 min gap); user 2: one session of 2 events
    assert set(s) == {(1, 1), (1, 2), (2, 1)}
    assert s[(2, 1)] == (
        2, T0_US + 60 * 1_000_000, T0_US + 120 * 1_000_000, 175
    )


def test_sessionize_tied_timestamps_deterministic(spark):
    # equal ts: event_id breaks the tie, so the session stats are stable
    s1 = _sessions(spark, [(5, 1, 0, 1.0), (3, 1, 0, 2.0), (9, 1, 45, 4.0)])
    s2 = _sessions(spark, [(3, 1, 0, 2.0), (9, 1, 45, 4.0), (5, 1, 0, 1.0)])
    assert s1 == s2
    assert s1[(1, 1)] == (2, T0_US, T0_US, 300)


def test_sessionize_custom_gap(spark):
    s = _sessions(spark, [(0, 1, 0, 1.0), (1, 1, 10, 1.0)], gap_minutes=5)
    assert set(s) == {(1, 1), (1, 2)}


# ---------------------------------------------------------------------------
# graphops
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    norm = sorted({(min(u, v), max(u, v)) for u, v in pairs})
    return spark.createDataFrame(norm, "u string, v string")


def _tris(spark, pairs):
    return sorted(
        (r.a, r.b, r.c) for r in triangles(_edges(spark, pairs)).collect()
    )


def test_comention_edges(spark):
    m = spark.createDataFrame(
        [("d1", "x"), ("d1", "y"), ("d1", "x"), ("d2", "y"), ("d2", "x"),
         ("d3", "z")],
        "doc_id string, surface string",
    )
    got = sorted((r.u, r.v) for r in comention_edges(m).collect())
    # duplicate mention rows and the reversed d2 order collapse to one edge
    assert got == [("x", "y")]


def test_triangles_k4(spark):
    verts = ["a", "b", "c", "d"]
    k4 = [(u, v) for i, u in enumerate(verts) for v in verts[i + 1:]]
    assert _tris(spark, k4) == [
        ("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"), ("b", "c", "d"),
    ]


def test_triangles_none_in_star_and_path(spark):
    star = [("hub", f"s{i}") for i in range(6)]
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _tris(spark, star) == []
    assert _tris(spark, path) == []


def test_triangles_hub_with_fan(spark):
    # hub h connects to all of a fan a..f; only (a,b) closes a triangle —
    # each triangle counted exactly once despite the degree-6 hub
    fan = ["a", "b", "c", "d", "e", "f"]
    edges = [("h", x) for x in fan] + [("a", "b"), ("c", "d")]
    assert _tris(spark, edges) == [("a", "b", "h"), ("c", "d", "h")]


def test_triangles_shared_edge(spark):
    # two triangles sharing edge (a,b)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    assert _tris(spark, edges) == [("a", "b", "c"), ("a", "b", "d")]


def test_degree_stats(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("b", "d")])
    got = {r.n: r.deg for r in degree_stats(e).collect()}
    assert got == {"a": 1, "b": 3, "c": 1, "d": 1}


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    verts = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    # column-stochastic transition matrix of the undirected graph
    M = np.zeros((n, n))
    for u, v in pairs:
        M[idx[v], idx[u]] = 1.0
        M[idx[u], idx[v]] = 1.0
    M /= M.sum(axis=0, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - 0.85) / n + 0.85 * (M @ r)

    got = {row.n: row.pr for row in pagerank(_edges(spark, pairs)).collect()}
    assert set(got) == set(verts)
    for v in verts:
        assert abs(got[v] - r[idx[v]]) < 1e-6, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_symmetry(spark):
    # a 4-cycle is vertex-transitive: every vertex gets exactly 1/4
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    got = {r.n: r.pr for r in pagerank(_edges(spark, cyc)).collect()}
    assert got == {"a": 0.25, "b": 0.25, "c": 0.25, "d": 0.25}


def test_sessionize_stream_matches_batch(spark, tmp_path):
    # file-source stream in two chunks; closed+open sessions all emitted
    # once the stream drains (processAllAvailable + final watermark batch)
    rows1 = [(0, 1, 0.0, 1.0), (1, 1, 10.0, 2.0), (2, 2, 5.0, 3.0)]
    rows2 = [(3, 1, 200.0, 4.0), (4, 2, 12.0, 5.0), (5, 1, 205.0, 6.0)]
    src = str(tmp_path / "landing")
    # chunk 2 is written only AFTER chunk 1 is fully processed: with a
    # 0-second watermark, processing them out of order would drop the
    # early sessions as late data
    _events(spark, rows1).write.parquet(src)

    schema = _events(spark, rows1).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _events(spark, rows2).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.start_us): (r.n_events, r.end_us, r.value_cents)
        for r in spark.sql("select * from sess_out").collect()
    }

    batch = sessionize(_events(spark, rows1 + rows2)).collect()
    expect = {
        (r.user_id, r.start_us): (r.n_events, r.end_us, r.value_cents)
        for r in batch
    }
    # the stream may not have emitted sessions still open at shutdown;
    # everything it DID emit must agree with batch, and the closed first
    # sessions of both users must be present
    assert got
    for k, v in got.items():
        assert expect[k] == v, (k, v, expect[k])
    assert (1, T0_US) in got


def test_triangle_count_matches_bruteforce(spark):
    # deterministic pseudo-random graph; oracle = O(n^3) python loop
    import itertools

    n = 14
    verts = [f"v{i}" for i in range(n)]
    pairs = [
        (verts[i], verts[j])
        for i, j in itertools.combinations(range(n), 2)
        if (i * 7 + j * 13 + i * j) % 3 == 0
    ]
    eset = {frozenset(p) for p in pairs}
    expect = sorted(
        (a, b, c)
        for a, b, c in itertools.combinations(sorted(verts), 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= eset
    )
    assert _tris(spark, pairs) == expect


# ---------------------------------------------------------------------------
# funnel / coalesce_intervals
# ---------------------------------------------------------------------------


def _evts(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), t) for u, m, t in rows],
        "user_id bigint, ts timestamp, event_type string",
    )


def test_funnel_hand_computed(spark):
    from sparkrdf.eventops import funnel

    base = dt.datetime(2024, 1, 1)
    us = lambda m: int((base + dt.timedelta(minutes=m)).timestamp() * 1e6)  # noqa: E731
    rows = [
        # u1 completes all three in order
        (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
        # u2: click BEFORE the first view -> chain can't use it
        (2, 0, "click"), (2, 3, "view"), (2, 7, "purchase"),
        # u3: completes but the purchase is outside the window
        (3, 0, "view"), (3, 5, "click"), (3, 200, "purchase"),
        # u4 never views -> absent from the output
        (4, 1, "click"), (4, 2, "purchase"),
    ]
    got = {
        r.user_id: (r.steps_completed, r.t1_us, r.t_end_us)
        for r in funnel(
            _evts(spark, rows), ["view", "click", "purchase"], within_minutes=60
        ).collect()
    }
    # NOTE: timestamps are NTZ; epoch_us treats them as UTC wall-clock
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 3 and got[1][2] == got[1][1] + 9 * 60_000_000
    assert got[2] == (1, got[2][1], got[2][1])  # click precedes view: only step 1
    assert got[3][0] == 2  # purchase past the 60-min window


def test_funnel_requires_two_steps(spark):
    from sparkrdf.eventops import funnel

    with pytest.raises(ValueError, match="two steps"):
        funnel(_evts(spark, [(1, 0, "view")]), ["view"])


def test_coalesce_intervals_hand_computed(spark):
    from sparkrdf.eventops import coalesce_intervals

    rows = [
        ("a", 1, 5), ("a", 3, 8), ("a", 8, 9),   # one island [1, 9] (touching merges)
        ("a", 20, 25),                            # second island
        ("b", 0, 1), ("b", 2, 3),                 # strict gap: two islands
    ]
    df = spark.createDataFrame(rows, "user_id string, start_us long, end_us long")
    got = {
        (r.user_id, r.island_idx): (r.start_us, r.end_us, r.n_intervals)
        for r in coalesce_intervals(df).collect()
    }
    assert got == {
        ("a", 1): (1, 9, 3),
        ("a", 2): (20, 25, 1),
        ("b", 1): (0, 1, 1),
        ("b", 2): (2, 3, 1),
    }


def test_coalesce_intervals_contained_interval(spark):
    from sparkrdf.eventops import coalesce_intervals

    # second interval entirely inside the first: running max keeps 10
    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 2, 3), ("a", 4, 12)],
        "user_id string, start_us long, end_us long",
    )
    out = coalesce_intervals(df).collect()
    assert len(out) == 1 and (out[0].start_us, out[0].end_us) == (0, 12)


def test_modularity_hand_values(spark):
    """graphops.modularity: two bridged triangles under a perfect split
    (Q = 2*(3/7 - (7/14)^2)); the all-one-community partition scores 0;
    unlabeled nodes default to singleton communities."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from sparkrdf.graphops import modularity

    E = [("a", "b"), ("b", "c"), ("c", "a"),
         ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")]
    df = spark.createDataFrame(E, "u string, v string")
    com = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"),
         ("d", "y"), ("e", "y"), ("f", "y")], "n string, label string")
    (row,) = modularity(df, com).collect()
    assert row.m_edges == 7 and abs(row.q - 0.357143) < 1e-6
    (one,) = modularity(df, com.withColumn("label", F.lit("z"))).collect()
    assert one.q == 0.0
    with _pytest.raises(ValueError, match="empty"):
        modularity(df.filter(F.col("u") == "zz"), com).collect()


def test_retention_cohorts(spark):
    """eventops.retention_cohorts: fixed epoch-week buckets, per-user
    first bucket, distinct-user counts per (cohort, age)."""
    import datetime as dt

    import pytest as _pytest

    from sparkrdf.eventops import retention_cohorts

    rows = [
        (1, dt.datetime(2024, 1, 1)), (1, dt.datetime(2024, 1, 9)),
        (1, dt.datetime(2024, 1, 9, 5)),  # same week dedups
        (2, dt.datetime(2024, 1, 2)), (2, dt.datetime(2024, 1, 20)),
        (3, dt.datetime(2024, 1, 10)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort, r.age): r.users
           for r in retention_cohorts(df).collect()}
    # epoch weeks: 2024-01-01..03 -> 2817, 01-04..10 -> 2818, 01-18..24 -> 2820
    assert out == {(2817, 0): 2, (2817, 1): 1, (2817, 3): 1, (2818, 0): 1}
    with _pytest.raises(ValueError, match="bucket_days"):
        retention_cohorts(df, bucket_days=0)
