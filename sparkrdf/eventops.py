"""Event-stream analytics over the ``events`` table.

Batch-side twin of the streaming operators in :mod:`sparkrdf.streaming`:
the same session semantics a `applyInPandasWithState` stream would keep as
state are expressed here as a per-key window + running sum, so the batch
result is DuckDB-oracle-checkable and the semantics are pinned once for
both execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(col_name: str) -> "F.Column":
    """tz-free epoch microseconds of a (possibly NTZ) timestamp column:
    diff against the NTZ epoch so the value never depends on
    ``spark.sql.session.timeZone`` (``unix_micros`` would, and rejects NTZ
    input outright)."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({col_name} AS TIMESTAMP_NTZ))"
    )


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of :func:`sessionize` using Spark's native
    ``session_window`` (gap-merged state windows + watermark eviction).
    Returns ``(user_col, start_us, end_us, n_events, value_cents)`` per
    closed session in append mode.

    Boundary semantics vs the batch operator: ``session_window`` starts a
    new session when the idle gap is ``>= gap`` (window end is exclusive),
    while the batch lag-based rule uses strictly ``>``; an event landing at
    EXACTLY the gap differs. Real event streams never hit the exact
    microsecond boundary; tests assert equality away from it.

    Scale shape: state is keyed by (user, session-window) and merged by the
    streaming aggregation operator itself — no applyInPandas state loop —
    and the watermark bounds state size to the active-session horizon.
    """
    sw = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), sw)
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("start_us"),
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("end_us"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("value_cents"),
        )
        .drop("session_window")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_minutes``. Returns one row per session:
    ``(user_col, session_idx, n_events, start_us, end_us, value_cents)``
    with timestamps as epoch-microsecond bigints (exact integer arithmetic
    on both engines — no float or format ambiguity) and the value sum in
    bigint cents.

    Scale shape: ONE shuffle on the user key; the lag + running-sum windows
    and the session aggregation all share that partitioning, so Catalyst
    plans a single exchange for the whole operator. No global sort exists —
    ordering is per-user-partition, which is exactly how a 1000-executor
    cluster would lay out per-entity timelines. Ties are broken by the event
    id so the assignment is deterministic under equal timestamps.
    """
    us = epoch_us(ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tagged = events.select(
        F.col(user_col),
        us.alias("_us"),
        F.col(id_col),
        F.col(value_col),
        F.sum(is_new).over(run).alias("session_idx"),
    )
    return tagged.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        F.round(F.sum(F.col(value_col).cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("value_cents"),
    )


def observation_ranges(
    observations: DataFrame,
    key_cols: list,
    ts_col: str = "warc_ts",
    prov_col: str = "page_iri",
) -> DataFrame:
    """Temporal scoping: per-key first/last observation + provenance reach.

    KG facts extracted from a rolling crawl carry the crawl timestamp of
    every page that asserted them; scoping collapses those observations to
    ``(…key, first_seen, last_seen, n_prov)`` — the validity interval a
    temporal KG stores per fact and the signal a freshness-aware ranker
    consumes (a fact last seen two years ago decays; one seen across many
    crawls is stable).

    One hash aggregate with map-side partials: MIN/MAX of the timestamp
    and a distinct-count of the provenance column, keyed by the fact key.
    Nothing else shuffles; the observation stream is consumed once.
    """
    return observations.groupBy(*key_cols).agg(
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
        F.countDistinct(prov_col).cast("long").alias("n_prov"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_minutes: int = 10_080,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel (ClickHouse ``windowFunnel`` semantics,
    greedy-earliest matching): per user, match ``steps`` in order — the
    first step at its earliest occurrence, each later step at its earliest
    occurrence STRICTLY after the previous matched step and within
    ``within_minutes`` of the first step. Returns one row per user who
    performed step 1: ``(user_col, steps_completed, t1_us, t_end_us)`` with
    epoch-microsecond bigints (exact on every engine). Greedy-earliest is
    deterministic and, for "did the user convert" semantics, equivalent to
    any-chain existence: if any chain completes inside the window, the
    earliest-match chain does too.

    Scale shape: one user-keyed min-aggregate per step plus a user-keyed
    join per step — len(steps) narrow shuffles on the SAME key, which
    Catalyst collapses onto one exchange-reuse partitioning; no windows, no
    per-user sort, no event-stream blowup. A dropped step k leaves NULLs
    from k on (the chain filter compares against a NULL and rejects), so
    ``steps_completed`` is always the length of the matched prefix.
    """
    if len(steps) < 2:
        raise ValueError("funnel requires at least two steps")
    us = epoch_us(ts_col)
    e = events.select(
        F.col(user_col).alias("_u"), F.col(type_col).alias("_et"), us.alias("_us")
    )
    w_us = within_minutes * 60 * 1_000_000
    cur = (
        e.filter(F.col("_et") == steps[0])
        .groupBy("_u")
        .agg(F.min("_us").alias("t1"))
        .withColumn("_deadline", F.col("t1") + F.lit(w_us))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            e.filter(F.col("_et") == step)
            .join(cur.select("_u", F.col(prev).alias("_prev"), "_deadline"), "_u")
            .filter((F.col("_us") > F.col("_prev")) & (F.col("_us") <= F.col("_deadline")))
            .groupBy("_u")
            .agg(F.min("_us").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "_u", "left")
    ts_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    completed = F.lit(1)
    for c in ts_cols[1:]:
        completed = completed + F.when(F.col(c).isNotNull(), 1).otherwise(0)
    return cur.select(
        F.col("_u").alias(user_col),
        completed.cast("int").alias("steps_completed"),
        F.col("t1").alias("t1_us"),
        F.coalesce(*[F.col(c) for c in reversed(ts_cols)]).alias("t_end_us"),
    )


def coalesce_intervals(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Merge overlapping or touching intervals per key (gaps-and-islands):
    the temporal-KG normalization that collapses redundant validity
    assertions — ``[1,5]`` and ``[3,8]`` become ``[1,8]`` — before interval
    joins or storage. Returns ``(key_col, island_idx, start_us, end_us,
    n_intervals)``.

    Algorithm: order intervals per key by (start, end); an interval starts
    a new island iff its start exceeds the running max of all previous
    ends (strictly — touching intervals merge); island id = running sum of
    the flag. Tie order cannot change the result: a tied row's running max
    already includes its twin's end ≥ the shared start.

    Scale shape: ONE shuffle on the key; the running-max window, the
    island running sum and the final aggregate all share that
    partitioning (the sessionize pattern — a single exchange end to end).
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        intervals.select(
            F.col(key_col),
            F.col(start_col),
            F.col(end_col),
            island.cast("long").alias("island_idx"),
        )
        .groupBy(key_col, "island_idx")
        .agg(
            F.min(start_col).alias("start_us"),
            F.max(end_col).alias("end_us"),
            F.count("*").cast("long").alias("n_intervals"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by FIRST-activity bucket
    (``bucket_days``-day periods from the epoch — fixed boundaries, so
    cohorts are stable across incremental recomputation), counted in
    every later bucket they remain active — the standard
    engagement-retention analysis. Returns ``(cohort, age, users)``:
    distinct users whose first bucket is ``cohort`` and who were active
    ``age`` buckets later (``age`` = 0 is the cohort's own size).

    Scale shape: one (user, bucket) dedup aggregate, one per-user MIN
    (both map-side combinable, same user-keyed shuffle), and one count —
    no windows, no self-joins; epoch-based bucket arithmetic is pure
    codegen (the tz-free discipline of :func:`sessionize`).
    """
    if bucket_days < 1:
        raise ValueError("bucket_days must be >= 1")
    bucket = (
        F.floor(epoch_us(ts_col) / F.lit(86_400_000_000 * bucket_days))
    ).cast("long")
    ub = (
        events.select(F.col(user_col).alias("u"), bucket.alias("b"))
        .dropDuplicates()
    )
    first = ub.groupBy("u").agg(F.min("b").alias("cohort"))
    return (
        ub.join(first, "u")
        .groupBy("cohort", (F.col("b") - F.col("cohort")).alias("age"))
        .agg(F.count("*").alias("users"))
    )
