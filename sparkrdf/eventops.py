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
