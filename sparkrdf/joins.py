"""Temporal joins Spark's built-in operators don't provide: as-of join and
bounded range (band) join.

Both are expressed as compositions of built-in DataFrame ops — no UDFs, no
driver loops — so Catalyst codegens the whole plan:

* ``asof_join`` is the union+window trick: interleave both sides on the
  time axis per key, then each left row reads the latest right row from a
  running ``last(..., ignorenulls)`` window. ONE shuffle on the key, no
  inequality join, no per-key skew beyond the key's own row count.
* ``range_join`` is band-bucketing: rows within ``max_gap`` of each other
  must land in the same or adjacent ``max_gap``-wide bucket, so one side is
  replicated ×3 into (b-1, b, b+1) and the match becomes an equi-join on
  the bucket id plus a residual filter — never a full inequality join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_us: str,
    right_us: str,
    right_cols: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """For every left row, attach ``right_cols`` from the latest right row
    of the same key with ``right_us <= left_us`` (backward as-of, inclusive;
    nulls when no right row precedes). Equal timestamps on the right are
    broken by the greatest ``tiebreak`` value, so the match is deterministic.

    ``left_us`` / ``right_us`` are epoch-microsecond bigint columns (use
    exact integers, not timestamps, so ordering semantics are engine-free).
    """
    on = list(on)
    lpay = [c for c in left.columns if c not in on and c != left_us]
    packed = F.struct(*[F.col(c) for c in right_cols]).alias("_r")

    l2 = left.select(
        *on,
        F.col(left_us).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_tb"),
        *lpay,
        F.lit(None)
        .cast(right.select(packed).schema["_r"].dataType)
        .alias("_r"),
    )
    r2 = right.select(
        *on,
        F.col(right_us).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.col(tiebreak).cast("long").alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        packed,
    )

    # rights sort before lefts at equal _ts (inclusive <=); among equal-ts
    # rights the greatest tiebreak is last, i.e. wins the running last()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_left"), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = l2.unionByName(r2).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("_is_left") == 1).select(
        *on,
        F.col("_ts").alias(left_us),
        *lpay,
        *[F.col("_m")[c].alias(c) for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_us: str,
    right_us: str,
    max_gap_us: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """All (left, right) row pairs with ``|left_us - right_us| <=
    max_gap_us`` (and equal ``on`` keys, if given). Column names of the two
    inputs must not collide apart from ``on``.

    The right side is replicated into its own bucket and both neighbors, so
    a pair within the gap always shares a bucket with the left row and the
    match is an equi-join on (keys, bucket) + a cheap residual filter. Work
    scales with rows-per-bucket (density × gap), never |L|×|R|.
    """
    on = list(on)
    band = lambda c: F.floor(F.col(c) / F.lit(max_gap_us))  # noqa: E731
    l2 = left.withColumn("_band", band(left_us))
    r2 = right.withColumn(
        "_band", F.explode(F.array(band(right_us) - 1, band(right_us), band(right_us) + 1))
    )
    joined = l2.join(r2, on=on + ["_band"]).filter(
        F.abs(F.col(left_us) - F.col(right_us)) <= max_gap_us
    )
    return joined.drop("_band")
