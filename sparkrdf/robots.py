"""robots.txt parsing and URL admission — crawl politeness as a dataset op.

A crawl-scale pipeline must re-check robots rules long after fetch time
(takedown compliance, corpus re-filtering), which makes robots evaluation a
DATASET operator, not a crawler detail. Semantics follow RFC 9309 (the
Googlebot rules): rule lines belong to the most recent ``User-agent``
group above them; matching is by path PREFIX; among all matching rules the
LONGEST prefix wins, with ``Allow`` beating ``Disallow`` on equal length;
a URL with no matching rule is allowed; an empty ``Disallow:`` matches
nothing.

Both stages are whole-stage-codegen DataFrame programs:

* :func:`parse_robots` — ``(host, body)`` → one row per rule
  ``(host, agent, allow, prefix)``: split lines, carry the governing
  user-agent forward with a ``last(ignorenulls)`` window ordered by line
  position (partitioned by host — robots bodies are tiny and the window
  never crosses hosts).
* :func:`filter_allowed` — URLs joined to their host's rules for the
  requested agent (plus ``*``), prefix-matched with ``startswith``,
  decided by ONE row_number window keyed on the url with the spec's
  (longest, allow-first) order. The rules table is dimension-sized
  (hosts × few rules) — AQE broadcasts it; the URL stream shuffles once
  on the window key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOST_RE = r"^https?://([^/]+)"


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``(host, body)`` → ``(host, agent, allow boolean, prefix)`` rules."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        # strip comments + whitespace
        F.trim(F.regexp_replace(F.col("line"), r"#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.regexp_extract(F.col("line"), r"(?i)^user-agent:\s*(\S+)", 1).alias("ua"),
        F.regexp_extract(F.col("line"), r"(?i)^(allow|disallow):\s*(\S*)", 1).alias(
            "verb"
        ),
        F.regexp_extract(F.col("line"), r"(?i)^(allow|disallow):\s*(\S*)", 2).alias(
            "prefix"
        ),
    )
    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.withColumn(
        "agent",
        F.last(F.when(F.col("ua") != "", F.col("ua")), ignorenulls=True).over(w),
    )
    return (
        grouped.filter((F.col("verb") != "") & F.col("agent").isNotNull())
        # RFC 9309: an empty Disallow/Allow value matches nothing — drop it
        .filter(F.col("prefix") != "")
        .select(
            "host",
            F.lower(F.col("agent")).alias("agent"),
            (F.lower(F.col("verb")) == "allow").alias("allow"),
            "prefix",
        )
    )


def filter_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Annotate every URL with its robots verdict: ``(url, allowed)``.

    Longest-prefix-match per RFC 9309; ``Allow`` wins length ties; no
    matching rule → allowed.
    """
    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
        F.regexp_replace(F.col(url_col), HOST_RE, "").alias("path"),
    )
    r = rules.filter(F.col("agent").isin([agent.lower(), "*"]))
    joined = u.join(r, "host", "left").withColumn(
        "hit",
        F.col("prefix").isNotNull() & F.col("path").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("url").orderBy(
        F.col("hit").desc(),
        F.length("prefix").desc(),
        F.col("allow").desc(),  # Allow beats Disallow on equal length
    )
    best = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "url",
            F.when(F.col("hit"), F.col("allow")).otherwise(F.lit(True)).alias(
                "allowed"
            ),
        )
    )
    return best
