"""robots.txt parsing and URL admission — crawl politeness as a dataset op.

A crawl-scale pipeline must re-check robots rules long after fetch time
(takedown compliance, corpus re-filtering), which makes robots evaluation a
DATASET operator, not a crawler detail. Semantics follow RFC 9309:

* rule lines belong to the group opened by the run of consecutive
  ``User-agent`` lines above them — a group may name SEVERAL agents, and
  its rules apply to each of them;
* a crawler obeys the most specific matching group only: if a group names
  the crawler's token, the ``*`` group is IGNORED; ``*`` applies only when
  no named group matches;
* rule values are matched against the URL path with ``*`` as any-sequence
  wildcard and a trailing ``$`` as an end-of-path anchor; all other
  characters (including interior ``$``) are literal;
* among all matching rules the LONGEST rule value wins, with ``Allow``
  beating ``Disallow`` on equal length; a URL with no matching rule is
  allowed; an empty ``Disallow:`` matches nothing.

Both stages are whole-stage-codegen DataFrame programs:

* :func:`parse_robots` — ``(host, body)`` → one row per (agent, rule) pair
  ``(host, agent, allow, prefix)``: lines are grouped by a running
  group-id (a ``User-agent`` line whose predecessor is not one opens a new
  group), agent names and rules of the same group are joined, so
  ``User-agent: a`` / ``User-agent: b`` / ``Disallow: /x`` yields the rule
  under BOTH agents. Windows are per host — robots bodies are tiny and the
  window never crosses hosts.
* :func:`filter_allowed` — per host, the agent's own group is selected if
  it exists, else the ``*`` group (RFC group-selection); URLs join their
  host's effective rules, rule values are compiled to anchored regexes
  (``*`` → ``.*``, trailing ``$`` → anchor, everything else escaped) and
  matched with ``regexp_like``, decided by ONE row_number window keyed on
  the url with the spec's (longest, allow-first) order. The rules table is
  dimension-sized (hosts × few rules) — AQE broadcasts it; the URL stream
  shuffles once on the window key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOST_RE = r"^https?://([^/]+)"


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``(host, body)`` → ``(host, agent, allow boolean, prefix)`` rules.

    One output row per (agent, rule) pair: a group opened by several
    consecutive ``User-agent`` lines repeats its rules under each agent.
    Rules that precede any ``User-agent`` line belong to no group and are
    dropped (RFC 9309 §2.2.1).
    """
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
    ).filter((F.col("ua") != "") | (F.col("verb") != ""))
    # group id: a User-agent line whose predecessor (among relevant lines)
    # is NOT a User-agent line opens a new group — so a run of consecutive
    # User-agent lines shares one id with the rules below it
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("ua") != ""
    grouped = parsed.withColumn(
        "gid",
        F.sum(
            (is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))).cast("int")
        ).over(w),
    )
    agents = grouped.filter(is_ua).select(
        "host", "gid", F.lower(F.col("ua")).alias("agent")
    )
    rules = (
        grouped.filter(F.col("verb") != "")
        # RFC 9309: an empty Disallow/Allow value matches nothing — drop it
        .filter(F.col("prefix") != "")
        .select(
            "host",
            "gid",
            (F.lower(F.col("verb")) == "allow").alias("allow"),
            "prefix",
        )
    )
    # inner join: rules before the first User-agent line have no agents row
    return rules.join(agents, ["host", "gid"]).select(
        "host", "agent", "allow", "prefix"
    )


def _rule_regex(prefix):
    """Compile an RFC 9309 rule value to an anchored Java regex (column).

    ``*`` matches any character sequence; a TRAILING ``$`` anchors the end
    of the path; every other character — including interior ``$`` — is
    literal and gets escaped.
    """
    anchored = prefix.endswith("$")
    body = F.when(
        anchored, F.substring(prefix, F.lit(1), F.length(prefix) - 1)
    ).otherwise(prefix)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", "\\\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), esc, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def filter_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Annotate every URL with its robots verdict: ``(url, allowed)``.

    RFC 9309 group selection (the agent's own group shadows ``*`` on hosts
    that name the agent), wildcard-aware longest-match (``*``/``$`` in rule
    values), ``Allow`` wins length ties; no matching rule → allowed.
    Agent-token matching is exact (case-insensitive) — the common
    product-token case; substring token matching is not modeled.
    """
    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
        F.regexp_replace(F.col(url_col), HOST_RE, "").alias("path"),
    )
    # RFC group selection: on hosts where the specific agent has a group,
    # ONLY that group applies; '*' is the fallback for the other hosts
    specific = rules.filter(F.col("agent") == agent.lower())
    star = rules.filter(F.col("agent") == "*")
    if agent.lower() == "*":
        effective = star
    else:
        effective = specific.unionByName(
            star.join(specific.select("host").distinct(), "host", "left_anti")
        )
    joined = u.join(effective, "host", "left").withColumn(
        "hit",
        F.col("prefix").isNotNull()
        & F.coalesce(
            F.regexp_like(F.col("path"), _rule_regex(F.col("prefix"))),
            F.lit(False),
        ),
    )
    w = Window.partitionBy("url").orderBy(
        F.col("hit").desc(),
        F.length("prefix").desc(),  # longest rule value wins
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


def crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """``(host, body)`` → ``(host, delay)``: the effective ``Crawl-delay``
    (seconds) for ``agent`` — the de-facto extension most crawlers honor,
    and the per-host rate input :func:`sparkrdf.weburl.frontier_waves`
    schedules against. RFC 9309 group selection applies (the agent's own
    group shadows ``*``); several delay lines in the selected group keep
    the MAX (conservative politeness); non-numeric values drop; hosts
    whose selected group has no delay line are absent (caller defaults).
    Codegen line parsing, dimension-sized output — same scale contract
    as :func:`parse_robots`.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("line"), r"#.*$", "")).alias("line"),
    )
    # Allow/Disallow lines are kept (as group members) even though they
    # carry no delay: dropping them would make two ADJACENT User-agent
    # runs separated only by rules merge into one group, attributing one
    # agent's delay to the other (same reason parse_robots keeps them)
    parsed = lines.select(
        "host",
        "pos",
        F.regexp_extract(F.col("line"), r"(?i)^user-agent:\s*(\S+)", 1).alias("ua"),
        F.regexp_extract(
            F.col("line"), r"(?i)^crawl-delay:\s*([0-9]+(?:\.[0-9]+)?)\s*$", 1
        ).alias("delay"),
        F.regexp_extract(
            F.col("line"), r"(?i)^(allow|disallow):", 1
        ).alias("verb"),
    ).filter(
        (F.col("ua") != "") | (F.col("delay") != "") | (F.col("verb") != "")
    )
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("ua") != ""
    grouped = parsed.withColumn(
        "gid",
        F.sum(
            (is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))).cast("int")
        ).over(w),
    )
    agents = grouped.filter(is_ua).select(
        "host", "gid", F.lower(F.col("ua")).alias("agent")
    )
    delays = (
        grouped.filter(F.col("delay") != "")
        .select("host", "gid", F.col("delay").cast("double").alias("delay"))
        .join(agents, ["host", "gid"])
    )
    specific = delays.filter(F.col("agent") == agent.lower())
    star = delays.filter(F.col("agent") == "*")
    if agent.lower() == "*":
        effective = star
    else:
        # shadowing keys on GROUP existence, not delay presence: a host
        # where the agent HAS a group (even one without a delay line)
        # never falls back to the '*' group's delay
        agent_hosts = (
            agents.filter(F.col("agent") == agent.lower())
            .select("host")
            .distinct()
        )
        effective = specific.unionByName(
            star.join(agent_hosts, "host", "left_anti")
        )
    return effective.groupBy("host").agg(F.max("delay").alias("delay"))
