"""URL canonicalization for web-corpus pipelines.

The first dedup key of any Common-Crawl-style corpus is the canonical URL:
crawls re-fetch the same page under scheme/case/port/fragment/tracking-param
variations, and collapsing those BEFORE content dedup removes the bulk of
exact duplicates with a pure projection (no shuffle, no content hashing).

:func:`canonicalize_url` is a single codegen column expression implementing
the standard normalization steps (RFC 3986 syntax-based normalization plus
the conventional tracking-parameter strip):

1. drop the fragment (``#…`` never reaches the server);
2. lowercase the scheme and host (case-insensitive per RFC 3986 §6.2.2.1);
3. strip the default port (``:80`` for http, ``:443`` for https) and a
   leading ``www.`` label;
4. collapse trailing slashes on the path; empty path → ``/``;
5. drop ``utm_*`` tracking parameters, sort the survivors byte-wise
   (query-parameter order is almost never semantic).

Every step is expressed with operations that Spark SQL (Java regex) and
DuckDB (RE2) evaluate identically — anchored regexps with explicit classes,
list filter/sort — so the operator is verifiable by the ANSI-SQL oracle.

Scale shape: a projection fused into the scan; the follow-on dedup is a
hash aggregate on ``canon_url`` with map-side partials. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, SCHEME_RE, 1))
    after = F.regexp_replace(no_frag, SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    host = F.when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(host, r"^www\.", "")
    raw_path = F.regexp_extract(after, r"^[^/?]*([^?]*)", 1)
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & (F.substring(p, 1, 4) != "utm_"),
    )
    qstr = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", F.array_sort(params)))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qstr)


def url_canon(pages: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Per-row canonicalization → (id, url, canon_url)."""
    return pages.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    )


def url_dedup_groups(pages: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Canonical-URL duplicate groups → (canon_url, n_docs, keep_id) for
    groups of size > 1; ``keep_id`` = smallest id (deterministic survivor).
    One hash aggregate on the canonical key."""
    return (
        url_canon(pages, url_col=url_col, id_col=id_col)
        .groupBy("canon_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def frontier_waves(
    urls: DataFrame,
    per_wave: int = 4,
    url_col: str = "url",
) -> DataFrame:
    """Politeness scheduling for a crawl frontier: assign every URL a
    per-host fetch ``wave`` so no host receives more than ``per_wave``
    requests per wave — the dataset-side half of crawl rate-limiting
    (the fetcher then maps one wave to one politeness interval).
    Returns ``(url, host, seq, wave)`` with ``seq`` the URL's
    deterministic 0-based arrival index within its host (ordered by url)
    and ``wave = seq // per_wave``.

    Scale shape: the per-host sequence is computed WITHOUT a per-host
    window (a hot host with 10^8 frontier URLs would otherwise become
    one task's sort): range-partition on (host, url), per-partition
    row_number keyed on the physical partition id, broadcast
    cumulative-offset, then ``seq = global_rank − min(global_rank) per
    host`` — rows of one host are contiguous in (host, url) order, so
    the difference IS the per-host index; the min is a partial-aggregated
    groupBy (the er.py sorted_neighborhood / graphops neighbor-index
    pattern)."""
    if per_wave < 1:
        raise ValueError("per_wave must be >= 1")
    # host is built over the POST-alias "url" column: referencing url_col
    # here would raise an unresolved-column error for any non-default
    # url_col (the column is renamed before withColumn runs)
    host = F.regexp_extract(
        F.col("url"), r"(?i)^[a-z][a-z0-9+.\-]*://([^/]+)", 1
    )
    from sparkrdf.er import global_rank

    d = (
        urls.select(F.col(url_col).alias("url"))
        .dropDuplicates()
        .withColumn("host", F.lower(host))
        .filter(F.col("host") != "")
    )
    ranked = global_rank(d, ["host", "url"])
    return (
        ranked.join(ranked.groupBy("host").agg(F.min("_gr").alias("_h0")), "host")
        .select(
            "url",
            "host",
            (F.col("_gr") - F.col("_h0")).cast("long").alias("seq"),
            ((F.col("_gr") - F.col("_h0")) / per_wave).cast("long").alias("wave"),
        )
    )
