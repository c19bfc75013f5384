"""Batched mention detection (dictionary NER).

One compiled alternation regex over the full dictionary (longest surface
first, word-boundary anchored), applied per Arrow batch in ``mapInPandas``.
Output: one row per (id, surface, count, first_off). No per-row Python UDFs
— the regex runs vectorized over each batch; the dictionary is baked into the
closure (equivalently a broadcast: it ships once per executor).

The dictionary is pluggable (``dictionary=`` + ``id_col``/``text_col``) so
the same operator serves both the gazetteer pipeline over pages and
arbitrary phrase dictionaries over the ``documents`` table; the default is
the extraction gazetteer. Longest-first alternation gives leftmost-longest
overlap resolution ("Alan Turing" beats "Turing") — identical semantics to
RE2's leftmost-first scan with the same alternation order, which is what
makes the operator oracle-checkable with DuckDB ``regexp_extract_all``.
"""

from __future__ import annotations

import re
from typing import Sequence

from sparkrdf.extract.gazetteer import surfaces


def mention_pattern(dictionary: Sequence[str] | None = None) -> str:
    """The alternation source string, deterministically ordered by
    (-len, lexicographic) so Python re and RE2 (DuckDB) compile the same
    preference order. Equal-length distinct literals can never compete at
    one position, so the lexicographic tie-break is purely for determinism
    of the pattern text itself.

    Word boundaries are the EXPLICIT class ``[0-9A-Za-z_]``, not ``\\w``:
    Python re's ``\\w`` is Unicode-aware while Java regex (Spark's
    ``regexp_extract_all``) and RE2 (DuckDB) default to ASCII — the explicit
    class makes all three engines match identically by construction instead
    of by corpus accident, which is what lets the same pattern serve the
    pandas operator, the JVM operator, and the SQL oracle."""
    alts = sorted(set(dictionary if dictionary is not None else surfaces()),
                  key=lambda s: (-len(s), s))
    w = "[0-9A-Za-z_]"
    # First-char gate: backtracking engines (java.util.regex, Python re) try
    # every alternation branch at every position; a lookahead over the set of
    # possible first characters rejects most positions after ONE class test
    # instead of |dictionary| literal attempts. Pure pruning — any match must
    # start with one of these characters, so the match set is unchanged
    # (pinned by test_extract's jvm-vs-pandas cross-check).
    gate = "".join(sorted({re.escape(s[0]) for s in alts if s}))
    return (
        f"(?<!{w})(?=[{gate}])("
        + "|".join(re.escape(s) for s in alts)
        + f")(?!{w})"
    )


def mention_pattern_re2(dictionary: Sequence[str] | None = None) -> str:
    """RE2-compatible form of :func:`mention_pattern` for the DuckDB oracle:
    RE2 has no lookarounds, but ``\\b`` is the ASCII word boundary —
    exactly the explicit ``[0-9A-Za-z_]`` class the lookarounds assert —
    provided every surface starts and ends with a word character (true of
    the gazetteer; enforced here)."""
    alts = sorted(set(dictionary if dictionary is not None else surfaces()),
                  key=lambda s: (-len(s), s))
    for s in alts:
        if not (re.match(r"[0-9A-Za-z_]", s) and re.search(r"[0-9A-Za-z_]$", s)):
            raise ValueError(
                f"surface {s!r} not word-char bounded; \\b rewrite invalid"
            )
    return r"\b(" + "|".join(re.escape(s) for s in alts) + r")\b"


def detect_mention_surfaces_jvm(df, dictionary: Sequence[str] | None = None,
                                id_col: str = "url", text_col: str = "text"):
    """Shuffle-free variant of :func:`detect_mentions_jvm` for consumers
    that need only the DISTINCT (id, surface) set (the flagship pipeline —
    it never reads the count): per-row ``array_distinct`` over the match
    array replaces the (id, surface)-keyed aggregate, so mention detection
    is a pure map stage — no exchange at all. Identical (id, surface) row
    set when ``id_col`` values are unique (one row per id), which is the
    pages contract."""
    from pyspark.sql import functions as F

    src = mention_pattern(dictionary)
    return df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.col(text_col), F.lit(src), 1)
            )
        ).alias("surface"),
    )


def detect_mentions_jvm(df, dictionary: Sequence[str] | None = None,
                        id_col: str = "url", text_col: str = "text"):
    """All-JVM variant of :func:`detect_mentions`: (id, surface, n) without
    match offsets, via ``regexp_extract_all`` inside whole-stage codegen —
    the text never crosses the Python boundary. Match set is identical to
    the pandas operator (same pattern string, same leftmost-longest
    alternation semantics in Java regex as in Python re and RE2); the
    flagship pipeline uses this because it never consumes offsets. The
    explode feeds a map-side-partial count keyed by (id, surface), so only
    narrow match rows shuffle, never text."""
    from pyspark.sql import functions as F

    src = mention_pattern(dictionary)
    matches = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(src), 1)).alias(
            "surface"
        ),
    )
    return matches.groupBy(id_col, "surface").agg(
        F.count(F.lit(1)).cast("int").alias("n")
    )


def detect_mentions(df, dictionary: Sequence[str] | None = None,
                    id_col: str = "url", text_col: str = "text"):
    """df(id_col, text_col, ...) → mentions(id_col, surface, n, first_off)."""
    import pandas as pd

    src = mention_pattern(dictionary)
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, surface string, n int, first_off int"

    def run(batches):
        pat = re.compile(src)
        for pdf in batches:
            out = []
            for key, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    continue
                found: dict[str, list[int]] = {}
                for m in pat.finditer(text):
                    found.setdefault(m.group(1), []).append(m.start())
                for surface, offs in found.items():
                    out.append((key, surface, len(offs), offs[0]))
            yield pd.DataFrame(out, columns=[id_col, "surface", "n", "first_off"])

    return df.select(id_col, text_col).mapInPandas(run, schema)
