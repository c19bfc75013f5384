"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Catalyst column expressions (whole-stage codegen, no
Python in the hot path) and are deliberately specified so a DuckDB oracle can
reproduce them bit-for-bit (the driver's correctness gate):

- token_count     — whitespace tokenization
- bpe_ish_count   — regex token count (word pieces + punctuation)
- quality_score   — length/punctuation/stopword-ratio heuristic, rounded
- lang_id         — stopword-hit n-gram heuristic with fixed tie-break
- fingerprint     — md5 of whitespace-normalized lowercase text
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed stopword lists (tiny, deterministic)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "with"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "mit"],
    "fr": ["le", "la", "les", "des", "avec"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}
LANG_ORDER = ["de", "en", "es", "fr", "zh"]  # tie-break: lexicographic

BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count (empty/null-safe)."""
    t = F.trim(text)
    return F.when(F.coalesce(t, F.lit("")) == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_count(text: Column) -> Column:
    """Count of BPE-ish tokens: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Number of stopwords (from the fixed list) present as whole words."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hit = None
    for w in words:
        h = F.when(padded.contains(f" {w} "), 1).otherwise(0)
        hit = h if hit is None else hit + h
    return hit


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0, 100]:
    40*min(1, tokens/50) + 30*(1 - punct_ratio) + 30*min(1, stop_hits/3)
    rounded to 2 decimals. (The exact formula is arbitrary; what matters is
    that it is reproducible in ANSI SQL for the oracle.)"""
    toks = token_count(text).cast("double")
    n_chars = F.length(text).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    ).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stops = stopword_hits(text, LANG_STOPWORDS["en"]).cast("double")
    score = (
        40.0 * F.least(F.lit(1.0), toks / 50.0)
        + 30.0 * (F.lit(1.0) - punct_ratio)
        + 30.0 * F.least(F.lit(1.0), stops / 3.0)
    )
    return F.round(score, 2)


def lang_id(text: Column) -> Column:
    """Argmax of stopword hits across languages; ties broken by LANG_ORDER
    (lexicographic-first); zero hits everywhere → 'und' (undetermined).

    Implemented as array_max over (score, -order_rank, lang) structs —
    fieldwise struct comparison gives the argmax with the exact tie-break,
    all inside codegen."""
    entries = F.array(
        *[
            F.struct(
                stopword_hits(text, LANG_STOPWORDS[lang]).alias("s"),
                F.lit(-idx).alias("r"),
                F.lit(lang).alias("l"),
            )
            for idx, lang in enumerate(LANG_ORDER)
        ]
    )
    best = F.array_max(entries)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercase, whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))
