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


def ngram_topk(
    docs: "DataFrame",
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> "DataFrame":
    """Corpus-level top-k word n-grams → (ngram, n) with a deterministic
    (count desc, ngram asc) tie-break.

    Scale shape: the per-document gram expansion is one codegen'd
    transform + explode (no Python); the count is a hash aggregate with
    map-side partial combine, so the exchange carries one row per DISTINCT
    gram per partition, and the final top-k is a TakeOrdered (no global
    sort materialization). All occurrences count (unlike the dedup
    shingles, which are per-document distinct)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    t = F.trim(F.lower(F.col(text_col)))
    words = F.split(t, r"\s+")
    grams = F.when(
        (t != "") & (F.size(words) >= n),
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    )
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram").asc())
        .limit(k)
    )


def token_histogram(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Token-length distribution in power-of-two buckets →
    (bucket, lo_tokens, n_docs). Bucket = floor(log2(tokens + 1)) — one
    projection + a tiny hash aggregate (bounded bucket count), the scalable
    form of a length histogram (exact percentiles at 100 TB would sort;
    the histogram answers the same pipeline questions — truncation budgets,
    outlier tails — with a constant-size result)."""
    toks = token_count(F.col(text_col)).cast("double")
    bucket = F.floor(F.log2(toks + F.lit(1.0))).cast("long")
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            "bucket",
            (F.pow(F.lit(2.0), F.col("bucket")) - 1).cast("long").alias("lo_tokens"),
            "n_docs",
        )
    )


def hash_split(
    docs: "DataFrame",
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    buckets: int = 10_000,
) -> "DataFrame":
    """Deterministic train/val/test assignment: adds a ``split`` column.

    The split is a pure function of the row id — ``h64(id) mod buckets``
    against cumulative fraction thresholds — so it is reproducible across
    runs, engines and partitionings (unlike ``randomSplit``/``sampleBy``,
    which depend on partition layout), holds per-row when new data arrives
    (a doc keeps its split forever — no train/test leakage on re-runs), and
    needs no shuffle: one codegen'd projection.
    """
    from sparkrdf.dedupe import h64

    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1.0")
    bucket = F.pmod(h64(F.col(id_col).cast("string")), F.lit(buckets))
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # guard against float rounding leaving the last bucket unlabeled
    expr = expr.otherwise(F.lit(list(fractions)[-1]))
    return docs.withColumn("split", expr)


def pack_documents(
    docs: "DataFrame",
    budget_tokens: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Sequence packing for LLM pretraining: concat-then-chunk assignment of
    documents to fixed token-budget bins →
    (doc_id, n_tokens, shard, bin_id, offset_in_bin).

    Documents are deterministically sharded (``h64(id) mod n_shards``), then
    packed within each shard in id order: a running token sum assigns each
    doc the bin ``floor(cum_before / budget)`` and offset
    ``cum_before mod budget`` — the layout of a writer that concatenates
    docs in order and cuts every ``budget_tokens``. The window partitions by
    shard, so no global single-partition sort exists; shard count scales
    with the cluster (at 100 TB, thousands of shards → thousands of
    independent packing streams, exactly how multi-writer packed-example
    generation shards in practice).
    """
    from pyspark.sql import Window

    from sparkrdf.dedupe import h64

    toks = token_count(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        F.pmod(h64(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "shard",
        F.floor(cum_before / budget_tokens).cast("long").alias("bin_id"),
        F.pmod(cum_before, F.lit(budget_tokens)).cast("long").alias("offset_in_bin"),
    )
