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

from pyspark.sql import Column, Window
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


def quality_flags(
    t: Column,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_word_len: float = 2.0,
    max_word_len: float = 12.0,
    max_punct_ratio: float = 0.3,
) -> dict[str, Column]:
    """The Gopher-rule failure flags as pure column expressions over a text
    column — shared by :func:`quality_filter` (reporting form) and
    :func:`sparkrdf.curate.curate_corpus` (inline predicate form)."""
    toks = token_count(t).cast("double")
    n_chars = F.length(t).cast("double")
    n_space = n_chars - F.length(F.regexp_replace(t, r"\s", "")).cast("double")
    word_chars = n_chars - n_space
    mean_wlen = F.when(toks > 0, word_chars / toks).otherwise(F.lit(0.0))
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast(
        "double"
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stops = stopword_hits(t, LANG_STOPWORDS["en"])
    return {
        "r_tokens": (toks < float(min_tokens)) | (toks > float(max_tokens)),
        "r_word_len": (mean_wlen < min_word_len) | (mean_wlen > max_word_len),
        "r_punct": punct_ratio > max_punct_ratio,
        "r_stop": stops == 0,
    }


def quality_filter(
    docs: "DataFrame",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_word_len: float = 2.0,
    max_word_len: float = 12.0,
    max_punct_ratio: float = 0.3,
) -> "DataFrame":
    """Gopher/C4-style document quality filter → per-doc keep decision with
    per-rule flags and a composite ``reasons`` string.

    Rules (each a pure codegen column expression, mirroring the published
    Gopher heuristics at whole-stage-codegen cost — no Python, no shuffle):

    - ``bad_token_count``: whitespace tokens outside [min_tokens, max_tokens]
    - ``word_len``:        mean word length outside [min_word_len, max_word_len]
    - ``high_punct``:      punctuation chars / total chars > max_punct_ratio
    - ``no_stopwords``:    zero hits from the fixed English stopword list

    Output: (doc_id, keep, r_tokens, r_word_len, r_punct, r_stop, reasons).
    At 100 TB this is one projection over the scan — the filter never
    shuffles, and downstream stages consume ``keep`` as a pushed-down
    predicate. Reproducible in ANSI SQL (DuckDB oracle): every signal uses
    integer counts and single-division ratios so the float comparisons are
    bit-identical across engines.
    """
    flags = quality_flags(
        F.col(text_col),
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        min_word_len=min_word_len,
        max_word_len=max_word_len,
        max_punct_ratio=max_punct_ratio,
    )
    r_tokens = flags["r_tokens"]
    r_word_len = flags["r_word_len"]
    r_punct = flags["r_punct"]
    r_stop = flags["r_stop"]
    reasons = F.concat_ws(
        ",",
        F.when(r_tokens, F.lit("bad_token_count")),
        F.when(r_word_len, F.lit("word_len")),
        F.when(r_punct, F.lit("high_punct")),
        F.when(r_stop, F.lit("no_stopwords")),
    )
    return docs.select(
        "doc_id",
        (~(r_tokens | r_word_len | r_punct | r_stop)).alias("keep"),
        r_tokens.alias("r_tokens"),
        r_word_len.alias("r_word_len"),
        r_punct.alias("r_punct"),
        r_stop.alias("r_stop"),
        reasons.alias("reasons"),
    )


def repetition_stats(
    docs: "DataFrame", id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """Within-document repetition signals (the Gopher repetition filters) →
    (doc_id, top_bigram_frac, dup_trigram_frac), fractions rounded to 6.

    - ``top_bigram_frac``:  occurrences of the most frequent word bigram /
      total bigram occurrences (boilerplate detector);
    - ``dup_trigram_frac``: fraction of trigram occurrences whose trigram
      appears more than once in the document (looped/templated text).

    Scale shape: ONE scan — bigram and trigram streams are tagged structs in
    a single codegen transform + explode (not two gram pipelines over two
    rescans), so the whole operator is one (doc_id, n, gram) hash aggregate
    feeding one conditional per-doc aggregate plus a left join back for the
    zero-fill — uniform keys (a doc's grams meet only at the final per-doc
    reduce, whose cardinality is #docs, not #grams), map-side partial
    combine throughout. Docs with fewer than n tokens get fraction 0.0 by
    definition.
    """
    t = F.trim(F.lower(F.col(text_col)))
    words = F.split(t, r"\s+")

    def grams(n):
        return F.when(
            (t != "") & (F.size(words) >= n),
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(" ", F.slice(words, i + 1, n)).alias("g"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))

    c = F.col("c")
    n = F.col("n")
    per_doc = (
        docs.select(F.col(id_col), F.explode(F.concat(grams(2), grams(3))).alias("t"))
        .groupBy(id_col, "t.n", "t.g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.round(
                F.max(F.when(n == 2, c)).cast("double") / F.sum(F.when(n == 2, c)),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                F.sum(F.when((n == 3) & (c > 1), c).otherwise(F.lit(0))).cast(
                    "double"
                )
                / F.sum(F.when(n == 3, c)),
                6,
            ).alias("dup_trigram_frac"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_trigram_frac", F.lit(0.0)).alias("dup_trigram_frac"),
        )
    )


#: PII patterns — deliberately restricted to syntax that Java regex (Spark),
#: Python re, and RE2 (DuckDB) all interpret identically: explicit classes,
#: ASCII \\b word boundaries, bounded repetition. No lookarounds.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"


def pii_scrub_col(t: Column) -> Column:
    """The scrub expression alone (emails → ``<EMAIL>``, IPv4 → ``<IP>``,
    phone fragments → ``<PHONE>``) for inline composition."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_IPV4_RE, "<IP>"
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )


def pii_scrub(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    """PII redaction for training corpora → (doc_id, scrubbed, n_email,
    n_ipv4, n_phone). Emails → ``<EMAIL>``, IPv4 → ``<IP>``, US-style
    7-digit phone fragments → ``<PHONE>``; counts are matched occurrences
    in the ORIGINAL text (before any replacement, so categories never
    double-count each other's replacements).

    One projection, all regexps inside whole-stage codegen — the standard
    shape for scrubbing at 100 TB is exactly this: a map-only pass fused
    into the scan with zero shuffle. Patterns are engine-portable by
    construction (see PII_*_RE), which is what lets the DuckDB oracle verify
    the scrub byte-for-byte.
    """
    t = F.col(text_col)
    scrubbed = pii_scrub_col(t)
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
        .cast("long")
        .alias("n_email"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RE), 0))
        .cast("long")
        .alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0))
        .cast("long")
        .alias("n_phone"),
    )


def corpus_profile(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Per-(lang, source) corpus statistics → (lang, source, n_docs,
    n_unique, total_tokens, avg_chars). ``n_unique`` counts distinct
    normalized fingerprints (exact — the honest pre-dedup statistic);
    ``avg_chars`` divides two exact integer sums so the double result is
    bit-identical across engines.

    Scale shape: one hash aggregate keyed on the (tiny) (lang, source)
    grid with map-side partials; distinct-count shuffles (key, fp) pairs.
    At 100 TB swap ``countDistinct`` for ``approx_count_distinct`` (HLL,
    constant memory) — kept exact here because exactness is what the
    correctness gate can verify.
    """
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct(fingerprint(F.col(text_col)))
            .cast("long")
            .alias("n_unique"),
            F.sum(token_count(F.col(text_col))).cast("long").alias("total_tokens"),
            F.round(
                F.sum(F.length(F.col(text_col))).cast("double") / F.count("*"), 2
            ).alias("avg_chars"),
        )
    )


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


def decontaminate(
    docs: "DataFrame",
    benchmark: "DataFrame",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> "DataFrame":
    """Benchmark decontamination: per-document n-gram overlap with a held-out
    evaluation set (the GPT-3-style "13-gram" contamination check; here the
    gram width is a parameter so tests can use short synthetic docs).

    Returns one row per corpus document that shares at least one distinct
    word ``n``-gram with ANY benchmark document:
    ``(id_col, n_grams, n_overlap, overlap_frac)`` where ``n_grams`` is the
    document's distinct-gram count and ``overlap_frac = n_overlap / n_grams``
    (rounded to 6 places). Callers drop or flag rows above a threshold.

    Scale shape (the part that matters at 100 TB): the benchmark gram set is
    built once, deduplicated, and **broadcast** — eval suites are KB-to-MB
    scale while the corpus is the 100 TB side, so the corpus scan never
    shuffles for the join (map-side broadcast hash join). The only exchange
    is the per-doc hit aggregation, which carries *hits only* (grams that
    matched a benchmark gram) — for a clean corpus that is ~0 rows. All gram
    construction is Catalyst expressions (split/transform/slice), no Python.
    """
    from sparkrdf.dedupe import word_shingles

    bench_text = bench_text_col or text_col
    bench_grams = (
        # explode_outer for the same reason as the corpus side below; the
        # possible null gram row matches nothing in the inner join
        benchmark.select(
            F.explode_outer(word_shingles(F.col(bench_text), n)).alias("gram")
        )
        .distinct()
    )
    # explode_outer, not explode: the non-outer Generate makes Catalyst infer
    # a `size(grams) > 0` filter and push it below the upstream exchange,
    # re-evaluating the whole shingle expression once in the pushed Filter
    # and again in the post-exchange Project (2x the dominant per-row cost,
    # seen in the physical plan). The outer variant skips the inference; its
    # only semantic difference — a null gram row for empty/null gram arrays —
    # is dropped by the inner join on `gram` below, so the result is
    # identical row-for-row.
    grams = docs.select(
        F.col(id_col),
        word_shingles(F.col(text_col), n).alias("grams"),
    ).select(
        id_col,
        F.size("grams").cast("long").alias("n_grams"),
        F.explode_outer("grams").alias("gram"),
    )
    hits = (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count("*").alias("n_overlap"))
    )
    return hits.select(
        id_col,
        "n_grams",
        F.col("n_overlap").cast("long").alias("n_overlap"),
        F.round(F.col("n_overlap") / F.col("n_grams"), 6).alias("overlap_frac"),
    )


def weighted_sample(
    docs: "DataFrame",
    rates: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    buckets: int = 1_000_000,
    seed: str = "ws",
) -> "DataFrame":
    """Deterministic per-domain downsampling — the domain-mixing primitive of
    a pretraining pipeline ("keep 100% of wiki, 25% of web, 10% of crawl").

    A row is kept iff ``h64(seed || ':' || id) mod buckets < rate(domain) *
    buckets``.  Because the decision is a pure function of (seed, row id), it
    is reproducible across runs, engines and partitionings, stable under
    re-runs over grown inputs (a kept doc stays kept), and composable with
    :func:`hash_split` (different seed ⇒ independent hash bits, so sampling
    does not bias the train/val/test assignment).

    Scale shape: one codegen'd projection + filter — **zero shuffles**, no
    per-domain pass over the data (a rate map over D domains compiles to one
    CASE expression evaluated in a single scan), and the filter sits directly
    above the parquet scan so column pruning/pushdown survive.
    """
    from sparkrdf.dedupe import h64

    bucket = F.pmod(
        h64(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
        F.lit(buckets),
    )
    thr = None
    for dom, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {dom!r} must be in [0, 1], got {rate}")
        t = F.lit(int(round(rate * buckets)))
        cond = F.col(domain_col) == dom
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_t = F.lit(int(round(default_rate * buckets)))
    thr = default_t if thr is None else thr.otherwise(default_t)
    return docs.filter(bucket < thr)


def tfidf_topk(
    docs: "DataFrame",
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Top-k TF-IDF terms per document → (doc_id, term, tf, score), the
    keyword/feature-extraction primitive of a corpus pipeline. Tokens are
    the same whitespace words the other textops use; idf is the smoothed
    ``ln((N+1)/(df+1)) + 1``. Scores are rounded to 6 d.p. BEFORE ranking
    so the (score desc, term asc) tie-break is engine-exact.

    Scale shape: one explode + two hash aggregates with map-side partials
    (term frequency keyed on (doc, term); document frequency keyed on
    term), then an equi-join back on the term key — the df table has one
    row per DISTINCT term, so AQE broadcasts it when the vocabulary is
    small and shuffle-joins otherwise. The per-doc top-k is a window over
    the (doc, term) table, already partitioned by the aggregate key.
    """
    t = F.trim(F.lower(F.col(text_col)))
    words = F.when(t != "", F.split(t, r"\s+")).otherwise(
        F.array().cast("array<string>")
    )
    n_docs = docs.count()
    tf = (
        docs.select(F.col(id_col), F.explode(words).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    scored = tf.join(df_tbl, "term").select(
        F.col(id_col),
        "term",
        "tf",
        F.round(F.col("tf") * idf, 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def cap_per_key(
    df: "DataFrame",
    keys: list[str],
    n: int,
    order_col: str,
) -> "DataFrame":
    """Hard per-key row cap: keep the first ``n`` rows of every key group,
    ordered by ``order_col`` — "at most N documents per (lang, source)".
    Deterministic (the order column must be unique within a key), so the
    kept set is stable across runs and engines.

    Scale shape: one shuffle on the key, then a running row_number — rank
    + filter fuse into the window operator's first pass. A Zipf-hot key
    still sorts its whole partition before cutting; at 100 TB pre-trim
    each map partition to its local top-n first (the window semantics
    admit it: any row beyond rank n within ONE partition can never enter
    the global first n) — kept single-pass here because gate scale never
    spills.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def boilerplate_scrub(
    docs: "DataFrame",
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """CCNet-style cross-corpus line-level boilerplate removal: any line
    whose normalized form (trim + lowercase) appears in >= ``min_docs``
    DISTINCT documents is dropped from every document; surviving lines are
    rejoined with ``\\n`` in original order. Returns
    (id, text, n_removed) — documents whose every line is boilerplate come
    back with empty text, not dropped rows.

    Scale shape: one posexplode, one hash aggregate keyed on the
    normalized line (count-distinct over doc ids, map-side partials), and
    a left_anti join against the common-line set. The common set is
    bounded by lines that repeat across >= min_docs documents — tiny
    relative to the corpus (it IS the boilerplate) — so AQE broadcasts it;
    no forced hint because a pathological corpus could make it large.
    Reassembly is one shuffle on the doc id with array_sort on the
    captured position (no window, no global sort).
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    ).withColumn("nline", F.trim(F.lower(F.col("line"))))
    common = (
        lines.filter(F.col("nline") != "")
        .groupBy("nline")
        .agg(F.count_distinct(F.col(id_col)).alias("line_df"))
        .filter(F.col("line_df") >= min_docs)
        .select("nline")
    )
    kept = lines.join(common, "nline", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("_text"),
        F.count("*").cast("long").alias("_kept"),
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n", -1)).cast("long").alias("_total"),
    )
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
        (F.col("_total") - F.coalesce(F.col("_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


def unigram_logprob(
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Corpus-internal unigram language-model score per document — the
    cheap stand-in for CCNet's KenLM perplexity filter: score(doc) =
    mean over token occurrences of ln(count(token)/total_tokens), where
    counts come from the corpus itself. Documents far below the corpus
    median are gibberish / OOV-dense; far above are repetitive. Returns
    (id, n_tokens, logprob) with logprob rounded to 6 d.p. (the same
    cross-engine determinism contract tfidf_topk uses); empty documents
    get (0, 0.0).

    Scale shape: one explode + one hash aggregate keyed on the term
    (map-side partials), a 1-row total broadcast-crossJoin (stays
    distributed — no driver collect), an equi-join of token occurrences
    back to the vocabulary table (AQE broadcasts the vocab when small),
    and a final per-doc aggregate on the id key.
    """
    t = F.trim(F.lower(F.col(text_col)))
    words = F.when(t != "", F.split(t, r"\s+")).otherwise(
        F.array().cast("array<string>")
    )
    toks = docs.select(F.col(id_col), F.explode(words).alias("term"))
    freq = toks.groupBy("term").agg(F.count("*").cast("double").alias("c"))
    tot = freq.agg(F.sum("c").alias("s"))
    perdoc = (
        toks.join(freq, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.avg(F.log(F.col("c") / F.col("s"))).alias("_alp"),
        )
    )
    return docs.select(F.col(id_col)).join(perdoc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_tokens"),
        F.round(F.coalesce(F.col("_alp"), F.lit(0.0)), 6).alias("logprob"),
    )


def cross_doc_dup_grams(
    docs: "DataFrame",
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Cross-document duplicate-span signal (the Lee et al. span-dedup
    metric, complementing ``repetition_stats``'s WITHIN-doc fractions):
    per document, the fraction of token n-gram occurrences whose n-gram
    also appears in >= ``min_docs`` DISTINCT documents corpus-wide →
    (id, n_grams, dup_frac). Docs with fewer than n tokens get (0, 0.0);
    dup_frac is an exact integer ratio rounded to 6 d.p. (sum/sum of
    counts — no float accumulation, engine-exact).

    Scale shape: one explode + one (doc, gram) hash aggregate (map-side
    partials collapse within-doc repeats before the exchange), then ONE
    gram-keyed window pass that counts the gram's distinct docs in place —
    no self-join, no second scan of the gram stream — and a final per-doc
    reduce whose cardinality is #docs. The gram exchange is the inherent
    cost of any cross-doc span statistic; everything else stays narrow.
    """
    if n < 1 or min_docs < 2:
        raise ValueError("need n >= 1 and min_docs >= 2")
    t = F.trim(F.lower(F.col(text_col)))
    words = F.split(t, r"\s+")
    gr = F.when(
        (t != "") & (F.size(words) >= n),
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tf = (
        docs.select(F.col(id_col), F.explode(gr).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # distinct-doc frequency via a window over the gram key: the (doc, gram)
    # table has one row per pair, so count(*) IS the distinct-doc count
    ddf = F.count("*").over(Window.partitionBy("g"))
    per = (
        tf.withColumn("ddf", ddf)
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(
                F.sum(
                    F.when(F.col("ddf") >= min_docs, F.col("c")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("c"),
                6,
            ).alias("dup_frac"),
        )
    )
    return docs.select(F.col(id_col)).join(per, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("dup_frac"), F.lit(0.0)).alias("dup_frac"),
    )
