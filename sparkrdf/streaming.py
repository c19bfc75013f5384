"""Structured-Streaming ingestion: a stream of pages → incremental graph.

The reference is strictly batch (SURVEY.md §2.8) — this is the engine's
scale-path addition: continuous crawling feeds micro-batches through the SAME
extraction + RPT/PGT transforms, committed idempotently.

Design:
- ``stream_pages_to_graph`` wires any streaming pages source (file source
  over a landing directory, Kafka, rate-source for tests) into
  ``foreachBatch``: each micro-batch runs extract→transform and merges into
  the graph tables by ``(collection, _key)`` (sparkrdf.io.merge_by_key — the
  deterministic keys make replays idempotent, which is exactly the
  exactly-once story Structured Streaming needs from its sink);
- checkpointing is Spark's own (``checkpointLocation``), resume = restart
  with the same checkpoint dir;
- late data needs no watermark for the graph itself (keys are deterministic,
  merges are idempotent); windowed crawl metrics use event-time windows on
  ``warc_ts`` with a configurable watermark.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def merge_table_name(prefix: str, key: str) -> str:
    """Validated, backtick-quoted target-table identifier for MERGE INTO.

    ``prefix`` may be dotted (``catalog.schema.name``); every part must be a
    plain SQL identifier — anything else raises rather than being
    interpolated into the SQL string (the prefix comes from user config)."""
    parts = f"{prefix}_{key}".split(".")
    for p in parts:
        if not _IDENT_RE.match(p):
            raise ValueError(
                f"invalid table identifier part {p!r} in {prefix!r} "
                "(allowed: letters, digits, underscore; no leading digit)"
            )
    return ".".join(f"`{p}`" for p in parts)


def merge_bootstrap_sql(tbl: str, view: str) -> str:
    """CREATE TABLE IF NOT EXISTS from the batch view's schema (empty) —
    MERGE INTO requires an existing target, so the first micro-batch against
    a fresh catalog bootstraps it."""
    return f"CREATE TABLE IF NOT EXISTS {tbl} AS SELECT * FROM {view} WHERE 1 = 0"


def merge_sql(tbl: str, view: str) -> str:
    """The row-level upsert statement the 'table' sink runs per micro-batch.
    Engine-parser-validated in tests (tests/test_streaming.py): this sandbox
    has no Iceberg/Delta jar to EXECUTE it against — Spark's built-in
    catalog rejects MERGE with UNSUPPORTED_FEATURE.TABLE_OPERATION — but the
    statement itself is proven valid Spark SQL, so a MERGE-capable catalog
    only changes where it runs, not what is sent."""
    return (
        f"MERGE INTO {tbl} t USING {view} s "
        "ON t.collection = s.collection AND t._key = s._key "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def crawl_metrics(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Windowed crawl metrics with late-data handling: pages and mean text
    length per (1-hour event-time window, lang)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.avg(F.length("text")).alias("avg_text_len"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "lang",
            "n_pages",
            F.round("avg_text_len", 2).alias("avg_text_len"),
        )
    )


def select_sink(spark, merge_sink: str = "auto") -> str:
    """Pick the micro-batch sink strategy.

    - ``"table"``: real ``MERGE INTO`` against a catalog table — requires an
      Iceberg/Delta SQL extension in the session (the scale path: the merge
      is row-level, not O(table) per batch).
    - ``"parquet-bucketed"``: key-bucketed parquet with dynamic partition
      overwrite — only the buckets a batch touches are rewritten,
      O(touched buckets) per batch (sparkrdf.io.merge_into_bucketed);
      replay-idempotent but not strictly atomic across buckets.
    - ``"parquet-swap"``: plain-parquet staging-swap (strictly atomic
      sandbox fallback, O(table) per batch by construction).
    - ``"auto"``: ``"table"`` when a MERGE-capable extension is configured,
      else ``"parquet-bucketed"`` — the O(touched-buckets) default; the
      O(table)-per-batch swap is opt-in only (its strict cross-bucket
      atomicity is the one reason to pick it).
    """
    if merge_sink not in ("auto", "table", "parquet-bucketed", "parquet-swap"):
        raise ValueError(f"unknown merge_sink {merge_sink!r}")
    exts = ""
    try:
        exts = spark.conf.get("spark.sql.extensions") or ""
    except Exception:
        pass
    merge_capable = "Iceberg" in exts or "Delta" in exts
    if merge_sink == "table" and not merge_capable:
        raise ValueError(
            "merge_sink='table' requires an Iceberg or Delta SQL extension "
            "(spark.sql.extensions); configure a catalog or use 'parquet-swap'"
        )
    if merge_sink == "auto":
        return "table" if merge_capable else "parquet-bucketed"
    return merge_sink


def stream_pages_to_graph(
    spark,
    pages_stream: DataFrame,
    base_dir: str,
    name: str = "CC",
    transform: str = "rpt",
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    merge_sink: str = "auto",
    table_prefix: str | None = None,
):
    """Wire a streaming pages DataFrame into incremental graph materialization.

    Returns the StreamingQuery. Each micro-batch:
      pages → extract_triples → rpt/pgt → merge into the graph tables,
    via ``MERGE INTO`` on ``{table_prefix}_vertices/_edges`` when a
    MERGE-capable catalog is configured (see :func:`select_sink`), else the
    crash-safe parquet staging-swap under ``base_dir``.
    """
    from sparkrdf.extract.pipeline import extract_triples
    from sparkrdf.io import merge_by_key, write_table
    from sparkrdf.pgt import pgt_transform
    from sparkrdf.rpt import rpt_transform

    sink = select_sink(spark, merge_sink)
    v_path = os.path.join(base_dir, "vertices")
    e_path = os.path.join(base_dir, "edges")

    def _fs(path_str: str):
        """Hadoop FileSystem handle — works on HDFS/S3A/local alike, unlike
        os.path (driver-local only)."""
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path_str)
        return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm

    def _rename(fs, src, dst):
        # HDFS-style FileSystems report failure by RETURNING false, not
        # raising — an unchecked rename here is silent data loss.
        if not fs.rename(src, dst):
            raise IOError(f"fs.rename({src}, {dst}) failed")

    def _restore_backup_if_crashed(path: str):
        """Crash recovery: if a previous run died between rename(path→backup)
        and rename(staging→path), the table path is missing but a
        ``.replaced-N`` backup survives — rename the newest one back before
        merging, otherwise the replayed batch would silently REPLACE the
        whole accumulated table (merged = new)."""
        fs, hpath, _ = _fs(path)
        if fs.exists(hpath):
            return
        parent, base = hpath.getParent(), hpath.getName()
        if parent is None or not fs.exists(parent):
            return
        backups = [
            st.getPath()
            for st in fs.listStatus(parent)
            if st.getPath().getName().startswith(base + ".replaced-")
        ]
        if backups:
            newest = max(
                backups, key=lambda p: int(p.getName().rsplit("-", 1)[1])
            )
            _rename(fs, newest, hpath)

    def _merge_into_table(new: DataFrame, key: str):
        tbl = merge_table_name(table_prefix or name, key)
        view = f"_sparkrdf_batch_{key}"
        new.createOrReplaceTempView(view)
        spark.sql(merge_bootstrap_sql(tbl, view))
        spark.sql(merge_sql(tbl, view))

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        # foreachBatch hands a CLONED session: session-scoped UDFs (the JVM
        # farmhash) registered on the main session don't exist there, so the
        # batch plan would fail analysis with UNRESOLVED_ROUTINE
        from sparkrdf.hashing import ensure_jvm_hash

        ensure_jvm_hash(batch_df.sparkSession)
        stmts = extract_triples(spark, batch_df).localCheckpoint(eager=True)
        # context-manage the transform output: each call pins a cached
        # keyed-statement block set, and a long-running stream would
        # accumulate them without bound if never released
        with (
            rpt_transform(stmts, name) if transform == "rpt" else pgt_transform(stmts, name)
        ) as graph:
            for key, path in (("vertices", v_path), ("edges", e_path)):
                new = graph[key].localCheckpoint(eager=True)
                _sink_one(new, key, path, batch_id)

    def _sink_one(new: DataFrame, key: str, path: str, batch_id: int):
        if sink == "table":
            _merge_into_table(new, key)
            return
        if sink == "parquet-bucketed":
            from sparkrdf.io import merge_into_bucketed

            merge_into_bucketed(spark, path, new)
            return
        # Merge into a STAGING path first, then swap: the current table
        # stays intact for the whole (re)computation, so a lost executor
        # mid-write can never recompute against a half-overwritten input.
        # (MERGE INTO — sink == "table" — replaces this whole dance when
        # a catalog is configured; this is the plain-parquet sandbox
        # equivalent, O(table) per batch by construction.)
        _restore_backup_if_crashed(path)
        fs, hpath, jvm = _fs(path)
        if fs.exists(hpath):
            old = spark.read.parquet(path)
            merged = merge_by_key(old, new)
        else:
            merged = new
        staging = f"{path}.staging-{batch_id}"
        write_table(merged, staging)
        backup = f"{path}.replaced-{batch_id}"
        _, hstaging, _ = _fs(staging)
        _, hbackup, _ = _fs(backup)
        if fs.exists(hbackup):
            fs.delete(hbackup, True)
        if fs.exists(hpath):
            _rename(fs, hpath, hbackup)
        _rename(fs, hstaging, hpath)
        if fs.exists(hbackup):
            fs.delete(hbackup, True)

    writer = pages_stream.writeStream.foreachBatch(process_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_first_seen(docs_stream: DataFrame, fp_col: str = "fp"):
    """Cross-batch streaming exact-dedup: emit each fingerprint's row only the
    FIRST time it is ever seen, keeping per-fingerprint state across
    micro-batches (``applyInPandasWithState`` — the custom-stateful-operator
    scale path; ``foreachBatch`` + merge cannot answer "is this new?" without
    re-reading the sink).

    Input: a streaming DataFrame with at least (``fp_col``, doc_id).
    Output stream: (fp, first_doc_id, n_dups_so_far) — one UPDATE row per
    fingerprint per micro-batch in which it appears; ``first_doc_id`` is
    pinned by the first batch that saw the fingerprint (ties within that
    batch broken by min doc_id, so replays are deterministic).

    State per fingerprint: (first_doc_id, n_seen). Keyed by the content
    fingerprint, state is hash-partitioned across executors exactly like a
    batch groupBy — no skew beyond the dedup key's own distribution, and the
    state store scales horizontally with executor count.

    ``doc_id`` may be any orderable type — integral ids keep numeric min,
    string ids (e.g. the pages pipeline's urls) resolve ties by
    lexicographic min; the output/state schemas follow the input's type.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    id_type = dict(docs_stream.dtypes)["doc_id"]
    # numpy scalars don't round-trip through the state store encoder —
    # coerce to the matching Python scalar
    conv = str if id_type in ("string", "varchar") else int

    def fn(key, pdfs, state: GroupState):
        n_new = 0
        first_id = None
        for pdf in pdfs:
            n_new += len(pdf)
            batch_min = conv(pdf["doc_id"].min())
            first_id = batch_min if first_id is None else min(first_id, batch_min)
        if state.exists:
            prev_first, prev_n = state.get
            state.update((conv(prev_first), int(prev_n + n_new)))
            yield pd.DataFrame(
                {"fp": [key[0]], "first_doc_id": [conv(prev_first)],
                 "n_dups_so_far": [int(prev_n + n_new - 1)]}
            )
        else:
            state.update((conv(first_id), int(n_new)))
            yield pd.DataFrame(
                {"fp": [key[0]], "first_doc_id": [conv(first_id)],
                 "n_dups_so_far": [int(n_new - 1)]}
            )

    return (
        docs_stream.select(F.col(fp_col).alias("fp"), "doc_id")
        .groupBy("fp")
        .applyInPandasWithState(
            fn,
            outputStructType=f"fp string, first_doc_id {id_type}, n_dups_so_far long",
            stateStructType=f"first_doc_id {id_type}, n_seen long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
