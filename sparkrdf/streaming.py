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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def stream_pages_to_graph(
    spark,
    pages_stream: DataFrame,
    base_dir: str,
    name: str = "CC",
    transform: str = "rpt",
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
):
    """Wire a streaming pages DataFrame into incremental graph materialization.

    Returns the StreamingQuery. Each micro-batch:
      pages → extract_triples → rpt/pgt → merge_by_key into parquet tables.
    """
    from sparkrdf.extract.pipeline import extract_triples
    from sparkrdf.io import merge_by_key, write_table
    from sparkrdf.pgt import pgt_transform
    from sparkrdf.rpt import rpt_transform

    v_path = os.path.join(base_dir, "vertices")
    e_path = os.path.join(base_dir, "edges")

    def _fs(path_str: str):
        """Hadoop FileSystem handle — works on HDFS/S3A/local alike, unlike
        os.path (driver-local only)."""
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path_str)
        return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        stmts = extract_triples(spark, batch_df).localCheckpoint(eager=True)
        graph = (
            rpt_transform(stmts, name) if transform == "rpt" else pgt_transform(stmts, name)
        )
        for key, path in (("vertices", v_path), ("edges", e_path)):
            # Merge into a STAGING path first, then swap: the current table
            # stays intact for the whole (re)computation, so a lost executor
            # mid-write can never recompute against a half-overwritten input.
            # (A true MERGE INTO sink — Iceberg/Delta — replaces this whole
            # dance when a catalog is configured; this is the plain-parquet
            # sandbox equivalent, O(table) per batch by construction.)
            fs, hpath, jvm = _fs(path)
            new = graph[key].localCheckpoint(eager=True)
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
                fs.rename(hpath, hbackup)
            fs.rename(hstaging, hpath)
            if fs.exists(hbackup):
                fs.delete(hbackup, True)

    writer = pages_stream.writeStream.foreachBatch(process_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
