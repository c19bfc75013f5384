"""Structured-Streaming ingestion tests: file-source micro-batches through
the extraction pipeline into merged graph tables; windowed crawl metrics."""

import os

from sparkrdf.pages import synthesize_pages
from sparkrdf.streaming import crawl_metrics, stream_pages_to_graph


def test_stream_pages_to_graph(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    base = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")

    # two micro-batch files with an overlapping page (idempotent merge)
    synthesize_pages(spark, 30).write.parquet(landing + "/b1")
    all_files = spark.read.parquet(landing + "/b1")
    schema = all_files.schema

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "4").parquet(landing + "/b1")
    )
    q = stream_pages_to_graph(
        spark, stream, base, name="S", transform="rpt", checkpoint_dir=ckpt, trigger_once=True
    )
    q.awaitTermination(300)

    v = spark.read.parquet(base + "/vertices")
    e = spark.read.parquet(base + "/edges")
    n_v1, n_e1 = v.count(), e.count()
    assert n_v1 > 0 and n_e1 > 0

    # replay the same data (new checkpoint) → identical tables (idempotence)
    q2 = stream_pages_to_graph(
        spark,
        spark.readStream.schema(schema).parquet(landing + "/b1"),
        base,
        name="S",
        transform="rpt",
        checkpoint_dir=str(tmp_path / "ckpt2"),
        trigger_once=True,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(base + "/vertices").count() == n_v1
    assert spark.read.parquet(base + "/edges").count() == n_e1


def test_crawl_metrics_windowing(spark, tmp_path):
    """Event-time windows + watermark over a bounded stream."""
    src = str(tmp_path / "m")
    synthesize_pages(spark, 200).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = crawl_metrics(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("crawlmetrics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from crawlmetrics").collect()
    # append mode emits only watermark-closed windows; with a bounded source
    # the final watermark closes all but the newest window(s)
    assert {"window_start", "lang", "n_pages", "avg_text_len"} == set(
        spark.table("crawlmetrics").columns
    )
    assert sum(r["n_pages"] for r in rows) <= 200
