"""Structured-Streaming ingestion tests: file-source micro-batches through
the extraction pipeline into merged graph tables; windowed crawl metrics."""

import os

import pytest

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

def test_stream_dedup_first_seen(spark, tmp_path):
    """Cross-batch stateful dedup (applyInPandasWithState): fp state survives
    micro-batch boundaries within a run AND a query restart from checkpoint
    (foreachBatch sink — the memory sink cannot recover a checkpoint)."""
    from sparkrdf.streaming import stream_dedup_first_seen

    src = tmp_path / "docs_in"
    src.mkdir()
    out_dir = str(tmp_path / "out")
    # batch 1: fps a (doc 1), b (docs 2+3 — in-batch dup);
    # batch 2: dup of a (doc 9), new c (doc 10)
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)], "fp string, doc_id long"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("a", 9), ("c", 10)], "fp string, doc_id long"
    ).coalesce(1).write.parquet(str(src / "f2"))

    import pyspark.sql.functions as F

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    def run_query():
        stream = (
            spark.readStream.schema("fp string, doc_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            stream_dedup_first_seen(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_query()
    got = {
        (r["fp"], r["batch_id"]): r for r in spark.read.parquet(out_dir).collect()
    }
    # in-batch dup resolved (b count 1, min doc wins); cross-batch state:
    # a's first_doc_id stays 1 in batch 2, dup count incremented
    assert got[("a", 0)]["first_doc_id"] == 1 and got[("a", 0)]["n_dups_so_far"] == 0
    assert got[("b", 0)]["first_doc_id"] == 2 and got[("b", 0)]["n_dups_so_far"] == 1
    assert got[("a", 1)]["first_doc_id"] == 1 and got[("a", 1)]["n_dups_so_far"] == 1
    assert got[("c", 1)]["first_doc_id"] == 10 and got[("c", 1)]["n_dups_so_far"] == 0

    # restart from checkpoint: a third file arrives; restored state must
    # remember b's origin and prior count
    spark.createDataFrame(
        [("b", 20)], "fp string, doc_id long"
    ).coalesce(1).write.parquet(str(src / "f3"))
    run_query()
    rows = [
        r
        for r in spark.read.parquet(out_dir).collect()
        if r["fp"] == "b" and r["batch_id"] >= 2
    ]
    assert len(rows) == 1
    assert rows[0]["first_doc_id"] == 2 and rows[0]["n_dups_so_far"] == 2


def test_stream_bucketed_sink(spark, tmp_path):
    """End-to-end stream through the parquet-bucketed sink: incremental
    batches merge by key into the _kb-partitioned table, a replay of the
    same data is idempotent, and the result matches the staging-swap sink's
    (same pages, same keys → identical vertex/edge sets)."""
    import pyspark.sql.functions as F

    from sparkrdf.io import KEY_BUCKET_COL

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    base_b = str(tmp_path / "graph-bucketed")
    base_s = str(tmp_path / "graph-swap")
    synthesize_pages(spark, 30).write.parquet(landing + "/b1")
    schema = spark.read.parquet(landing + "/b1").schema

    def run(base, sink, ckpt):
        q = stream_pages_to_graph(
            spark,
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "4")
            .parquet(landing + "/b1"),
            base,
            name="B",
            checkpoint_dir=str(tmp_path / ckpt),
            trigger_once=True,
            merge_sink=sink,
        )
        q.awaitTermination(300)

    run(base_b, "parquet-bucketed", "ckpt-b1")
    v = spark.read.parquet(base_b + "/vertices")
    assert KEY_BUCKET_COL in v.columns  # partitioned layout materialized
    keys_b = {
        (r["collection"], r["_key"])
        for r in v.select("collection", "_key").collect()
    }
    n_e = spark.read.parquet(base_b + "/edges").count()
    assert keys_b and n_e > 0

    # replay (fresh checkpoint) → identical tables (idempotent re-merge)
    run(base_b, "parquet-bucketed", "ckpt-b2")
    assert {
        (r["collection"], r["_key"])
        for r in spark.read.parquet(base_b + "/vertices")
        .select("collection", "_key")
        .collect()
    } == keys_b
    assert spark.read.parquet(base_b + "/edges").count() == n_e

    # cross-sink equivalence: staging-swap over the same pages lands the
    # same key sets (the sinks differ in write strategy, not contents)
    run(base_s, "parquet-swap", "ckpt-s1")
    assert {
        (r["collection"], r["_key"])
        for r in spark.read.parquet(base_s + "/vertices")
        .select("collection", "_key")
        .collect()
    } == keys_b
    assert spark.read.parquet(base_s + "/edges").count() == n_e


def test_sink_selection(spark):
    """select_sink: auto defaults to the O(touched-buckets) bucketed merge
    without a MERGE-capable catalog (the O(table)-per-batch swap is opt-in
    only); 'table' without one is a hard error, not silent data loss."""
    import pytest

    from sparkrdf.streaming import select_sink

    assert select_sink(spark, "auto") == "parquet-bucketed"
    assert select_sink(spark, "parquet-swap") == "parquet-swap"
    assert select_sink(spark, "parquet-bucketed") == "parquet-bucketed"
    with pytest.raises(ValueError, match="Iceberg or Delta"):
        select_sink(spark, "table")
    with pytest.raises(ValueError, match="unknown merge_sink"):
        select_sink(spark, "bogus")


def test_bucketed_micro_batch_rewrites_only_touched_buckets(spark, tmp_path):
    """A micro-batch through the bucketed sink rewrites ONLY the buckets its
    keys hash into: untouched bucket directories keep their files byte-for-
    byte (mtimes and names unchanged), touched ones are replaced."""
    import os as _os

    import pyspark.sql.functions as F

    from sparkrdf.io import KEY_BUCKET_COL, key_bucket, merge_into_bucketed

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(f"C", f"k{i}", f"v{i}") for i in range(64)],
        "collection string, _key string, val string",
    )
    merge_into_bucketed(spark, path, base, n_buckets=8)

    def bucket_files():
        out = {}
        for d in _os.listdir(path):
            if not d.startswith(KEY_BUCKET_COL + "="):
                continue
            b = int(d.split("=")[1])
            full = _os.path.join(path, d)
            out[b] = {
                f: _os.path.getmtime(_os.path.join(full, f))
                for f in _os.listdir(full)
                if f.endswith(".parquet")
            }
        return out

    before = bucket_files()
    batch = spark.createDataFrame(
        [("C", "k3", "v3b"), ("C", "k17", "v17b")],
        "collection string, _key string, val string",
    )
    expected = {
        r[0]
        for r in batch.withColumn("_b", key_bucket(8)).select("_b").collect()
    }
    touched = set(merge_into_bucketed(spark, path, batch, n_buckets=8))
    assert touched == expected
    after = bucket_files()
    for b in before:
        if b in touched:
            continue
        assert after[b] == before[b], f"untouched bucket {b} was rewritten"
    # and the merge itself upserted the new values
    got = {
        r["_key"]: r["val"]
        for r in spark.read.parquet(path).select("_key", "val").collect()
    }
    assert got["k3"] == "v3b" and got["k17"] == "v17b" and got["k5"] == "v5"


def test_stream_recovers_from_crashed_swap(spark, tmp_path):
    """Crash window between rename(table→backup) and rename(staging→table):
    the table path is gone but a .replaced-N backup survives. The next batch
    must restore the backup before merging — without that, the replayed
    batch silently replaces the whole accumulated table."""
    import os

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    base = str(tmp_path / "graph")
    synthesize_pages(spark, 40).write.parquet(landing + "/b1")
    schema = spark.read.parquet(landing + "/b1").schema

    q = stream_pages_to_graph(
        spark,
        spark.readStream.schema(schema).parquet(landing + "/b1"),
        base,
        name="CR",
        checkpoint_dir=str(tmp_path / "ckpt1"),
        trigger_once=True,
        merge_sink="parquet-swap",  # the recovery path under test
    )
    q.awaitTermination(300)
    n_v = spark.read.parquet(base + "/vertices").count()
    n_e = spark.read.parquet(base + "/edges").count()

    # simulate the mid-swap crash: vertices dir renamed to backup, no table
    os.rename(base + "/vertices", base + "/vertices.replaced-7")

    # a later batch with a strict subset of the pages (rows 0-9 of the same
    # synthesis → same keys, no new ones) replays; if recovery failed, the
    # vertices table would shrink to just this batch's keys
    synthesize_pages(spark, 10).write.parquet(landing + "/b2")
    q2 = stream_pages_to_graph(
        spark,
        spark.readStream.schema(schema).parquet(landing + "/b2"),
        base,
        name="CR",
        checkpoint_dir=str(tmp_path / "ckpt2"),
        trigger_once=True,
        merge_sink="parquet-swap",  # the recovery path under test
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(base + "/vertices").count() == n_v
    assert spark.read.parquet(base + "/edges").count() == n_e


def test_stream_dedup_string_doc_ids(spark, tmp_path):
    """String doc ids (the pages pipeline's natural key — urls) flow through
    the stateful dedup; min is lexicographic."""
    import pyspark.sql.functions as F

    from sparkrdf.streaming import stream_dedup_first_seen

    src = tmp_path / "sdocs"
    src.mkdir()
    out_dir = str(tmp_path / "sout")
    spark.createDataFrame(
        [("a", "https://x.org/p2"), ("a", "https://x.org/p10")],
        "fp string, doc_id string",
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("a", "https://x.org/p1")], "fp string, doc_id string"
    ).coalesce(1).write.parquet(str(src / "f2"))

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    stream = (
        spark.readStream.schema("fp string, doc_id string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        stream_dedup_first_seen(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["fp"], r["batch_id"]): r for r in spark.read.parquet(out_dir).collect()
    }
    # lexicographic min within batch 1: p10 < p2
    assert got[("a", 0)]["first_doc_id"] == "https://x.org/p10"
    assert got[("a", 0)]["n_dups_so_far"] == 1
    # state pins the first batch's winner; later lexicographically-smaller
    # ids do NOT retroactively change it (first-seen semantics)
    assert got[("a", 1)]["first_doc_id"] == "https://x.org/p10"
    assert got[("a", 1)]["n_dups_so_far"] == 2


def test_merge_sql_engine_parsed_and_identifier_quoting(spark):
    """The 'table' sink's generated statements must be valid Spark SQL: no
    Iceberg/Delta jar exists in this sandbox to EXECUTE a MERGE, so the
    statements are validated by the engine's own parser, and the execution
    failure mode against the built-in catalog is pinned to the documented
    UNSUPPORTED_FEATURE error (i.e. the statement reaches the catalog layer
    intact — a MERGE-capable catalog only changes where it runs)."""
    from sparkrdf.streaming import merge_bootstrap_sql, merge_sql, merge_table_name

    tbl = merge_table_name("cat.ns.CC", "vertices")
    assert tbl == "`cat`.`ns`.`CC_vertices`"
    with pytest.raises(ValueError, match="invalid table identifier"):
        merge_table_name("x; DROP TABLE y", "vertices")
    with pytest.raises(ValueError, match="invalid table identifier"):
        merge_table_name("a.b-c", "edges")

    parser = spark._jsparkSession.sessionState().sqlParser()
    for sql in (merge_bootstrap_sql(tbl, "batch_v"), merge_sql(tbl, "batch_v")):
        plan = parser.parsePlan(sql)  # raises ParseException on invalid SQL
        assert plan is not None

    # execution probe: bootstrap works on the built-in catalog; MERGE is
    # rejected with exactly the unsupported-table-operation error (not a
    # parse/analysis error about the statement itself)
    spark.sql("DROP TABLE IF EXISTS merge_probe_tgt")
    spark.createDataFrame(
        [("c", "k1", 1)], "collection string, _key string, v int"
    ).createOrReplaceTempView("merge_probe_src")
    spark.sql(merge_bootstrap_sql("merge_probe_tgt", "merge_probe_src"))
    assert spark.table("merge_probe_tgt").count() == 0
    with pytest.raises(Exception, match="UNSUPPORTED_FEATURE|does not support MERGE"):
        spark.sql(merge_sql("merge_probe_tgt", "merge_probe_src"))
    spark.sql("DROP TABLE IF EXISTS merge_probe_tgt")


def test_stream_rdf_documents_to_statements(spark, tmp_path):
    """Crawl batches of RDF documents landing as parquet stream through
    the distributed readers unchanged — rdfxml_statements / jsonld
    jsonld_statements are plain mapInPandas projections, so the SAME
    operator runs batch and streaming (the kg-construction loop closes:
    readStream → parse → statements → merge sink), and a malformed
    document in the stream yields its error row instead of killing the
    query."""
    from sparkrdf.jsonldoc import jsonld_statements
    from sparkrdf.rdfxml import rdfxml_statements

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    xml = (f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="http://e.org/">'
           f'<ex:T rdf:about="#i"><ex:v>1</ex:v></ex:T></rdf:RDF>')
    src = str(tmp_path / "landing")
    spark.createDataFrame(
        [("http://h/a", xml), ("http://h/bad", "<broken")],
        "url string, xml string",
    ).write.parquet(src)

    stream = spark.readStream.schema("url string, xml string").parquet(src)
    q = (
        rdfxml_statements(stream)
        .writeStream.format("memory")
        .queryName("rdfxml_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from rdfxml_stream").collect()
    assert {r.url for r in rows} == {"http://h/a", "http://h/bad"}
    assert any(r.p.endswith("parseError") for r in rows)
    assert any(r.s == "http://h/a#i" for r in rows)

    jsrc = str(tmp_path / "jl")
    spark.createDataFrame(
        [("http://h/j", '{"@id": "#x", "http://p/v": 7}')],
        "url string, json string",
    ).write.parquet(jsrc)
    q2 = (
        jsonld_statements(
            spark.readStream.schema("url string, json string").parquet(jsrc)
        )
        .writeStream.format("memory")
        .queryName("jsonld_stream")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("select * from jsonld_stream").collect()
    assert len(rows) == 1 and rows[0].s == "http://h/j#x"
