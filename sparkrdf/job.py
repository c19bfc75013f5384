"""spark-submit entrypoint: the production launch shape of the north rule.

    spark-submit --py-files sparkrdf.zip [--jars farmhash.jar] \\
        path/to/job.py --synthesize 100000 --ckpt /data/ckpt --out /data/kg

or, with the package importable, ``python -m sparkrdf.job ...``. The job:

1. loads the pages table (``--pages`` parquet dir) or deterministically
   synthesizes one (``--synthesize N`` — tests/benches; no external data);
2. runs the checkpoint-resumable extraction pipeline
   (:func:`sparkrdf.resume.run_extract_job`: pages → statements → RPT
   vertex/edge tables, each stage a committed parquet checkpoint), so
   re-launching after a crash with the same ``--ckpt`` resumes at the first
   unfinished stage;
3. materializes the graph to ``--out`` via :func:`sparkrdf.io.write_graph`
   (partitioned tables + edge-definition manifest + lineage);
4. prints ONE machine-readable summary line ``JOB_RESULT {...}`` with
   per-stage status (computed|resumed) and triple-count metrics.

Session config comes from :func:`sparkrdf.session.get_spark` when the script
runs standalone (AQE + skew-join splitting, Arrow batching, shuffle
partitions sized to cores); under spark-submit the existing session/conf is
respected (getOrCreate) so cluster operators keep control. When the farmhash
jar was not shipped via ``--jars``, hashing degrades to the in-package
Arrow-batched Python implementation automatically (sparkrdf.hashing).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="sparkrdf.job",
        description="pages -> statements -> RPT graph, checkpoint-resumable",
    )
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet dir with url/warc_ts/html/text/lang")
    src.add_argument(
        "--synthesize", type=int, metavar="N",
        help="deterministically synthesize N pages instead of reading --pages",
    )
    ap.add_argument("--ckpt", required=True, help="checkpoint/resume directory")
    ap.add_argument("--out", required=True, help="output graph directory")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--name", default="kg", help="graph name (vertex/edge prefix)")
    ap.add_argument(
        "--master", default=None,
        help="only honored when no session exists (standalone python runs)",
    )
    return ap


def run(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)

    import os

    if os.environ.get("PYSPARK_GATEWAY_PORT"):
        # launched by spark-submit: the JVM gateway (and all submit-line
        # conf: --master, --py-files, --jars, executor sizing) already
        # exists — respect it instead of re-deciding config driver-side
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("sparkrdf-job").getOrCreate()
    else:
        from sparkrdf.session import get_spark

        spark = get_spark("sparkrdf-job", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        from sparkrdf.pages import synthesize_pages

        pages = synthesize_pages(spark, args.synthesize)

    from sparkrdf.io import write_graph
    from sparkrdf.resume import run_extract_job

    tables, metrics = run_extract_job(
        spark, pages, args.ckpt, run_id=args.run_id, name=args.name
    )
    manifest = write_graph(
        {
            "vertices": tables["vertices"],
            "edges": tables["edges"],
            "edge_definitions": tables["edge_definitions"],
        },
        args.out,
        run_id=args.run_id,
        name=args.name,
    )

    by_stage = {m["stage"]: m for m in metrics}
    summary = {
        "run_id": args.run_id,
        "triples": by_stage["statements"]["rows"],
        "vertices": manifest["vertices_rows"],
        "edges": manifest["edges_rows"],
        "stages": {m["stage"]: m["status"] for m in metrics},
    }
    print("JOB_RESULT " + json.dumps(summary, sort_keys=True))
    return summary


if __name__ == "__main__":
    run(sys.argv[1:])
