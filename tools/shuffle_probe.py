"""Shuffle-byte breakdown of the flagship job (pages → extract → RPT).

Runs the pipeline with the Spark UI enabled and dumps per-stage
shuffle-write/read bytes from the REST API — the evidence base for
shuffle-narrowing work (BENCH.md). Usage: python tools/shuffle_probe.py
[n_pages].
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from sparkrdf.session import get_spark

    spark = get_spark(
        "shuffle-probe",
        master="local[32]",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sparkrdf.extract.pipeline import extract_triples
    from sparkrdf.pages import synthesize_pages
    from sparkrdf.rpt import rpt_transform

    pages = synthesize_pages(spark, n_pages).persist()
    pages.count()
    stmts = extract_triples(spark, pages).persist()
    print("triples:", stmts.count())
    rpt = rpt_transform(stmts, "Bench")
    print("edges:", rpt["edges"].count())
    print("vertices:", rpt["vertices"].count())

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4049/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    rows = [
        {
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:70],
            "write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "run_s": round(s.get("executorRunTime", 0) / 1e3, 1),
        }
        for s in stages
    ]
    rows.sort(key=lambda r: -(r["write_mb"] + r["read_mb"]))
    total_w = sum(r["write_mb"] for r in rows)
    print(f"\ntotal shuffle write: {total_w:.1f} MB")
    for r in rows[:20]:
        print(
            f"stage {r['stage']:>4}  w={r['write_mb']:>8} MB  r={r['read_mb']:>8} MB  "
            f"cpu={r['cpu_s']:>7}s  run={r['run_s']:>7}s  {r['name']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
