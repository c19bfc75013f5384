"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "e2e_sec", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "pages": N, "triples": N, "triples_per_sec": N, "cpus": N}

The flagship measurement is the Common-Crawl-style pipeline: synthesize the
pages table (distributed, deterministic), extract triples, materialize the
RPT edge table — reported as triples/sec. Plus the training-data operators
(minhash dedup, ANN top-k, text stats) over the driver testdata tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = max(1000, int(1_000_000 * sf))

    from sparkrdf.session import get_spark

    spark = get_spark("sparkrdf-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from sparkrdf.extract.pipeline import extract_triples
    from sparkrdf.pages import synthesize_pages
    from sparkrdf.rpt import rpt_transform

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # 1. flagship: pages -> triples -> RPT edges
    pages = synthesize_pages(spark, n_pages).persist()
    timed("pages_synthesize", lambda: pages.count())
    stmts = extract_triples(spark, pages).persist()
    n_triples = timed("kg_extract_triples", lambda: stmts.count())
    rpt = rpt_transform(stmts, "Bench")
    timed("kg_rpt_edges", lambda: rpt["edges"].count())
    timed("kg_rpt_vertices", lambda: rpt["vertices"].count())
    stmts.unpersist()
    pages.unpersist()

    # 2. training-data operators over testdata
    qs = entrymod.queries()
    for name in (
        "dedup_exact",
        "dedup_minhash_pairs",
        "dedup_clusters",
        "dedup_simhash",
        "text_stats",
        "text_hash_split",
        "text_pack_bins",
        "sim_topk",
        "sim_lsh_topk",
        "sim_blocked_near_dup",
        "rel_pricing_summary",
    ):
        # time construction + execution: builders may materialize
        # intermediates (e.g. the LSH band table), which must be on the clock
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    kg_sec = timings["kg_extract_triples"] + timings["kg_rpt_edges"] + timings["kg_rpt_vertices"]
    extras["triples_per_sec"] = round(n_triples / kg_sec, 1) if kg_sec else 0.0

    print(
        json.dumps(
            {
                "metric": "e2e_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "pages": n_pages,
                "triples": n_triples,
                "triples_per_sec": extras["triples_per_sec"],
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
