"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE compact JSON line as the LAST line
of output (the driver tail-captures it — round 4's artifact failed to
parse because the embedded per-rep table outgrew the capture window):
  {"metric": "e2e_sec", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "pages": N, "triples": N, "triples_per_sec": N, "cpus": N,
   "clean_reps": N, "all_windows_dirty": bool}
The full per-rep table (timings + steal%) is written to the file named
by $SPARK_GRAFT_BENCH_REPS_OUT (default BENCH_local.json next to this
script), NOT embedded in the summary line.

The flagship measurement is the Common-Crawl-style pipeline: synthesize the
pages table (distributed, deterministic), extract triples, materialize the
RPT edge table — reported as triples/sec. Plus the training-data operators
(minhash dedup, ANN top-k, text stats) over the driver testdata tables.

Steal-aware methodology (round 4): this VM shows heavy CPU-steal variance —
identical runs differ 2x depending on the hypervisor window (BENCH.md;
BENCH_r03 recorded a phantom 2x extraction regression an idle re-run
disproved). So the whole suite is run SPARK_GRAFT_BENCH_REPS times (default
3); each rep records the machine-wide CPU-steal delta from /proc/stat,
normalized to the rep's wall x cpu capacity. The reported per-query numbers
are the min over CLEAN reps (steal <= SPARK_GRAFT_MAX_STEAL_PCT, default
2.0); if every window is dirty the min over all reps is used and
"all_windows_dirty": true is set so the artifact is self-describing. The
per-rep table (timings + steal%) is embedded under "reps".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OP_QUERIES = (
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "dedup_simhash",
    "text_stats",
    "text_quality_filter",
    "text_repetition",
    "text_pii_scrub",
    "web_url_dedup",
    "text_hash_split",
    "text_decontaminate",
    "text_weighted_sample",
    "text_pack_bins",
    "sim_topk",
    "sim_lsh_topk",
    "sim_blocked_near_dup",
    "rel_pricing_summary",
    "events_sessionize",
    "graph_triangles",
    "graph_pagerank",
    "graph_npmi_edges",
    "graph_kcore",
    "kg_triple_support",
    "er_fuzzy_pairs",
    "corpus_kmeans",
    "evt_error_attribution",
    "evt_nearby_pairs",
    "kg_rdfs_entailed",
    "kg_char_sets",
    "graph_lpa",
    "graph_adamic_adar",
    "kg_lp_ranks",
    "evt_funnel",
    "evt_interval_merge",
    "er_sorted_neighborhood",
    "kg_path_expr",
    "kg_owl_entailed",
    "kg_bgp_graph",
    "graph_ktruss",
    "graph_assortativity",
    "kg_table_triples",
    "kg_jsonld_triples",
    "kg_page_meta",
    "kg_describe",
    "kg_bgp_not_exists",
    "kg_bgp_agg",
    "graph_coreness",
    "sim_knn_join",
    "graph_wcc",
    "kg_warc_records",
    "kg_rdfs_delta",
    "web_robots_filter",
    "web_sitemap_urls",
    # round-5 session-2 additions (per-query timings comparable; e2e_sec
    # covers a LARGER suite than rounds <= 5a — compare per query)
    "kg_rdfxml_triples",
    "kg_jsonld_doc_triples",
    "kg_sparql_term_fns",
    "kg_skolemized",
    "graph_scc",
    "graph_nf",
    "graph_harmonic",
    "web_host_ppr",
    "web_node2vec_walks",
    "web_frontier_waves",
    "graph_betweenness",
    "graph_closeness",
    "graph_modularity",
    "evt_retention",
)


def _steal_jiffies() -> int:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])  # cpu: user nice system idle iowait irq softirq steal
    except (OSError, IndexError, ValueError):
        return 0


def run_rep(spark, entrymod, sf_dir: str, n_pages: int, cpus: int) -> dict:
    """One full pass over the suite; returns {'timings': {...},
    'triples': N, 'wall': s, 'steal_pct': %-of-pinned-capacity}."""
    from sparkrdf.extract.pipeline import extract_triples
    from sparkrdf.pages import synthesize_pages
    from sparkrdf.rpt import rpt_transform

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    s0 = _steal_jiffies()
    w0 = time.perf_counter()

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
    for name in OP_QUERIES:
        # time construction + execution: builders may materialize
        # intermediates (e.g. the LSH band table), which must be on the clock
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    wall = time.perf_counter() - w0
    steal = _steal_jiffies() - s0
    # steal jiffies are machine-wide steal-seconds x100 (USER_HZ); normalize
    # by wall x cpus so the number reads as "% of this run's capacity lost"
    steal_pct = round(100.0 * (steal / 100.0) / (max(wall, 1e-9) * cpus), 2)
    # drop transform-internal caches so the next rep measures the same work
    spark.catalog.clearCache()
    return {
        "timings": timings,
        "triples": n_triples,
        "wall": round(wall, 2),
        "steal_pct": steal_pct,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    max_steal = float(os.environ.get("SPARK_GRAFT_MAX_STEAL_PCT", "2.0"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = max(1000, int(1_000_000 * sf))

    from sparkrdf.session import get_spark

    spark = get_spark("sparkrdf-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    reps = [run_rep(spark, entrymod, sf_dir, n_pages, cpus) for _ in range(n_reps)]

    clean = [r for r in reps if r["steal_pct"] <= max_steal]
    all_dirty = not clean
    pool = clean if clean else reps
    # per-query min over the clean pool: min-over-reps is the standard noise
    # estimator and the clean filter keeps hypervisor-steal windows out of it
    timings = {
        name: min(r["timings"][name] for r in pool)
        for name in pool[0]["timings"]
    }
    n_triples = pool[0]["triples"]

    total = round(sum(timings.values()), 3)
    kg_sec = (
        timings["kg_extract_triples"]
        + timings["kg_rpt_edges"]
        + timings["kg_rpt_vertices"]
    )
    tps = round(n_triples / kg_sec, 1) if kg_sec else 0.0

    summary = {
        "metric": "e2e_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages": n_pages,
        "triples": n_triples,
        "triples_per_sec": tps,
        "cpus": cpus,
        "clean_reps": len(clean),
        "max_steal_pct": max_steal,
        "all_windows_dirty": all_dirty,
    }
    # full detail (per-rep timings + steal windows) goes to a side file so
    # the stdout summary stays small enough for the driver's tail capture
    reps_out = os.environ.get(
        "SPARK_GRAFT_BENCH_REPS_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
    )
    try:
        with open(reps_out, "w") as f:
            json.dump(
                {
                    **summary,
                    "reps": [
                        {
                            "wall": r["wall"],
                            "steal_pct": r["steal_pct"],
                            "timings": r["timings"],
                        }
                        for r in reps
                    ],
                },
                f,
                indent=1,
            )
            f.write("\n")
    except OSError as e:
        print(f"warning: could not write reps file {reps_out}: {e}", file=sys.stderr)

    spark.stop()
    # the summary line MUST be the last stdout line (spark.stop() above can
    # still emit shutdown chatter; print after it)
    sys.stdout.flush()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
