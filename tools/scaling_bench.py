"""Two-parallelism scaling evidence (BASELINE.md north rule): run the
identical flagship job at local[N] and local[4N] on the same input and report
throughput at both + scaling efficiency = (T_{4N} / T_N) / 4.

Usage: python tools/scaling_bench.py [n_low] [sf_dir]
Writes the measured table into BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from sparkrdf.session import get_spark
spark = get_spark("scaling", master="local[{cpus}]",
                  **{{"spark.sql.shuffle.partitions": "{parts}",
                      # GC pools auto-size to the MACHINE's cores; under
                      # taskset pinning that oversubscribes the low-core run
                      # and skews the ratio — size them to the pinned set
                      "spark.driver.extraJavaOptions":
                          "-XX:ParallelGCThreads={gc} -XX:ConcGCThreads={cgc}"}})
spark.sparkContext.setLogLevel("ERROR")
from sparkrdf.pages import synthesize_pages
from sparkrdf.extract.pipeline import extract_triples
from sparkrdf.rpt import rpt_transform
pages = synthesize_pages(spark, {n_pages}, partitions={parts}).persist()
pages.count()  # exclude synthesis from the timed section
t0 = time.perf_counter()
# persist the statement stream: both output tables derive from it (exactly
# how the production job materializes stage outputs between checkpoints)
stmts = extract_triples(spark, pages).persist()
rpt = rpt_transform(stmts, "Scale")
n_e = rpt["edges"].count()
n_v = rpt["vertices"].count()
dt = time.perf_counter() - t0
print(json.dumps({{"sec": dt, "edges": n_e, "vertices": n_v,
                   "triples_per_sec": (n_e + n_v) / dt}}))
spark.stop()
"""


def run(cpus: int, n_pages: int, reps: int = 3) -> dict:
    """Best-of-reps wall time (this sandbox shows heavy run-to-run variance
    from CPU steal; min is the standard noise-robust throughput estimator).

    The process is PINNED to exactly `cpus` CPUs via taskset: in local[N]
    mode Python UDF workers run outside the N task slots, so an unpinned
    local[2] job actually consumes ~4+ cores and inflates the baseline —
    pinning makes the N-vs-4N comparison account for total machine
    resources, which is what N-vs-4N executors on a real cluster means.
    """
    best = None
    for _ in range(reps):
        # 4 partitions per core: the Arrow-batched extraction dominates, and
        # finer partitions keep stragglers from serializing the tail (the
        # round-1 0.65 efficiency was partly one slow partition per wave)
        code = _JOB.format(
            repo=REPO,
            cpus=cpus,
            parts=4 * cpus,
            n_pages=n_pages,
            gc=max(2, cpus),
            cgc=max(1, cpus // 4),
        )
        cmd = [sys.executable, "-c", code]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["sec"] < best["sec"]:
            best = r
    return best


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
    n_high = 4 * n_low

    lo = run(n_low, n_pages)
    hi = run(n_high, n_pages)
    eff = (lo["sec"] / hi["sec"]) / 4.0
    result = {
        "n_pages": n_pages,
        "low_cpus": n_low,
        "high_cpus": n_high,
        "sec_low": round(lo["sec"], 2),
        "sec_high": round(hi["sec"], 2),
        "rows_per_sec_low": round(lo["triples_per_sec"], 1),
        "rows_per_sec_high": round(hi["triples_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    bench_md = os.path.join(REPO, "BENCH.md")
    stamp = time.strftime("%Y-%m-%d %H:%M:%SZ", time.gmtime())
    with open(bench_md, "a", encoding="utf-8") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"| pages | local[{n_low}] sec | local[{n_high}] sec | "
            f"rows/s @{n_low} | rows/s @{n_high} | efficiency (target ≥0.8) |\n"
            f"|---|---|---|---|---|---|\n"
            f"| {n_pages} | {result['sec_low']} | {result['sec_high']} | "
            f"{result['rows_per_sec_low']} | {result['rows_per_sec_high']} | "
            f"{result['scaling_efficiency']} |\n"
        )


if __name__ == "__main__":
    main()
