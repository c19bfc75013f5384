"""Phase + utilization profile of the scaling job at one parallelism level.

Runs the identical flagship job as scaling_bench, but reports per-phase wall
time AND executor utilization (sum of task runtimes / (cores x phase wall))
from the status tracker, so scaling loss can be attributed to either
scheduling gaps/stragglers (low utilization) or per-task inflation
(bandwidth/GC — high utilization but slow).

Usage: python tools/phase_profile.py <cpus> [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
    parts = 4 * cpus

    from sparkrdf.session import get_spark

    spark = get_spark(
        "profile",
        master=f"local[{cpus}]",
        **{
            "spark.sql.shuffle.partitions": str(parts),
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": f"-XX:ParallelGCThreads={max(2, cpus)}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    me = os.getpid()

    def _tree_cpu_s():
        """CPU seconds consumed by this process and ALL live descendants
        (JVM, Python UDF workers) — /proc walk, no psutil dependency."""
        ppid_of, cpu_of = {}, {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                # fields after comm: state(0) ppid(1) ... utime(11) stime(12)
                ppid_of[int(d)] = int(parts[1])
                cpu_of[int(d)] = (int(parts[11]) + int(parts[12])) / 100.0
            except (OSError, IndexError, ValueError):
                continue
        total = 0.0
        for pid, cpu in cpu_of.items():
            p = pid
            while p > 1:
                if p == me:
                    total += cpu
                    break
                p = ppid_of.get(p, 1)
        return total

    def task_time_ms():
        return _tree_cpu_s() * 1000.0

    from sparkrdf.extract.pipeline import extract_triples
    from sparkrdf.pages import synthesize_pages
    from sparkrdf.rpt import rpt_transform

    pages = synthesize_pages(spark, n_pages, partitions=parts).persist()
    pages.count()

    phases = {}

    def timed(name, fn):
        t0, r0 = time.perf_counter(), task_time_ms()
        out = fn()
        dt = time.perf_counter() - t0
        dr = (task_time_ms() - r0) / 1000.0
        phases[name] = {
            "wall_s": round(dt, 2),
            "task_s": round(dr, 1),
            "util": round(dr / (dt * cpus), 3),
        }
        return out

    stmts = extract_triples(spark, pages).persist()
    timed("extract+persist", lambda: stmts.count())
    rpt = rpt_transform(stmts, "Prof")
    timed("rpt_edges", lambda: rpt["edges"].count())
    timed("rpt_vertices", lambda: rpt["vertices"].count())

    total_wall = sum(p["wall_s"] for p in phases.values())
    print(
        json.dumps(
            {"cpus": cpus, "pages": n_pages, "total_wall": round(total_wall, 2), "phases": phases}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
