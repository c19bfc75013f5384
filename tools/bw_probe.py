"""Memory-bandwidth contention probe: identical numpy stream work per worker,
run with 2 then 8 pinned workers; reports per-worker CPU time inflation."""
import multiprocessing as mp, os, time, sys

def worker(n_iter, q):
    import numpy as np
    a = np.arange(12_000_000, dtype=np.float64)  # ~96 MB — larger than LLC
    t0 = time.process_time(); w0 = time.perf_counter()
    for _ in range(n_iter):
        b = a * 1.0001
        c = b + a
        s = float(c[::997].sum())
    q.put((time.process_time() - t0, time.perf_counter() - w0))

def run(nproc, n_iter=12):
    os.sched_setaffinity(0, set(range(nproc)))
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(n_iter, q)) for _ in range(nproc)]
    t0 = time.perf_counter()
    [p.start() for p in ps]; res = [q.get() for _ in ps]; [p.join() for p in ps]
    wall = time.perf_counter() - t0
    cpu = sum(r[0] for r in res)
    return wall, cpu, cpu / (wall * nproc)

if __name__ == "__main__":
    w2 = run(2); w8 = run(8)
    per_unit_2 = w2[1] / 2 / 12    # cpu-sec per worker-iter at 2 procs
    per_unit_8 = w8[1] / 8 / 12
    thr2 = 2 * 12 / w2[0]; thr8 = 8 * 12 / w8[0]
    print({"cpu_inflation_8_vs_2": round(per_unit_8 / per_unit_2, 3),
           "eff_2_to_8": round((thr8 / thr2) / 4, 3),
           "util2": round(w2[2],3), "util8": round(w8[2],3)})
