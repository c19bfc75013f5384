"""Compute-bound contrast probe: cache-resident work, same harness."""
import multiprocessing as mp, os, time

def worker(n_iter, q):
    import numpy as np
    a = np.arange(200_000, dtype=np.float64)  # 1.6 MB — cache resident
    t0 = time.process_time()
    for _ in range(n_iter):
        for _ in range(60):
            b = np.sin(a) * 1.0001
            s = float(b.sum())
    q.put(time.process_time() - t0)

def run(nproc, n_iter=10):
    os.sched_setaffinity(0, set(range(nproc)))
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(n_iter, q)) for _ in range(nproc)]
    t0 = time.perf_counter()
    [p.start() for p in ps]; res = [q.get() for _ in ps]; [p.join() for p in ps]
    wall = time.perf_counter() - t0
    return wall, sum(res)

if __name__ == "__main__":
    w2 = run(2); w8 = run(8)
    thr2 = 2 * 10 / w2[0]; thr8 = 8 * 10 / w8[0]
    print({"cpu_inflation_8_vs_2": round((w8[1]/8) / (w2[1]/2), 3),
           "eff_2_to_8": round((thr8 / thr2) / 4, 3)})
