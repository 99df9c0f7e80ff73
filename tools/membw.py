"""Aggregate memory-bandwidth ceiling of this box vs process count.

Each worker repeatedly streams a buffer that is far larger than LLC
(numpy copy = read + write), so the measurement is pure memory-bus
throughput. Prints aggregate GB/s at 1/2/4/8 processes — the hardware
table behind BENCH/BASELINE.md §2's scaling-ceiling argument.
Usage: python tools/membw.py [buf_mb] [seconds]
"""

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def worker(buf_mb: int, seconds: float, out, barrier):
    a = np.random.default_rng(0).random(buf_mb * 1024 * 1024 // 8)
    b = np.empty_like(a)
    np.copyto(b, a)  # touch pages before the barrier
    barrier.wait()   # all workers stream simultaneously
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(b, a)
        n += 1
    dt = time.time() - t0
    # bytes moved per copy: read a + write b
    out.put(2 * a.nbytes * n / dt)


def measure(procs: int, buf_mb: int, seconds: float) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [mp.Process(target=worker, args=(buf_mb, seconds, q, barrier))
          for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / 1e9


def main():
    buf_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    res = {}
    for procs in (1, 2, 4, 8):
        res[procs] = round(measure(procs, buf_mb, seconds), 1)
    print(json.dumps({"buf_mb": buf_mb, "aggregate_gb_per_s": res,
                      "scaling_2_to_8": round(res[8] / res[2], 2)}))


if __name__ == "__main__":
    main()
