"""Probe the sandbox's REAL CPU capacity (vCPU pair interference).

The VM advertises 32 vCPUs (lscpu: 32 cores, 1 thread/core), but a
pairwise interference probe shows the high vCPUs are oversubscribed at
the hypervisor: a busy competitor pinned to cpu17 or cpu31 slows a
probe pinned to cpu0 to ~35%/~22% of its solo speed, while competitors
on cpu1-cpu15 cost ≤10%.  The machine therefore has roughly 16 real
cores of capacity; scheduling 32-way actively slows every thread.

This is why bench.py's scaling proxy compares num_cpus=4 vs
num_cpus=16 (both pinned inside the real-core range) as its N vs 4N
cluster emulation: 8→32 on this box is physically capped at ~2×
regardless of the software, which would measure the hypervisor, not
the pipeline.  Run this script to reproduce the evidence table.

Usage: python tools/cpu_probe.py
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time


def burn(cpu: int, dur: float, q=None) -> int:
    os.sched_setaffinity(0, {cpu})
    x = 1
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < dur:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        n += 10000
    if q is not None:
        q.put(n)
    return n


def rate_with_competitor(comp_cpu: int | None, probe_cpu: int = 0) -> int:
    q = mp.Queue()
    procs = []
    if comp_cpu is not None:
        c = mp.Process(target=burn, args=(comp_cpu, 3.0))
        c.start()
        procs.append(c)
        time.sleep(0.3)
    p = mp.Process(target=burn, args=(probe_cpu, 2.0, q))
    p.start()
    n = q.get()
    p.join()
    for c in procs:
        c.join()
    return n


def main() -> None:
    base = rate_with_competitor(None)
    print(f"probe on cpu0 alone: {base / 1e6:.1f}M iters")
    for comp in (1, 2, 8, 15, 16, 17, 24, 31):
        r = rate_with_competitor(comp)
        print(f"cpu0 vs busy cpu{comp}: {r / 1e6:.1f}M ({100 * r / base:.0f}%)")


if __name__ == "__main__":
    main()
