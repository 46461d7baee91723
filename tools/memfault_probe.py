"""Reproduce this sandbox's pathological first-touch memory latency.

Fresh guest pages fault in at ~5-20 MB/s under co-tenant host memory
pressure (vs >5 GB/s steady-state), episodically: a 16 MB numpy
full+cumsum+copy measured 6.4 s on its first round in a fresh process
and 0.02 s once the arena was resident (2026-08-18).  The effect is
invisible to /proc/stat steal%% (it is fault latency, not stolen CPU)
and is the mechanism behind same-code wall-time drift documented in
BASELINE.md.

Every fresh Ray worker pays this tax on its first real batch, which
shows up as a FIXED multi-second per-run overhead and flattens
CPU-scaling curves — hence bench.py's arena warmup
(`util.touch_arena`, excluded from pipeline timing like any resident
production worker pool would be).

Run: python tools/memfault_probe.py [mb]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = mb * 125_000
    for i in range(5):
        t0 = time.perf_counter()
        a = np.full(n, 7, dtype=np.uint64)
        s = np.cumsum(a)
        s.copy()
        dt = time.perf_counter() - t0
        print(f"round {i}: {dt:.3f}s  ({3 * mb / dt:.0f} MB/s touched)")
        del a, s


if __name__ == "__main__":
    main()
