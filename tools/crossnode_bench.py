"""Cross-node exchange THROUGHPUT measurement (VERDICT r4 #2/#5).

`tests/test_two_node_cluster.py` proves cross-node exchange PARITY at
toy scale; this tool measures the throughput cost of the same topology
at the 240k-doc fixture: the flagship runs on

  - leg "2x4": a simulated two-node cluster (ray.cluster_utils.Cluster,
    2 nodes x 4 CPUs) — every exchange shard that lands on the other
    node crosses the object-store transport;
  - leg "1x8": one node with 8 CPUs (the scaling-gate shape).

Equal CPU budgets, same fixture, fresh subprocess per trial,
interleaved trials with per-trial hypervisor-steal measurement (the
scaling gate's protocol).  Cross-node efficiency = t_1x8 / t_2x4 —
1.0 means the transport adds nothing; the artifact lands in
BENCH_crossnode.json.

Usage:  python tools/crossnode_bench.py [ndocs] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEG = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
import ray

mode = {mode!r}
if mode == "2x4":
    from ray.cluster_utils import Cluster
    cluster = Cluster()
    # cluster_utils nodes default to 150 MB object stores — at the
    # 240k fixture that means constant spilling, which measures disk,
    # not transport.  8 GB per node matches a real worker's store.
    cluster.add_node(num_cpus=4, include_dashboard=False,
                     object_store_memory=8_000_000_000)
    cluster.add_node(num_cpus=4, object_store_memory=8_000_000_000)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    nodes = [n for n in ray.nodes() if n["Alive"]]
    assert len(nodes) == 2, nodes
else:
    try:
        os.sched_setaffinity(0, range(8))
    except OSError:
        pass
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")

from hyrise_generalized_dedup_ray.pipelines.dedup import dedup_pages_from_path
from hyrise_generalized_dedup_ray.util import prewarm_cluster
prewarm_cluster(8)

t0 = time.perf_counter()
labels, metrics = dedup_pages_from_path({path!r})
n = labels.count()
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({{
    "secs": dt, "docs": n, "docs_per_sec": n / dt,
    "stage_secs": {{k: v for k, v in metrics.items()
                    if k.startswith("t_")}},
}}))
ray.shutdown()
if mode == "2x4":
    cluster.shutdown()
"""


def steal_pct(a, b, dt):
    da = sum(b[:7]) - sum(a[:7])
    return 100.0 * (b[7] - a[7]) / max(da, 1)


def read_stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def run_leg(mode: str, path: str) -> dict:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    s0, t0 = read_stat(), time.time()
    proc = subprocess.run(
        [sys.executable, "-c", LEG.format(repo=REPO, mode=mode, path=path)],
        env=env, capture_output=True, timeout=900)
    s1, t1 = read_stat(), time.time()
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    line = next(ln for ln in proc.stdout.decode().splitlines()
                if ln.startswith("RESULT "))
    out = json.loads(line[len("RESULT "):])
    out["steal_pct"] = round(steal_pct(s0, s1, t1 - t0), 2)
    return out


def main():
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from hyrise_generalized_dedup_ray.sources.fixtures import \
        pages_parquet_dir
    d = pages_parquet_dir(ndocs, seed=42)
    path = os.path.join(d, "pages")

    runs = {"1x8": [], "2x4": []}
    for _ in range(trials):
        for mode in ("1x8", "2x4"):
            r = run_leg(mode, path)
            runs[mode].append(r)
            print(f"{mode}: {r['secs']:.1f}s "
                  f"({r['docs_per_sec']:.0f} docs/s, "
                  f"steal {r['steal_pct']}%)", flush=True)

    best = {m: min(rs, key=lambda r: r["secs"]) for m, rs in runs.items()}
    eff = best["1x8"]["secs"] / best["2x4"]["secs"]
    art = {
        "metric": "cross-node exchange throughput, 2x4 vs 1x8 CPUs",
        "ndocs": ndocs,
        "best": best,
        "trials": runs,
        "crossnode_efficiency": round(eff, 3),
        "note": "efficiency = t_1x8/t_2x4 (1.0 = transport-free); "
                "simulated two-node cluster shares one host, so this "
                "isolates object-transport+scheduling cost, not NIC "
                "bandwidth",
        "recorded_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                      time.gmtime()),
    }
    with open(os.path.join(REPO, "BENCH_crossnode.json"), "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"crossnode_efficiency": art["crossnode_efficiency"],
                      "best_1x8_s": round(best["1x8"]["secs"], 2),
                      "best_2x4_s": round(best["2x4"]["secs"], 2)}))


if __name__ == "__main__":
    main()
