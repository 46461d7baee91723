"""``ray job submit`` entrypoint for the flagship dedup pipeline — the
multi-node story (north_rule: "run via ray job submit on a fixed-size
multi-node Ray cluster").

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/submit.py --input s3://bucket/pages/ \
            --ckpt s3://bucket/ckpt/run1 --output s3://bucket/labels/run1 \
            --num-partitions 4096

In this sandbox the same script runs against local parquet with
``RAY_ADDRESS=local``.  The job is resumable: every stage checkpoints
per-partition Parquet with lineage manifests (state/checkpoint.py), so
re-submitting after a failure skips completed stages.

This script OWNS its Ray session when run standalone (guarded init —
under ``ray job submit`` the cluster address comes from the
environment).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path/dir of pages (url, warc_ts, html, text, lang)")
    ap.add_argument("--ckpt", required=True, help="checkpoint root directory")
    ap.add_argument("--output", required=True, help="labels output parquet dir")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=0,
                    help="local-mode CPU cap (0 = cluster default)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.cpus:
            kwargs["num_cpus"] = args.cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"), **kwargs)

    from hyrise_generalized_dedup_ray.pipelines.dedup import run_dedup_checkpointed
    from hyrise_generalized_dedup_ray.util import prewarm_cluster

    # warm every worker's memory arena before the pipeline: a resident
    # production pool is always warm; fresh workers on this sandbox
    # (and on autoscaled nodes) pay pathological first-touch fault
    # latency inside the first real batch otherwise (tools/
    # memfault_probe.py, BASELINE.md round-3 scaling section)
    prewarm_cluster(int(ray.cluster_resources().get("CPU", 8)))

    labels, metrics = run_dedup_checkpointed(
        args.input, args.ckpt, num_partitions=args.num_partitions)
    labels.write_parquet(args.output)
    print(json.dumps({"metrics": metrics, "output": args.output}))
    ray.shutdown()


if __name__ == "__main__":
    main()
