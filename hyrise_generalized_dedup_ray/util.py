"""Small engine-wide utilities."""

from __future__ import annotations

from ray.data import Dataset


def tune_data_context() -> None:
    """Cap the CPU reservation of hash-shuffle/join aggregator actors.

    Ray's default sizes each join's aggregator pool to reserve up to
    50% of the cluster's CPUs (``min(1, (CPU/2)/num_partitions)`` per
    partition, hash_shuffle.py).  With the flagship's edge branches
    running CONCURRENTLY (pipelines/dedup.py), two cluster-wide joins
    would reserve 100% of the CPUs for aggregators and starve the map
    tasks that feed them — measured as a 20× slowdown at 32 CPUs.
    Aggregators mostly concat blocks (I/O-bound), so a small fraction
    per partition is plenty; 1/16 CPU keeps three concurrent
    cluster-wide exchanges under ~20% of the cluster."""
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.0625
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.0625
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.0625


def spread_blocks(ds: Dataset, per_cpu: int = 4, floor: int = 8) -> Dataset:
    """Repartition so downstream compute parallelizes across the
    cluster.

    Ray fuses ``map_batches`` chains into their upstream read tasks; a
    single Parquet file with one row group therefore executes the WHOLE
    read→map chain in one task, serializing stages that should use
    every core (measured: the signature stage ran at identical speed on
    8 and 32 CPUs until this was added).  A repartition right after the
    cheap part of the chain breaks the fusion and spreads the rows over
    ``per_cpu × cluster CPUs`` blocks.  On a many-file input this is a
    near-no-op balance pass; the block target keeps scaling with the
    fleet's core count on a real cluster."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ds.repartition(max(floor, per_cpu * cpus))


# NOTE: heal_blocks (repartition workaround for Ray's zero-column empty
# groupby blocks breaking Dataset.join) was removed: every join now runs
# on stages/exchange.exchange_join, whose map-split skips degenerate
# blocks natively.


def prewarm_cluster(num_tasks: int, mb: int = 192, rounds: int = 3) -> None:
    """Pre-fault worker memory arenas before timing a pipeline.

    This sandbox's guest memory exhibits pathological FIRST-TOUCH
    latency (reproduce with ``python tools/memfault_probe.py``): a
    16 MB numpy full+cumsum+copy measures seconds on its first round
    in a fresh process and ~20 ms at steady state — three orders of
    magnitude — because host-side page population is slow under
    co-tenant memory pressure.  Each fresh Ray worker therefore pays
    a one-time multi-second tax on its first real batch, which reads
    as a fixed per-run overhead that flattens CPU-scaling curves.

    The fix is the same thing a production cluster gets for free from
    long-lived resident workers: touch the arena once, up front.  One
    task per CPU slot allocates/touches ``mb`` MB in a few rounds; with
    ``MALLOC_MMAP_THRESHOLD_``/``MALLOC_TRIM_THRESHOLD_`` raised (see
    bench.py) the freed pages stay in the worker's arena, so the timed
    pipeline reuses already-resident memory.  Driver arena included.
    """
    import ray

    @ray.remote(num_cpus=1)
    def _touch(mb_: int, rounds_: int) -> int:
        touch_arena(mb_, rounds_)
        return 0

    touch_arena(mb, rounds)
    ray.get([_touch.remote(mb, rounds) for _ in range(num_tasks)])


def touch_arena(mb: int = 192, rounds: int = 3) -> None:
    """Touch ``mb`` MB of fresh heap in this process a few times so the
    pages are faulted in and (with raised MALLOC_TRIM/MMAP thresholds)
    retained in the allocator arena for the real workload to reuse."""
    import numpy as np

    for _ in range(rounds):
        a = np.full(mb * 125_000, 7, dtype=np.uint64)
        np.cumsum(a)
        del a
