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
