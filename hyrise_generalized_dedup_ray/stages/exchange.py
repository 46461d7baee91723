"""Direct hash exchange: map-side split by key hash → per-shard reduce.

The engine's hot wide steps all share one shape: explode compact
fixed-width rows, co-locate equal keys, run a vectorized partition
kernel (functions/grouping).  Expressing that through
``groupby("pkey").map_groups`` routes it into Ray Data's *sort-based*
shuffle, which globally range-samples and sorts the exploded rows —
measured on this corpus at ~135 CPU-seconds of real work stretched to
60-240 s of wall time by boundary sampling, per-slice object churn and
barrier scheduling, independent of CPU count.  That fixed coordination
cost is exactly what a two-cluster-size scaling criterion punishes.

This module is the engine's own exchange operator instead — the
documented escape hatch for semantics the Dataset API can't express
efficiently (a pure hash partitioning needs no order, no sampling, no
barrier):

- ``num_shards`` MAP tasks each read a bundle of Arrow blocks
  (zero-copy from the object store), apply ``map_fn`` (explode /
  key-derivation), hash-split the rows on ``key_col`` with one argsort,
  and return one compact Arrow table per shard (``num_returns=P``);
- P REDUCE tasks concat their shard's pieces and run the stage's
  partition kernel.

Every row moves exactly once; shard payloads are plain Arrow tables in
the object store, so multi-node placement and spilling behave exactly
as in Ray Data's shuffle.  Equal keys land in the same reduce by
construction (functions.grouping.partition_ids), which is the only
guarantee the partition kernels need.

Reference analog: the radix-partitioned AggregateHash/JoinHash
materialization passes (aggregate_hash.cpp:260, join_hash.hpp:36) —
hash-cluster once, then run tight per-partition loops.

Scale contract (10^12 docs / 256 nodes): the shuffle-object count is
``map_tasks × num_shards``; both default to O(cluster CPUs), which is
the right shape up to a few thousand cores (8k × 8k ≈ 67M objects is
NOT — at that size, run the exchange hierarchically: exchange within
each node group on ``hash(key) % G`` first, then across groups on the
full key, keeping every level's object count ≤ ~10^5).  Shard payloads
are ordinary object-store entries, so multi-node placement, transfer
and disk spill are Ray's — a mega-shard degrades to spill, not OOM,
and reduces pull shards as plain refs over the network exactly like
Ray Data's own shuffle.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.functions.grouping import partition_ids

MapFn = Callable[[pa.Table], pa.Table]
KernelFn = Callable[[pa.Table], pa.Table]


@ray.remote
def _map_split(map_fn: MapFn, key_col: str, num_shards: int,
               schema: pa.Schema, key_is_shard: bool, *blocks: pa.Table):
    ts = []
    for b in blocks:
        if b is None or b.num_columns == 0 or b.num_rows == 0:
            continue
        t = map_fn(b)
        if t.num_rows:
            ts.append(t)
    empty = schema.empty_table()
    if not ts:
        return empty if num_shards == 1 else tuple(
            empty for _ in range(num_shards))
    t = ts[0] if len(ts) == 1 else pa.concat_tables(ts)
    keys = t.column(key_col).to_numpy(zero_copy_only=False)
    # key_is_shard: map_fn already computed the shard id (e.g. a fused
    # melt that dedups per (doc, shard)) — route on it verbatim
    pk = keys if key_is_shard else partition_ids(keys, num_shards)
    order = np.argsort(pk, kind="stable")
    bounds = np.searchsorted(pk[order], np.arange(num_shards + 1))
    # ONE take clusters the rows by shard, then each shard ships as a
    # zero-copy SLICE of the clustered table — Arrow IPC truncates
    # sliced buffers to the referenced range (verified: a 1% slice of
    # a string table serializes to ~1% of the bytes), so the objects
    # stay compact.  A take() PER SHARD looked equivalent but caused a
    # ~100× page-fault amplification (4M minor faults per map task on
    # a 113k-row text table; ~12 cores of kernel time at 16-way) from
    # per-take buffer allocation churn.
    clustered = t.take(pa.array(order)).combine_chunks()
    out = []
    for i in range(num_shards):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        out.append(clustered.slice(lo, hi - lo) if hi > lo else empty)
    return out[0] if num_shards == 1 else tuple(out)


@ray.remote
def _reduce(kernel: KernelFn, seed: pa.Table | None, *shards: pa.Table):
    ts = [s for s in shards if s.num_rows]
    if seed is not None and seed.num_rows:
        ts.append(seed)
    if not ts:
        t = seed if seed is not None else shards[0]
    elif len(ts) == 1:
        t = ts[0]
    else:
        t = pa.concat_tables(ts).combine_chunks()
    return kernel(t)


def hash_exchange_refs(
    block_refs: Sequence["ray.ObjectRef"],
    map_fn: MapFn,
    key_col: str,
    kernel: KernelFn,
    num_shards: int,
    schema: pa.Schema,
    seed_shards: Sequence[pa.Table] | None = None,
    map_tasks: int | None = None,
    key_is_shard: bool = False,
) -> list["ray.ObjectRef"]:
    """Exchange over materialized Arrow block refs → per-shard kernel
    output refs.  ``map_fn(block) → rows`` must emit ``key_col``
    (int64); ``schema`` is ``map_fn``'s output schema (used for empty
    shards).  ``seed_shards`` (optional, len ``num_shards``) are
    driver-built tables appended to each reduce's input — the broadcast
    small side of a fused exchange (e.g. pair/membership indexes)."""
    block_refs = list(block_refs)
    if seed_shards is not None and len(seed_shards) != num_shards:
        raise ValueError("seed_shards must have one table per shard")
    if not block_refs:
        if seed_shards is None:
            return []
        return [_reduce.remote(kernel, seed, *[schema.empty_table()])
                for seed in seed_shards]
    # one map task per CPU: the split work is light, and halving the
    # task count halves the (num_maps × num_shards) shuffle-object
    # count — small returns are shipped inline through their owner, so
    # object COUNT, not bytes, sets this stage's fixed cost
    cpus = int(ray.cluster_resources().get("CPU", 8))
    m = map_tasks or min(len(block_refs), max(1, cpus))
    fanin = math.ceil(len(block_refs) / m)
    shard_lists: list[list] = []
    for i in range(0, len(block_refs), fanin):
        refs = _map_split.options(num_returns=num_shards).remote(
            map_fn, key_col, num_shards, schema, key_is_shard,
            *block_refs[i:i + fanin])
        shard_lists.append([refs] if num_shards == 1 else list(refs))
    return [
        _reduce.remote(kernel,
                       None if seed_shards is None else seed_shards[p],
                       *[sl[p] for sl in shard_lists])
        for p in range(num_shards)
    ]


def hash_exchange(
    ds: Dataset,
    map_fn: MapFn,
    key_col: str,
    kernel: KernelFn,
    num_shards: int,
    schema: pa.Schema,
    seed_shards: Sequence[pa.Table] | None = None,
    map_tasks: int | None = None,
    key_is_shard: bool = False,
) -> Dataset:
    """Dataset-in/Dataset-out wrapper around :func:`hash_exchange_refs`.

    Executes ``ds`` (if not already materialized) to obtain its Arrow
    blocks; the result Dataset streams from the reduce outputs."""
    refs = ds.to_arrow_refs()
    out = hash_exchange_refs(refs, map_fn, key_col, kernel, num_shards,
                             schema, seed_shards=seed_shards,
                             map_tasks=map_tasks, key_is_shard=key_is_shard)
    if not out:
        return ray.data.from_arrow(kernel(schema.empty_table()))
    return ray.data.from_arrow_refs(out)


@ray.remote
def _num_rows(t: pa.Table) -> int:
    return t.num_rows


def count_rows(refs: Sequence["ray.ObjectRef"]) -> int:
    """Total rows across table refs without moving the tables."""
    return int(sum(ray.get([_num_rows.remote(r) for r in refs])))


def split_by_key(table: pa.Table, keys: np.ndarray,
                 num_shards: int, key_is_shard: bool = False) -> list[pa.Table]:
    """Driver-side split of a small table into ``num_shards`` compact
    tables by key hash (or verbatim shard ids with ``key_is_shard``) —
    builds ``seed_shards`` for a fused exchange."""
    pk = keys if key_is_shard else partition_ids(keys, num_shards)
    order = np.argsort(pk, kind="stable")
    bounds = np.searchsorted(pk[order], np.arange(num_shards + 1))
    return [table.take(pa.array(order[bounds[i]:bounds[i + 1]]))
            for i in range(num_shards)]
