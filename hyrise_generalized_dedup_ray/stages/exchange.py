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
NOT — above ~10^5 objects :func:`hash_exchange_refs` and
:func:`exchange_join` now switch THEMSELVES to the two-level
hierarchical path, exchanging within ``G`` groups first and across
groups second, keeping every level's object count bounded;
``_EXCHANGE_OBJECT_BOUND``).  Shard payloads
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
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.functions.grouping import partition_ids
from hyrise_generalized_dedup_ray.functions.hashing import (hash_strings,
                                                            splitmix64)

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


# shuffle objects (map_tasks × num_shards) above this bound route
# through the two-level exchange automatically — the module-note scale
# contract (~10^5 object-directory entries per level), now enforced in
# code instead of left to the caller.
_EXCHANGE_OBJECT_BOUND = 100_000


def _auto_groups(map_tasks: int, num_shards: int) -> int | None:
    """Level-1 group count when a flat exchange would exceed the
    object bound; ``None`` keeps the flat path.  Picks the divisor of
    ``num_shards`` nearest sqrt(num_shards) that brings
    ``map_tasks × G + num_shards`` under the bound (or the best
    achievable one)."""
    if map_tasks * num_shards <= _EXCHANGE_OBJECT_BOUND:
        return None
    divisors = [d for d in range(1, num_shards) if num_shards % d == 0]
    if not divisors:
        return None
    ok = [d for d in divisors
          if map_tasks * d + num_shards <= _EXCHANGE_OBJECT_BOUND]
    pool = ok or [min(divisors, key=lambda d: map_tasks * d)]
    target = max(1, math.isqrt(num_shards))
    return min(pool, key=lambda d: (abs(d - target), d))


def _shard_side(block_refs: Sequence["ray.ObjectRef"], map_fn: MapFn,
                key_col: str, num_shards: int, schema: pa.Schema,
                map_tasks: int | None = None,
                key_is_shard: bool = False) -> list[list]:
    """Map-split one side's blocks into ``num_shards`` hash shards.
    Returns one per-shard ref list per map task.  One map task per CPU:
    the split work is light, and halving the task count halves the
    (num_maps × num_shards) shuffle-object count — small returns are
    shipped inline through their owner, so object COUNT, not bytes,
    sets this stage's fixed cost."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    m = map_tasks or min(len(block_refs), max(1, cpus))
    fanin = math.ceil(len(block_refs) / m)
    shard_lists: list[list] = []
    for i in range(0, len(block_refs), fanin):
        refs = _map_split.options(num_returns=num_shards).remote(
            map_fn, key_col, num_shards, schema, key_is_shard,
            *block_refs[i:i + fanin])
        shard_lists.append([refs] if num_shards == 1 else list(refs))
    return shard_lists


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
    if seed_shards is None and not key_is_shard and block_refs:
        # auto-hierarchical: enforce the ~10^5 shuffle-object contract
        cpus = int(ray.cluster_resources().get("CPU", 8))
        m = map_tasks or min(len(block_refs), max(1, cpus))
        g = _auto_groups(m, num_shards)
        if g is not None and 1 < g < num_shards:
            return hash_exchange_hierarchical_refs(
                block_refs, map_fn, key_col, kernel, num_shards, schema,
                num_groups=g, map_tasks=map_tasks)
    if not block_refs:
        if seed_shards is None:
            return []
        return [_reduce.remote(kernel, seed, *[schema.empty_table()])
                for seed in seed_shards]
    shard_lists = _shard_side(block_refs, map_fn, key_col, num_shards,
                              schema, map_tasks=map_tasks,
                              key_is_shard=key_is_shard)
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
    num_groups: int | None = None,
) -> Dataset:
    """Dataset-in/Dataset-out wrapper around :func:`hash_exchange_refs`.

    Executes ``ds`` (if not already materialized) to obtain its Arrow
    blocks; the result Dataset streams from the reduce outputs.
    ``num_groups`` switches to the two-level hierarchical exchange
    (see :func:`hash_exchange_hierarchical_refs`) — the >10³-core path
    that bounds shuffle-object count at M×G + S instead of M×S."""
    refs = ds.to_arrow_refs()
    if num_groups is not None and refs:
        if seed_shards is not None or key_is_shard:
            raise ValueError("hierarchical exchange does not support "
                             "seed_shards / key_is_shard routing")
        out = hash_exchange_hierarchical_refs(
            refs, map_fn, key_col, kernel, num_shards, schema,
            num_groups=num_groups, map_tasks=map_tasks)
    else:
        out = hash_exchange_refs(refs, map_fn, key_col, kernel, num_shards,
                                 schema, seed_shards=seed_shards,
                                 map_tasks=map_tasks,
                                 key_is_shard=key_is_shard)
    if not out:
        return ray.data.from_arrow(kernel(schema.empty_table()))
    return ray.data.from_arrow_refs(out)


@ray.remote
def _num_rows(t: pa.Table) -> int:
    return t.num_rows


def count_rows(refs: Sequence["ray.ObjectRef"]) -> int:
    """Total rows across table refs without moving the tables."""
    return int(sum(ray.get([_num_rows.remote(r) for r in refs])))


# --------------------------------------------------------------------------
# hierarchical exchange: two-level routing for very wide clusters
# --------------------------------------------------------------------------

@ray.remote
def _concat_shards(*shards: pa.Table) -> pa.Table:
    ts = [s for s in shards if s.num_rows]
    if not ts:
        return shards[0]
    return ts[0] if len(ts) == 1 else pa.concat_tables(ts)


def hash_exchange_hierarchical_refs(
    block_refs: Sequence["ray.ObjectRef"],
    map_fn: MapFn,
    key_col: str,
    kernel: KernelFn,
    num_shards: int,
    schema: pa.Schema,
    num_groups: int,
    map_tasks: int | None = None,
) -> list["ray.ObjectRef"]:
    """Two-level exchange for clusters where ``map_tasks × num_shards``
    shuffle objects would swamp the object directory (the module-note
    scale contract: keep every level's object count ≤ ~10^5).

    Level 1 routes rows to ``num_groups`` GROUPS of final shards
    (group = final_shard // shards_per_group — equal keys stay
    together by construction); level 2 splits each group's concatenated
    rows into its own final shards and runs the partition kernel.
    Object count falls from M×S to M×G + S (e.g. 8k maps × 8k shards:
    67M flat → 8k×64 + 8k ≈ 0.5M at G=64).  Kernel outputs are
    IDENTICAL to the flat exchange — same final shard assignment, same
    per-shard row multiset."""
    if num_shards % num_groups:
        raise ValueError("num_shards must be a multiple of num_groups")
    per_group = num_shards // num_groups

    g_schema = schema.append(pa.field("__shard", pa.int64()))

    # level 1: route on group id (final_shard // per_group); the final
    # shard is re-derived from the key inside level 2 (cheap) rather
    # than carried as a second routing column
    def route1(b: pa.Table) -> pa.Table:
        t = map_fn(b)
        if "__shard" in t.column_names:
            t = t.drop_columns(["__shard"])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        g = partition_ids(keys, num_shards) // per_group
        return t.append_column("__shard", pa.array(g, type=pa.int64()))

    lvl1 = _shard_side(list(block_refs), route1, "__shard", num_groups,
                       g_schema, map_tasks=map_tasks, key_is_shard=True)
    group_refs = [
        _concat_shards.remote(*[sl[g] for sl in lvl1])
        for g in range(num_groups)
    ]

    def route2(b: pa.Table) -> pa.Table:
        t = b.drop_columns(["__shard"])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        local = partition_ids(keys, num_shards) % per_group
        return t.append_column("__shard", pa.array(local, type=pa.int64()))

    out: list = [None] * num_shards
    for g, gref in enumerate(group_refs):
        lvl2 = _shard_side([gref], route2, "__shard", per_group, g_schema,
                           map_tasks=1, key_is_shard=True)
        for p in range(per_group):
            shard_ref = _reduce.remote(
                _drop_shard_then(kernel), None, *[sl[p] for sl in lvl2])
            out[g * per_group + p] = shard_ref
    return out


def _drop_shard_then(kernel: KernelFn) -> KernelFn:
    def fn(t: pa.Table) -> pa.Table:
        if "__shard" in t.column_names:
            t = t.drop_columns(["__shard"])
        return kernel(t)
    return fn


# --------------------------------------------------------------------------
# exchange join: map-split BOTH sides by key hash → per-shard Acero join
# --------------------------------------------------------------------------
#
# Ray Data's built-in ``Dataset.join`` spawns a dedicated hash-shuffle
# actor pool whose startup alone costs tens of seconds in this sandbox
# (measured: 46 s cold / 8 s warm for a 15k×25-row join) and whose width
# is fixed by ``num_partitions`` rather than the data.  The exchange
# join below reuses the engine's own shuffle primitive instead: both
# sides are map-split on a normalized 64-bit key hash (every row moves
# exactly once, plain tasks, no actor pool), and each shard runs ONE
# vectorized ``pyarrow.Table.join`` (Acero hash join).  This is the
# reference's JoinHash shape verbatim — radix-cluster both inputs on the
# key hash, then a tight local build/probe per partition
# (join_hash.hpp:36-46, join_hash.cpp two-phase materialization) — and
# it matches SQL semantics because the per-shard join is Acero's:
# NULL keys never match, outer rows survive null-padded in whichever
# shard they hashed to.
#
# Scale contract: shard payloads are ordinary object-store entries
# (multi-node placement / spill are Ray's); a hot key concentrates in
# one reduce exactly as in any hash join — salt known-hot keys upstream.

_ACERO_HOW = {
    "inner": "inner", "left": "left outer", "left_outer": "left outer",
    "right_outer": "right outer", "full_outer": "full outer",
    "semi": "left semi", "anti": "left anti",
}

_NULL_I64 = np.int64(-0x6A09E667F3BCC909)  # arbitrary sentinel shard key


def _type_kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t) or pa.types.is_time(t):
        return "temporal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    return f"other:{t}"


def _hash_kind(lt: pa.DataType, rt: pa.DataType) -> str:
    """Normalization for one key position so that values Acero treats
    as equal hash identically on BOTH sides."""
    kl, kr = _type_kind(lt), _type_kind(rt)
    k = kl if kl == kr else "str"
    return {"ts": "temporal"}.get(k, k if not k.startswith("other") else "str")


def _common_key_type(lt: pa.DataType, rt: pa.DataType) -> pa.DataType | None:
    """Cast target that makes one key position joinable by the
    per-shard Acero join (which requires EXACTLY equal types on both
    sides), or None when the types already match.  Same-kind pairs
    widen (int32↔int64 → int64, float32↔float64 → float64,
    string↔large_string → large_string, mixed timestamp units → the
    finer unit — which also makes equal instants hash equal).
    Cross-kind pairs (int vs float, numeric vs string, ...) raise a
    driver-side TypeError instead of failing deep inside a Ray task."""
    if lt.equals(rt):
        return None
    kl, kr = _type_kind(lt), _type_kind(rt)
    if kl != kr or kl.startswith("other"):
        raise TypeError(
            f"exchange_join: incompatible key types {lt} vs {rt}; "
            "cast one side explicitly before joining")
    if kl == "int":
        return pa.int64()
    if kl == "float":
        return pa.float64()
    if kl == "ts":
        units = ["s", "ms", "us", "ns"]
        u = units[max(units.index(lt.unit), units.index(rt.unit))]
        return pa.timestamp(u, tz=lt.tz or rt.tz)
    if kl == "temporal":
        raise TypeError(
            f"exchange_join: incompatible key types {lt} vs {rt}; "
            "cast one side explicitly before joining")
    return pa.large_string()


def _with_key_types(schema: pa.Schema, on: Sequence[str],
                    casts: Sequence[pa.DataType | None]) -> pa.Schema:
    for c, ct in zip(on, casts):
        if ct is not None:
            i = schema.get_field_index(c)
            schema = schema.set(i, pa.field(c, ct))
    return schema


def _key_hash_column(t: pa.Table, on: Sequence[str],
                     kinds: Sequence[str]) -> np.ndarray:
    """uint64 row hash over the key columns (null → fixed sentinel;
    nulls never match in the per-shard join, they only need A home)."""
    h = None
    for c, k in zip(on, kinds):
        a = t.column(c)
        if k == "int":
            v = pc.fill_null(pc.cast(a, pa.int64()), int(_NULL_I64))
            col = splitmix64(v.to_numpy(zero_copy_only=False)
                             .astype(np.int64).view(np.uint64))
        elif k == "float":
            v = pc.fill_null(pc.cast(a, pa.float64()), float("nan"))
            f = np.nan_to_num(v.to_numpy(zero_copy_only=False),
                              nan=-7.25e307)
            # -0.0 + 0.0 == +0.0: join-equal zeros must hash equal
            col = splitmix64((f + 0.0).view(np.uint64))
        elif k == "temporal":
            v = pc.fill_null(pc.cast(a, pa.int64()), int(_NULL_I64))
            col = splitmix64(v.to_numpy(zero_copy_only=False)
                             .astype(np.int64).view(np.uint64))
        else:
            s = pc.coalesce(pc.cast(a, pa.string()), pa.scalar("\x00null"))
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            col = hash_strings(s.to_numpy(zero_copy_only=False))
        h = col if h is None else splitmix64(h ^ col)
    return h


def _append_pk(on: Sequence[str], kinds: Sequence[str],
               casts: Sequence[pa.DataType | None] | None = None) -> MapFn:
    on, kinds = list(on), list(kinds)
    casts = list(casts) if casts is not None else [None] * len(on)

    def fn(t: pa.Table) -> pa.Table:
        if "__pk" in t.column_names:
            t = t.drop_columns(["__pk"])
        for c, ct in zip(on, casts):
            if ct is not None:
                t = t.set_column(t.column_names.index(c), c,
                                 pc.cast(t.column(c), ct))
        h = _key_hash_column(t, on, kinds)
        return t.append_column(
            "__pk", pa.array(h.view(np.int64), type=pa.int64()))
    return fn


def _norm_float_keys(t: pa.Table, keys) -> pa.Table:
    """-0.0 → +0.0 on float key columns (x + 0.0; nulls/NaN preserved):
    SQL equality has -0.0 = 0.0 but Acero's join hash does not."""
    for c in keys:
        typ = t.schema.field(c).type
        if pa.types.is_floating(typ):
            t = t.set_column(t.column_names.index(c), c,
                             pc.add(t.column(c), pa.scalar(0.0, type=typ)))
    return t


@ray.remote
def _join_reduce(n_left: int, on, right_on, join_type: str,
                 left_suffix, right_suffix, coalesce_keys,
                 *shards: pa.Table) -> pa.Table:
    l = shards[0] if n_left == 1 else pa.concat_tables(shards[:n_left])
    rs = shards[n_left:]
    r = rs[0] if len(rs) == 1 else pa.concat_tables(rs)
    l, r = l.drop_columns(["__pk"]), r.drop_columns(["__pk"])
    l, r = _norm_float_keys(l, on), _norm_float_keys(r, right_on)
    on, right_on = list(on), list(right_on)
    salted = "__salt" in l.column_names
    if salted:
        on, right_on = on + ["__salt"], right_on + ["__salt"]
    out = l.join(r, keys=on, right_keys=right_on,
                 join_type=join_type, left_suffix=left_suffix,
                 right_suffix=right_suffix, coalesce_keys=coalesce_keys,
                 use_threads=False)
    if salted:
        # with coalesce_keys=False Acero keeps BOTH sides' key columns
        # (possibly suffixed, possibly two columns both named __salt) —
        # drop every salt column by position, not by (ambiguous) name
        names = {"__salt", f"__salt{left_suffix or ''}",
                 f"__salt{right_suffix or ''}"}
        for i in reversed([i for i, n in enumerate(out.column_names)
                           if n in names]):
            out = out.remove_column(i)
    return out


def _pa_schema(ds: Dataset,
               refs: Sequence["ray.ObjectRef"] | None = None) -> pa.Schema:
    s = ds.schema()
    if s is not None:
        base = getattr(s, "base_schema", s)
        if isinstance(base, pa.Schema):
            return base
        return pa.schema(list(zip(s.names, s.types)))
    # empty datasets can lose their schema; a block may still carry it
    for r in refs or []:
        sch = ray.get(r).schema
        if len(sch) > 0:
            return sch
    raise ValueError("cannot determine schema of an empty dataset")


def _salted_maps(base_l: MapFn, base_r: MapFn, salt: int):
    """Hot-key defense: the left side's rows for ANY key spread across
    ``salt`` sub-buckets (round-robin within each map task — any
    assignment is correct), while every right row is replicated into
    all ``salt`` sub-buckets, so each sub-bucket holds a full copy of
    its key's build side."""
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def lmap(t: pa.Table) -> pa.Table:
        t = base_l(t)
        h = t.column("__pk").to_numpy(zero_copy_only=False).view(np.uint64)
        s = (np.arange(len(h), dtype=np.uint64) % np.uint64(salt))
        pk = splitmix64(h + s * GOLD)
        t = t.set_column(t.column_names.index("__pk"), "__pk",
                         pa.array(pk.view(np.int64), type=pa.int64()))
        # __salt joins as an extra key: two sub-buckets of one hot key
        # can collide into the same reduce shard, where they must NOT
        # cross-match (that would duplicate every pair)
        return t.append_column("__salt",
                               pa.array(s.view(np.int64), type=pa.int64()))

    def rmap(t: pa.Table) -> pa.Table:
        t = base_r(t)
        n = t.num_rows
        h = t.column("__pk").to_numpy(zero_copy_only=False).view(np.uint64)
        idx = np.repeat(np.arange(n), salt)
        s = np.tile(np.arange(salt, dtype=np.uint64), n)
        pk = splitmix64(h[idx] + s * GOLD)
        out = t.take(pa.array(idx))
        out = out.set_column(out.column_names.index("__pk"), "__pk",
                             pa.array(pk.view(np.int64), type=pa.int64()))
        return out.append_column("__salt",
                                 pa.array(s.view(np.int64), type=pa.int64()))

    return lmap, rmap


def exchange_join(
    left: Dataset, right: Dataset, on: Sequence[str],
    right_on: Sequence[str] | None = None, how: str = "inner",
    num_partitions: int | None = None,
    left_suffix: str | None = None, right_suffix: str | None = None,
    map_tasks: int | None = None, coalesce_keys: bool = True,
    salt: int | None = None,
) -> Dataset:
    """Distributed equality join on the hash exchange (see module note
    above).  ``how`` ∈ {inner, left_outer, right_outer, full_outer,
    semi, anti}; output column naming is Acero's (keys coalesced, right
    key column dropped for inner/left; ``coalesce_keys=False`` keeps
    both sides' key columns — the reference's outer-join output shape,
    int_outer_join_sorted_asc.tbl).

    ``salt`` (hot-key defense): split every key's LEFT rows across
    ``salt`` sub-buckets and replicate the RIGHT side into each, so a
    skewed probe key no longer lands whole on one reduce.  Right-side
    volume multiplies by ``salt`` — use when the build side is modest
    but a probe key is hot.  Only valid for how ∈ {inner, left,
    left_outer, semi, anti}: right/full outer would emit unmatched
    right rows once per replica."""
    on = list(on)
    right_on = list(right_on or on)
    jt = _ACERO_HOW[how]
    if salt and salt > 1 and how in ("right_outer", "full_outer"):
        raise ValueError("salt is not valid for right/full outer joins")
    lrefs, rrefs = list(left.to_arrow_refs()), list(right.to_arrow_refs())
    ls, rs = _pa_schema(left, lrefs), _pa_schema(right, rrefs)
    casts = [_common_key_type(ls.field(a).type, rs.field(b).type)
             for a, b in zip(on, right_on)]
    ls = _with_key_types(ls, on, casts)
    rs = _with_key_types(rs, right_on, casts)
    kinds = [_hash_kind(ls.field(a).type, rs.field(b).type)
             for a, b in zip(on, right_on)]
    cpus = int(ray.cluster_resources().get("CPU", 8))
    P = num_partitions or max(2, cpus)
    if not (salt and salt > 1):
        # auto-hierarchical: enforce the ~10^5 shuffle-object contract
        # (per side).  Rewrap the already-executed refs so the
        # hierarchical path doesn't re-run the input pipelines.
        m = map_tasks or min(max(len(lrefs), len(rrefs), 1),
                             max(1, cpus))
        g = _auto_groups(m, P)
        if g is not None and 1 < g < P:
            return exchange_join_hierarchical(
                ray.data.from_arrow_refs(lrefs) if lrefs else left,
                ray.data.from_arrow_refs(rrefs) if rrefs else right,
                on, right_on=right_on, how=how, num_partitions=P,
                num_groups=g, left_suffix=left_suffix,
                right_suffix=right_suffix, map_tasks=map_tasks,
                coalesce_keys=coalesce_keys)
    ls_pk = ls.append(pa.field("__pk", pa.int64()))
    rs_pk = rs.append(pa.field("__pk", pa.int64()))
    lmap = _append_pk(on, kinds, casts)
    rmap = _append_pk(right_on, kinds, casts)
    if salt and salt > 1:
        lmap, rmap = _salted_maps(lmap, rmap, int(salt))
        ls_pk = ls_pk.append(pa.field("__salt", pa.int64()))
        rs_pk = rs_pk.append(pa.field("__salt", pa.int64()))
    lsh = (_shard_side(lrefs, lmap, "__pk", P, ls_pk,
                       map_tasks=map_tasks) if lrefs else [])
    rsh = (_shard_side(rrefs, rmap, "__pk", P, rs_pk,
                       map_tasks=map_tasks) if rrefs else [])
    l_empty = r_empty = None
    if not lsh:
        l_empty = ray.put(ls_pk.empty_table())
    if not rsh:
        r_empty = ray.put(rs_pk.empty_table())
    out = []
    for p in range(P):
        lrefs_p = [sl[p] for sl in lsh] if lsh else [l_empty]
        rrefs_p = [sl[p] for sl in rsh] if rsh else [r_empty]
        out.append(_join_reduce.remote(
            len(lrefs_p), on, right_on, jt, left_suffix, right_suffix,
            coalesce_keys, *lrefs_p, *rrefs_p))
    return ray.data.from_arrow_refs(out)


@ray.remote
def _group_join(on, right_on, jt, left_suffix, right_suffix,
                coalesce_keys, per_group, lt: pa.Table,
                rt: pa.Table) -> list[pa.Table]:
    """Level-2 of the hierarchical join: split BOTH group tables into
    their local shards on the (already computed) __pk and join each
    pair — one task per group, ``per_group`` local Acero joins."""
    def local(t: pa.Table) -> list[pa.Table]:
        pk = t.column("__pk").to_numpy(zero_copy_only=False)
        # re-mix before the modulo: the group id was splitmix64(pk)%G,
        # so splitmix64(pk)%per_group would CORRELATE with it (all of a
        # group's rows in one sub-shard when G and per_group share
        # factors); xor-shifting first decorrelates the two levels
        mixed = splitmix64(pk.view(np.uint64)
                           ^ np.uint64(0xA5A5A5A5A5A5A5A5))
        ids = (mixed % np.uint64(per_group)).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        bounds = np.searchsorted(ids[order], np.arange(per_group + 1))
        clustered = t.take(pa.array(order))
        return [clustered.slice(int(bounds[i]),
                                int(bounds[i + 1] - bounds[i]))
                for i in range(per_group)]

    lps, rps = local(lt), local(rt)
    out = []
    for lp_t, rp_t in zip(lps, rps):
        l = _norm_float_keys(lp_t.drop_columns(["__pk"]), on)
        r = _norm_float_keys(rp_t.drop_columns(["__pk"]), right_on)
        out.append(l.join(r, keys=list(on), right_keys=list(right_on),
                          join_type=jt, left_suffix=left_suffix,
                          right_suffix=right_suffix,
                          coalesce_keys=coalesce_keys, use_threads=False))
    return out[0] if per_group == 1 else tuple(out)


def exchange_join_hierarchical(
    left: Dataset, right: Dataset, on: Sequence[str],
    right_on: Sequence[str] | None = None, how: str = "inner",
    num_partitions: int | None = None, num_groups: int | None = None,
    left_suffix: str | None = None, right_suffix: str | None = None,
    map_tasks: int | None = None, coalesce_keys: bool = True,
) -> Dataset:
    """Two-level exchange join — the >10³-core variant of
    :func:`exchange_join` (same semantics, same per-shard Acero join):
    both sides route level-1 to ``num_groups`` GROUPS on the key hash
    (M×G objects per side instead of M×S), and each group task splits
    its two tables into ``num_partitions/num_groups`` local shard pairs
    and joins them.  Sub-shard assignment inside a group re-mixes the
    key hash, so equal keys meet by construction."""
    on = list(on)
    right_on = list(right_on or on)
    jt = _ACERO_HOW[how]
    cpus = int(ray.cluster_resources().get("CPU", 8))
    P = num_partitions or max(2, cpus)
    G = num_groups or max(1, int(math.isqrt(P)))
    if P % G:
        raise ValueError("num_partitions must be a multiple of num_groups")
    per_group = P // G
    lrefs, rrefs = list(left.to_arrow_refs()), list(right.to_arrow_refs())
    ls, rs = _pa_schema(left, lrefs), _pa_schema(right, rrefs)
    casts = [_common_key_type(ls.field(a).type, rs.field(b).type)
             for a, b in zip(on, right_on)]
    ls = _with_key_types(ls, on, casts)
    rs = _with_key_types(rs, right_on, casts)
    kinds = [_hash_kind(ls.field(a).type, rs.field(b).type)
             for a, b in zip(on, right_on)]
    ls_pk = ls.append(pa.field("__pk", pa.int64()))
    rs_pk = rs.append(pa.field("__pk", pa.int64()))

    def group_route(base: MapFn) -> MapFn:
        # route level-1 on hash(key) % G, carried in a SEPARATE column
        # so __pk (the raw key hash) survives for level 2
        def fn(t: pa.Table) -> pa.Table:
            t = base(t)
            pk = t.column("__pk").to_numpy(zero_copy_only=False)
            g = partition_ids(pk, G)
            return t.append_column("__grp", pa.array(g, type=pa.int64()))
        return fn

    lg = ls_pk.append(pa.field("__grp", pa.int64()))
    rg = rs_pk.append(pa.field("__grp", pa.int64()))
    lmap = group_route(_append_pk(on, kinds, casts))
    rmap = group_route(_append_pk(right_on, kinds, casts))
    lsh = (_shard_side(lrefs, lmap, "__grp", G, lg, map_tasks=map_tasks,
                       key_is_shard=True) if lrefs else [])
    rsh = (_shard_side(rrefs, rmap, "__grp", G, rg, map_tasks=map_tasks,
                       key_is_shard=True) if rrefs else [])
    l_empty = ray.put(lg.empty_table())
    r_empty = ray.put(rg.empty_table())
    out: list = []
    for g in range(G):
        lt = (_concat_shards.remote(*[sl[g] for sl in lsh]) if lsh
              else l_empty)
        rt = (_concat_shards.remote(*[sl[g] for sl in rsh]) if rsh
              else r_empty)
        parts = _group_join.options(num_returns=per_group).remote(
            on, right_on, jt, left_suffix, right_suffix, coalesce_keys,
            per_group, _drop_grp.remote(lt), _drop_grp.remote(rt))
        out.extend([parts] if per_group == 1 else list(parts))
    return ray.data.from_arrow_refs(out)


@ray.remote
def _drop_grp(t: pa.Table) -> pa.Table:
    return t.drop_columns(["__grp"]) if "__grp" in t.column_names else t


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
