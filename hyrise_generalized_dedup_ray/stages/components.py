"""Distributed connected components over hash-partitioned edge lists —
iterative star-contraction rounds.

Implements the alternating large-star / small-star algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond" /
"Finding connected components in map-reduce in logarithmic rounds"
(ICDE 2013, public literature — see PAPERS.md): each round is one
engine hash exchange over the edge list keyed on the node id
(stages/exchange.py — one move per row, no sort-based coordination),
converging in O(log n) rounds to star graphs whose centers are the
component minima.

- large-star: for every node u with neighborhood N(u) (edges in both
  orientations), link every neighbor v > u to m = min(N(u) ∪ {u}).
- small-star: orient edges (max→min); link every v in N(u) ∪ {u},
  v ≠ m, to m = min(N(u) ∪ {u}).

Convergence is detected by an order-insensitive edge-set checksum
(sum of mix2(u,v) + count), computed with a per-batch partial
aggregate.  A driver-side union-find finisher handles provably small
edge sets (≤ EngineConfig.small_cc_threshold) — the distributed rounds
are for the scale path where the edge list never fits one process.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from hyrise_generalized_dedup_ray.config import EngineConfig
from hyrise_generalized_dedup_ray.functions.hashing import mix2

# map-side output schema of the orientation fns (u, v, shard id)
_UVP_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                         ("pkey", pa.int64())])


def _both_orientations(batch: pa.Table, num_partitions: int = 32) -> pa.Table:
    from hyrise_generalized_dedup_ray.functions.grouping import partition_ids

    a = batch.column("a").to_numpy(zero_copy_only=False)
    b = batch.column("b").to_numpy(zero_copy_only=False)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    return pa.table({
        "u": pa.array(u, type=pa.int64()),
        "v": pa.array(v, type=pa.int64()),
        "pkey": pa.array(partition_ids(u, num_partitions), type=pa.int64()),
    })


def _group_node_stats(part: pa.Table):
    """(u_sorted, v_sorted, starts, ends, per-row group min incl. u)."""
    from hyrise_generalized_dedup_ray.functions.grouping import sort_groups

    u = part.column("u").to_numpy(zero_copy_only=False)
    v = part.column("v").to_numpy(zero_copy_only=False)
    order, starts, ends = sort_groups((u,))
    u, v = u[order], v[order]
    if len(u) == 0:
        return u, v, starts, ends, np.empty(0, dtype=np.int64)
    gmin_v = np.minimum.reduceat(v, starts)
    gmin = np.minimum(gmin_v, u[starts])        # min(N(u) ∪ {u})
    sizes = ends - starts
    row_gmin = np.repeat(gmin, sizes)
    return u, v, starts, ends, row_gmin


def _large_star_partition(part: pa.Table) -> pa.Table:
    """large-star, all groups of one hash partition vectorized:
    for each node u link every neighbor v > u to m = min(N(u) ∪ {u})."""
    u, v, starts, ends, row_gmin = _group_node_stats(part)
    mask = v > u
    vv, mm = v[mask], row_gmin[mask]
    return pa.table({
        "a": pa.array(np.minimum(vv, mm), type=pa.int64()),
        "b": pa.array(np.maximum(vv, mm), type=pa.int64()),
    })


def _orient_max_min(batch: pa.Table, num_partitions: int = 32) -> pa.Table:
    from hyrise_generalized_dedup_ray.functions.grouping import partition_ids

    a = batch.column("a").to_numpy(zero_copy_only=False)
    b = batch.column("b").to_numpy(zero_copy_only=False)
    u = np.maximum(a, b)
    return pa.table({
        "u": pa.array(u, type=pa.int64()),
        "v": pa.array(np.minimum(a, b), type=pa.int64()),
        "pkey": pa.array(partition_ids(u, num_partitions), type=pa.int64()),
    })


def _small_star_partition(part: pa.Table) -> pa.Table:
    """small-star vectorized: all v < u; link every node of
    N(u) ∪ {u} except m to m = min(N(u))."""
    u, v, starts, ends, row_gmin = _group_node_stats(part)
    mask = v != row_gmin
    a1 = row_gmin[mask]
    b1 = v[mask]
    # u itself links to m once per group (u > v ≥ m always ⇒ u ≠ m)
    if len(starts):
        gmin = row_gmin[starts]
        a2 = gmin
        b2 = u[starts]
    else:
        a2 = b2 = np.empty(0, dtype=np.int64)
    return pa.table({
        "a": pa.array(np.concatenate([a1, a2]), type=pa.int64()),
        "b": pa.array(np.concatenate([b1, b2]), type=pa.int64()),
    })


def _dedupe(edges: Dataset) -> Dataset:
    from hyrise_generalized_dedup_ray.stages.lsh import dedupe_pairs

    return dedupe_pairs(edges)


def _checksum(edges: Dataset) -> tuple[int, int]:
    """Order-insensitive (hash-sum, count) of the edge set."""

    def partial(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).view(np.uint64)
        b = batch.column("b").to_numpy(zero_copy_only=False).view(np.uint64)
        h = mix2(a, b)
        # accumulate in int64-safe space: sum mod 2^63 via uint64 wraparound
        with np.errstate(over="ignore"):
            s = np.uint64(h.sum())
        return pa.table({"s": pa.array([int(s % np.uint64(1 << 62))], type=pa.int64()),
                         "n": pa.array([len(h)], type=pa.int64())})

    agg = (
        edges.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )
    return int(agg["s"] or 0) % (1 << 62), int(agg["n"] or 0)


def star_contraction(edges: Dataset, eng: EngineConfig,
                     num_partitions: int = 32) -> tuple[Dataset, int]:
    """Iterate large-star/small-star until the edge set is stable.

    Returns ``(star_edges, rounds)``; ``star_edges`` connect each
    non-minimum node of a component to the component minimum.  Each
    round is ONE hash shuffle on the node id; the reducers run once per
    partition, fully vectorized (functions/grouping pattern).
    """
    import functools

    from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange

    current = _dedupe(edges)
    prev_sig = _checksum(current)
    rounds = 0
    orient_both = functools.partial(_both_orientations,
                                    num_partitions=num_partitions)
    orient_mm = functools.partial(_orient_max_min,
                                  num_partitions=num_partitions)
    for rounds in range(1, eng.cc_max_rounds + 1):
        # each half-round is ONE engine hash exchange routed on the
        # precomputed pkey (key_is_shard) — not Ray's sort-based
        # groupby, whose boundary sampling + barriers the exchange
        # module measured as the slow path (stages/exchange.py:5-11)
        ls = hash_exchange(
            current, orient_both, "pkey", _large_star_partition,
            num_shards=num_partitions, schema=_UVP_SCHEMA,
            key_is_shard=True)
        ss = hash_exchange(
            ls, orient_mm, "pkey", _small_star_partition,
            num_shards=num_partitions, schema=_UVP_SCHEMA,
            key_is_shard=True)
        current = _dedupe(ss).materialize()
        sig = _checksum(current)
        if sig == prev_sig:
            break
        prev_sig = sig
    return current, rounds


def labels_from_star_edges(star_edges: Dataset,
                           num_partitions: int = 32) -> Dataset:
    """Star edges → (doc_id, cluster) rows for every node in an edge."""
    import functools

    def node_min_partition(part: pa.Table) -> pa.Table:
        u, v, starts, ends, row_gmin = _group_node_stats(part)
        if len(starts) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "cluster": pa.array([], type=pa.int64())})
        return pa.table({
            "doc_id": pa.array(u[starts], type=pa.int64()),
            "cluster": pa.array(row_gmin[starts], type=pa.int64()),
        })

    from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange

    orient_both = functools.partial(_both_orientations,
                                    num_partitions=num_partitions)
    return hash_exchange(
        star_edges, orient_both, "pkey", node_min_partition,
        num_shards=num_partitions, schema=_UVP_SCHEMA, key_is_shard=True)


def connected_components(
    edges: Dataset, eng: EngineConfig, force_distributed: bool = False
) -> tuple[Dataset, dict]:
    """(a,b) edge Dataset → (doc_id, cluster) labels for edge nodes.

    Uses the distributed star-contraction when the edge set is large
    (or forced); otherwise finishes with a driver-side union-find —
    the reference-style exact finisher for provably small inputs
    (mirrors JoinHash's "smaller side builds" pragmatism,
    join_hash.hpp:20-46).
    """
    metrics: dict = {}
    n_edges = edges.count()
    metrics["input_edges"] = n_edges
    if force_distributed or n_edges > eng.small_cc_threshold:
        star, rounds = star_contraction(edges, eng)
        metrics["cc_mode"] = "star_contraction"
        metrics["cc_rounds"] = rounds
        return labels_from_star_edges(star), metrics

    metrics["cc_mode"] = "driver_union_find"
    tables = [t for t in ray.get(edges.to_arrow_refs())
              if t.num_columns > 0 and len(t)]
    if tables:
        full = pa.concat_tables(tables)
        a = full.column("a").to_numpy(zero_copy_only=False)
        b = full.column("b").to_numpy(zero_copy_only=False)
    else:
        a = b = np.empty(0, dtype=np.int64)
    nodes, labels = _vector_components(a, b)
    tbl = pa.table({
        "doc_id": pa.array(nodes, type=pa.int64()),
        "cluster": pa.array(labels, type=pa.int64()),
    })
    return ray.data.from_arrow(tbl), metrics


def _vector_components(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Min-label connected components over an in-memory edge list,
    fully vectorized (no per-edge Python loop): alternate edge-wise
    min-label hooking (``np.minimum.at``) with pointer-jumping
    compression until fixpoint — Shiloach-Vishkin-style, O(E) vector
    work per round, O(log n) rounds.  Produces the identical labeling
    as sequential union-find with min-id roots (functions.pairs
    UnionFind, which remains the oracle's reference implementation)."""
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.copy()
        m = np.minimum(label[ia], label[ib])
        np.minimum.at(label, ia, m)
        np.minimum.at(label, ib, m)
        while True:
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, before):
            break
    return nodes, nodes[label]
