"""Partition-level grouping kernels.

``groupby(key).map_groups(fn)`` pays one Ray task + Python call +
Arrow-table construction PER GROUP — ruinous when groups are tiny and
numerous (LSH band keys, winnowing fingerprints, pair dedup: millions
of 1-2-row groups).  The scalable shape is:

1. add a ``pkey = hash(key) % P`` column (vectorized),
2. ``groupby("pkey").map_groups(partition_fn)`` — exactly P calls,
3. inside the partition, sort by the real key with ``np.lexsort`` and
   process ALL groups with reduceat/boundary vectorization, dropping to
   a Python loop only for the rare multi-member groups.

Same shuffle (hash on the key), same co-location guarantee (equal keys
⇒ equal pkey ⇒ same partition), 10-100× less per-group overhead.  This
mirrors the reference's design: AggregateHash partitions chunks by a
radix of the key hash and runs a tight per-partition loop
(aggregate_hash.cpp:260,308), never a task per group.
"""

from __future__ import annotations

import numpy as np

from hyrise_generalized_dedup_ray.functions.hashing import splitmix64

_U64 = np.uint64


def partition_ids(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """int64/uint64 key array → int64 partition id in [0, P)."""
    k = np.asarray(keys)
    if k.dtype != np.uint64:
        k = k.astype(np.int64).view(np.uint64)
    return (splitmix64(k) % _U64(num_partitions)).astype(np.int64)


def group_boundaries(*sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-key runs in already-sorted key columns."""
    n = len(sorted_keys[0])
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    change = np.zeros(n - 1, dtype=bool)
    for k in sorted_keys:
        change |= k[1:] != k[:-1]
    idx = np.flatnonzero(change) + 1
    starts = np.concatenate([[0], idx])
    ends = np.concatenate([idx, [n]])
    return starts, ends


def sort_groups(
    keys: tuple[np.ndarray, ...],
    order_by: tuple[np.ndarray, ...] = (),
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort rows by ``keys`` (group identity) then ``order_by`` (order
    *within* a group — NOT part of the group key), and return
    ``(order, starts, ends)`` where starts/ends delimit equal-``keys``
    runs in the sorted view."""
    keys = tuple(keys)
    order_by = tuple(order_by)
    # np.lexsort: LAST array is the primary sort key
    order = np.lexsort(tuple(reversed(order_by)) + tuple(reversed(keys)))
    sorted_keys = [k[order] for k in keys]
    starts, ends = group_boundaries(*sorted_keys)
    return order, starts, ends
