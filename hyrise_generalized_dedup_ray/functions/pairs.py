"""Deterministic candidate-pair emission and group-chunking rules.

These small pure functions define the *semantics* of candidate
generation under group-size caps.  They are shared verbatim by the
distributed stages and the sequential reference oracle, so both engines
emit byte-identical candidate sets — group capping is part of the
algorithm's definition, not a per-engine heuristic (the "no silent
caps" rule: callers log whenever ``truncated`` comes back True).

Analogy in the reference: JoinHash caps/partitions its build side by
radix bits computed from input sizes (join_hash.hpp:36) — a
deterministic function of the data, identical across runs.
"""

from __future__ import annotations

import numpy as np

# docs per suffix-array partition (chunk_with_anchor bound) — shared
# semantic constant: changing it changes which edges exist.
SUBSTR_MAX_GROUP = 64


def emit_group_pairs(sorted_ids: np.ndarray, cap: int) -> tuple[list[tuple[int, int]], bool]:
    """Candidate pairs for one group of co-bucketed doc ids.

    ``sorted_ids`` must be sorted ascending and unique.  If the full
    pair count fits under ``cap``, emit all pairs.  Otherwise emit a
    star from the minimum id plus a ring of adjacent ids — that
    preserves connectivity of any true duplicate set that spans the
    group while bounding output to 2(n-1) pairs.  Returns
    ``(pairs, truncated)``.
    """
    ids = [int(x) for x in sorted_ids]
    n = len(ids)
    if n < 2:
        return [], False
    if n * (n - 1) // 2 <= cap:
        return [(ids[i], ids[j]) for i in range(n) for j in range(i + 1, n)], False
    star = [(ids[0], ids[i]) for i in range(1, n)]
    ring = [(ids[i], ids[i + 1]) for i in range(1, n - 1)]
    return star + ring, True


def chunk_with_anchor(sorted_ids: np.ndarray, max_docs: int) -> list[list[int]]:
    """Split one oversized group into chunks of ≤ ``max_docs`` docs,
    each chunk carrying the group's minimum id as an anchor so that any
    connectivity found inside a chunk links back through the anchor.
    """
    ids = [int(x) for x in sorted_ids]
    if len(ids) <= max_docs:
        return [ids]
    anchor, rest = ids[0], ids[1:]
    step = max_docs - 1
    return [[anchor] + rest[i : i + step] for i in range(0, len(rest), step)]


def docset_key(sorted_ids: np.ndarray) -> np.uint64:
    """Stable uint64 key of a sorted id set — used to deduplicate
    fingerprint groups that contain the same document set (a shared run
    of length L yields ~L/10 identical winnowed-fingerprint groups)."""
    arr = np.asarray(sorted_ids, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.uint64(0xCBF29CE484222325)
        for chunk in np.split(arr, range(4096, len(arr), 4096)):
            h = np.uint64(h * np.uint64(0x100000001B3)) + np.uint64(
                np.bitwise_xor.reduce(
                    (chunk + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xC2B2AE3D27D4EB4F)
                )
            ) + np.uint64(len(chunk))
    return h


def batch_docset_keys(ids: np.ndarray, starts: np.ndarray,
                      sizes: np.ndarray) -> np.ndarray:
    """docset_key for MANY concatenated groups at once, bit-identical
    to ``[docset_key(ids[s:s+n]) for s, n in zip(starts, sizes)]``.

    Groups ≤4096 ids (all but pathological ones) are a single chunk of
    docset_key's loop, so their hash is one ``bitwise_xor.reduceat``
    over the pre-mixed ids plus two scalar ops — the per-group Python
    call disappears.  Larger groups fall back to the loop form.
    """
    with np.errstate(over="ignore"):
        return batch_docset_keys_raw(ids, starts, sizes)


def batch_docset_keys_raw(ids: np.ndarray, starts: np.ndarray,
                          sizes: np.ndarray) -> np.ndarray:
    """:func:`batch_docset_keys` without the errstate guard — for hot
    per-group callers that hoist one ``np.errstate`` around their whole
    sweep (same rationale as substr._gram_hashes_raw)."""
    arr = np.asarray(ids, dtype=np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    sizes = np.asarray(sizes, dtype=np.int64)
    keys = np.empty(len(sizes), dtype=np.uint64)
    if len(sizes) == 0:
        return keys
    mixed = (arr + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xC2B2AE3D27D4EB4F)
    xor = np.bitwise_xor.reduceat(mixed, starts)
    # reduceat over a segment of length 1 returns the element; a
    # trailing empty segment can't occur (sizes >= 1 by contract)
    keys[:] = (np.uint64(0xCBF29CE484222325) * np.uint64(0x100000001B3)
               + xor + sizes.astype(np.uint64))
    big = np.flatnonzero(sizes > 4096)
    for i in big:
        keys[i] = docset_key(arr[starts[i]:starts[i] + sizes[i]])
    return keys


def salt_of(ids: np.ndarray, buckets: int) -> np.ndarray:
    """Deterministic salt bucket per doc id (splitmix64 mod buckets)."""
    from hyrise_generalized_dedup_ray.functions.hashing import splitmix64

    return (splitmix64(np.asarray(ids, dtype=np.int64).view(np.uint64).copy())
            % np.uint64(buckets)).astype(np.int64)


def band_group_candidates(
    sorted_ids: np.ndarray,
    salt_threshold: int,
    salt_buckets: int,
    pair_cap: int,
) -> tuple[list[tuple[int, int]], bool, bool]:
    """THE candidate rule for one LSH band group — shared semantics.

    Groups up to ``salt_threshold`` docs emit pairs directly
    (`emit_group_pairs`).  Hot bands are *salted*: members split into
    ``salt_buckets`` deterministic sub-groups (splitmix64(doc_id) mod
    buckets), pairs emitted per sub-group, plus bridge pairs linking
    the minima of consecutive non-empty sub-groups so a genuinely
    duplicate mega-band stays connected.  In the distributed pipeline
    the salt is a real shuffle-key column — sub-groups land on
    different reducers — while the sequential oracle calls this
    function directly; both produce the identical candidate set.

    Returns ``(pairs, salted, truncated)``.
    """
    ids = np.asarray(sorted_ids)
    if len(ids) <= salt_threshold:
        pairs, trunc = emit_group_pairs(ids, pair_cap)
        return pairs, False, trunc
    salts = salt_of(ids, salt_buckets)
    pairs: list[tuple[int, int]] = []
    truncated = False
    sub_minima: list[int] = []
    for s in range(salt_buckets):
        sub = ids[salts == s]
        if len(sub) == 0:
            continue
        sub_minima.append(int(sub[0]))
        p, t = emit_group_pairs(sub, pair_cap)
        pairs.extend(p)
        truncated = truncated or t
    for a, b in zip(sub_minima, sub_minima[1:]):
        lo, hi = (a, b) if a < b else (b, a)
        pairs.append((lo, hi))
    return pairs, True, truncated


class UnionFind:
    """Plain path-compressing union-find keyed by int — used by the
    sequential oracle and by the driver-side finisher for small edge
    sets (the distributed star-contraction handles the big case)."""

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:  # min id wins as root → labels are min(component)
            ra, rb = rb, ra
        self.parent[rb] = ra

    def labels(self, ids) -> dict[int, int]:
        return {int(i): self.find(int(i)) for i in ids}
