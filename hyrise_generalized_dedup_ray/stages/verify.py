"""Candidate verification: exact shingle Jaccard on candidate pairs,
plus exact-duplicate edges from text-hash groups.

The reference never trusts an approximate structure — hash-join probes
re-check keys, Bloom filters only *prune* (join_hash.hpp:54-58), and
DISTINCT is exact (SURVEY.md §2.8).  Likewise here: LSH only proposes,
the verdict is the exact Jaccard of the true shingle sets, recomputed
from text inside the stage (shipping shingle *sets* through the
shuffle would dwarf the text itself — SURVEY.md §7.5).

Pair → text lookup is a hash-shuffle `Dataset.join` on doc_id (both
sides large in general); a per-batch memo avoids re-shingling a text
that appears in many pairs of the same batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from hyrise_generalized_dedup_ray.config import SignatureConfig
from hyrise_generalized_dedup_ray.functions.text import (
    batch_shingles,
    jaccard_sorted,
    unique_shingle_sets,
)


def attach_texts(
    pairs: Dataset, docs: Dataset, num_partitions: int = 32
) -> Dataset:
    """(a,b) ⋈ docs(doc_id,text) twice → (a, b, text_a, text_b).

    Join fan-out scales with the session's CPU count (callers pass a
    cluster-derived ``num_partitions``); the floor of 4 only guards
    degenerate tiny sessions.  Each Dataset.join spawns one aggregator
    actor per partition — a fixed per-partition spawn cost that is paid
    once and amortized over the text payload, so width must follow the
    cluster (a hard cap here would freeze the pipeline's widest data
    movement at one node's worth of parallelism forever).  (A join-free
    melt→attach→pivot variant was tried and is slower: Ray's sort-based
    groupby handles large string payloads worse than the hash-shuffle
    join.)"""
    from hyrise_generalized_dedup_ray.util import heal_blocks

    num_partitions = max(4, num_partitions)

    # pairs come out of a groupby → may carry zero-column empty blocks
    # that break the join's schema resolution (util.heal_blocks)
    pairs = heal_blocks(pairs, max(2, num_partitions // 4))
    docs = docs.select_columns(["doc_id", "text"])
    j1 = pairs.join(
        docs, join_type="inner", num_partitions=num_partitions,
        on=("a",), right_on=("doc_id",),
    ).rename_columns({"text": "text_a"}).select_columns(["a", "b", "text_a"])
    # a join over sparse partitions can itself emit schema-less empties
    j1 = heal_blocks(j1, max(2, num_partitions // 4))
    j2 = j1.join(
        docs, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("doc_id",),
    ).rename_columns({"text": "text_b"}).select_columns(["a", "b", "text_a", "text_b"])
    return j2


# per-worker-process shingle-set cache: a hot document (boilerplate,
# big dup cluster) appears in thousands of candidate pairs spread over
# many batches — re-shingling it per batch dominated the verify stage.
# Keyed by (config hash, full text — exact, no collision risk); bounded FIFO.
_SHINGLE_CACHE: dict = {}
_SHINGLE_CACHE_MAX = 8192


class JaccardVerifier:
    """Batch verifier: exact shingle-set Jaccard ≥ threshold (runs as
    tasks; state is per-worker-process caches, see stages/signatures.py)."""

    def __init__(self, cfg: SignatureConfig):
        self.cfg = cfg
        self.cfg_key = cfg.config_hash()

    def _sets_for(self, texts: list[str]) -> list[np.ndarray]:
        cfg = self.cfg
        # resolve through a batch-local dict so FIFO eviction during
        # this batch's inserts can never invalidate this batch's lookups
        local: dict[str, np.ndarray] = {}
        for t in texts:
            if t not in local:
                cached = _SHINGLE_CACHE.get((self.cfg_key, t))
                if cached is not None:
                    local[t] = cached
        missing = [t for t in dict.fromkeys(texts) if t not in local]
        if missing:
            flat, offsets = batch_shingles(missing, cfg.shingle_n)
            for i, t in enumerate(missing):
                s = np.unique(flat[offsets[i]:offsets[i + 1]])
                local[t] = s
                if len(_SHINGLE_CACHE) >= _SHINGLE_CACHE_MAX:
                    _SHINGLE_CACHE.pop(next(iter(_SHINGLE_CACHE)))
                _SHINGLE_CACHE[(self.cfg_key, t)] = s
        return [local[t] for t in texts]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        # shingle each distinct text once per batch (cache-backed)
        uniq: dict[str, int] = {}
        order: list[str] = []
        for t in ta + tb:
            if t not in uniq:
                uniq[t] = len(order)
                order.append(t)
        sets = self._sets_for(order)
        jac = np.fromiter(
            (jaccard_sorted(sets[uniq[x]], sets[uniq[y]]) for x, y in zip(ta, tb)),
            dtype=np.float64, count=len(ta),
        )
        keep = jac >= cfg.jaccard_threshold
        return pa.table({
            "a": batch.column("a").filter(pa.array(keep)),
            "b": batch.column("b").filter(pa.array(keep)),
        })


def verify_pairs(
    pairs: Dataset, docs: Dataset, cfg: SignatureConfig,
    batch_size: int = 2048, num_partitions: int = 32,
) -> Dataset:
    """Candidate pairs → verified near-duplicate edges (a,b).

    The verifier runs as plain tasks (warm-worker reuse, elastic
    parallelism — deliberately NO concurrency cap, so the stage widens
    with the cluster); see the process-cache note in
    stages/signatures.py for when an actor pool is the right shape."""

    with_texts = attach_texts(pairs, docs, num_partitions)

    def verify_batch(batch: pa.Table, cfg=cfg) -> pa.Table:
        return JaccardVerifier(cfg)(batch)

    return with_texts.map_batches(
        verify_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def exact_dup_edges(signatures: Dataset, num_partitions: int = 32) -> Dataset:
    """Edges between documents with byte-identical text.

    Hash-partition on text_hash (functions/grouping pattern — one call
    per partition, not per group); inside the partition, only hash
    groups with ≥2 rows are regrouped by the actual text to rule out
    64-bit collisions.  Star edges (min doc → others), the same rule as
    the oracle."""
    from hyrise_generalized_dedup_ray.functions.grouping import (
        partition_ids, sort_groups)

    def add_pkey(batch: pa.Table) -> pa.Table:
        th = batch.column("text_hash").to_numpy(zero_copy_only=False)
        pk = partition_ids(th, num_partitions)
        return batch.append_column("pkey", pa.array(pk, type=pa.int64()))

    def star_partition(part: pa.Table) -> pa.Table:
        th = part.column("text_hash").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        order, starts, ends = sort_groups((th,), order_by=(ids,))
        th, ids = th[order], ids[order]
        texts = part.column("text").take(pa.array(order))
        sizes = ends - starts
        a: list[int] = []
        b: list[int] = []
        for gi in np.flatnonzero(sizes >= 2):
            s, e = starts[gi], ends[gi]
            by_text: dict[str, list[int]] = {}
            for j in range(s, e):
                by_text.setdefault(texts[j].as_py(), []).append(int(ids[j]))
            for members in by_text.values():
                members.sort()
                a.extend(members[0] for _ in members[1:])
                b.extend(members[1:])
        return pa.table({
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
        })

    return (
        signatures.select_columns(["doc_id", "text", "text_hash"])
        .map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pkey")
        .map_groups(star_partition, batch_format="pyarrow")
    )
