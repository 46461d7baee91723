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
    """(a,b) + docs(doc_id,text) → (a, b, text_a, text_b) WITHOUT joins.

    Two ``Dataset.join`` calls here cost 2×num_partitions aggregator
    ACTOR spawns plus empty-block healing repartitions — measured 5×
    slower at 32 CPUs than the data itself warrants.  Instead, the
    melt → attach → pivot shape uses the engine's partition-grouping
    pattern (functions/grouping) end to end:

    1. melt each pair into two rows keyed by one endpoint; union with
       the doc rows (side=-1) under the same doc-hash pkey;
    2. per partition, build the local doc_id→text dict and stamp each
       pair-side row with its endpoint's text (each doc's text ships
       ONCE, not once per pair);
    3. regroup by the pair hash and zip side 0 + side 1 together.
    """
    from hyrise_generalized_dedup_ray.functions.grouping import (
        partition_ids, sort_groups)
    from hyrise_generalized_dedup_ray.functions.hashing import mix2

    P = num_partitions

    def melt(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        key = np.concatenate([a, b])
        aa = np.concatenate([a, a])
        bb = np.concatenate([b, b])
        side = np.concatenate([np.zeros(len(a), np.int64),
                               np.ones(len(b), np.int64)])
        return pa.table({
            "key": pa.array(key, type=pa.int64()),
            "a": pa.array(aa, type=pa.int64()),
            "b": pa.array(bb, type=pa.int64()),
            "side": pa.array(side, type=pa.int64()),
            "text": pa.array([None] * len(key), type=pa.string()),
            "pkey": pa.array(partition_ids(key, P), type=pa.int64()),
        })

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        z = np.zeros(len(ids), np.int64)
        return pa.table({
            "key": pa.array(ids, type=pa.int64()),
            "a": pa.array(z, type=pa.int64()),
            "b": pa.array(z, type=pa.int64()),
            "side": pa.array(np.full(len(ids), -1, np.int64)),
            "text": pc_cast_string(batch.column("text")),
            "pkey": pa.array(partition_ids(ids, P), type=pa.int64()),
        })

    def attach(part: pa.Table) -> pa.Table:
        side = part.column("side").to_numpy(zero_copy_only=False)
        keys = part.column("key").to_numpy(zero_copy_only=False)
        texts = part.column("text")
        dmask = side == -1
        lookup: dict[int, str] = {}
        for i in np.flatnonzero(dmask):
            lookup[int(keys[i])] = texts[i].as_py()
        pmask = ~dmask
        idx = np.flatnonzero(pmask)
        a = part.column("a").to_numpy(zero_copy_only=False)[idx]
        b = part.column("b").to_numpy(zero_copy_only=False)[idx]
        sd = side[idx]
        ktexts = [lookup.get(int(k)) for k in keys[idx]]
        pk2 = partition_ids(
            mix2(a.view(np.uint64), b.view(np.uint64)), P)
        return pa.table({
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
            "side": pa.array(sd, type=pa.int64()),
            "text": pa.array(ktexts, type=pa.string()),
            "pkey2": pa.array(pk2, type=pa.int64()),
        })

    def pivot(part: pa.Table) -> pa.Table:
        a = part.column("a").to_numpy(zero_copy_only=False)
        b = part.column("b").to_numpy(zero_copy_only=False)
        side = part.column("side").to_numpy(zero_copy_only=False)
        order, starts, ends = sort_groups((a, b), order_by=(side,))
        a, b, side = a[order], b[order], side[order]
        texts = part.column("text").take(pa.array(order))
        out_a: list[int] = []
        out_b: list[int] = []
        out_ta: list[str] = []
        out_tb: list[str] = []
        for s, e in zip(starts, ends):
            if e - s != 2:        # orphan (text missing) — drop
                continue
            ta, tb = texts[s].as_py(), texts[s + 1].as_py()
            if ta is None or tb is None:
                continue
            out_a.append(int(a[s]))
            out_b.append(int(b[s]))
            out_ta.append(ta)
            out_tb.append(tb)
        return pa.table({
            "a": pa.array(out_a, type=pa.int64()),
            "b": pa.array(out_b, type=pa.int64()),
            "text_a": pa.array(out_ta, type=pa.string()),
            "text_b": pa.array(out_tb, type=pa.string()),
        })

    docs = docs.select_columns(["doc_id", "text"])
    melted = pairs.map_batches(melt, batch_format="pyarrow",
                               zero_copy_batch=True)
    drows = docs.map_batches(doc_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
    attached = melted.union(drows).groupby("pkey").map_groups(
        attach, batch_format="pyarrow")
    return attached.groupby("pkey2").map_groups(pivot, batch_format="pyarrow")


def pc_cast_string(arr):
    import pyarrow.compute as pc

    return arr if pa.types.is_string(arr.type) else pc.cast(arr, pa.string())


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
    concurrency: int = 8,
) -> Dataset:
    """Candidate pairs → verified near-duplicate edges (a,b).

    The verifier runs as plain tasks (warm-worker reuse, elastic
    parallelism) — its only state is the config; see the process-cache
    note in stages/signatures.py for when an actor pool is the right
    shape instead."""

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
