"""LSH candidate generation: band-key explode → hash exchange →
per-band candidate rule (salt/cap/bridge) → pair dedup.

The band-key co-location is the pipeline's dominant all-to-all
movement (SURVEY.md §7.4); skew is handled *explicitly* per the north
rule by the shared candidate rule
``functions.pairs.band_group_candidates``: band groups over
``EngineConfig.band_salt_threshold`` docs are salted into
``band_salt_buckets`` deterministic sub-groups (splitmix64 of the doc
id), pairs are emitted per sub-group under ``max_pairs_per_band``
caps, and bridge pairs link consecutive sub-group minima so a
genuinely duplicate mega-band stays connected.

Execution shape: ONE hash exchange (stages/exchange — map-side split
on ``hash(band_key) % P``, per-shard vectorized kernel).  Every band
group lands whole in exactly one reduce and the rule runs locally — no
global hot-key pre-count pass, no second salted shuffle, no
driver-side bridge assembly, and no sort-based-shuffle coordination
(all four existed in earlier revisions; the rule's semantics are
bit-identical because the salt assignment is a pure function of doc
id).

Scale note (10^12 docs): the reduce holding a mega-band must hold its
(band_key, doc_id) rows — 16 bytes/doc, so even a pathological
10^8-member boilerplate band is ~1.6 GB in ONE reduce while every
other shard streams normally.  If a corpus exceeds that, re-shard the
explode output by ``(band_key, salt_of(doc_id))`` first and emit
per-sub-group minima markers for driver bridge assembly — the rule is
factored so both physical layouts produce the identical candidate set.

The reference has no skew defense beyond radix partitioning
(join_hash.hpp:36, SURVEY.md §4.1) — this stage is where our engine
must do better, because Common-Crawl boilerplate creates mega-bands.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.config import EngineConfig
from hyrise_generalized_dedup_ray.functions.grouping import (
    partition_ids,
    sort_groups,
)
from hyrise_generalized_dedup_ray.functions.hashing import mix2
from hyrise_generalized_dedup_ray.functions.pairs import band_group_candidates
from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange_refs

_I64 = pa.int64()
_BAND_SCHEMA = pa.schema([("band_key", _I64), ("doc_id", _I64)])
_PAIR_SCHEMA = pa.schema([("a", _I64), ("b", _I64)])


def explode_band_block(block: pa.Table) -> pa.Table:
    """One signer block → (band_key, doc_id) rows.  Docs with zero
    shingles are excluded — their band keys are degenerate (see
    functions.minhash.band_keys)."""
    block = block.select(["doc_id", "band_keys", "num_shingles"])
    block = block.filter(pa.compute.greater(block["num_shingles"], 0))
    lists = block.column("band_keys").combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    counts = np.diff(lists.offsets.to_numpy())
    ids = np.repeat(block.column("doc_id").to_numpy(zero_copy_only=False),
                    counts)
    return pa.table({
        # int64 bit-cast: group keys stay int64 end-to-end
        "band_key": pa.array(flat, type=_I64),
        "doc_id": pa.array(ids, type=_I64),
    })


def explode_band_keys(signatures: Dataset) -> Dataset:
    """Dataset view of :func:`explode_band_block` (tests/tools)."""
    return signatures.select_columns(
        ["doc_id", "band_keys", "num_shingles"]
    ).map_batches(explode_band_block, batch_format="pyarrow",
                  zero_copy_batch=True)


def _band_pairs_kernel(part: pa.Table, salt_threshold: int,
                       salt_buckets: int, pair_cap: int,
                       full_max: int) -> pa.Table:
    """One shard of (band_key, doc_id) rows; groups resolved with
    lexsort + boundary scan.  Small groups (the overwhelming majority —
    C(n,2) under the cap) emit their pairs VECTORIZED per size class;
    only capped/salted groups fall back to the shared per-group rule
    (band_group_candidates) — semantics identical because the
    vectorized form IS emit_group_pairs' all-pairs branch."""
    bk = part.column("band_key").to_numpy(zero_copy_only=False)
    ids = part.column("doc_id").to_numpy(zero_copy_only=False)
    order, starts, ends = sort_groups((bk,), order_by=(ids,))
    bk, ids = bk[order], ids[order]
    # drop duplicate (band, doc) rows, recompute boundaries
    if len(bk):
        keep = np.concatenate(
            [[True], (bk[1:] != bk[:-1]) | (ids[1:] != ids[:-1])])
        bk, ids = bk[keep], ids[keep]
        idx = np.flatnonzero(bk[1:] != bk[:-1]) + 1
        starts = np.concatenate([[0], idx])
        ends = np.concatenate([idx, [len(bk)]])
    sizes = ends - starts
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    small = (sizes >= 2) & (sizes <= full_max)
    for s in np.unique(sizes[small]):
        g_starts = starts[small & (sizes == s)]
        # (g, s) matrix of each group's sorted unique ids
        m = ids[g_starts[:, None] + np.arange(s)]
        iu, ju = np.triu_indices(int(s), 1)
        a_parts.append(m[:, iu].ravel())
        b_parts.append(m[:, ju].ravel())
    a_out: list[int] = []
    b_out: list[int] = []
    for gi in np.flatnonzero(sizes > full_max):
        pairs, _salted, _trunc = band_group_candidates(
            ids[starts[gi]:ends[gi]], salt_threshold, salt_buckets,
            pair_cap)
        a_out.extend(p[0] for p in pairs)
        b_out.extend(p[1] for p in pairs)
    if a_out:
        a_parts.append(np.array(a_out, dtype=np.int64))
        b_parts.append(np.array(b_out, dtype=np.int64))
    a_all = np.concatenate(a_parts) if a_parts else \
        np.empty(0, dtype=np.int64)
    b_all = np.concatenate(b_parts) if b_parts else \
        np.empty(0, dtype=np.int64)
    return pa.table({
        "a": pa.array(a_all, type=_I64),
        "b": pa.array(b_all, type=_I64),
    })


def candidate_pairs(
    signatures: Dataset,
    eng: EngineConfig,
    num_partitions: int = 64,
    dedupe: bool = True,
) -> tuple[Dataset, dict]:
    """Signatures → candidate pair Dataset (a:i64, b:i64), deduplicated
    unless ``dedupe=False`` (the flagship passes False: its verifier
    collects pairs for the broadcast index anyway and dedups there,
    saving this extra all-to-all of the pair set).

    Semantics are the oracle's ``band_group_candidates`` applied per
    full band group — the kernel literally calls that shared function,
    so the distributed and sequential candidate sets are identical by
    construction.
    """
    metrics: dict = {}

    # largest group size whose full pair set fits under the cap —
    # such groups take the vectorized all-pairs path in the kernel
    full_max = 2
    while (full_max + 1) * full_max // 2 <= eng.max_pairs_per_band:
        full_max += 1
    full_max = min(full_max - 1, eng.band_salt_threshold)

    P = max(num_partitions,
            2 * int(ray.cluster_resources().get("CPU", 8)))
    refs = hash_exchange_refs(
        signatures.to_arrow_refs(), explode_band_block, "band_key",
        functools.partial(_band_pairs_kernel,
                          salt_threshold=eng.band_salt_threshold,
                          salt_buckets=eng.band_salt_buckets,
                          pair_cap=eng.max_pairs_per_band,
                          full_max=full_max),
        P, _BAND_SCHEMA)
    raw = ray.data.from_arrow_refs(refs) if refs else \
        ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    if not dedupe:
        return raw, metrics
    return dedupe_pairs(raw, num_partitions), metrics


def _dedupe_kernel(part: pa.Table) -> pa.Table:
    a = part.column("a").to_numpy(zero_copy_only=False)
    b = part.column("b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    if len(a):
        sa, sb = a[order], b[order]
        keep = np.concatenate(
            [[True], (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])])
        order = order[keep]
    return part.take(pa.array(order))


def _add_pair_key(batch: pa.Table) -> pa.Table:
    a = batch.column("a").to_numpy(zero_copy_only=False).view(np.uint64)
    b = batch.column("b").to_numpy(zero_copy_only=False).view(np.uint64)
    pk = mix2(a, b).view(np.int64)
    return batch.append_column("__pairkey", pa.array(pk, type=_I64))


def dedupe_pairs(pairs: Dataset, num_partitions: int = 32) -> Dataset:
    """Drop duplicate (a,b) rows: ONE hash exchange on a mix of the
    pair ids, fully vectorized unique inside each shard (equal pairs
    co-locate by construction).  Extra columns ride along; the first
    row of each (a,b) group survives."""

    def kernel(part: pa.Table) -> pa.Table:
        return _dedupe_kernel(part.drop_columns(["__pairkey"]))

    schema = pairs.schema()
    base = pa.schema([(n, t) for n, t in zip(schema.names, schema.types)])
    melt_schema = base.append(pa.field("__pairkey", _I64))
    refs = hash_exchange_refs(
        pairs.to_arrow_refs(), _add_pair_key, "__pairkey", kernel,
        num_partitions, melt_schema)
    if not refs:
        return ray.data.from_arrow(base.empty_table())
    return ray.data.from_arrow_refs(refs)
