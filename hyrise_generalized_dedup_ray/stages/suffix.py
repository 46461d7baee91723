"""Suffix-array substring stage: winnowing-fingerprint partitioning →
per-partition suffix array over concatenated text → ≥L-byte cross-doc
repeat edges.

Partitioning is **content-based**: documents sharing any verbatim run
of ≥ ``min_substring_bytes`` share a winnowed fingerprint (guarantee of
winnowing, functions/substr.py), so they co-locate deterministically —
there is no "same url-bucket" recall boundary.  Stages:

1. explode (fingerprint, doc_id) from the signer output and group by
   fingerprint; keep groups with ≥2 distinct docs (light shuffle —
   two u64s per fingerprint, no text);
2. deduplicate groups by their *document set* (a shared run of length
   R yields ~R/10 identical fingerprint groups — one suffix-array run
   suffices), via a groupby on ``docset_key``;
3. ship text only for surviving groups: explode membership, hash-join
   doc texts, regroup by docset;
4. per group: ``chunk_with_anchor`` (≤64 docs per partition, anchor =
   group min keeps chunks connected) → suffix array over the
   \\x00-joined concatenation → adjacent cross-doc pairs with
   sentinel-clamped LCP ≥ L (functions.substr.cross_doc_repeats).

This is the engine's recast of the reference's trained-dictionary LZ4
encoder (lz4_encoder.hpp:40-59): the shared substring discovered here
is the "base" every member deduplicates against.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from hyrise_generalized_dedup_ray.config import SignatureConfig
from hyrise_generalized_dedup_ray.functions.pairs import (
    SUBSTR_MAX_GROUP,
    chunk_with_anchor,
    docset_key,
)
from hyrise_generalized_dedup_ray.functions.substr import cross_doc_repeats


def explode_fingerprints(signatures: Dataset) -> Dataset:
    def explode(batch: pa.Table) -> pa.Table:
        lists = batch.column("fingerprints").combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        counts = np.diff(lists.offsets.to_numpy())
        ids = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), counts)
        return pa.table({
            "fp": pa.array(flat, type=pa.int64()),
            "doc_id": pa.array(ids, type=pa.int64()),
        })

    return signatures.select_columns(["doc_id", "fingerprints"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprint_groups(signatures: Dataset) -> Dataset:
    """→ rows (docset:u64, doc_id:i64), one row per member of each
    *distinct* multi-doc fingerprint group."""

    def members(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table({"docset": pa.array([], type=pa.uint64()),
                             "doc_id": pa.array([], type=pa.int64())})
        key = np.uint64(docset_key(ids)).view(np.int64)
        return pa.table({
            "docset": pa.array(np.full(len(ids), key, dtype=np.int64)),
            "doc_id": pa.array(ids, type=pa.int64()),
        })

    def first_docset(group: pa.Table) -> pa.Table:
        # identical doc sets hash to the same docset key → keep one copy
        ids = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
        key = group.column("docset")[0].as_py()
        return pa.table({
            "docset": pa.array(np.full(len(ids), key, dtype=np.int64)),
            "doc_id": pa.array(ids, type=pa.int64()),
        })

    exploded = explode_fingerprints(signatures)
    grouped = exploded.groupby("fp").map_groups(members, batch_format="pyarrow")
    return grouped.groupby("docset").map_groups(first_docset, batch_format="pyarrow")


def substring_edges(
    signatures: Dataset,
    cfg: SignatureConfig,
    num_partitions: int = 32,
) -> Dataset:
    """Signer output → exact ≥L-byte shared-substring edges (a,b)."""
    from hyrise_generalized_dedup_ray.util import heal_blocks

    # groups come out of two groupbys → heal zero-column empty blocks
    # before the join (util.heal_blocks)
    groups = heal_blocks(fingerprint_groups(signatures),
                         max(2, num_partitions // 4))
    docs = signatures.select_columns(["doc_id", "text"])
    with_text = groups.join(
        docs, join_type="inner", num_partitions=num_partitions,
        on=("doc_id",),
    )
    min_len = cfg.min_substring_bytes

    def suffix_pass(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("doc_id").to_numpy(zero_copy_only=False))
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)[order]
        texts = group.column("text").take(pa.array(order)).to_pylist()
        text_of = dict(zip((int(i) for i in ids), texts))
        a: list[int] = []
        b: list[int] = []
        for chunk in chunk_with_anchor(ids, SUBSTR_MAX_GROUP):
            chunk_texts = [text_of[d].encode("utf-8") for d in chunk]
            for ia, ib in cross_doc_repeats(chunk_texts, min_len):
                x, y = chunk[ia], chunk[ib]
                a.append(min(x, y))
                b.append(max(x, y))
        return pa.table({
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
        })

    return with_text.groupby("docset").map_groups(suffix_pass, batch_format="pyarrow")
