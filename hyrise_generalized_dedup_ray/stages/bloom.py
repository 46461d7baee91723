"""Distributed Bloom filter + incremental (crawl-over-corpus) dedup.

The recurring 100-TB ingest problem: a NEW crawl slice must be deduped
against an EXISTING corpus without joining the two in full.  The scale
pattern here:

1. **Build** — each existing block hashes its text column to u64 and
   sets k bits in a fixed-size bitmap (vectorized numpy).  Per-block
   bitmaps are OR-reduced in a **binary tree of Ray tasks** (log depth,
   bounded driver traffic: the driver only ever holds object refs),
   and the final bitmap is broadcast via the object store — one copy
   per node, read zero-copy by every probe actor.
2. **Probe** — incoming rows test their k bits.  Bloom-NEGATIVE rows
   are *definitively* new (no false negatives) and short-circuit past
   the join entirely; only bloom-POSITIVE rows (true dups + fpp
   false positives) enter the exact confirmation joins.
3. **Confirm** — the positive slice is exactly semi/anti-joined
   against the existing corpus on the text value itself
   (stages/exchange.exchange_join), so the final answer is EXACT —
   the bloom only prunes join traffic, it never decides membership.

Sizing: m = -n·ln(fpp)/ln(2)², k = (m/n)·ln(2) — at fpp=1% that is
~9.6 bits/item, so 10⁹ existing docs fit a 1.2 GB bitmap (one object
per node); beyond that, partition the corpus and build one bloom per
hash-range (the build API takes pre-partitioned refs unchanged).

Reference analog: the probe-side Bloom filter the reference's hash
join builds from the build side to skip non-matching probe rows
(join_hash.hpp:54-58) — here lifted to a corpus-level, tree-reduced,
broadcast structure.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.functions.hashing import (
    hash_strings,
    splitmix64,
)

_U64 = np.uint64
# two base streams for Kirsch–Mitzenmacher double hashing
_SEED_A = _U64(0x9E3779B97F4A7C15)
_SEED_B = _U64(0xBF58476D1CE4E5B9)


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits rounded up to a u64-word multiple, k hash functions).

    k is the textbook optimum (m/n)·ln 2, uncapped: the k streams come
    from double hashing (h1 + i·h2), so any requested fpp is realized
    (Kirsch & Mitzenmacher, "Less Hashing, Same Performance", 2006).
    """
    n = max(1, n_items)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _bit_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit indices via double hashing: pos_i = h1 + i·h2 mod m."""
    h1 = splitmix64(h ^ _SEED_A)
    h2 = splitmix64(h ^ _SEED_B) | _U64(1)   # odd => full period mod 2^64
    return np.stack([(h1 + _U64(i) * h2) % _U64(m_bits)
                     for i in range(k)])


def _set_bits(bitmap: np.ndarray, h: np.ndarray, m_bits: int,
              k: int) -> None:
    pos = _bit_positions(h, m_bits, k).ravel()
    np.bitwise_or.at(bitmap, (pos >> _U64(6)).astype(np.int64),
                     _U64(1) << (pos & _U64(63)))


def _test_bits(bitmap: np.ndarray, h: np.ndarray, m_bits: int,
               k: int) -> np.ndarray:
    """True where ALL k bits are set (bloom-positive)."""
    pos = _bit_positions(h, m_bits, k)
    word = bitmap[(pos >> _U64(6)).astype(np.int64)]
    hit = (word >> (pos & _U64(63))) & _U64(1)
    return hit.all(axis=0)


@ray.remote
def _block_bitmap(tab: pa.Table, col: str, m_bits: int, k: int
                  ) -> np.ndarray:
    bitmap = np.zeros(m_bits // 64, dtype=_U64)
    vals = tab.column(col)
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    h = hash_strings(vals.to_numpy(zero_copy_only=False))
    if len(h):
        _set_bits(bitmap, h, m_bits, k)
    return bitmap


@ray.remote
def _or_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def build_bloom(ds: Dataset, col: str, n_items_hint: int,
                fpp: float = 0.01,
                block_refs: list | None = None
                ) -> tuple["ray.ObjectRef", int, int]:
    """Bloom filter over ``ds[col]``: per-block bitmaps OR-reduced in a
    binary task tree.  Returns (bitmap ref, m_bits, k).  Pass
    ``block_refs`` (from ``ds.to_arrow_refs()``) to reuse an already
    materialized execution instead of re-running the dataset."""
    m_bits, k = bloom_params(n_items_hint, fpp)
    if block_refs is None:
        block_refs = ds.to_arrow_refs()
    refs = [_block_bitmap.remote(r, col, m_bits, k) for r in block_refs]
    if not refs:
        return ray.put(np.zeros(m_bits // 64, dtype=_U64)), m_bits, k
    while len(refs) > 1:
        nxt = [_or_pair.remote(refs[i], refs[i + 1])
               for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return refs[0], m_bits, k


def incremental_dedup(
    existing: Dataset,
    incoming: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_items_hint: int | None = None,
    fpp: float = 0.01,
) -> Dataset:
    """(doc_id, is_new) for every incoming row: is_new=False iff its
    exact text already occurs in ``existing``.  EXACT result; the
    bloom only routes rows around the confirmation joins."""
    from hyrise_generalized_dedup_ray.stages.exchange import exchange_join

    # Materialize the pruned existing side ONCE: the bloom build, the
    # row count (metadata-only after materialize) and both confirmation
    # joins all read the same blocks — one scan of the corpus, not two.
    ex = existing.select_columns([text_col]).materialize()
    inc = incoming.select_columns([id_col, text_col])
    if n_items_hint is None:
        n_items_hint = ex.count()
    bloom_ref, m_bits, k = build_bloom(
        ex, text_col, n_items_hint, fpp, block_refs=ex.to_arrow_refs())

    class _Probe:
        def __init__(self):
            self.bitmap = ray.get(bloom_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(text_col)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            h = hash_strings(vals.to_numpy(zero_copy_only=False))
            pos = (_test_bits(self.bitmap, h, m_bits, k) if len(h)
                   else np.zeros(0, dtype=bool))
            return batch.append_column("__bloom_pos",
                                       pa.array(pos, type=pa.bool_()))

    probed = inc.map_batches(_Probe, batch_format="pyarrow",
                             zero_copy_batch=True,
                             concurrency=(1, 8)).materialize()

    def split(want: bool):
        def f(batch: pa.Table) -> pa.Table:
            m = batch.column("__bloom_pos")
            if not want:
                m = pc.invert(m)
            return batch.filter(m).select([id_col, text_col])
        return f

    negatives = probed.map_batches(split(False), batch_format="pyarrow")
    candidates = probed.map_batches(split(True), batch_format="pyarrow")

    def mark(is_new: bool):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                id_col: batch.column(id_col),
                "is_new": pa.array(
                    np.full(len(batch), is_new, dtype=bool)),
            })
        return f

    # bloom-positive rows partition exactly into semi (dup) + anti (new)
    dups = exchange_join(candidates, ex, on=[text_col], how="semi")
    fps = exchange_join(candidates, ex, on=[text_col], how="anti")
    return (negatives.map_batches(mark(True), batch_format="pyarrow")
            .union(fps.map_batches(mark(True), batch_format="pyarrow"))
            .union(dups.map_batches(mark(False), batch_format="pyarrow")))
