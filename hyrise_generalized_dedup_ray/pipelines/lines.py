"""CCNet-style line-level deduplication: remove lines that repeat
across many documents (navigation bars, cookie banners, footers — the
dominant boilerplate in web crawls).

A line is "boilerplate" when it appears in ≥ ``k`` DISTINCT documents
corpus-wide.  Two passes, Ray-Data-first:

1. **Count pass** — ``map_batches`` explodes each doc into
   (line_hash u64, doc_id) pairs, pre-deduped per batch, then ONE
   value-keyed shuffle counts distinct docs per line
   (``relational.aggregate`` count_distinct kernel).  The boilerplate
   set (lines with ≥ k docs) is small by construction, so it is
   reduced to a sorted unique u64 array INSIDE a Ray task (the driver
   never holds it) and broadcast once per node.
2. **Rewrite pass** — a stateless ``map_batches`` stage re-splits each
   doc, marks boilerplate lines via ``np.searchsorted`` against the
   broadcast set, and rebuilds the cleaned text fully vectorized:
   new list offsets from a cumsum of the keep mask +
   ``pc.binary_join`` — no per-row Python.

At 100 TB the count pass's shuffle carries only (u64, i64) pairs
pre-deduped per batch (not text), and the rewrite pass streams.
Line identity uses a 64-bit SipHash of the line bytes; a collision
merges two lines' doc counts (P ≈ n²/2⁶⁵ — negligible below ~10¹²
distinct lines, and only ever over-removes).

Reference analog: the generalized-dedup lookup-table idea — recurring
values are collapsed to one dictionary entry
(dictionary_encoder.hpp:32,61-66: sort+unique into a dictionary,
rows re-expressed as ids) and recurring byte runs dedup against a
segment-trained dictionary (lz4_encoder.hpp:40-59); here the
recurring unit is a text LINE, the "dictionary" is the broadcast
boilerplate set, and the re-expression is removal from every copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.functions.hashing import hash_strings
from hyrise_generalized_dedup_ray.relational import agg, aggregate

_U64 = np.uint64


def _split_lines(texts: pa.ChunkedArray | pa.Array, delimiter: str
                 ) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """texts → (flat line values, per-doc list offsets int64,
    u64 line hashes).  Plain (non-regex) split: same non-overlapping
    left-to-right semantics as DuckDB's ``string_split``."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, pattern=delimiter)
    flat = toks.values
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    h = hash_strings(flat.to_numpy(zero_copy_only=False))
    return flat, offsets, h


@ray.remote
def _build_line_set(refs: list) -> np.ndarray:
    """Concat + sort-unique the boilerplate line hashes inside a task
    (decontam._build_eval_set pattern — never on the driver)."""
    tables = [t for t in ray.get(list(refs)) if t.num_rows > 0]
    if not tables:
        return np.empty(0, dtype=_U64)
    full = pa.concat_tables(tables)
    return np.unique(full.column("line_hash").to_numpy(
        zero_copy_only=False).astype(_U64))


def line_dedup(
    docs: Dataset,
    k: int = 3,
    delimiter: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """(doc_id, n_lines, n_removed, text_clean): drop every line that
    occurs in ≥ k distinct documents, preserving the order (and the
    delimiter) of the surviving lines."""

    kk = int(k)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        _, offsets, h = _split_lines(batch.column(text_col), delimiter)
        doc = np.repeat(ids, np.diff(offsets))
        # per-batch dedup of (line_hash, doc) shrinks the shuffle to
        # one pair per line per doc per batch
        pairs = np.unique(np.stack([h, doc.astype(_U64)], axis=1), axis=0)
        # hot-line cap: a doc lives in exactly ONE batch, so distinct
        # docs per line = Σ per-batch distinct; capping each batch's
        # contribution at k keeps the "≥ k distinct docs" decision
        # EXACT (true ≥ k ⇒ Σ min(cᵢ, k) ≥ k; true < k ⇒ Σ min ≤ true)
        # while bounding a universal line (nav bars at 10¹² docs) to k
        # rows per batch instead of one per doc.
        if len(pairs):
            change = pairs[1:, 0] != pairs[:-1, 0]
            starts = np.flatnonzero(np.r_[True, change])
            run_of = np.cumsum(np.r_[0, change.astype(np.int64)])
            pos_in_run = np.arange(len(pairs)) - starts[run_of]
            pairs = pairs[pos_in_run < kk]
        return pa.table({
            "line_hash": pa.array(pairs[:, 0], type=pa.uint64()),
            id_col: pa.array(pairs[:, 1].astype(np.int64)),
        })

    exploded = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)
    counts = aggregate(exploded, ["line_hash"],
                       {"ndocs": agg("count_distinct", id_col)})
    def frequent(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("ndocs"), pa.scalar(kk))
        return batch.filter(mask).select(["line_hash"])

    boiler = counts.map_batches(frequent, batch_format="pyarrow",
                                zero_copy_batch=True)
    set_ref = _build_line_set.remote(boiler.to_arrow_refs())

    class _Rewrite:
        def __init__(self):
            self.boiler = ray.get(set_ref)  # sorted unique u64

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, offsets, h = _split_lines(batch.column(text_col),
                                            delimiter)
            b = self.boiler
            if len(b):
                pos = np.searchsorted(b, h)
                drop = (pos < len(b)) & (b[np.minimum(pos, len(b) - 1)]
                                         == h)
            else:
                drop = np.zeros(len(h), dtype=bool)
            keep = ~drop
            ck = np.zeros(len(keep) + 1, dtype=np.int64)
            np.cumsum(keep, out=ck[1:])
            new_off = ck[offsets]
            kept_vals = flat.filter(pa.array(keep)) if len(keep) else flat
            clean = pa.ListArray.from_arrays(
                pa.array(new_off, type=pa.int32()), kept_vals)
            n_lines = np.diff(offsets)
            n_kept = np.diff(new_off)
            return pa.table({
                id_col: batch.column(id_col),
                "n_lines": pa.array(n_lines, type=pa.int64()),
                "n_removed": pa.array(n_lines - n_kept, type=pa.int64()),
                "text_clean": pc.binary_join(clean, delimiter),
            })

    return docs.select_columns([id_col, text_col]).map_batches(
        _Rewrite, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8))
