"""Train/test decontamination: flag training documents that share any
word n-gram with a held-out evaluation set.

The standard guard against benchmark leakage in LLM training corpora
(GPT-3 appendix C / PaLM-style 8-gram overlap): the eval set is tiny
next to the training corpus, so its n-gram set is built ONCE and
broadcast, and the 100-TB training side streams through a stateless
membership probe — no shuffle at all.  Reference analog: the same
build-once/probe-many shape as its Bloom-filter semi-join reduction
(join_hash.hpp:54-58).

Scale design:
- eval grams are hashed to u64 and reduced to a sorted unique array
  INSIDE a Ray task (the driver never holds the set; one object-store
  copy per node, same pattern as stages/embed_dedup._build_corpus).
- the training side is one ``map_batches`` actor-pool stage: tokens →
  rolling gram hashes → ``np.searchsorted`` membership → per-doc
  distinct-hit counts, all vectorized (no per-row Python).
- counting distinct MATCHING grams per doc over u64 hashes is exact up
  to u64 collisions (~1e-12 at 10^4 grams); the SQL oracle counts the
  same distinct gram strings.
"""

from __future__ import annotations

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


def _gram_hashes(texts: pa.ChunkedArray | pa.Array, n: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(gram_hash u64[], doc_index int64[]) for every word n-gram.

    Tokenization contract (must match the SQL oracle):
    lowercase, split on ``\\s+``.  Gram hash = splitmix64 fold over the
    window's token hashes (order-sensitive)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
    flat = toks.values
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = len(flat)
    if n_tok < n:
        return (np.empty(0, dtype=_U64), np.empty(0, dtype=np.int64))
    th = hash_strings(flat.to_numpy(zero_copy_only=False))
    # fold the window: h_j+1 = splitmix64(h_j ^ tok_hash[i+j])
    m = n_tok - n + 1
    h = np.zeros(m, dtype=_U64)
    for j in range(n):
        h = splitmix64(h ^ th[j:j + m])
    # a start position i is valid iff tokens i..i+n-1 fall in ONE doc
    doc_of = np.repeat(np.arange(len(toks), dtype=np.int64),
                       np.diff(offsets))
    valid = doc_of[:m] == doc_of[n - 1:]
    return h[valid], doc_of[:m][valid]


@ray.remote
def _build_eval_set(refs: list) -> np.ndarray:
    """Concat + unique the eval gram hashes inside a task — the driver
    never holds the set (stages/embed_dedup.py:50 pattern)."""
    tables = [t for t in ray.get(list(refs)) if t.num_rows > 0]
    if not tables:
        return np.empty(0, dtype=_U64)
    full = pa.concat_tables(tables)
    return np.unique(full.column("g").to_numpy(zero_copy_only=False)
                     .astype(_U64))


def decontaminate(
    docs: Dataset,
    eval_docs: Dataset,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """(doc_id, n_overlap, contaminated) for every training doc:
    n_overlap = number of DISTINCT word n-grams the doc shares with the
    eval set, contaminated = n_overlap > 0."""

    def eval_grams(batch: pa.Table) -> pa.Table:
        g, _ = _gram_hashes(batch.column(text_col), n)
        return pa.table({"g": pa.array(np.unique(g), type=pa.uint64())})

    refs = (eval_docs.select_columns([text_col])
            .map_batches(eval_grams, batch_format="pyarrow",
                         zero_copy_batch=True)
            .to_arrow_refs())
    eval_ref = _build_eval_set.remote(refs)

    class _Probe:
        def __init__(self):
            self.ev = ray.get(eval_ref)  # sorted unique u64

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            g, d = _gram_hashes(batch.column(text_col), n)
            n_docs = len(batch)
            if len(g) and len(self.ev):
                pos = np.searchsorted(self.ev, g)
                hit = (pos < len(self.ev)) & (self.ev[np.minimum(
                    pos, len(self.ev) - 1)] == g)
                # distinct matching grams per doc
                pairs = np.unique(
                    np.stack([d[hit].astype(_U64), g[hit]], axis=1),
                    axis=0)
                n_overlap = np.bincount(pairs[:, 0].astype(np.int64),
                                        minlength=n_docs)
            else:
                n_overlap = np.zeros(n_docs, dtype=np.int64)
            n_overlap = n_overlap.astype(np.int64)
            return pa.table({
                id_col: ids,
                "n_overlap": pa.array(n_overlap, type=pa.int64()),
                "contaminated": pa.array(n_overlap > 0),
            })

    return docs.select_columns([id_col, text_col]).map_batches(
        _Probe, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8))
