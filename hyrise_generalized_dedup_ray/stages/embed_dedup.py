"""Embedding-cosine near-duplicate detection — the vector-space member
of the dedup family (exact / MinHash / SimHash / n-gram Jaccard /
embedding-cosine).

Exact variant: the full (ids, matrix) is broadcast once (`ray.put`) and
every batch computes its slice of the similarity matrix — O(n²/B) work
per block, zero shuffle, emitting only pairs ≥ τ.  Valid while n×d
floats fit a worker heap (~10⁶×64 ≈ 0.5 GB); beyond that the LSH
variant buckets by hyperplane signs first (same recall/S-curve logic as
the MinHash LSH stage, stages/lsh.py).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.stages.ann import (
    _embedding_matrix,
    _normalize,
    hyperplane_keys,
)


def _pair_score(batch: pa.Table, corpus_ref, tau: float,
                col: str) -> pa.Table:
    """Task UDF: the corpus object is a zero-copy read from the object
    store per call (numpy views into shared memory — nothing to cache,
    no actor-pool spawn latency)."""
    c = ray.get(corpus_ref)
    all_ids, all_mat = c["ids"], c["mat"]   # mat already normalized f64
    ids, mat = _embedding_matrix(batch, col)
    sims = _normalize(mat) @ all_mat.T          # (b, n)
    bi, ci = np.nonzero(sims >= tau)
    a = ids[bi]
    b = all_ids[ci]
    keep = a < b                 # canonical a<b, drops self-pairs
    return pa.table({
        "a": pa.array(a[keep], type=pa.int64()),
        "b": pa.array(b[keep], type=pa.int64()),
        "sim": pa.array(sims[bi[keep], ci[keep]], type=pa.float64()),
    })


@ray.remote
def _build_corpus(refs: list, col: str) -> dict:
    """Concat + normalize the corpus INSIDE a task — the driver never
    holds the matrix; downstream actors read the returned object-store
    entry directly (one copy in shared memory per node)."""
    tables = [t for t in ray.get(list(refs)) if t.num_columns > 0]
    full = pa.concat_tables(tables)
    ids, mat = _embedding_matrix(full, col)
    return {"ids": ids, "mat": _normalize(mat)}


def embedding_near_dup_pairs(
    embeddings: Dataset,
    tau: float = 0.95,
    col: str = "embedding",
    concurrency: tuple[int, int] | None = None,  # kept for API compat
    max_broadcast_bytes: int = 2 << 30,
) -> Dataset:
    """Exact all-pairs cosine ≥ τ; returns (a, b, sim) with a < b.

    The corpus matrix is broadcast (built off-driver, one object-store
    copy) and each batch scores its slice — O(n²/B) per block, zero
    shuffle.  GUARDED: when the matrix would exceed
    ``max_broadcast_bytes``, this op no longer fits one worker heap by
    construction and the call falls back to the bucketed LSH variant
    (logged — approximate per its documented S-curve recall; call
    :func:`embedding_near_dup_pairs_lsh` directly to choose its knobs)."""
    mat_ds = embeddings.select_columns(["vec_id", col])
    n = mat_ds.count()
    dim = len(embeddings.take(1)[0][col])
    if n * dim * 8 > max_broadcast_bytes:
        import logging

        logging.getLogger(__name__).warning(
            "embedding_near_dup_pairs: corpus %d×%d exceeds the %d-byte "
            "broadcast guard — falling back to the LSH-bucketed variant "
            "(approximate, recall per its S-curve)", n, dim,
            max_broadcast_bytes)
        return embedding_near_dup_pairs_lsh(embeddings, tau=tau, col=col)
    refs = mat_ds.to_arrow_refs()
    corpus_ref = _build_corpus.remote(refs, col)
    return embeddings.map_batches(
        functools.partial(_pair_score, corpus_ref=corpus_ref,
                          tau=tau, col=col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def embedding_near_dup_pairs_lsh(
    embeddings: Dataset,
    tau: float = 0.95,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 0xD1CE,
    col: str = "embedding",
) -> Dataset:
    """Scale path: ``num_tables`` independent hyperplane banding rounds;
    each round ONE groupby on the bucket key, exact cosine inside the
    bucket.  Union of rounds, deduped.  Recall follows the standard
    random-hyperplane S-curve: P(same bucket) = (1 - θ/π)^planes per
    table; at τ=0.95 (θ≈18°) with 8 planes × 4 tables recall ≈ 0.97."""
    rounds = []
    for t in range(num_tables):

        def add_bucket(batch: pa.Table, table_idx=t) -> pa.Table:
            ids, mat = _embedding_matrix(batch, col)
            # planes derived from (seed, table_idx, dim): deterministic
            # across batches/workers, regenerated cheaply per batch
            rng = np.random.default_rng((seed, table_idx))
            planes = rng.standard_normal((num_planes, mat.shape[1]))
            keys = hyperplane_keys(_normalize(mat), planes)
            return batch.append_column("bucket", pa.array(keys, type=pa.int64()))

        def bucket_pairs(group: pa.Table) -> pa.Table:
            ids, mat = _embedding_matrix(group, col)
            nm = _normalize(mat)
            sims = nm @ nm.T
            ai, bi = np.nonzero(np.triu(sims >= tau, k=1))
            a, b = ids[ai], ids[bi]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pa.table({
                "a": pa.array(lo, type=pa.int64()),
                "b": pa.array(hi, type=pa.int64()),
            })

        rounds.append(
            embeddings.map_batches(add_bucket, batch_format="pyarrow",
                                   zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(bucket_pairs, batch_format="pyarrow")
        )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.union(r)
    from hyrise_generalized_dedup_ray.stages.lsh import dedupe_pairs
    return dedupe_pairs(out)
