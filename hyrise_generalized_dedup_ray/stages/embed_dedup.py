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
    import ray as _ray

    from hyrise_generalized_dedup_ray.functions.grouping import sort_groups
    from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange_refs

    def bucket_pairs(part: pa.Table, tau=tau) -> pa.Table:
        """All buckets of one shard: exact cosine within each bucket
        (groups resolved with one argsort — the partition-kernel
        pattern, functions/grouping)."""
        bk = part.column("bucket").to_numpy(zero_copy_only=False)
        order, starts, ends = sort_groups((bk,))
        sorted_part = part.take(pa.array(order))
        ids_all, mat_all = _embedding_matrix(sorted_part, col)
        nm_all = _normalize(mat_all)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            nm = nm_all[s:e]
            ids = ids_all[s:e]
            sims = nm @ nm.T
            ai, bi = np.nonzero(np.triu(sims >= tau, k=1))
            a, b = ids[ai], ids[bi]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
        return pa.table({
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
        })

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    P = max(4, cpus)
    emb_refs = embeddings.to_arrow_refs()
    round_refs: list = []
    for t in range(num_tables):

        def add_bucket(batch: pa.Table, table_idx=t) -> pa.Table:
            ids, mat = _embedding_matrix(batch, col)
            # planes derived from (seed, table_idx, dim): deterministic
            # across batches/workers, regenerated cheaply per batch
            rng = np.random.default_rng((seed, table_idx))
            planes = rng.standard_normal((num_planes, mat.shape[1]))
            keys = hyperplane_keys(_normalize(mat), planes)
            return pa.table({
                "bucket": pa.array(keys, type=pa.int64()),
                "vec_id": batch.column("vec_id"),
                col: batch.column(col),
            })

        schema = pa.schema([("bucket", pa.int64()),
                            ("vec_id", pa.int64()),
                            (col, embeddings.schema().base_schema.field(col).type)])
        round_refs.extend(hash_exchange_refs(
            emb_refs, add_bucket, "bucket", bucket_pairs, P, schema))
    out = ray.data.from_arrow_refs(round_refs)
    from hyrise_generalized_dedup_ray.stages.lsh import dedupe_pairs
    return dedupe_pairs(out)


# ------------------------------------------------------------------
# SemDeDup — semantic dedup via k-means cluster partitioning
# ------------------------------------------------------------------

def _semdedup_kernel(shard: pa.Table, tau: float, id_col: str,
                     col: str, block: int = 2048) -> pa.Table:
    """Per-shard SemDeDup: shard rows carry a ``cluster`` column; for
    each cluster (sorted by id), drop every vector with cosine ≥ tau
    to ANY lower-id member.  O(C²) flops per cluster, memory bounded
    by ``block`` columns at a time."""
    if shard.num_rows == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "cluster": pa.array([], type=pa.int64()),
                         "is_kept": pa.array([], type=pa.bool_())})
    ids, mat = _embedding_matrix(shard, col)
    cl = shard.column("cluster").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, cl))
    ids, cl, mat = ids[order], cl[order], _normalize(mat[order])
    kept = np.ones(len(ids), dtype=bool)
    starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
    bounds = np.r_[starts, len(cl)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        x = mat[s:e]
        n = e - s
        for j0 in range(1, n, block):
            j1 = min(n, j0 + block)
            # sims of all strictly-lower rows vs columns j0:j1
            sims = x[:j1 - 1] @ x[j0:j1].T
            jj = np.arange(j0, j1)
            tri = np.arange(j1 - 1)[:, None] < jj[None, :]
            kept[s + j0:s + j1] &= ~((sims >= tau) & tri).any(axis=0)
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "cluster": pa.array(cl.astype(np.int64), type=pa.int64()),
        "is_kept": pa.array(kept),
    })


def semantic_dedup(
    embeddings: Dataset,
    tau: float = 0.92,
    n_clusters: int = 64,
    train_sample: int = 4096,
    iters: int = 8,
    seed: int = 0x5EED,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space, then deduplicate WITHIN each cluster — cosine
    pairs across clusters are never computed, so the all-pairs O(n²)
    collapses to O(n²/k) inside buckets that fit a worker.

    Deterministic keep rule (vectorized variant of the paper's
    keep-one-per-group): a vector is dropped iff some LOWER-ID member
    of its cluster is ≥ tau cosine-similar.  Scale shape: centroids
    trained in a task from a bounded sample (ann._train_centroids),
    assignment is one stateless map, then ONE exchange on cluster id;
    the per-cluster kernel blocks its similarity matrix so memory is
    O(C·block).  Returns (id, cluster, is_kept)."""
    from hyrise_generalized_dedup_ray.stages.ann import (
        _ivf_assign,
        _train_centroids,
    )
    from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange

    sample = embeddings.limit(train_sample).select_columns([id_col, col])
    cent_ref = _train_centroids.remote(
        sample.to_arrow_refs(), col, n_clusters, iters, seed)

    assigned = embeddings.select_columns([id_col, col]).map_batches(
        functools.partial(_ivf_assign, cent_ref=cent_ref, col=col),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(
        lambda t: t.rename_columns(
            [{"bucket": "cluster"}.get(n, n) for n in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)

    schema = pa.schema([(id_col, pa.int64()),
                        (col, pa.list_(pa.float32())),
                        ("cluster", pa.int64())])
    return hash_exchange(
        assigned,
        map_fn=lambda t: t,
        key_col="cluster",
        kernel=functools.partial(_semdedup_kernel, tau=tau,
                                 id_col=id_col, col=col),
        num_shards=min(n_clusters, 64),
        schema=schema,
    )
