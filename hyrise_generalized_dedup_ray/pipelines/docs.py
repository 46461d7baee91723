"""Dedup operator family over a plain documents table (doc_id, text) —
each of the engine's near-dup methods exposed as its own pipeline:

- exact              (hash-partition on text, min-id per group)
- MinHash + LSH      (shingle → minhash → band → salted groupby → verify)
- SimHash            (64-bit, pigeonhole band blocking, exact Hamming)
- n-gram Jaccard     (char n-gram MinHash LSH, exact char-set verify)
- embedding cosine   (stages/embed_dedup.py)

These are the flagship's stages re-pointed at the TPC-H-ish
``documents`` test table; the flagship itself (pipelines/dedup.py)
composes the same stages over web pages.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.config import (
    DEFAULT_ENGINE_CONFIG,
    DEFAULT_SIGNATURE_CONFIG,
    EngineConfig,
    SignatureConfig,
)
from hyrise_generalized_dedup_ray.functions.minhash import minhash_signatures, band_keys
from hyrise_generalized_dedup_ray.functions.text import (
    char_shingles,
    jaccard_many,
    unique_shingle_sets,
)
from hyrise_generalized_dedup_ray.stages.lsh import candidate_pairs, dedupe_pairs
from hyrise_generalized_dedup_ray.stages.signatures import _list_of_u64
from hyrise_generalized_dedup_ray.stages.verify import verify_pairs

# byte-wise popcount lookup table for Hamming distance kernels
_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def sign_docs(
    docs: Dataset,
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
) -> Dataset:
    """documents(doc_id, text, …) → signer output (stages/signatures.py)."""
    import functools

    from hyrise_generalized_dedup_ray.stages.signatures import sign_batch

    from hyrise_generalized_dedup_ray.util import spread_blocks

    return spread_blocks(docs.select_columns(["doc_id", "text"])).map_batches(
        functools.partial(sign_batch, cfg=cfg),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=eng.signature_batch_size,
    )


def exact_dedup_docs(docs: Dataset) -> Dataset:
    """One row per distinct text: (doc_id = min id, n_copies).

    The reference's SELECT DISTINCT lowering — group by the value,
    no aggregate (sql_translator.cpp:1148) — plus the dictionary
    encoder's pick-one-representative semantics
    (dictionary_encoder.hpp:61-66).  ONE shuffle keyed on text, on
    the engine's hash exchange (string keys route there via
    relational.aggregate — Ray's sort-based groupby would range-sample
    the text payloads, stages/exchange.py:5-11)."""
    from hyrise_generalized_dedup_ray.relational import agg, aggregate

    ag = aggregate(docs.select_columns(["doc_id", "text"]), ["text"], {
        "rep_id": agg("min", "doc_id"),
        "n_copies": agg("count_star"),
    })
    return ag.select_columns(["rep_id", "n_copies"])


def minhash_dup_pairs(
    docs: Dataset,
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
    num_partitions: int = 16,
) -> Dataset:
    """Verified near-duplicate pairs (a,b), a<b, exact token-shingle
    Jaccard ≥ cfg.jaccard_threshold, candidates from MinHash LSH."""
    sigs = sign_docs(docs, cfg, eng).materialize()
    pairs, _ = candidate_pairs(sigs, eng, num_partitions)
    sets = sigs.select_columns(["doc_id", "shingles"])
    return verify_pairs(pairs, sets, cfg,
                        batch_size=eng.verify_batch_size,
                        num_partitions=num_partitions)


def simhash_near_dup_pairs(
    docs: Dataset,
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
    max_hamming: int = 3,
    num_partitions: int = 16,
) -> Dataset:
    """Pairs with SimHash Hamming distance ≤ max_hamming.

    Blocking by pigeonhole: split the 64-bit simhash into
    ``max_hamming+1`` chunks — any pair within distance d agrees on at
    least one chunk, so grouping by (chunk_idx, chunk_value) has recall
    1.0; exact Hamming check inside the group restores precision.
    ONE groupby shuffle keyed on (chunk_idx, chunk_value)."""
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    sigs = sign_docs(docs, replace(cfg), eng)

    from hyrise_generalized_dedup_ray.functions.grouping import sort_groups

    def explode_chunks(batch: pa.Table) -> pa.Table:
        batch = batch.select(["doc_id", "simhash", "num_shingles"])
        batch = batch.filter(pc.greater(batch["num_shingles"], 0))
        sim = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_key, out_id, out_sim = [], [], []
        for c in range(n_chunks):
            shift = np.uint64(c * chunk_bits)
            mask = np.uint64((1 << chunk_bits) - 1)
            chunk = (sim >> shift) & mask
            # key packs (chunk idx, value): distinct per c (≤32 chunks)
            key = (chunk.astype(np.int64) << np.int64(5)) | np.int64(c)
            out_key.append(key)
            out_id.append(ids)
            out_sim.append(sim.view(np.int64))
        key = np.concatenate(out_key)
        return pa.table({
            "block_key": pa.array(key, type=pa.int64()),
            "doc_id": pa.array(np.concatenate(out_id), type=pa.int64()),
            "simhash": pa.array(np.concatenate(out_sim), type=pa.int64()),
        })

    block_cap = eng.simhash_block_cap

    def _block_hamming_pairs(gids: np.ndarray, gsims: np.ndarray,
                             out_a: list, out_b: list) -> None:
        """Exact Hamming ≤ d pairs of ONE (sub-)block, memory-bounded:
        the XOR/popcount matrix is computed in row chunks with a
        256-entry popcount LUT (never the full g×g×8 unpackbits tensor
        that OOMed on boilerplate mega-blocks)."""
        n = len(gids)
        chunk = max(1, min(256, (1 << 22) // max(n, 1)))  # ≤ ~32 MB
        for s in range(0, n, chunk):
            rows = gsims[s:s + chunk]
            xor = rows[:, None] ^ gsims[None, :]
            pop = _POPCOUNT[xor.view(np.uint8).reshape(
                len(rows), n, 8)].sum(axis=2, dtype=np.int64)
            ai, bi = np.nonzero(pop <= max_hamming)
            ai = ai + s
            keep = ai < bi  # upper triangle only
            a, b = gids[ai[keep]], gids[bi[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))

    def block_pairs_partition(part: pa.Table) -> pa.Table:
        """All blocks of one hash partition; Python loop only over
        blocks with ≥2 docs (functions/grouping pattern).

        Hot-block defense (the boilerplate-skew case the LSH stage
        salts, stages/lsh.py): a block larger than
        ``eng.simhash_block_cap`` is split into deterministic
        splitmix64(doc_id ^ block_key) sub-blocks of ≤ cap docs, and
        exact Hamming runs per sub-block — O(g²) work becomes
        O(g·cap).  The split VARIES WITH THE BLOCK KEY, so a true ≤d
        pair separated in one chunk's mega-block usually co-locates in
        another of its d+1 pigeonhole blocks (miss probability
        (1-1/r)^(d+1) per fully-shared-boilerplate pair at split ratio
        r) — bounded work at a quantified, deterministic recall cost
        on pure-boilerplate collisions only."""
        from hyrise_generalized_dedup_ray.functions.hashing import \
            splitmix64

        bkey = part.column("block_key").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        sims = part.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        order, starts, ends = sort_groups((bkey,), order_by=(ids,))
        bkey, ids, sims = bkey[order], ids[order], sims[order]
        sizes = ends - starts
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for gi in np.flatnonzero(sizes >= 2):
            s, e = starts[gi], ends[gi]
            gids, first = np.unique(ids[s:e], return_index=True)
            gsims = sims[s:e][first]
            if len(gids) < 2:
                continue
            if len(gids) <= block_cap:
                _block_hamming_pairs(gids, gsims, out_a, out_b)
            else:
                n_sub = -(-len(gids) // block_cap)
                mixed = gids.astype(np.int64).view(np.uint64) ^ \
                    np.uint64(int(bkey[s]) & 0xFFFFFFFFFFFFFFFF)
                salts = (splitmix64(mixed) % np.uint64(n_sub)).astype(np.int64)
                for sub in range(n_sub):
                    m = salts == sub
                    if m.sum() >= 2:
                        _block_hamming_pairs(gids[m], gsims[m], out_a, out_b)
        a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
        return pa.table({
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
        })

    from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange

    block_schema = pa.schema([("block_key", pa.int64()),
                              ("doc_id", pa.int64()),
                              ("simhash", pa.int64())])
    raw = hash_exchange(sigs, explode_chunks, "block_key",
                        block_pairs_partition, num_partitions, block_schema)
    return dedupe_pairs(raw, num_partitions)


class _CharJaccardVerifier:
    """Exact char-n-gram Jaccard on candidate pairs (actor pool)."""

    def __init__(self, n: int, tau: float):
        self.n, self.tau = n, tau

    def __call__(self, batch: pa.Table) -> pa.Table:
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        uniq: dict[str, int] = {}
        order: list[str] = []
        for t in ta + tb:
            if t not in uniq:
                uniq[t] = len(order)
                order.append(t)
        flat, offsets = char_shingles(order, self.n)
        sets = unique_shingle_sets(flat, offsets)
        half = len(ta)
        codes = np.fromiter((uniq[t] for t in ta + tb), dtype=np.int64,
                            count=2 * half)
        jac = jaccard_many(sets, codes[:half], codes[half:])
        keep = jac >= self.tau
        return pa.table({
            "a": batch.column("a").filter(pa.array(keep)),
            "b": batch.column("b").filter(pa.array(keep)),
        })


def ngram_jaccard_pairs(
    docs: Dataset,
    n: int = 8,
    tau: float = 0.7,
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
    num_partitions: int = 16,
) -> Dataset:
    """Near-dup pairs by exact char-n-gram Jaccard ≥ τ; candidates from
    a MinHash LSH over the SAME char shingles (shared S-curve machinery
    — only the shingle kernel differs from the token pipeline)."""

    import functools

    def char_sign(batch: pa.Table, cfg_: SignatureConfig) -> pa.Table:
        # plain TASKS (no actor pool): the only per-call state is two
        # 128-element coefficient arrays, cached per worker process by
        # cfg.perm_coefficients — an actor pool capped concurrency at
        # 8 while the char-shingle minhash (8× the token shingle
        # volume) is the query's dominant compute
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        flat, offsets = char_shingles(texts, n)
        sig = minhash_signatures(flat, offsets, cfg_)
        bands = band_keys(sig, cfg_)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "band_keys": _list_of_u64(bands),
            "num_shingles": pa.array(np.diff(offsets), type=pa.int64()),
            "text": batch.column("text"),
        })

    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        functools.partial(char_sign, cfg_=cfg),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=eng.signature_batch_size,
    ).materialize()
    pairs, _ = candidate_pairs(sigs, eng, num_partitions)
    from hyrise_generalized_dedup_ray.stages.verify import attach_texts
    with_texts = attach_texts(pairs, sigs.select_columns(["doc_id", "text"]),
                              num_partitions)

    def char_verify(batch: pa.Table) -> pa.Table:
        return _CharJaccardVerifier(n, tau)(batch)

    return with_texts.map_batches(
        char_verify, batch_format="pyarrow",
        batch_size=eng.verify_batch_size,
    )


@ray.remote
def _sorted_id_set(refs: list) -> np.ndarray:
    """Sorted unique doc ids of a dataset, built INSIDE a task (the
    decontam ``_build_eval_set`` pattern — the driver never holds it)."""
    tables = [t.select(["doc_id"]) for t in ray.get(list(refs))
              if t.num_rows]
    if not tables:
        return np.empty(0, dtype=np.int64)
    return np.unique(pa.concat_tables(tables).column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64))


def _member_mask(sorted_ids: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``ids`` in a sorted unique array."""
    if not len(sorted_ids):
        return np.zeros(len(ids), dtype=bool)
    pos = np.searchsorted(sorted_ids, ids)
    pos = np.minimum(pos, len(sorted_ids) - 1)
    return sorted_ids[pos] == ids


def incremental_near_dup(
    existing: Dataset,
    incoming: Dataset,
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
    num_partitions: int = 16,
) -> Dataset:
    """Crawl-over-corpus NEAR-duplicate gate: for every ``incoming``
    doc that has token-shingle Jaccard ≥ ``cfg.jaccard_threshold``
    against ANY ``existing`` doc, emit (doc_id, n_matches, rep_id) —
    the count of matching corpus docs and the smallest matching corpus
    id.  Incoming docs with no match produce no row (they are "new").

    The near-dup companion of :func:`stages.bloom.incremental_dedup`
    (which gates on EXACT text equality).  Doc ids must be globally
    unique across the two sides.

    100-TB shape: both sides stream through ONE shared signer +
    banding pass (the union below concatenates lazily — no
    materialized copy), candidates come from the same salted band
    exchange as :func:`minhash_dup_pairs`, and the side predicate is
    applied from a broadcast sorted array of INCOMING ids — the crawl
    increment, typically orders of magnitude smaller than the corpus
    (the same broadcast-the-small-side shape as decontamination).
    Cross-side filtering runs BEFORE text verification, so the
    expensive Jaccard confirm only ever sees corpus×increment pairs;
    an increment too large to broadcast (≫10⁹ ids) would instead
    carry a side bit through the signer schema.

    Reference analog: the generalized-dedup encoder deduplicates new
    chunks against the fingerprint lookup table built from already-
    stored bases (generalized_dedup.hpp fingerprint lookup) — here the
    "table" is the corpus band index and the "chunk" is a crawled page.
    """
    import functools

    from hyrise_generalized_dedup_ray.relational import agg, aggregate

    ex = existing.select_columns(["doc_id", "text"])
    inc = incoming.select_columns(["doc_id", "text"])
    inc_ids_ref = _sorted_id_set.remote(
        inc.select_columns(["doc_id"]).to_arrow_refs())

    sigs = sign_docs(ex.union(inc), cfg, eng).materialize()
    pairs, _ = candidate_pairs(sigs, eng, num_partitions)

    def cross_only(batch: pa.Table, ref) -> pa.Table:
        inc_ids = ray.get(ref)   # zero-copy view, cached per node
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        keep = _member_mask(inc_ids, a) != _member_mask(inc_ids, b)
        return batch.filter(pa.array(keep))

    cross = pairs.map_batches(
        functools.partial(cross_only, ref=inc_ids_ref),
        batch_format="pyarrow", zero_copy_batch=True)
    edges = verify_pairs(cross, sigs.select_columns(["doc_id", "shingles"]),
                         cfg, batch_size=eng.verify_batch_size,
                         num_partitions=num_partitions)

    def orient(batch: pa.Table, ref) -> pa.Table:
        """(a,b) → (doc_id=incoming endpoint, ex_id=corpus endpoint)."""
        inc_ids = ray.get(ref)
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        a_in = _member_mask(inc_ids, a)
        return pa.table({
            "doc_id": pa.array(np.where(a_in, a, b), type=pa.int64()),
            "ex_id": pa.array(np.where(a_in, b, a), type=pa.int64()),
        })

    oriented = edges.map_batches(
        functools.partial(orient, ref=inc_ids_ref),
        batch_format="pyarrow", zero_copy_batch=True)
    return aggregate(oriented, ["doc_id"], {
        "n_matches": agg("count_star"),
        "rep_id": agg("min", "ex_id"),
    }, num_partitions=max(4, num_partitions // 2))
