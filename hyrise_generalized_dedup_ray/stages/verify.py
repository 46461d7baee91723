"""Candidate verification: exact shingle Jaccard on candidate pairs,
plus exact-duplicate edges from text-hash groups.

The reference never trusts an approximate structure — hash-join probes
re-check keys, Bloom filters only *prune* (join_hash.hpp:54-58), and
DISTINCT is exact (SURVEY.md §2.8).  Likewise here: LSH only proposes,
the verdict is the exact Jaccard of the true shingle sets, recomputed
from text inside the stage (shipping shingle *sets* through the
shuffle would dwarf the text itself — SURVEY.md §7.5).

All wide steps run on :mod:`stages.exchange` (hash exchange: one
compact move per row, no sort-shuffle coordination); texts ship at
most once per shard via the fused melt pattern.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.config import SignatureConfig
from hyrise_generalized_dedup_ray.functions.grouping import (
    partition_ids,
    sort_groups,
)
from hyrise_generalized_dedup_ray.functions.hashing import mix2
from hyrise_generalized_dedup_ray.functions.text import (
    batch_shingles,
    jaccard_many,
)
from hyrise_generalized_dedup_ray.stages.exchange import (
    count_rows,
    hash_exchange_refs,
    split_by_key,
)

_I64 = pa.int64()
_PAIR_SCHEMA = pa.schema([("a", _I64), ("b", _I64)])
_VERIFY_SCHEMA = pa.schema([("pkey", _I64), ("kind", _I64), ("a", _I64),
                            ("b", _I64), ("doc_id", _I64),
                            ("text", pa.string())])
# signer-shingle variant: the melt ships each doc's SORTED UNIQUE
# shingle set (signer column) instead of its text — the kernel then
# verifies without tokenizing anything (see _verify_shingle_kernel)
_VERIFY_SHINGLE_SCHEMA = pa.schema([
    ("pkey", _I64), ("kind", _I64), ("a", _I64), ("b", _I64),
    ("doc_id", _I64), ("shingles", pa.list_(pa.int64()))])


# pairs up to this many rows ride the broadcast attach path (~64 bytes
# of index state per pair, ray.put ONCE → one shared-memory copy per
# node, workers read zero-copy); beyond it the two-sided hash join
# takes over — the JoinHash small-side-builds pragmatism
# (join_hash.hpp:20-46) applied to strategy selection.  25M pairs ≈
# 1.6 GB of index state: comfortably one worker heap, and measured
# ~10× faster than the join path at 5M pairs (the join spawns
# aggregator actors and shuffles text per pair row).
BROADCAST_PAIRS_MAX = 25_000_000


def attach_texts(
    pairs: Dataset, docs: Dataset, num_partitions: int = 32
) -> Dataset:
    """(a,b) ⋈ docs(doc_id,text) twice → (a, b, text_a, text_b).

    Strategy is size-guarded like the reference's join planning:

    - pairs ≤ ``BROADCAST_PAIRS_MAX``: broadcast the pair MEMBERSHIP
      INDEX (sorted doc→(pair,slot) arrays, built once), melt texts
      against it in a map over docs, and pivot with ONE hash exchange
      — no join aggregator actors, and only texts that appear in some
      pair ever cross the shuffle.
    - larger: two hash-shuffle ``Dataset.join``s, fan-out from the
      caller's cluster-derived ``num_partitions`` (a hard cap here
      would freeze the pipeline's widest data movement at one node's
      worth of parallelism forever)."""
    from hyrise_generalized_dedup_ray.stages.exchange import exchange_join

    num_partitions = max(4, num_partitions)
    # pin: count + the chosen strategy both consume `pairs`
    pairs = pairs.materialize()
    if pairs.count() <= BROADCAST_PAIRS_MAX:
        return _attach_texts_broadcast(pairs, docs, num_partitions)

    docs = docs.select_columns(["doc_id", "text"])
    j1 = exchange_join(
        pairs, docs, on=["a"], right_on=["doc_id"],
        num_partitions=num_partitions,
    ).rename_columns({"text": "text_a"}).select_columns(["a", "b", "text_a"])
    j2 = exchange_join(
        j1, docs, on=["b"], right_on=["doc_id"],
        num_partitions=num_partitions,
    ).rename_columns({"text": "text_b"}).select_columns(["a", "b", "text_a", "text_b"])
    return j2


@ray.remote
def _build_pair_index(refs: list) -> dict:
    """(a, b) pair blocks → sorted member index, concatenated inside a
    task so the driver never materializes the pairs."""
    tables = [t for t in ray.get(list(refs)) if t.num_columns > 0]
    pt = pa.concat_tables(tables) if tables else _PAIR_SCHEMA.empty_table()
    a = pt.column("a").to_numpy(zero_copy_only=False)
    b = pt.column("b").to_numpy(zero_copy_only=False)
    n = len(a)
    member_doc = np.concatenate([a, b])
    member_pair = np.tile(np.arange(n, dtype=np.int64), 2)
    member_slot = np.concatenate([np.zeros(n, dtype=np.int64),
                                  np.ones(n, dtype=np.int64)])
    order = np.argsort(member_doc, kind="stable")
    return {"md": member_doc[order], "mp": member_pair[order],
            "ms": member_slot[order], "a": a, "b": b}


def _attach_texts_broadcast(
    pairs: Dataset, docs: Dataset, num_partitions: int
) -> Dataset:
    """Broadcast-index attach (see :func:`attach_texts`): one map over
    docs emits (pair, slot, a, b, text) rows for every pair membership,
    then one hash exchange pivots the two slots together."""
    from hyrise_generalized_dedup_ray.functions.grouping import sort_groups

    # index built INSIDE a task (embed_dedup._build_corpus pattern):
    # the driver never holds the pair table, only the object ref —
    # workers read the one shared-memory copy per node directly
    state_ref = _build_pair_index.remote(list(pairs.to_arrow_refs()))

    def melt(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)   # zero-copy views from the object store
        md, mp, ms = st["md"], st["mp"], st["ms"]
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(md, ids, "left")
        hi = np.searchsorted(md, ids, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        doc_rows = np.repeat(np.arange(len(ids)), cnt)
        excl = np.concatenate([[0], np.cumsum(cnt)[:-1]]) if len(cnt) else \
            np.empty(0, dtype=np.int64)
        pos = np.arange(total) + np.repeat(lo - excl, cnt)
        pidx = mp[pos]
        return pa.table({
            "pair": pa.array(pidx, type=_I64),
            "slot": pa.array(ms[pos], type=_I64),
            "a": pa.array(st["a"][pidx], type=_I64),
            "b": pa.array(st["b"][pidx], type=_I64),
            "text": batch.column("text").take(pa.array(doc_rows)),
        })

    def pivot(part: pa.Table) -> pa.Table:
        pidx = part.column("pair").to_numpy(zero_copy_only=False)
        slot = part.column("slot").to_numpy(zero_copy_only=False)
        order2, starts, ends = sort_groups((pidx,), order_by=(slot,))
        # complete pairs have exactly two rows (slot 0 then 1); an
        # incomplete pair (doc missing from docs) drops, matching the
        # inner-join semantics of the large path
        full = (ends - starts) == 2
        r0 = order2[starts[full]]
        r1 = order2[starts[full] + 1]
        return pa.table({
            "a": part.column("a").take(pa.array(r0)),
            "b": part.column("b").take(pa.array(r0)),
            "text_a": part.column("text").take(pa.array(r0)),
            "text_b": part.column("text").take(pa.array(r1)),
        })

    melt_schema = pa.schema([("pair", _I64), ("slot", _I64), ("a", _I64),
                             ("b", _I64), ("text", pa.string())])
    refs = hash_exchange_refs(
        docs.to_arrow_refs(), melt, "pair", pivot, num_partitions,
        melt_schema)
    if not refs:
        return ray.data.from_arrow(pa.table(
            {"a": pa.array([], type=_I64), "b": pa.array([], type=_I64),
             "text_a": pa.array([], type=pa.string()),
             "text_b": pa.array([], type=pa.string())}))
    return ray.data.from_arrow_refs(refs)


# per-worker-process shingle-set cache: a hot document (boilerplate,
# big dup cluster) appears in thousands of candidate pairs spread over
# many batches — re-shingling it per batch dominated the verify stage.
# Keyed by (config hash, u64 polynomial text hash over the zero-copy
# Arrow buffers — substr.text_hashes_csr): the engine-wide
# collision-accepting u64 text-identity convention (exact_dedup_best —
# P[collision] ≈ n²/2⁶⁵); Python-string keys cost a to_pylist
# materialization of every distinct text per chunk.  Bounded FIFO;
# per-process, so the key only needs process-level stability.
_SHINGLE_CACHE: dict = {}
_SHINGLE_CACHE_MAX = 8192


class JaccardVerifier:
    """Batch verifier: exact shingle-set Jaccard ≥ threshold (runs as
    tasks; state is per-worker-process caches, see stages/signatures.py)."""

    def __init__(self, cfg: SignatureConfig):
        self.cfg = cfg
        self.cfg_key = cfg.config_hash()

    def _sets_for_arrow(self, uniq_col: pa.Array) -> list[np.ndarray]:
        """Shingle sets for an Arrow array of DISTINCT texts.  Cache
        keys are u64 text hashes (see _SHINGLE_CACHE note); only the
        cache-missing texts are shingled, on the zero-copy Arrow
        path."""
        from hyrise_generalized_dedup_ray.functions.substr import \
            text_hashes_csr
        from hyrise_generalized_dedup_ray.functions.text import (
            batch_shingles_arrow,
            utf8_csr,
        )

        cfg = self.cfg
        # resolve through a batch-local list so FIFO eviction during
        # this batch's inserts can never invalidate this batch's lookups
        keys = text_hashes_csr(*utf8_csr(uniq_col))
        out: list[np.ndarray | None] = [
            _SHINGLE_CACHE.get((self.cfg_key, int(k))) for k in keys]
        missing = [i for i, v in enumerate(out) if v is None]
        if missing:
            flat, offsets = batch_shingles_arrow(
                uniq_col.take(pa.array(missing, type=pa.int64())),
                cfg.shingle_n)
            for j, i in enumerate(missing):
                s = np.unique(flat[offsets[j]:offsets[j + 1]])
                out[i] = s
                if len(_SHINGLE_CACHE) >= _SHINGLE_CACHE_MAX:
                    _SHINGLE_CACHE.pop(next(iter(_SHINGLE_CACHE)))
                _SHINGLE_CACHE[(self.cfg_key, int(keys[i]))] = s
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        cols = []
        for name in ("text_a", "text_b"):
            c = batch.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols.append(pc.fill_null(c, ""))
        # distinct texts once per batch via dictionary codes — no
        # Python strings for the (typically dominant) repeated texts
        enc = pa.concat_arrays(cols).dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sets = self._sets_for_arrow(enc.dictionary)
        # grouped kernel: one lexsort over all pairs' values — no
        # per-pair Python iteration (bit-identical to jaccard_sorted)
        jac = jaccard_many(sets, idx[:n], idx[n:])
        keep = jac >= cfg.jaccard_threshold
        return pa.table({
            "a": batch.column("a").filter(pa.array(keep)),
            "b": batch.column("b").filter(pa.array(keep)),
        })


def _melt_pair_texts(block: pa.Table, ref, P: int) -> pa.Table:
    """Melt each doc's text toward the shards of the pairs it belongs
    to, deduped per (doc, shard)."""
    st = ray.get(ref)
    md, mpk = st["md"], st["mpk"]
    ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    lo = np.searchsorted(md, ids, "left")
    hi = np.searchsorted(md, ids, "right")
    cnt = hi - lo
    total = int(cnt.sum())
    doc_rows = np.repeat(np.arange(len(ids)), cnt)
    excl = np.concatenate([[0], np.cumsum(cnt)[:-1]]) if len(cnt) else \
        np.empty(0, dtype=np.int64)
    pos = np.arange(total) + np.repeat(lo - excl, cnt)
    pks = mpk[pos]
    # dedup (doc, shard): ship each text once per shard
    key = doc_rows * np.int64(P) + pks
    keep = np.zeros(total, dtype=bool)
    if total:
        o2 = np.argsort(key, kind="stable")
        ks = key[o2]
        first = np.concatenate([[True], ks[1:] != ks[:-1]])
        keep[o2[first]] = True
    doc_rows, pks = doc_rows[keep], pks[keep]
    m = len(doc_rows)
    return pa.table({
        "pkey": pa.array(pks, type=_I64),
        "kind": pa.array(np.ones(m, dtype=np.int64), type=_I64),
        "a": pa.nulls(m, type=_I64),
        "b": pa.nulls(m, type=_I64),
        "doc_id": pa.array(ids[doc_rows], type=_I64),
        "text": block.column("text").take(pa.array(doc_rows)),
    }, schema=_VERIFY_SCHEMA)


def _melt_pair_shingles(block: pa.Table, ref, P: int) -> pa.Table:
    """Shingle-payload twin of :func:`_melt_pair_texts`: ships each
    doc's signer-computed sorted unique shingle set once per shard."""
    st = ray.get(ref)
    md, mpk = st["md"], st["mpk"]
    ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    lo = np.searchsorted(md, ids, "left")
    hi = np.searchsorted(md, ids, "right")
    cnt = hi - lo
    total = int(cnt.sum())
    doc_rows = np.repeat(np.arange(len(ids)), cnt)
    excl = np.concatenate([[0], np.cumsum(cnt)[:-1]]) if len(cnt) else \
        np.empty(0, dtype=np.int64)
    pos = np.arange(total) + np.repeat(lo - excl, cnt)
    pks = mpk[pos]
    key = doc_rows * np.int64(P) + pks
    keep = np.zeros(total, dtype=bool)
    if total:
        o2 = np.argsort(key, kind="stable")
        ks = key[o2]
        first = np.concatenate([[True], ks[1:] != ks[:-1]])
        keep[o2[first]] = True
    doc_rows, pks = doc_rows[keep], pks[keep]
    m = len(doc_rows)
    return pa.table({
        "pkey": pa.array(pks, type=_I64),
        "kind": pa.array(np.ones(m, dtype=np.int64), type=_I64),
        "a": pa.nulls(m, type=_I64),
        "b": pa.nulls(m, type=_I64),
        "doc_id": pa.array(ids[doc_rows], type=_I64),
        "shingles": block.column("shingles").take(pa.array(doc_rows)),
    }, schema=_VERIFY_SHINGLE_SCHEMA)


def _verify_shingle_kernel(part: pa.Table, cfg: SignatureConfig) -> pa.Table:
    """One shard of pair rows (kind=0) + per-shard-deduped SHINGLE
    rows (kind=1) → verified near-dup edges.  No tokenization, no
    shingle cache: the sets are zero-copy slices of the melted list
    column, and ONE :func:`jaccard_many` call covers the whole shard
    (re-tokenizing melted texts was ~half the stage's CPU at 2M)."""
    from hyrise_generalized_dedup_ray.functions.text import jaccard_many

    kind = part.column("kind").to_numpy(zero_copy_only=False)
    pair_idx = np.flatnonzero(kind == 0)
    doc_idx = np.flatnonzero(kind == 1)
    if len(pair_idx) == 0 or len(doc_idx) == 0:
        return _PAIR_SCHEMA.empty_table()
    dids = part.column("doc_id").to_numpy(
        zero_copy_only=False)[doc_idx].astype(np.int64)
    dorder = np.argsort(dids, kind="stable")
    dids_sorted = dids[dorder]
    sh = part.column("shingles")
    if isinstance(sh, pa.ChunkedArray):
        sh = sh.combine_chunks()
    sh = sh.take(pa.array(doc_idx[dorder]))
    flat = sh.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    offs = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    sets = [flat[offs[i]:offs[i + 1]] for i in range(len(dids_sorted))]
    pa_ids = part.column("a").to_numpy(
        zero_copy_only=False)[pair_idx].astype(np.int64)
    pb_ids = part.column("b").to_numpy(
        zero_copy_only=False)[pair_idx].astype(np.int64)

    def lookup(x):
        pos = np.searchsorted(dids_sorted, x)
        pos_c = np.minimum(pos, len(dids_sorted) - 1)
        ok = dids_sorted[pos_c] == x
        return pos_c, ok

    la, oka = lookup(pa_ids)
    lb, okb = lookup(pb_ids)
    ok = oka & okb
    la, lb = la[ok], lb[ok]
    pa_ok, pb_ok = pa_ids[ok], pb_ids[ok]
    jac = jaccard_many(sets, la, lb)
    keep = jac >= cfg.jaccard_threshold
    return pa.table({
        "a": pa.array(pa_ok[keep], type=_I64),
        "b": pa.array(pb_ok[keep], type=_I64),
    })


def _verify_kernel(part: pa.Table, cfg: SignatureConfig,
                   batch_size: int) -> pa.Table:
    """One shard of pair rows (kind=0) + per-shard-deduped text rows
    (kind=1) → verified near-dup edges."""
    kind = part.column("kind").to_numpy(zero_copy_only=False)
    pair_idx = np.flatnonzero(kind == 0)
    doc_idx = np.flatnonzero(kind == 1)
    if len(pair_idx) == 0 or len(doc_idx) == 0:
        return _PAIR_SCHEMA.empty_table()
    dids = part.column("doc_id").to_numpy(
        zero_copy_only=False)[doc_idx].astype(np.int64)
    dorder = np.argsort(dids, kind="stable")
    dids_sorted = dids[dorder]
    texts = part.column("text").take(pa.array(doc_idx[dorder]))
    pa_ids = part.column("a").to_numpy(
        zero_copy_only=False)[pair_idx].astype(np.int64)
    pb_ids = part.column("b").to_numpy(
        zero_copy_only=False)[pair_idx].astype(np.int64)

    def lookup(x):
        pos = np.searchsorted(dids_sorted, x)
        pos_c = np.minimum(pos, len(dids_sorted) - 1)
        ok = dids_sorted[pos_c] == x
        return pos_c, ok

    la, oka = lookup(pa_ids)
    lb, okb = lookup(pb_ids)
    ok = oka & okb
    la, lb = la[ok], lb[ok]
    pa_ok, pb_ok = pa_ids[ok], pb_ids[ok]
    # Chunked per-pair verification with the bounded process-level
    # shingle cache (JaccardVerifier).  A partition-wide
    # "shingle every unique doc once" kernel sounds strictly
    # better, but its working set is the whole partition
    # (~100 MB of texts + sets) of FRESH allocations per task —
    # measured 10-25× slower here than this form, whose per-chunk
    # working set (~10 MB) recycles the worker's heap pages and
    # whose cache carries hot docs across partitions.
    verifier = JaccardVerifier(cfg)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s in range(0, len(pa_ok), batch_size):
        e = s + batch_size
        chunk = pa.table({
            "a": pa.array(pa_ok[s:e], type=_I64),
            "b": pa.array(pb_ok[s:e], type=_I64),
            "text_a": texts.take(pa.array(la[s:e])),
            "text_b": texts.take(pa.array(lb[s:e])),
        })
        res = verifier(chunk)
        out_a.append(res.column("a").to_numpy(zero_copy_only=False))
        out_b.append(res.column("b").to_numpy(zero_copy_only=False))
    return pa.table({
        "a": pa.array(np.concatenate(out_a) if out_a else
                      np.empty(0, dtype=np.int64), type=_I64),
        "b": pa.array(np.concatenate(out_b) if out_b else
                      np.empty(0, dtype=np.int64), type=_I64),
    })


def verify_pairs(
    pairs: Dataset, docs: Dataset, cfg: SignatureConfig,
    batch_size: int = 2048, num_partitions: int = 32,
    pre_deduped: bool = True,
) -> Dataset:
    """Candidate pairs → verified near-duplicate edges (a,b).

    Strategy is size-guarded (JoinHash small-side-builds pragmatism):

    - pairs ≤ ``BROADCAST_PAIRS_MAX``: FUSED attach+verify — pairs are
      hash-partitioned, each doc's text is shipped AT MOST ONCE PER
      SHARD (not once per pair!), and the exchange's reduce kernel
      looks texts up locally and Jaccard-verifies in place.  A hot
      boilerplate doc appearing in hundreds of candidate pairs was
      otherwise replicated per pair — measured as a multi-GB text
      shuffle that collapsed the stage at 240k docs.
    - larger: two-sided hash joins (attach_texts) + a verify map.

    ``pre_deduped=False`` means the caller skipped the pair-dedup
    shuffle (flagship: the broadcast path dedups driver-side for free
    while building its index; the large path restores the shuffle)."""
    pairs = pairs.materialize()
    if pairs.count() <= BROADCAST_PAIRS_MAX:
        return _verify_broadcast(pairs, docs, cfg, batch_size,
                                 num_partitions,
                                 pre_deduped=pre_deduped)

    if not pre_deduped:
        from hyrise_generalized_dedup_ray.stages.lsh import dedupe_pairs
        pairs = dedupe_pairs(pairs, num_partitions).materialize()

    with_texts = attach_texts(pairs, docs, num_partitions)

    def verify_batch(batch: pa.Table, cfg=cfg) -> pa.Table:
        return JaccardVerifier(cfg)(batch)

    return with_texts.map_batches(
        verify_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def _verify_broadcast(
    pairs: Dataset, docs: Dataset, cfg: SignatureConfig,
    batch_size: int, num_partitions: int,
    pre_deduped: bool = True,
) -> Dataset:
    """Fused attach+verify (see :func:`verify_pairs`): ONE hash
    exchange over per-shard pair seeds and per-(doc, shard)-
    deduplicated text rows.  The seed shards and the member index are
    built INSIDE one task (embed_dedup._build_corpus pattern) — the
    driver holds only object refs, never the pair table."""
    # Width follows pairs volume (~2k pairs / kernel task) and cluster
    # CPUs, floored by the caller's ``num_partitions`` — kernel
    # parallelism is bounded by the shard count: 16 shards on 32 CPUs
    # ran the kernels near-serially.  (count() is free: the caller
    # materialized `pairs`; a pre-dedup overcount only widens P.)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    P = int(np.clip(pairs.count() // 20000,
                    max(4, num_partitions, 2 * cpus), 4 * cpus))
    sch = docs.schema()
    names = getattr(sch, "names", None) or []
    use_shingles = "shingles" in names
    payload = "shingles" if use_shingles else "text"
    parts = _build_verify_seeds.options(num_returns=P + 1).remote(
        list(pairs.to_arrow_refs()), P, pre_deduped, payload)
    seed_refs, ref = list(parts[:P]), parts[P]

    if use_shingles:
        melt = functools.partial(_melt_pair_shingles, ref=ref, P=P)
        kernel = functools.partial(_verify_shingle_kernel, cfg=cfg)
        schema = _VERIFY_SHINGLE_SCHEMA
    else:
        melt = functools.partial(_melt_pair_texts, ref=ref, P=P)
        kernel = functools.partial(_verify_kernel, cfg=cfg,
                                   batch_size=batch_size)
        schema = _VERIFY_SCHEMA
    refs = hash_exchange_refs(
        docs.to_arrow_refs(), melt, "pkey", kernel,
        P, schema, seed_shards=seed_refs, key_is_shard=True)
    if not refs:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    return ray.data.from_arrow_refs(refs)


@ray.remote
def _build_verify_seeds(refs: list, P: int, pre_deduped: bool,
                        payload: str = "text"):
    """Pair blocks → P per-shard seed tables + the member index, all
    built off-driver.  ``num_returns=P+1``: the P seed shards ship to
    their reduce tasks individually; the index dict broadcasts once."""
    tables = [t for t in ray.get(list(refs)) if t.num_columns > 0]
    pt = pa.concat_tables(tables) if tables else _PAIR_SCHEMA.empty_table()
    a = pt.column("a").to_numpy(zero_copy_only=False)
    b = pt.column("b").to_numpy(zero_copy_only=False)
    if not pre_deduped and len(a):
        # pairs are already in-hand for the index build — dedup here
        # costs one lexsort instead of the whole dedupe_pairs
        # all-to-all the flagship used to pay
        order0 = np.lexsort((b, a))
        a, b = a[order0], b[order0]
        keep0 = np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        a, b = a[keep0], b[keep0]
    pk = partition_ids(mix2(a.view(np.uint64), b.view(np.uint64)), P)
    n = len(a)
    schema = (_VERIFY_SHINGLE_SCHEMA if payload == "shingles"
              else _VERIFY_SCHEMA)
    payload_nulls = (pa.nulls(n, type=pa.list_(pa.int64()))
                     if payload == "shingles"
                     else pa.nulls(n, type=pa.string()))
    pair_table = pa.table({
        "pkey": pa.array(pk, type=_I64),
        "kind": pa.array(np.zeros(n, dtype=np.int64), type=_I64),
        "a": pa.array(a, type=_I64),
        "b": pa.array(b, type=_I64),
        "doc_id": pa.nulls(n, type=_I64),
        payload: payload_nulls,
    }, schema=schema)
    seed_shards = split_by_key(pair_table, pk, P, key_is_shard=True)
    member_doc = np.concatenate([a, b])
    member_pk = np.concatenate([pk, pk])
    order = np.argsort(member_doc, kind="stable")
    return (*seed_shards,
            {"md": member_doc[order], "mpk": member_pk[order]})


def _melt_exact_candidates(block: pa.Table, ref) -> pa.Table:
    """Melt candidate texts out of signer blocks: docs present in the
    broadcast candidate index ship (pkey, text_hash, doc_id, text)."""
    st = ray.get(ref)
    md = st["md"]
    ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    pos = np.searchsorted(md, ids)
    pos_c = np.minimum(pos, len(md) - 1) if len(md) else \
        np.zeros(len(ids), dtype=np.int64)
    found = (md[pos_c] == ids) if len(md) else np.zeros(len(ids), dtype=bool)
    rows = np.flatnonzero(found)
    pos_f = pos_c[rows]
    return pa.table({
        "pkey": pa.array(st["mpk"][pos_f], type=_I64),
        "text_hash": pa.array(st["mth"][pos_f], type=_I64),
        "doc_id": pa.array(ids[rows], type=_I64),
        "text": block.column("text").take(pa.array(rows)),
    })


_EXACT_MELT_SCHEMA = pa.schema([("pkey", _I64), ("text_hash", _I64),
                                ("doc_id", _I64), ("text", pa.string())])


def _exact_members_map(block: pa.Table) -> pa.Table:
    return pa.table({
        "text_hash": block.column("text_hash"),
        "doc_id": block.column("doc_id"),
    })


def _exact_members_kernel(part: pa.Table) -> pa.Table:
    th = part.column("text_hash").to_numpy(zero_copy_only=False)
    ids = part.column("doc_id").to_numpy(zero_copy_only=False)
    order, starts, ends = sort_groups((th,), order_by=(ids,))
    th, ids = th[order], ids[order]
    sizes = ends - starts
    keep = np.repeat(sizes >= 2, sizes) if len(sizes) else \
        np.empty(0, dtype=bool)
    return pa.table({
        "text_hash": pa.array(th[keep], type=_I64),
        "doc_id": pa.array(ids[keep], type=_I64),
    })


_EXACT_MEMBERS_SCHEMA = pa.schema([("text_hash", _I64), ("doc_id", _I64)])


def exact_dup_edges(signatures: Dataset, num_partitions: int = 32) -> Dataset:
    """Edges between documents with byte-identical text.

    Two exchanges, so the wide one never carries text:

    1. exchange only (text_hash:u64, doc_id:i64) rows — 16 B/doc — and
       keep the hash groups with ≥2 members (the only exact-dup
       candidates; ~the duplicate fraction of the corpus);
    2. broadcast the candidate doc→shard index, melt each candidate's
       text out of ``signatures`` in one map (non-candidates never
       leave their block), and byte-compare within hash groups per
       shard to rule out 64-bit collisions.

    Star edges (min doc → others), the same rule as the oracle."""
    sig_refs = signatures.to_arrow_refs()
    member_refs = hash_exchange_refs(
        sig_refs, _exact_members_map, "text_hash", _exact_members_kernel,
        num_partitions, _EXACT_MEMBERS_SCHEMA)
    if not member_refs:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())

    n_members = count_rows(member_refs)
    if n_members > BROADCAST_PAIRS_MAX:
        # candidate membership too big to broadcast: hash-join the
        # candidate texts instead (still only candidates ship text)
        from hyrise_generalized_dedup_ray.stages.exchange import exchange_join

        members = ray.data.from_arrow_refs(member_refs)
        with_text = exchange_join(
            members, signatures.select_columns(["doc_id", "text"]),
            on=["doc_id"], num_partitions=num_partitions,
        )

        def add_th_pkey(batch: pa.Table) -> pa.Table:
            th = batch.column("text_hash").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "pkey", pa.array(partition_ids(th, num_partitions),
                                 type=_I64))

        # engine hash exchange, NOT Ray's sort-based groupby: the
        # rows carry full text payloads, exactly what range sampling
        # + sorting must not touch twice (stages/exchange.py:5-11)
        from hyrise_generalized_dedup_ray.stages.exchange import \
            hash_exchange
        return hash_exchange(with_text, add_th_pkey, "pkey",
                             _confirm_exact_partition, num_partitions,
                             _EXACT_MELT_SCHEMA, key_is_shard=True)

    if n_members == 0:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    # index built INSIDE a task — the driver never holds the
    # candidate-membership table, only the object ref
    ref = _build_exact_member_index.remote(list(member_refs),
                                           num_partitions)

    refs = hash_exchange_refs(
        sig_refs,
        functools.partial(_melt_exact_candidates, ref=ref),
        "pkey", _confirm_exact_partition, num_partitions,
        _EXACT_MELT_SCHEMA, key_is_shard=True)
    if not refs:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    return ray.data.from_arrow_refs(refs)


@ray.remote
def _build_exact_member_index(refs: list, num_partitions: int) -> dict:
    """Candidate-membership blocks → sorted (doc → text_hash, shard)
    lookup, concatenated inside a task (off-driver)."""
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    mt = pa.concat_tables(tables)
    m_th = mt.column("text_hash").to_numpy(zero_copy_only=False)
    m_id = mt.column("doc_id").to_numpy(zero_copy_only=False)
    m_pk = partition_ids(m_th, num_partitions)
    order = np.argsort(m_id, kind="stable")
    return {"md": m_id[order], "mth": m_th[order], "mpk": m_pk[order]}


def _confirm_exact_partition(part: pa.Table) -> pa.Table:
    """One hash shard of (text_hash, doc_id, text) candidate rows →
    byte-confirmed exact-dup star edges (see :func:`exact_dup_edges`).

    Fully vectorized (round-4): sort by (hash, text, id) with Arrow's
    C-level string sort, find group boundaries by adjacent-row
    equality, and emit (min-id rep → member) edges with one gather —
    a 10^6-copy boilerplate cluster confirms without a single
    per-row ``.as_py()``."""
    n = len(part)
    if n < 2:
        return pa.table({"a": pa.array([], type=_I64),
                         "b": pa.array([], type=_I64)})
    idx = pc.sort_indices(
        part, sort_keys=[("text_hash", "ascending"),
                         ("text", "ascending"),
                         ("doc_id", "ascending")])
    part = part.take(idx)
    th = part.column("text_hash").to_numpy(zero_copy_only=False)
    ids = part.column("doc_id").to_numpy(zero_copy_only=False)
    txt = part.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    same_hash = th[1:] == th[:-1]
    same_text = pc.fill_null(
        pc.equal(txt.slice(0, n - 1), txt.slice(1)), False
    ).to_numpy(zero_copy_only=False).astype(bool)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    np.logical_not(same_hash & same_text, out=boundary[1:])
    gid = np.cumsum(boundary) - 1
    rep = ids[np.flatnonzero(boundary)][gid - 0]
    member = ~boundary
    return pa.table({
        "a": pa.array(rep[member], type=_I64),
        "b": pa.array(ids[member], type=_I64),
    })
