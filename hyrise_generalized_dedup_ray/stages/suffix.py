"""Suffix-array substring stage: winnowing-fingerprint partitioning →
per-partition suffix array over concatenated text → ≥L-byte cross-doc
repeat edges.

Partitioning is **content-based**: documents sharing any verbatim run
of ≥ ``min_substring_bytes`` share a winnowed fingerprint (guarantee of
winnowing, functions/substr.py), so they co-locate deterministically —
there is no "same url-bucket" recall boundary.  Stages (every wide step
is a :mod:`stages.exchange` hash exchange — one compact move per row,
no sort-shuffle coordination):

1. explode (fingerprint, doc_id) from the signer output and exchange
   on fingerprint; the reduce keeps groups with ≥2 distinct docs and
   hashes every group's id set into a ``docset`` key (light shuffle —
   two u64s per fingerprint, no text);
2. exchange the member rows on ``docset`` to deduplicate groups by
   their *document set* (a shared run of length R yields ~R/10
   identical fingerprint groups — one suffix-array run suffices) and
   pre-assign ≤64-doc suffix-array chunks (``chunk_with_anchor``);
3. ship text only for surviving groups: broadcast the (docset, chunk,
   doc_id) membership index, melt each member's text out of the
   signer blocks ONCE PER SHARD (not once per membership), and run the
   suffix kernel as the same exchange's reduce;
4. per group: suffix array over the \\x00-joined concatenation →
   adjacent cross-doc pairs with sentinel-clamped LCP ≥ L
   (functions.substr.cross_doc_repeats).

This is the engine's recast of the reference's trained-dictionary LZ4
encoder (lz4_encoder.hpp:40-59): the shared substring discovered here
is the "base" every member deduplicates against.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.config import SignatureConfig
from hyrise_generalized_dedup_ray.functions.grouping import (
    partition_ids,
    sort_groups,
)
from hyrise_generalized_dedup_ray.functions.hashing import mix2
from hyrise_generalized_dedup_ray.functions.pairs import (
    SUBSTR_MAX_GROUP,
    batch_docset_keys,
)
from hyrise_generalized_dedup_ray.functions.substr import cross_doc_repeats
from hyrise_generalized_dedup_ray.stages.exchange import (
    hash_exchange_refs,
    split_by_key,
)

_I64 = pa.int64()
_FP_SCHEMA = pa.schema([("fp", _I64), ("doc_id", _I64)])
_DS_SCHEMA = pa.schema([("docset", _I64), ("doc_id", _I64)])
_CHUNK_SCHEMA = pa.schema([("docset", _I64), ("chunk", _I64),
                           ("doc_id", _I64)])
_FUSED_SCHEMA = pa.schema([("pkey", _I64), ("kind", _I64), ("docset", _I64),
                           ("chunk", _I64), ("doc_id", _I64),
                           ("text", pa.string())])
_EDGE_SCHEMA = pa.schema([("a", _I64), ("b", _I64)])


def explode_fp_block(block: pa.Table) -> pa.Table:
    """One signer block → (fp, doc_id) rows (winnowed fingerprints)."""
    lists = block.column("fingerprints").combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    counts = np.diff(lists.offsets.to_numpy())
    ids = np.repeat(block.column("doc_id").to_numpy(zero_copy_only=False),
                    counts)
    return pa.table({
        "fp": pa.array(flat, type=_I64),
        "doc_id": pa.array(ids, type=_I64),
    })


def members_kernel(part: pa.Table) -> pa.Table:
    """All (fp, doc_id) rows of one shard → (docset, doc_id) member rows
    of the shard's *distinct multi-doc* fingerprint groups."""
    fp = part.column("fp").to_numpy(zero_copy_only=False)
    ids = part.column("doc_id").to_numpy(zero_copy_only=False)
    order, starts, ends = sort_groups((fp,), order_by=(ids,))
    fp, ids = fp[order], ids[order]
    # drop duplicate (fp, doc) rows, recompute boundaries
    keep = np.concatenate([[True], (fp[1:] != fp[:-1]) | (ids[1:] != ids[:-1])]) \
        if len(fp) else np.empty(0, dtype=bool)
    fp, ids = fp[keep], ids[keep]
    if len(fp):
        idx = np.flatnonzero(fp[1:] != fp[:-1]) + 1
        starts = np.concatenate([[0], idx])
        ends = np.concatenate([idx, [len(fp)]])
    else:
        starts = ends = np.empty(0, dtype=np.int64)
    sizes = ends - starts
    # keep only multi-member groups, then hash every group's id set
    # in ONE reduceat pass (boilerplate corpora have ~millions of
    # multi-member fingerprint groups per shard — a per-group
    # docset_key() Python loop here was the substr branch's
    # dominant cost, ~15µs × 1M groups per shard)
    multi = sizes >= 2
    row_keep = np.repeat(multi, sizes) if len(sizes) else \
        np.empty(0, dtype=bool)
    ids_k = ids[row_keep]
    sizes_k = sizes[multi]
    if len(sizes_k) == 0:
        return _DS_SCHEMA.empty_table()
    gstarts = np.concatenate([[0], np.cumsum(sizes_k)[:-1]])
    keys = batch_docset_keys(ids_k, gstarts, sizes_k)
    # shard-local docset dedup: a shared run of length R yields ~R/10
    # fingerprint groups with IDENTICAL doc sets; collapsing the copies
    # that landed in this shard up front shrinks the docset exchange
    _, first = np.unique(keys, return_index=True)
    sel = np.zeros(len(keys), dtype=bool)
    sel[first] = True
    row_sel = np.repeat(sel, sizes_k)
    return pa.table({
        "docset": pa.array(
            np.repeat(keys[sel].view(np.int64), sizes_k[sel]), type=_I64),
        "doc_id": pa.array(ids_k[row_sel], type=_I64),
    })


def chunks_kernel(part: pa.Table) -> pa.Table:
    """All (docset, doc_id) rows of one shard → unique (docset, chunk,
    doc_id) rows with pre-assigned ≤SUBSTR_MAX_GROUP-doc suffix-array
    chunks — a 3000-doc boilerplate docset runs as ~47 parallel tasks
    downstream, not one."""
    dsk = part.column("docset").to_numpy(zero_copy_only=False)
    ids = part.column("doc_id").to_numpy(zero_copy_only=False)
    if not len(dsk):
        return _CHUNK_SCHEMA.empty_table()
    order = np.lexsort((ids, dsk))
    dsk, ids = dsk[order], ids[order]
    keep = np.concatenate(
        [[True], (dsk[1:] != dsk[:-1]) | (ids[1:] != ids[:-1])])
    dsk, ids = dsk[keep], ids[keep]
    idx = np.flatnonzero(dsk[1:] != dsk[:-1]) + 1
    starts = np.concatenate([[0], idx])
    sizes = np.diff(np.concatenate([starts, [len(dsk)]]))
    keys = dsk[starts]
    # fits-in-one-chunk groups (the overwhelming majority) emit their
    # rows verbatim under chunk 0; oversized groups split into
    # anchored ≤SUBSTR_MAX_GROUP chunks (chunk_with_anchor semantics,
    # vectorized — a boilerplate corpus makes millions of groups per
    # shard, so no per-group Python, same reasoning as members_kernel)
    small = sizes <= SUBSTR_MAX_GROUP
    parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    if small.any():
        row_small = np.repeat(small, sizes)
        parts.append((np.repeat(keys[small], sizes[small]),
                      np.zeros(int(sizes[small].sum()), dtype=np.int64),
                      ids[row_small]))
    if not small.all():
        big = ~small
        step = SUBSTR_MAX_GROUP - 1
        sizes_b, keys_b = sizes[big], keys[big]
        # non-anchor rows: position p ≥ 1 within its group → chunk
        # (p-1)//step, exactly chunk_with_anchor's rest slicing
        pos = np.arange(len(dsk)) - np.repeat(starts, sizes)
        rest = np.repeat(big, sizes) & (pos > 0)
        parts.append((np.repeat(keys_b, sizes_b - 1),
                      (pos[rest] - 1) // step, ids[rest]))
        # anchor rows: the group's min id repeats once per chunk
        n_chunks = -(-(sizes_b - 1) // step)
        tot = int(n_chunks.sum())
        offs = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        parts.append((np.repeat(keys_b, n_chunks),
                      np.arange(tot) - np.repeat(offs, n_chunks),
                      np.repeat(ids[starts[big]], n_chunks)))
    return pa.table({
        "docset": pa.array(np.concatenate([p[0] for p in parts])
                           .astype(np.int64), type=_I64),
        "chunk": pa.array(np.concatenate([p[1] for p in parts])
                          .astype(np.int64), type=_I64),
        "doc_id": pa.array(np.concatenate([p[2] for p in parts])
                           .astype(np.int64), type=_I64),
    })


def _identity(t: pa.Table) -> pa.Table:
    return t


def fingerprint_group_refs(
    signatures: Dataset, num_partitions: int = 32
) -> list["ray.ObjectRef"]:
    """Signer output → per-shard refs of (docset, chunk, doc_id) rows,
    one row per member of each distinct multi-doc fingerprint group.

    Two chained hash exchanges (fp, then docset); winnowing yields
    ~text_len/10 fingerprints per doc, so the exploded input is ~100×
    the doc count — both passes move only 16-byte rows."""
    sig_refs = signatures.to_arrow_refs()
    members = hash_exchange_refs(
        sig_refs, explode_fp_block, "fp", members_kernel,
        num_partitions, _FP_SCHEMA)
    return hash_exchange_refs(
        members, _identity, "docset", chunks_kernel,
        max(8, num_partitions // 2), _DS_SCHEMA)


def fingerprint_groups(signatures: Dataset,
                       num_partitions: int = 32) -> Dataset:
    """Dataset view of :func:`fingerprint_group_refs` (tests/tools)."""
    refs = fingerprint_group_refs(signatures, num_partitions)
    if not refs:
        return ray.data.from_arrow(_CHUNK_SCHEMA.empty_table())
    return ray.data.from_arrow_refs(refs)


def _melt_group_texts(block: pa.Table, ref, P: int) -> pa.Table:
    """Melt each doc's text toward the shards of the groups it belongs
    to, deduped per (doc, shard) — a doc in many docsets ships its text
    at most once per shard, never once per membership."""
    st = ray.get(ref)   # zero-copy views from the object store
    md, mpk = st["md"], st["mpk"]
    ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    lo = np.searchsorted(md, ids, "left")
    hi = np.searchsorted(md, ids, "right")
    cnt = hi - lo
    total = int(cnt.sum())
    doc_rows = np.repeat(np.arange(len(ids)), cnt)
    excl = np.concatenate([[0], np.cumsum(cnt)[:-1]]) if len(cnt) \
        else np.empty(0, dtype=np.int64)
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
    k = len(doc_rows)
    return pa.table({
        "pkey": pa.array(pks, type=_I64),
        "kind": pa.array(np.ones(k, dtype=np.int64), type=_I64),
        "docset": pa.nulls(k, type=_I64),
        "chunk": pa.nulls(k, type=_I64),
        "doc_id": pa.array(ids[doc_rows], type=_I64),
        "text": block.column("text").take(pa.array(doc_rows)),
    }, schema=_FUSED_SCHEMA)


def _suffix_fused_kernel(part: pa.Table, min_len: int) -> pa.Table:
    """One shard of membership rows (kind=0) + per-shard-deduped text
    rows (kind=1) → cross-doc ≥min_len-byte repeat edges.

    Three shard-level amortizations over the per-group form (the edge
    SET is unchanged — each qualifying pair is emitted once per shard
    instead of once per docset chunk, and downstream is union-find /
    ``dedupe_pairs`` either way):

    - zero-copy CSR text access (no ``to_pylist`` + re-encode); gram
      hashes are computed lazily per doc straight off the CSR slices
      (bit-identical to per-doc :func:`gram_hashes`).  Lazy-per-doc,
      NOT one batched pass: a whole-shard hash array is 8 bytes per
      text byte — ~0.8 GB per 100 MB shard × 32 concurrent workers
      blew worker heaps at the 2M-page scale point, while the per-doc
      transient is a few hundred KB.
    - a per-doc sorted-gram cache built lazily with a single introsort
      (any-occurrence witness index instead of np.unique's stable-sort
      first-occurrence — any occurrence verifies equally, and the
      collision fallback below keeps exactness either way).
    - a shard-level pair-verdict memo: overlapping docset chunks retest
      the same doc pair many times (73k pair tests vs far fewer
      distinct pairs at 240k docs); "does this pair share a ≥L run" is
      a pure function of the two texts, so each pair is decided once.

    A pair whose common gram hashes all fail byte-verification (64-bit
    collision) is resolved exactly by a two-doc suffix array — per
    PAIR, not per group, so one adversarial collision can't knock a
    whole boilerplate group onto the O(n log² n) path.
    """
    from hyrise_generalized_dedup_ray.functions.pairs import \
        batch_docset_keys_raw
    from hyrise_generalized_dedup_ray.functions.substr import (
        PAIRWISE_MAX_BYTES,
        PAIRWISE_MAX_GROUP,
    )
    from hyrise_generalized_dedup_ray.functions.text import utf8_csr

    kind = part.column("kind").to_numpy(zero_copy_only=False)
    mem_idx = np.flatnonzero(kind == 0)
    doc_idx = np.flatnonzero(kind == 1)
    if len(mem_idx) == 0 or len(doc_idx) == 0:
        return _EDGE_SCHEMA.empty_table()
    dids = part.column("doc_id").to_numpy(
        zero_copy_only=False)[doc_idx].astype(np.int64)
    dorder = np.argsort(dids, kind="stable")
    dids_sorted = dids[dorder]
    texts = part.column("text").take(pa.array(doc_idx[dorder]))
    flat, offs = utf8_csr(texts)
    lens = np.diff(offs)
    cnts = np.maximum(lens - min_len + 1, 0)
    n_docs = len(lens)
    flat_bytes = flat.tobytes()

    dsk = part.column("docset").to_numpy(
        zero_copy_only=False)[mem_idx].astype(np.int64)
    ck = part.column("chunk").to_numpy(
        zero_copy_only=False)[mem_idx].astype(np.int64)
    ids = part.column("doc_id").to_numpy(
        zero_copy_only=False)[mem_idx].astype(np.int64)
    order3, starts, ends = sort_groups((dsk, ck), order_by=(ids,))
    ids_sorted = ids[order3]

    # whole-shard gram hashes in ONE chunked pass (gram_hashes_csr:
    # 2 MiB chunks at doc boundaries, bit-identical to per-doc
    # hashing).  8 B per text byte of shard-local transient — bounded
    # by shard sizing (kernel_partitions tracks 2× cluster CPUs, so a
    # shard is corpus_melt/(2·CPUs)); per-doc valid slice is
    # H_csr[offs[p] : offs[p] + cnts[p]].  Replaces ~1M per-doc
    # hash calls whose numpy dispatch dominated the 2M profile.
    from hyrise_generalized_dedup_ray.functions.substr import \
        gram_hashes_csr
    H_csr = gram_hashes_csr(flat, offs, min_len)

    gram_cache: list = [False] * n_docs

    def grams_of(p: int):
        """Sorted unique gram hashes + witness in-doc offsets of one
        doc — used by the pairwise/collision paths only (sweep_group
        reads raw H_csr slices directly)."""
        g = gram_cache[p]
        if g is False:
            c = int(cnts[p])
            if c <= 0:
                g = None
            else:
                h = H_csr[offs[p]: offs[p] + c]
                o = np.argsort(h)  # introsort; any occurrence verifies
                hs = h[o]
                keep = np.empty(len(hs), dtype=bool)
                keep[0] = True
                np.not_equal(hs[1:], hs[:-1], out=keep[1:])
                g = (hs[keep], o[keep])
            gram_cache[p] = g
        return g

    def text_of(p: int) -> bytes:
        return flat_bytes[offs[p]: offs[p + 1]]

    decided: dict[int, bool] = {}
    # edges accumulate as pi*n_docs+pj KEY ARRAYS (pi < pj positions in
    # dids_sorted), deduped once at the end with a single np.unique —
    # the per-edge dict-check + two list appends this replaces were
    # ~1.7 s of pure Python per 1M edges at the 240k point
    sweep_keys: list[np.ndarray] = []
    slow_keys: list[int] = []

    _EMPTY_PAIRS = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))

    def sweep_group(idxs):
        """All qualifying pairs of one in-bounds group in ONE vectorized
        sweep — bit-equal to running :func:`decide_pair` over every
        pair.  Concatenate the members' sorted unique gram hashes, find
        hash runs spanning ≥2 docs (per-doc hashes are unique, so run
        length 2+ ⟺ 2+ docs), byte-verify every run entry against the
        run's FIRST entry, and connect each run's docs as a clique via
        one doc×run incidence matmul.  If every entry of every multi
        run byte-matches its run head, then for any pair sharing a run
        the pairwise witness check would have byte-verified too (all
        occurrences carry identical bytes), and a pair sharing no run
        has no common hash — identical verdicts.  Any mismatch (a
        64-bit collision inside a run) returns None and the caller
        falls back to the exact pairwise path for the whole group.

        Cost: one argsort + one small matmul per group instead of
        g(g-1)/2 searchsorted intersections — the 64-doc boilerplate
        chunks that dominate pair tests (≥70% at 240k docs) drop from
        ~2000 numpy-call rounds to ~10.  Consumes per-doc UNIQUE gram
        sets (grams_of, cached per shard): repetitive boilerplate
        documents have raw gram counts 10-100× their unique counts,
        so deduping per doc BEFORE the group concat is the volume
        lever (a raw-slice variant measured 1.5× slower at the 2M
        point).  Returns (pi, pj) POSITION arrays (pi < pj, indices
        into dids_sorted), or None on a collision."""
        live_l: list[int] = []
        arrs: list[np.ndarray] = []
        wits: list[np.ndarray] = []
        for p in idxs:
            gr = grams_of(int(p))
            if gr is None:
                continue
            live_l.append(int(p))
            arrs.append(gr[0])
            wits.append(gr[1])
        if len(arrs) < 2:
            return _EMPTY_PAIRS
        live = np.array(live_l, dtype=np.int64)
        lens_ = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                            count=len(arrs))
        H = np.concatenate(arrs)
        W = np.concatenate(wits) if len(wits) > 1 else wits[0]
        W = W + np.repeat(offs[live].astype(np.int64), lens_)
        SL = np.repeat(np.arange(len(live), dtype=np.int64), lens_)
        o = np.argsort(H, kind="stable")
        H, W, SL = H[o], W[o], SL[o]
        newrun = np.empty(len(H), dtype=bool)
        newrun[0] = True
        np.not_equal(H[1:], H[:-1], out=newrun[1:])
        rid = np.cumsum(newrun) - 1
        counts = np.bincount(rid)
        multi = counts[rid] >= 2
        if not multi.any():
            return _EMPTY_PAIRS
        We, SLe = W[multi], SL[multi]
        RIDe = rid[multi]
        first = np.empty(len(RIDe), dtype=bool)
        first[0] = True
        np.not_equal(RIDe[1:], RIDe[:-1], out=first[1:])
        run_starts = np.flatnonzero(first)
        run_ends = np.concatenate([run_starts[1:], [len(RIDe)]])
        sizes_r = run_ends - run_starts
        # dedupe runs by their DOC SET (a boilerplate chunk has ~2k
        # hash runs all spanning the same 64 docs — one byte-verified
        # representative establishes the identical clique).  Within a
        # run entries keep concat order (stable sort), so doc lists
        # are sorted and batch_docset_keys is the pipeline's standard
        # set identity (same collision-accepting hash the upstream
        # docset grouping already rests on).
        keys_r = batch_docset_keys_raw(SLe.astype(np.int64), run_starts,
                                       sizes_r)
        _, rep = np.unique(keys_r, return_index=True)
        # byte-verify EVERY entry of every representative run against
        # its run head in one gather + one compare (the per-rep loop
        # this replaces paid an np.ix_ / fancy-index pair per run —
        # ~168k numpy calls across a 240k-doc sweep)
        cnt_r = sizes_r[rep]
        tot = int(cnt_r.sum())
        base = np.concatenate([[0], np.cumsum(cnt_r)[:-1]])
        ent = np.arange(tot) + np.repeat(run_starts[rep] - base, cnt_r)
        w = We[ent]
        aw = flat[w[:, None] + np.arange(min_len)]
        if (aw != aw[np.repeat(base, cnt_r)]).any():
            return None  # collision inside a run — exact fallback
        # clique closure: one (runs × docs) incidence matmul instead
        # of per-run Mb[np.ix_] writes
        inc = np.zeros((len(rep), len(live)), dtype=np.int32)  # can't wrap
        inc[np.repeat(np.arange(len(rep)), cnt_r), SLe[ent]] = 1
        Mb = inc.T @ inc
        ii, jj = np.nonzero(np.triu(Mb, 1))
        return live[ii], live[jj]

    def decide_pair(pi: int, pj: int) -> bool:
        """Exact 'share a ≥min_len run?' for two shard docs — gram-set
        intersection + one byte-verified witness, two-doc suffix array
        when every common hash is a collision."""
        gi = grams_of(pi)
        gj = grams_of(pj)
        if gi is None or gj is None:
            return False
        ui, fi = gi
        uj, fj = gj
        if len(ui) <= len(uj):
            pos = np.searchsorted(uj, ui)
            pos_c = np.minimum(pos, len(uj) - 1)
            hit = uj[pos_c] == ui
            ci = np.flatnonzero(hit)
            cj = pos_c[ci]
        else:
            pos = np.searchsorted(ui, uj)
            pos_c = np.minimum(pos, len(ui) - 1)
            hit = ui[pos_c] == uj
            cj = np.flatnonzero(hit)
            ci = pos_c[cj]
        if len(ci) == 0:
            return False
        oi = int(offs[pi])
        oj = int(offs[pj])
        for p1, p2 in zip(fi[ci], fj[cj]):
            q1 = oi + int(p1)
            q2 = oj + int(p2)
            if flat_bytes[q1:q1 + min_len] == flat_bytes[q2:q2 + min_len]:
                return True
        # collisions only — exact two-doc resolution
        return bool(cross_doc_repeats([text_of(pi), text_of(pj)], min_len))

    # one errstate for the WHOLE sweep: grams_of / batch_docset_keys
    # run their raw (unguarded) forms inside it
    with np.errstate(over="ignore"):
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            gids = ids_sorted[s:e]
            pos = np.searchsorted(dids_sorted, gids)
            pos_c = np.minimum(pos, len(dids_sorted) - 1)
            ok = dids_sorted[pos_c] == gids
            if not ok.all():
                pos_c = pos_c[ok]
            # gids is ascending and unique within a group and
            # dids_sorted is sorted, so pos_c is already sorted unique
            idxs = pos_c
            g = len(idxs)
            if g < 2:
                continue
            if (g <= PAIRWISE_MAX_GROUP
                    and int(lens[idxs].sum()) <= PAIRWISE_MAX_BYTES):
                pairs = sweep_group(idxs) if g > 2 else None
                if pairs is not None:
                    pi_a, pj_a = pairs
                    if len(pi_a):
                        sweep_keys.append(pi_a * n_docs + pj_a)
                    continue
                for a_i in range(g):
                    pi = int(idxs[a_i])
                    for b_i in range(a_i + 1, g):
                        pj = int(idxs[b_i])
                        key = pi * n_docs + pj
                        v = decided.get(key)
                        if v is None:
                            v = decide_pair(pi, pj)
                            decided[key] = v
                        if v:
                            slow_keys.append(key)
                continue
            # oversized group (> byte bound): suffix array over the
            # chunk, adjacent-pair subset (connectivity-equivalent)
            chunk_texts = [text_of(int(p)) for p in idxs]
            for ia, ib in cross_doc_repeats(chunk_texts, min_len):
                slow_keys.append(int(idxs[ia]) * n_docs + int(idxs[ib]))
    parts_k = sweep_keys
    if slow_keys:
        parts_k = parts_k + [np.array(slow_keys, dtype=np.int64)]
    if not parts_k:
        return _EDGE_SCHEMA.empty_table()
    keys_all = np.unique(np.concatenate(parts_k))
    pi_f = keys_all // n_docs
    pj_f = keys_all % n_docs
    # positions index dids_sorted (ascending unique) and pi < pj, so
    # a < b without a min/max pass — the same edge set the per-pair
    # emit produced, deduped in one vectorized unique
    return pa.table({
        "a": pa.array(dids_sorted[pi_f], type=_I64),
        "b": pa.array(dids_sorted[pj_f], type=_I64),
    })


# membership tables up to this many rows (~24 B/row, one shared-memory
# copy per node) broadcast the doc→(docset, chunk) index instead of
# hash-joining texts — the same size-guarded strategy selection as
# stages/verify.attach_texts; 25M rows ≈ 0.6 GB of index state.
BROADCAST_GROUPS_MAX = 25_000_000

# subset pruning runs up to this many member rows (the per-group loop
# in _prune_subset_chunks is ~10 µs/group in one Ray task); above it
# the redundancy is tolerated — pruning affects only work volume,
# never the edge semantics.
PRUNE_MEMBERS_MAX = 8_000_000


def prune_subset_chunks(gt: pa.Table) -> pa.Table:
    """Drop every (docset, chunk) group whose member set is a STRICT
    subset of another group's.

    Soundness: the fused kernel sweeps each group over its members'
    FULL gram-hash sets (not just the group's own fingerprint), so any
    pair of a subset group is tested — with identical gram data and
    identical verdicts — inside the superset group's sweep.  Subsets
    are rampant by construction: a long shared run emits one docset
    per winnowed fingerprint, and runs shared by extra documents over
    sub-intervals nest their docsets (measured 61% strict-subset
    groups on the 240k-page fixture).  Pruning shrinks both the melt
    shuffle (docs whose groups all died ship nowhere) and the kernel's
    group loop ~2.6×.

    Containment test per group: its rarest member (fewest group
    memberships) yields the candidate supersets; sorted-array
    searchsorted confirms.  Strictness (|B| > |A|) suffices because
    identical docsets share one docset key and were deduplicated by
    the upstream exchange.  Transitive chains are safe: maximal
    groups are never pruned."""
    if gt.num_rows == 0:
        return gt
    ds = gt.column("docset").to_numpy(zero_copy_only=False)
    ck = gt.column("chunk").to_numpy(zero_copy_only=False)
    ids = gt.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, ck, ds))
    ds_s, ck_s, ids_s = ds[order], ck[order], ids[order]
    nb = np.empty(len(ids_s), dtype=bool)
    nb[0] = True
    nb[1:] = (ds_s[1:] != ds_s[:-1]) | (ck_s[1:] != ck_s[:-1])
    gid = np.cumsum(nb) - 1
    n_groups = int(gid[-1]) + 1
    starts = np.flatnonzero(nb)
    sizes = np.diff(np.append(starts, len(ids_s)))
    # doc → groups adjacency (CSR over doc codes)
    docs_u, doc_inv = np.unique(ids_s, return_inverse=True)
    deg = np.bincount(doc_inv)
    ao = np.argsort(doc_inv, kind="stable")
    adj_groups = gid[ao]
    adj_starts = np.concatenate([[0], np.cumsum(deg)])
    # rarest member per group: rows sorted by (gid, degree) — the
    # first row of each gid is a minimum-degree member
    o2 = np.lexsort((deg[doc_inv], gid))
    g2 = gid[o2]
    f2 = np.empty(len(g2), dtype=bool)
    f2[0] = True
    np.not_equal(g2[1:], g2[:-1], out=f2[1:])
    rare_doc = doc_inv[o2[f2]]
    state = {"ids_s": ids_s, "starts": starts, "sizes": sizes,
             "adj_groups": adj_groups, "adj_starts": adj_starts,
             "rare_doc": rare_doc}
    keep_group = _prune_scan(state, 0, n_groups)
    if keep_group.all():
        return gt
    row_keep = np.repeat(keep_group, sizes)
    sel = np.zeros(len(ids_s), dtype=bool)
    sel[order[row_keep]] = True
    return gt.filter(pa.array(sel))


def _prune_scan(state: dict, g_lo: int, g_hi: int) -> np.ndarray:
    """Containment scan over groups [g_lo, g_hi) — the per-group loop
    of :func:`prune_subset_chunks`, split out so the remote path can
    fan it out over a shared read-only index."""
    ids_s = state["ids_s"]
    starts = state["starts"]
    sizes = state["sizes"]
    adj_groups = state["adj_groups"]
    adj_starts = state["adj_starts"]
    rare_doc = state["rare_doc"]
    keep = np.ones(g_hi - g_lo, dtype=bool)
    for g in range(g_lo, g_hi):
        m = rare_doc[g]
        lo, hi = adj_starts[m], adj_starts[m + 1]
        if hi - lo < 2:
            continue
        a = ids_s[starts[g]: starts[g] + sizes[g]]
        for b in adj_groups[lo:hi]:
            if b == g or sizes[b] <= sizes[g]:
                continue
            bm = ids_s[starts[b]: starts[b] + sizes[b]]
            pos = np.searchsorted(bm, a)
            pos = np.minimum(pos, len(bm) - 1)
            if np.array_equal(bm[pos], a):
                keep[g - g_lo] = False
                break
    return keep


@ray.remote
def _prune_scan_task(state, g_lo: int, g_hi: int) -> np.ndarray:
    return _prune_scan(state, g_lo, g_hi)


# above this many groups the containment scan fans out over child
# tasks sharing one object-store copy of the index (the scan is an
# embarrassingly parallel read-only loop; ~10 µs/group serial)
_PRUNE_SCAN_PARALLEL_MIN = 50_000


@ray.remote
def _prune_subset_chunks_task(*tables: pa.Table) -> pa.Table:
    ts = [t for t in tables if t.num_rows]
    if not ts:
        return _CHUNK_SCHEMA.empty_table()
    return _prune_concat(ts)


@ray.remote
def _prune_and_seed_task(P: int, *tables: pa.Table):
    """Fused prune + kernel-stage prep, all off-driver (one task,
    ``num_returns=P+1``): prune subset chunks, build the per-shard
    member seed tables and the sorted doc→shard index the melt
    broadcasts.  Replaces a gt→driver→seeds round-trip on the
    substring branch's critical path."""
    from hyrise_generalized_dedup_ray.stages.exchange import split_by_key

    ts = [t for t in tables if t.num_rows]
    gt = _prune_concat(ts) if ts else _CHUNK_SCHEMA.empty_table()
    g_ds = gt.column("docset").to_numpy(zero_copy_only=False)
    g_ch = gt.column("chunk").to_numpy(zero_copy_only=False)
    g_id = gt.column("doc_id").to_numpy(zero_copy_only=False)
    g_pk = partition_ids(mix2(g_ds.view(np.uint64), g_ch.view(np.uint64)),
                         P) if len(g_id) else np.empty(0, dtype=np.int64)
    m = len(g_id)
    member_table = pa.table({
        "pkey": pa.array(g_pk, type=_I64),
        "kind": pa.array(np.zeros(m, dtype=np.int64), type=_I64),
        "docset": pa.array(g_ds, type=_I64),
        "chunk": pa.array(g_ch, type=_I64),
        "doc_id": pa.array(g_id, type=_I64),
        "text": pa.nulls(m, type=pa.string()),
    }, schema=_FUSED_SCHEMA)
    seeds = split_by_key(member_table, g_pk, P, key_is_shard=True)
    order = np.argsort(g_id, kind="stable")
    return (*seeds, {"md": g_id[order], "mpk": g_pk[order]})


def _prune_concat(ts: list) -> pa.Table:
    gt = pa.concat_tables(ts)
    if gt.num_rows == 0:
        return gt
    ds = gt.column("docset").to_numpy(zero_copy_only=False)
    ck = gt.column("chunk").to_numpy(zero_copy_only=False)
    ids = gt.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, ck, ds))
    ds_s, ck_s, ids_s = ds[order], ck[order], ids[order]
    nb = np.empty(len(ids_s), dtype=bool)
    nb[0] = True
    nb[1:] = (ds_s[1:] != ds_s[:-1]) | (ck_s[1:] != ck_s[:-1])
    gid = np.cumsum(nb) - 1
    n_groups = int(gid[-1]) + 1
    if n_groups < _PRUNE_SCAN_PARALLEL_MIN:
        return prune_subset_chunks(gt)
    starts = np.flatnonzero(nb)
    sizes = np.diff(np.append(starts, len(ids_s)))
    docs_u, doc_inv = np.unique(ids_s, return_inverse=True)
    deg = np.bincount(doc_inv)
    ao = np.argsort(doc_inv, kind="stable")
    adj_groups = gid[ao]
    adj_starts = np.concatenate([[0], np.cumsum(deg)])
    o2 = np.lexsort((deg[doc_inv], gid))
    g2 = gid[o2]
    f2 = np.empty(len(g2), dtype=bool)
    f2[0] = True
    np.not_equal(g2[1:], g2[:-1], out=f2[1:])
    rare_doc = doc_inv[o2[f2]]
    state_ref = ray.put({"ids_s": ids_s, "starts": starts,
                         "sizes": sizes, "adj_groups": adj_groups,
                         "adj_starts": adj_starts,
                         "rare_doc": rare_doc})
    k = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    bounds = np.linspace(0, n_groups, k + 1).astype(np.int64)
    keep_group = np.concatenate(ray.get(
        [_prune_scan_task.remote(state_ref, int(a), int(b))
         for a, b in zip(bounds[:-1], bounds[1:]) if b > a]))
    if keep_group.all():
        return gt
    row_keep = np.repeat(keep_group, sizes)
    sel = np.zeros(len(ids_s), dtype=bool)
    sel[order[row_keep]] = True
    return gt.filter(pa.array(sel))


def substring_edges(
    signatures: Dataset,
    cfg: SignatureConfig,
    num_partitions: int = 32,
) -> Dataset:
    """Signer output → exact ≥L-byte shared-substring edges (a,b)."""
    from hyrise_generalized_dedup_ray.stages.exchange import exchange_join

    # the suffix/pairwise kernels are the branch's heaviest compute and
    # group costs are skewed (one boilerplate docset vs thousands of
    # pairs) — partition the KERNEL stage much wider than the join so
    # stragglers can't hold a whole shard's worth of groups
    kernel_partitions = max(num_partitions,
                            2 * int(ray.cluster_resources().get("CPU", 8)))

    # the fingerprint grouping is kernel-bound, not shuffle-bound —
    # its width follows the CLUSTER, not the join fan-out cap, keeping
    # every core busy at 4× cluster sizes
    grp_partitions = max(num_partitions,
                         2 * int(ray.cluster_resources().get("CPU", 8)))
    group_refs = fingerprint_group_refs(signatures, grp_partitions)
    min_len = cfg.min_substring_bytes

    from hyrise_generalized_dedup_ray.stages.exchange import count_rows
    n_member_rows = count_rows(group_refs) if group_refs else 0
    if n_member_rows <= BROADCAST_GROUPS_MAX:
        if group_refs and 0 < n_member_rows <= PRUNE_MEMBERS_MAX:
            # strict-subset groups (61% at 240k) do only redundant
            # work — drop them BEFORE the melt so their text never
            # ships (see prune_subset_chunks for the soundness note).
            # Prune + seed + index build run fused in ONE off-driver
            # task; the driver holds only refs.
            parts = _prune_and_seed_task.options(
                num_returns=kernel_partitions + 1).remote(
                kernel_partitions, *group_refs)
            seed_refs = list(parts[:kernel_partitions])
            ref = parts[kernel_partitions]
            edge_refs = hash_exchange_refs(
                signatures.to_arrow_refs(),
                functools.partial(_melt_group_texts, ref=ref,
                                  P=kernel_partitions),
                "pkey",
                functools.partial(_suffix_fused_kernel, min_len=min_len),
                kernel_partitions, _FUSED_SCHEMA,
                seed_shards=seed_refs, key_is_shard=True)
            if not edge_refs:
                return ray.data.from_arrow(_EDGE_SCHEMA.empty_table())
            return ray.data.from_arrow_refs(edge_refs)
        tables = [t for t in ray.get(group_refs) if t.num_rows] \
            if group_refs else []
        gt = pa.concat_tables(tables) if tables else \
            _CHUNK_SCHEMA.empty_table()
        # broadcast the (docset, chunk, doc_id) membership index (~24
        # B/row): membership rows ship WITHOUT text (seeded per shard,
        # tiny), and each doc's text ships AT MOST ONCE PER SHARD
        # (not once per membership — a doc in many docsets otherwise
        # replicates its text per docset, the same multi-GB fan-out
        # that collapsed the verify stage); the kernel joins them
        # locally by doc id.
        g_ds = gt.column("docset").to_numpy(zero_copy_only=False)
        g_ch = gt.column("chunk").to_numpy(zero_copy_only=False)
        g_id = gt.column("doc_id").to_numpy(zero_copy_only=False)
        g_pk = partition_ids(mix2(g_ds.view(np.uint64), g_ch.view(np.uint64)),
                             kernel_partitions)
        m = len(g_id)
        member_table = pa.table({
            "pkey": pa.array(g_pk, type=_I64),
            "kind": pa.array(np.zeros(m, dtype=np.int64), type=_I64),
            "docset": pa.array(g_ds, type=_I64),
            "chunk": pa.array(g_ch, type=_I64),
            "doc_id": pa.array(g_id, type=_I64),
            "text": pa.nulls(m, type=pa.string()),
        }, schema=_FUSED_SCHEMA)
        seed_shards = split_by_key(member_table, g_pk, kernel_partitions,
                                   key_is_shard=True)

        order = np.argsort(g_id, kind="stable")
        ref = ray.put({"md": g_id[order], "mpk": g_pk[order]})
        edge_refs = hash_exchange_refs(
            signatures.to_arrow_refs(),
            functools.partial(_melt_group_texts, ref=ref,
                              P=kernel_partitions),
            "pkey",
            functools.partial(_suffix_fused_kernel, min_len=min_len),
            kernel_partitions, _FUSED_SCHEMA,
            seed_shards=seed_shards, key_is_shard=True)
        if not edge_refs:
            return ray.data.from_arrow(_EDGE_SCHEMA.empty_table())
        return ray.data.from_arrow_refs(edge_refs)

    # membership too large to broadcast: hash-join texts to members,
    # then exchange on (docset, chunk) — still only member texts move
    groups = ray.data.from_arrow_refs(group_refs)
    docs = signatures.select_columns(["doc_id", "text"])
    with_text = exchange_join(groups, docs, on=["doc_id"],
                              num_partitions=num_partitions)

    def add_group_pkey(batch: pa.Table) -> pa.Table:
        """Hash-partition on (docset, chunk) — the sort-based
        groupby alternative would range-sample and sort the text-heavy
        rows themselves; hashing moves each row exactly once with no
        boundary sampling on a string-payload dataset."""
        dsk = batch.column("docset").to_numpy(zero_copy_only=False)
        ck = batch.column("chunk").to_numpy(zero_copy_only=False)
        pk = partition_ids(
            mix2(dsk.view(np.uint64), ck.view(np.uint64)), kernel_partitions)
        return batch.append_column("pkey", pa.array(pk, type=_I64))

    def suffix_partition(part: pa.Table) -> pa.Table:
        dsk = part.column("docset").to_numpy(zero_copy_only=False)
        ck = part.column("chunk").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        order, starts, ends = sort_groups((dsk, ck), order_by=(ids,))
        ids_sorted = ids[order]
        texts_py = [t.encode("utf-8") for t in
                    part.column("text").take(pa.array(order)).to_pylist()]
        a_out: list[int] = []
        b_out: list[int] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            gids = ids_sorted[s:e]
            chunk_texts = texts_py[s:e]
            for ia, ib in cross_doc_repeats(chunk_texts, min_len):
                x, y = int(gids[ia]), int(gids[ib])
                a_out.append(min(x, y))
                b_out.append(max(x, y))
        return pa.table({
            "a": pa.array(a_out, type=_I64),
            "b": pa.array(b_out, type=_I64),
        })

    # engine hash exchange on the precomputed pkey (key_is_shard) —
    # the sort-based groupby this replaces would range-sample and
    # globally sort the text-heavy rows, the exact shape
    # stages/exchange.py:5-11 documents as the scale bottleneck
    from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange
    fallback_schema = pa.schema([
        ("docset", _I64), ("chunk", _I64), ("doc_id", _I64),
        ("text", pa.string()), ("pkey", _I64)])
    return hash_exchange(with_text, add_group_pkey, "pkey",
                         suffix_partition, kernel_partitions,
                         fallback_schema, key_is_shard=True)
