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
    batch_docset_keys,
    chunk_with_anchor,
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


def fingerprint_groups(signatures: Dataset, num_partitions: int = 32) -> Dataset:
    """→ rows (docset:u64, doc_id:i64), one row per member of each
    *distinct* multi-doc fingerprint group.

    Both grouping passes use the hash-partition + in-partition lexsort
    pattern (functions/grouping): winnowing yields ~text_len/10
    fingerprints per doc, so the naive groupby("fp").map_groups would
    make MILLIONS of per-group Python calls — the partition kernel makes
    ``num_partitions`` of them."""
    from hyrise_generalized_dedup_ray.functions.grouping import (
        partition_ids, sort_groups)

    def add_fp_pkey(batch: pa.Table) -> pa.Table:
        fp = batch.column("fp").to_numpy(zero_copy_only=False)
        pk = partition_ids(fp, num_partitions)
        return batch.append_column("pkey", pa.array(pk, type=pa.int64()))

    def members_partition(part: pa.Table) -> pa.Table:
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
        # multi-member fingerprint groups per partition — a per-group
        # docset_key() Python loop here was the substr branch's
        # dominant cost, ~15µs × 1M groups per partition)
        multi = sizes >= 2
        row_keep = np.repeat(multi, sizes) if len(sizes) else \
            np.empty(0, dtype=bool)
        ids_k = ids[row_keep]
        sizes_k = sizes[multi]
        if len(sizes_k) == 0:
            return pa.table({
                "docset": pa.array(np.empty(0, dtype=np.int64)),
                "doc_id": pa.array(np.empty(0, dtype=np.int64)),
            })
        gstarts = np.concatenate([[0], np.cumsum(sizes_k)[:-1]])
        keys = batch_docset_keys(ids_k, gstarts, sizes_k)
        return pa.table({
            "docset": pa.array(np.repeat(keys.view(np.int64), sizes_k),
                               type=pa.int64()),
            "doc_id": pa.array(ids_k, type=pa.int64()),
        })

    def add_ds_pkey(batch: pa.Table) -> pa.Table:
        dsk = batch.column("docset").to_numpy(zero_copy_only=False)
        pk = partition_ids(dsk, num_partitions)
        return batch.append_column("pkey", pa.array(pk, type=pa.int64()))

    def uniq_partition(part: pa.Table) -> pa.Table:
        # identical doc sets share the docset key → unique (docset, doc);
        # then pre-assign suffix-array chunks (chunk_with_anchor) so each
        # ≤64-doc chunk becomes its OWN downstream group — a 3000-doc
        # boilerplate docset runs as ~47 parallel tasks, not one.
        dsk = part.column("docset").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dsk))
        dsk, ids = dsk[order], ids[order]
        if len(dsk):
            keep = np.concatenate(
                [[True], (dsk[1:] != dsk[:-1]) | (ids[1:] != ids[:-1])])
            dsk, ids = dsk[keep], ids[keep]
        out_set: list[int] = []
        out_chunk: list[int] = []
        out_id: list[int] = []
        if len(dsk):
            idx = np.flatnonzero(dsk[1:] != dsk[:-1]) + 1
            starts = np.concatenate([[0], idx])
            ends = np.concatenate([idx, [len(dsk)]])
            for s, e in zip(starts, ends):
                key = int(dsk[s])
                for ci, chunk in enumerate(
                        chunk_with_anchor(ids[s:e], SUBSTR_MAX_GROUP)):
                    out_set.extend([key] * len(chunk))
                    out_chunk.extend([ci] * len(chunk))
                    out_id.extend(chunk)
        return pa.table({
            "docset": pa.array(out_set, type=pa.int64()),
            "chunk": pa.array(out_chunk, type=pa.int64()),
            "doc_id": pa.array(out_id, type=pa.int64()),
        })

    exploded = explode_fingerprints(signatures)
    grouped = (
        exploded.map_batches(add_fp_pkey, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("pkey").map_groups(members_partition, batch_format="pyarrow")
    )
    return (
        grouped.map_batches(add_ds_pkey, batch_format="pyarrow",
                            zero_copy_batch=True)
        .groupby("pkey").map_groups(uniq_partition, batch_format="pyarrow")
    )


# membership tables up to this many rows (~24 B/row) broadcast the
# doc→(docset, chunk) index instead of hash-joining texts — the same
# size-guarded strategy selection as stages/verify.attach_texts.
BROADCAST_GROUPS_MAX = 2_000_000


def substring_edges(
    signatures: Dataset,
    cfg: SignatureConfig,
    num_partitions: int = 32,
) -> Dataset:
    """Signer output → exact ≥L-byte shared-substring edges (a,b)."""
    from hyrise_generalized_dedup_ray.util import heal_blocks

    # groups come out of two groupbys → heal zero-column empty blocks
    # before the join (util.heal_blocks)
    import ray

    from hyrise_generalized_dedup_ray.functions.grouping import (
        partition_ids, sort_groups)
    from hyrise_generalized_dedup_ray.functions.hashing import mix2

    # the suffix/pairwise kernels are the branch's heaviest compute and
    # group costs are skewed (one boilerplate docset vs thousands of
    # pairs) — partition the KERNEL stage much wider than the join so
    # stragglers can't hold a whole partition's worth of groups
    kernel_partitions = max(4 * num_partitions,
                            2 * int(ray.cluster_resources().get("CPU", 8)))

    # the fingerprint grouping is kernel-bound, not shuffle-bound
    # (measured: 29M exploded rows shuffle in ~3-5s at any width, the
    # members kernel dominates) — so its width follows the CLUSTER, not
    # the join fan-out cap, keeping every core busy at 4× cluster sizes
    grp_partitions = max(num_partitions,
                         2 * int(ray.cluster_resources().get("CPU", 8)))
    # materialize: the count below AND the broadcast/join consumer both
    # read `groups` — without pinning, the two fingerprint shuffles
    # would execute twice
    groups = fingerprint_groups(signatures, grp_partitions).materialize()
    docs = signatures.select_columns(["doc_id", "text"])
    min_len = cfg.min_substring_bytes

    def suffix_partition(part: pa.Table) -> pa.Table:
        """All (docset, chunk) suffix-array groups of one hash
        partition; each group is a pre-assigned ≤SUBSTR_MAX_GROUP-doc
        chunk (fingerprint_groups)."""
        dsk = part.column("docset").to_numpy(zero_copy_only=False)
        ck = part.column("chunk").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        order, starts, ends = sort_groups((dsk, ck), order_by=(ids,))
        ids_sorted = ids[order]
        texts = part.column("text").take(pa.array(order))
        a_out: list[int] = []
        b_out: list[int] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            gids = ids_sorted[s:e]
            chunk_texts = [texts[j].as_py().encode("utf-8")
                           for j in range(s, e)]
            for ia, ib in cross_doc_repeats(chunk_texts, min_len):
                x, y = int(gids[ia]), int(gids[ib])
                a_out.append(min(x, y))
                b_out.append(max(x, y))
        return pa.table({
            "a": pa.array(a_out, type=pa.int64()),
            "b": pa.array(b_out, type=pa.int64()),
        })


    n_member_rows = groups.count()
    if n_member_rows <= BROADCAST_GROUPS_MAX:
        # broadcast the (docset, chunk, doc_id) membership index (~24
        # B/row): membership rows ship WITHOUT text (built driver-side,
        # tiny), and each doc's text ships AT MOST ONCE PER PARTITION
        # (not once per membership — a doc in many docsets otherwise
        # replicates its text per docset, the same multi-GB fan-out
        # that collapsed the verify stage); the kernel joins them
        # locally by doc id.
        tables = [t for t in ray.get(groups.to_arrow_refs())
                  if t.num_columns > 0]
        gt = pa.concat_tables(tables) if tables else pa.table(
            {"docset": pa.array([], type=pa.int64()),
             "chunk": pa.array([], type=pa.int64()),
             "doc_id": pa.array([], type=pa.int64())})
        g_ds = gt.column("docset").to_numpy(zero_copy_only=False)
        g_ch = gt.column("chunk").to_numpy(zero_copy_only=False)
        g_id = gt.column("doc_id").to_numpy(zero_copy_only=False)
        g_pk = partition_ids(mix2(g_ds.view(np.uint64), g_ch.view(np.uint64)),
                             kernel_partitions)
        m = len(g_id)
        i64, s_ = pa.int64(), pa.string()
        schema = pa.schema([("pkey", i64), ("kind", i64), ("docset", i64),
                            ("chunk", i64), ("doc_id", i64), ("text", s_)])
        member_rows = ray.data.from_arrow(pa.table({
            "pkey": pa.array(g_pk, type=i64),
            "kind": pa.array(np.zeros(m, dtype=np.int64), type=i64),
            "docset": pa.array(g_ds, type=i64),
            "chunk": pa.array(g_ch, type=i64),
            "doc_id": pa.array(g_id, type=i64),
            "text": pa.nulls(m, type=s_),
        }, schema=schema))

        order = np.argsort(g_id, kind="stable")
        ref = ray.put({"md": g_id[order], "mpk": g_pk[order]})
        P = kernel_partitions

        def melt_texts(batch: pa.Table) -> pa.Table:
            st = ray.get(ref)
            md, mpk = st["md"], st["mpk"]
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
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
                "pkey": pa.array(pks, type=i64),
                "kind": pa.array(np.ones(k, dtype=np.int64), type=i64),
                "docset": pa.nulls(k, type=i64),
                "chunk": pa.nulls(k, type=i64),
                "doc_id": pa.array(ids[doc_rows], type=i64),
                "text": batch.column("text").take(pa.array(doc_rows)),
            }, schema=schema)

        text_rows = docs.map_batches(melt_texts, batch_format="pyarrow",
                                     zero_copy_batch=True)

        def fused_partition(part: pa.Table) -> pa.Table:
            kind = part.column("kind").to_numpy(zero_copy_only=False)
            mem_idx = np.flatnonzero(kind == 0)
            doc_idx = np.flatnonzero(kind == 1)
            if len(mem_idx) == 0 or len(doc_idx) == 0:
                return pa.table({"a": pa.array([], type=i64),
                                 "b": pa.array([], type=i64)})
            dids = part.column("doc_id").to_numpy(
                zero_copy_only=False)[doc_idx].astype(np.int64)
            dorder = np.argsort(dids, kind="stable")
            dids_sorted = dids[dorder]
            texts = part.column("text").take(pa.array(doc_idx[dorder]))
            dsk = part.column("docset").to_numpy(
                zero_copy_only=False)[mem_idx].astype(np.int64)
            ck = part.column("chunk").to_numpy(
                zero_copy_only=False)[mem_idx].astype(np.int64)
            ids = part.column("doc_id").to_numpy(
                zero_copy_only=False)[mem_idx].astype(np.int64)
            order3, starts, ends = sort_groups((dsk, ck), order_by=(ids,))
            ids_sorted = ids[order3]
            a_out: list[int] = []
            b_out: list[int] = []
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                gids = ids_sorted[s:e]
                pos = np.searchsorted(dids_sorted, gids)
                pos_c = np.minimum(pos, len(dids_sorted) - 1)
                ok = dids_sorted[pos_c] == gids
                if not ok.all():
                    gids = gids[ok]
                    pos_c = pos_c[ok]
                    if len(gids) < 2:
                        continue
                chunk_texts = [texts[int(p)].as_py().encode("utf-8")
                               for p in pos_c]
                for ia, ib in cross_doc_repeats(chunk_texts, min_len):
                    x, y = int(gids[ia]), int(gids[ib])
                    a_out.append(min(x, y))
                    b_out.append(max(x, y))
            return pa.table({
                "a": pa.array(a_out, type=pa.int64()),
                "b": pa.array(b_out, type=pa.int64()),
            })

        return (
            member_rows.union(text_rows)
            .groupby("pkey")
            .map_groups(fused_partition, batch_format="pyarrow")
        )

    groups = heal_blocks(groups, max(2, num_partitions // 4))
    with_text = groups.join(
        docs, join_type="inner", num_partitions=num_partitions,
        on=("doc_id",),
    )

    def add_group_pkey(batch: pa.Table) -> pa.Table:
        """Hash-partition on (docset, chunk) — the sort-based
        groupby alternative would range-sample and sort the text-heavy
        rows themselves; hashing moves each row exactly once with no
        boundary sampling on a string-payload dataset."""
        dsk = batch.column("docset").to_numpy(zero_copy_only=False)
        ck = batch.column("chunk").to_numpy(zero_copy_only=False)
        pk = partition_ids(
            mix2(dsk.view(np.uint64), ck.view(np.uint64)), kernel_partitions)
        return batch.append_column("pkey", pa.array(pk, type=pa.int64()))

    return (
        with_text.map_batches(add_group_pkey, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("pkey")
        .map_groups(suffix_partition, batch_format="pyarrow")
    )
