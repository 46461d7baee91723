"""LSH candidate generation: band-key explode → hot-band detection →
salted groupby → candidate pairs.

The band-key groupby is the pipeline's dominant all-to-all shuffle
(SURVEY.md §7.4); skew is handled *explicitly* per the north rule:

1. a cheap pre-pass computes exact global band-group sizes with
   per-batch partial counts (combiner) before a small groupby-sum —
   the partial-aggregation pattern, so the count shuffle moves one row
   per distinct band key per batch, not one per document;
2. band keys over ``EngineConfig.band_salt_threshold`` are broadcast
   (`ray.put`) as the hot set, and the main explode assigns those rows
   a real salt column — the groupby key becomes ``(band_key, salt)``
   so a hot band's members land on ``band_salt_buckets`` different
   reducers;
3. bridge pairs between sub-group minima keep genuinely duplicate
   mega-bands connected (rule shared with the oracle via
   ``functions.pairs.band_group_candidates``).

The reference has no skew defense beyond radix partitioning
(join_hash.hpp:36, SURVEY.md §4.1) — this stage is where our engine
must do better, because Common-Crawl boilerplate creates mega-bands.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from hyrise_generalized_dedup_ray.config import EngineConfig
from hyrise_generalized_dedup_ray.functions.grouping import (
    partition_ids,
    sort_groups,
)
from hyrise_generalized_dedup_ray.functions.hashing import mix2
from hyrise_generalized_dedup_ray.functions.pairs import emit_group_pairs, salt_of


def explode_band_keys(signatures: Dataset) -> Dataset:
    """(doc_id, band_keys:list<i64>, num_shingles, …) → rows
    (band_key:i64, doc_id:i64).  Docs with zero shingles are excluded —
    their band keys are degenerate (see functions.minhash.band_keys)."""

    def explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.greater(batch["num_shingles"], 0))
        lists = batch.column("band_keys").combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        counts = np.diff(lists.offsets.to_numpy())
        ids = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), counts)
        return pa.table({
            # int64 bit-cast: group keys stay int64 so Ray's sort/shuffle
            # boundary sampling never sees uint64 extremes
            "band_key": pa.array(flat, type=pa.int64()),
            "doc_id": pa.array(ids, type=pa.int64()),
        })

    return signatures.select_columns(["doc_id", "band_keys", "num_shingles"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def hot_band_keys(exploded: Dataset, eng: EngineConfig) -> np.ndarray:
    """Exact global band-group sizes; returns keys with size > threshold.

    Partial count per batch (combiner) → groupby-sum over the partials.
    The hot set is tiny by construction (≤ total_rows / threshold keys).
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch.column("band_key").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({
            "band_key": pa.array(keys, type=pa.int64()),
            "partial": pa.array(counts, type=pa.int64()),
        })

    totals = (
        exploded.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("band_key")
        .aggregate(Sum("partial", alias_name="n"))
    )
    hot = totals.filter(expr=f"n > {eng.band_salt_threshold}")
    rows = hot.take_all()  # bounded: ≤ total_rows / threshold rows
    return np.array([r["band_key"] for r in rows], dtype=np.int64)


def candidate_pairs(
    signatures: Dataset,
    eng: EngineConfig,
    num_partitions: int = 64,
) -> tuple[Dataset, dict]:
    """Signatures → deduplicated candidate pair Dataset (a:i64, b:i64).

    Semantics are identical to the oracle's
    ``band_group_candidates`` applied per full band group; here the
    salt is a physical shuffle key and bridge pairs are assembled from
    per-sub-group minima on the driver (the marker set is ≤ hot_bands ×
    salt_buckets rows).
    """
    exploded = explode_band_keys(signatures)
    hot = hot_band_keys(exploded, eng)
    hot_ref = ray.put(set(int(k) for k in hot))
    metrics: dict = {"hot_bands": int(len(hot))}

    salt_buckets = eng.band_salt_buckets
    pair_cap = eng.max_pairs_per_band

    def add_salt(batch: pa.Table) -> pa.Table:
        # hot rows get salt 1..buckets (salt_of + 1); cold rows salt 0 —
        # so "salt > 0" unambiguously marks membership in a salted band
        # and every hot sub-group (including oracle-bucket 0) emits a
        # bridge marker below.  pkey hash-partitions (band_key, salt) so
        # the per-partition kernel sees whole groups (functions/grouping).
        hot_set = ray.get(hot_ref)
        keys = batch.column("band_key").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        salts = np.zeros(len(keys), dtype=np.int64)
        if hot_set:
            is_hot = np.fromiter((int(k) in hot_set for k in keys), bool, len(keys))
            if is_hot.any():
                salts[is_hot] = salt_of(ids[is_hot], salt_buckets) + 1
        pkey = partition_ids(
            mix2(keys.view(np.uint64), salts.view(np.uint64)), num_partitions)
        out = batch.append_column("salt", pa.array(salts, type=pa.int64()))
        return out.append_column("pkey", pa.array(pkey, type=pa.int64()))

    salted = exploded.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)

    def partition_pairs(part: pa.Table) -> pa.Table:
        """One call per hash partition; groups resolved with lexsort +
        boundary scan, Python loop only over multi-member / hot groups."""
        bk = part.column("band_key").to_numpy(zero_copy_only=False)
        st = part.column("salt").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        order, starts, ends = sort_groups((bk, st), order_by=(ids,))
        bk, st, ids = bk[order], st[order], ids[order]
        sizes = ends - starts
        need = np.flatnonzero((sizes >= 2) | (st[starts] > 0))
        a_out: list[int] = []
        b_out: list[int] = []
        k_out: list[int] = []
        s_out: list[int] = []
        for gi in need:
            s, e = starts[gi], ends[gi]
            uids = np.unique(ids[s:e])
            pairs, _ = emit_group_pairs(uids, pair_cap)
            salt = int(st[s])
            if salt > 0:  # marker row (b = -1) carries sub-group minimum
                pairs = pairs + [(int(uids[0]), -1)]
            a_out.extend(p[0] for p in pairs)
            b_out.extend(p[1] for p in pairs)
            k_out.extend([int(bk[s])] * len(pairs))
            s_out.extend([salt] * len(pairs))
        return pa.table({
            "a": pa.array(a_out, type=pa.int64()),
            "b": pa.array(b_out, type=pa.int64()),
            "band_key": pa.array(k_out, type=pa.int64()),
            "salt": pa.array(s_out, type=pa.int64()),
        })

    # materialize: `raw` is consumed twice (marker collection below and
    # the surviving-pairs stream) — without pinning, the whole
    # explode→salt→groupby pipeline would execute twice
    raw = salted.groupby("pkey").map_groups(
        partition_pairs, batch_format="pyarrow"
    ).materialize()

    # bridges: collect marker rows (tiny), link consecutive sub-group minima
    markers = raw.filter(expr="b == -1").take_all()
    by_band: dict[int, list[tuple[int, int]]] = {}
    for r in markers:
        by_band.setdefault(int(r["band_key"]), []).append((int(r["salt"]), int(r["a"])))
    bridge_pairs: set[tuple[int, int]] = set()
    for _, entries in by_band.items():
        entries.sort()
        minima = [m for _, m in entries]
        for x, y in zip(minima, minima[1:]):
            bridge_pairs.add((min(x, y), max(x, y)))
    metrics["bridge_pairs"] = len(bridge_pairs)

    pairs_ds = raw.filter(expr="b >= 0").select_columns(["a", "b"])
    if bridge_pairs:
        bp = sorted(bridge_pairs)
        pairs_ds = pairs_ds.union(ray.data.from_arrow(pa.table({
            "a": pa.array([p[0] for p in bp], type=pa.int64()),
            "b": pa.array([p[1] for p in bp], type=pa.int64()),
        })))
    return dedupe_pairs(pairs_ds, num_partitions), metrics


def dedupe_pairs(pairs: Dataset, num_partitions: int = 32) -> Dataset:
    """Drop duplicate (a,b) rows: ONE shuffle on a hash partition of the
    pair, fully vectorized unique inside each partition (equal pairs
    hash to the same partition by construction)."""

    def add_pkey(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).view(np.uint64)
        b = batch.column("b").to_numpy(zero_copy_only=False).view(np.uint64)
        pk = partition_ids(mix2(a, b), num_partitions)
        return batch.append_column("pkey", pa.array(pk, type=pa.int64()))

    def uniq_partition(part: pa.Table) -> pa.Table:
        a = part.column("a").to_numpy(zero_copy_only=False)
        b = part.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
            a, b = a[keep], b[keep]
        return pa.table({"a": pa.array(a, type=pa.int64()),
                         "b": pa.array(b, type=pa.int64())})

    return (
        pairs.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pkey")
        .map_groups(uniq_partition, batch_format="pyarrow")
        .select_columns(["a", "b"])
    )
