"""Sequential single-process reference implementation of the dedup
pipeline — the correctness oracle.

Plays the role the reference gives `JoinVerification`
(src/lib/operators/join_verification.hpp:12): a trusted, simple,
single-threaded implementation of the same semantics, used to validate
the distributed engine.  It shares the *kernels* (shingling, MinHash,
SimHash, winnowing, suffix array — `functions/`) and the *candidate
rules* (`functions/pairs.py`) with the distributed pipeline, and the
same ``SignatureConfig``; only the composition differs (in-process
dicts + union-find instead of Ray shuffles + star contraction).  The
north-rule recall target (dup-pair recall ≥ 0.99 at identical
shingle/signature config) is measured against this oracle's cluster
assignments.

Duplicate-edge definition (identical in both engines):
  1. exact:     identical text bytes
  2. near:      exact shingle-set Jaccard ≥ cfg.jaccard_threshold on
                LSH-band candidate pairs (5-gram shingles, 128-perm
                MinHash, b×r banding)
  3. substring: a shared verbatim byte run ≥ cfg.min_substring_bytes,
                surfaced by winnowing fingerprints and confirmed by a
                per-partition suffix array
Clusters = connected components; label = min(doc_id) of the component.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from hyrise_generalized_dedup_ray.config import (
    DEFAULT_ENGINE_CONFIG,
    DEFAULT_SIGNATURE_CONFIG,
    EngineConfig,
    SignatureConfig,
)
from hyrise_generalized_dedup_ray.functions.hashing import hash_strings
from hyrise_generalized_dedup_ray.functions.minhash import (
    band_keys,
    minhash_signatures,
    simhash_signatures,
)
from hyrise_generalized_dedup_ray.functions.pairs import (
    SUBSTR_MAX_GROUP,
    UnionFind,
    band_group_candidates,
    chunk_with_anchor,
    docset_key,
)
from hyrise_generalized_dedup_ray.functions.substr import (
    cross_doc_repeats,
    winnow_fingerprints,
)
from hyrise_generalized_dedup_ray.functions.text import (
    batch_shingles,
    jaccard_sorted,
    unique_shingle_sets,
)

@dataclass
class OracleResult:
    labels: dict[int, int]                 # doc_id -> cluster label (min id)
    edges_exact: set = field(default_factory=set)
    edges_jaccard: set = field(default_factory=set)
    edges_substr: set = field(default_factory=set)

    @property
    def dup_pairs(self) -> set:
        """All intra-cluster pairs implied by the final labels."""
        clusters = defaultdict(list)
        for d, c in self.labels.items():
            clusters[c].append(d)
        pairs = set()
        for members in clusters.values():
            members.sort()
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((members[i], members[j]))
        return pairs


def reference_dedup(
    doc_ids: list[int],
    texts: list[str],
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
) -> OracleResult:
    ids = np.asarray(doc_ids, dtype=np.int64)
    n = len(ids)
    assert n == len(texts)

    # --- signatures (shared kernels) -------------------------------------
    flat, offsets = batch_shingles(texts, cfg.shingle_n)
    sig = minhash_signatures(flat, offsets, cfg)
    simhash_signatures(flat, offsets, cfg)  # computed for parity; unused here
    bands = band_keys(sig, cfg)
    shingle_sets = unique_shingle_sets(flat, offsets)
    text_hashes = hash_strings(texts)

    # --- 1. exact duplicates: identical text bytes -----------------------
    edges_exact: set[tuple[int, int]] = set()
    by_hash: dict[int, dict[str, list[int]]] = defaultdict(lambda: defaultdict(list))
    for i in range(n):
        by_hash[int(text_hashes[i])][texts[i]].append(int(ids[i]))
    for groups in by_hash.values():
        for members in groups.values():
            members.sort()
            for m in members[1:]:
                edges_exact.add((members[0], m))

    # --- 2. LSH candidates → exact-Jaccard verification ------------------
    band_groups: dict[int, list[int]] = defaultdict(list)
    for i in range(n):
        if len(shingle_sets[i]) == 0:
            continue
        for b in range(cfg.bands):
            band_groups[int(bands[i, b])].append(i)
    candidates: set[tuple[int, int]] = set()
    for members in band_groups.values():
        if len(members) < 2:
            continue
        uniq = sorted(set(members))
        group_ids = np.asarray(sorted(int(ids[i]) for i in uniq))
        pairs, _salted, _trunc = band_group_candidates(
            group_ids, eng.band_salt_threshold, eng.band_salt_buckets,
            eng.max_pairs_per_band,
        )
        candidates.update(pairs)
    id_to_idx = {int(ids[i]): i for i in range(n)}
    edges_jaccard: set[tuple[int, int]] = set()
    for a, b in candidates:
        ja = jaccard_sorted(shingle_sets[id_to_idx[a]], shingle_sets[id_to_idx[b]])
        if ja >= cfg.jaccard_threshold:
            edges_jaccard.add((a, b))

    # --- 3. winnowing fingerprints → per-partition suffix array ----------
    fp_groups: dict[int, set[int]] = defaultdict(set)
    for i in range(n):
        for fp in winnow_fingerprints(texts[i]):
            fp_groups[int(fp)].add(int(ids[i]))
    # dedupe identical doc-sets (a shared run yields many identical groups)
    seen_sets: dict[int, np.ndarray] = {}
    for members in fp_groups.values():
        if len(members) < 2:
            continue
        arr = np.asarray(sorted(members), dtype=np.int64)
        seen_sets.setdefault(int(docset_key(arr)), arr)
    edges_substr: set[tuple[int, int]] = set()
    for arr in seen_sets.values():
        for chunk in chunk_with_anchor(arr, SUBSTR_MAX_GROUP):
            chunk_texts = [texts[id_to_idx[d]].encode("utf-8") for d in chunk]
            for a_idx, b_idx in cross_doc_repeats(chunk_texts, cfg.min_substring_bytes):
                a, b = chunk[a_idx], chunk[b_idx]
                edges_substr.add((min(a, b), max(a, b)))

    # --- union-find ------------------------------------------------------
    uf = UnionFind()
    for e in edges_exact | edges_jaccard | edges_substr:
        uf.union(*e)
    labels = uf.labels(int(i) for i in ids)
    return OracleResult(labels, edges_exact, edges_jaccard, edges_substr)
