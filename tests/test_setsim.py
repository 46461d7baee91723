"""Prefix-filter exact set-similarity join (stages/setsim.py): the
result must equal brute-force all-pairs word-n-gram Jaccard — the
prefix filter is a candidate PRUNE, never a recall loss."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from hyrise_generalized_dedup_ray.functions.text import (batch_shingles,
                                                         jaccard_sorted)
from hyrise_generalized_dedup_ray.stages.setsim import exact_jaccard_join


def _brute_force(texts, n, tau):
    flat, off = batch_shingles(texts, n)
    sets = [np.unique(flat[off[i]:off[i + 1]]) for i in range(len(texts))]
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if jaccard_sorted(sets[i], sets[j]) >= tau:
                out.add((i, j))
    return out


def _mk_texts(rng):
    words = [f"w{k}" for k in range(50)]
    texts = []
    for _ in range(40):
        texts.append(" ".join(rng.choice(words, size=30)))
    # planted near-dups: copy with small perturbations
    for i in range(0, 12, 2):
        toks = texts[i].split()
        toks[rng.integers(len(toks))] = "ZZZ"
        texts.append(" ".join(toks))
    # an exact duplicate and a short doc (2 tokens → no 3-grams)
    texts.append(texts[1])
    texts.append("just two")
    return texts


def test_exact_jaccard_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    texts = _mk_texts(rng)
    tau, n = 0.5, 3
    truth = _brute_force(texts, n, tau)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": texts})).repartition(4)
    out = exact_jaccard_join(docs, n=n, tau=tau,
                             num_partitions=5).to_pandas()
    got = set(zip(out["a"].tolist(), out["b"].tolist()))
    assert got == truth and len(truth) >= 7  # the planted pairs exist


def test_exact_jaccard_threshold_boundary(ray_session):
    # two docs sharing exactly 3 of 6 distinct grams: J = 3/9 = 1/3
    a = "a b c d e f g h"          # grams: 6
    b = "a b c d e X Y Z"          # shares a-b-c, b-c-d, c-d-e → 3
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": [a, b]}))
    hit = exact_jaccard_join(docs, n=3, tau=1 / 3, num_partitions=2)
    assert hit.count() == 1  # J == τ is included (>=)
    miss = exact_jaccard_join(docs, n=3, tau=0.34, num_partitions=2)
    assert miss.count() == 0
