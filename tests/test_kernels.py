"""Unit tests for the Ray-free kernels (functions/)."""

import numpy as np
import pytest

from hyrise_generalized_dedup_ray.config import SignatureConfig
from hyrise_generalized_dedup_ray.functions.hashing import hash_strings, mix2, splitmix64
from hyrise_generalized_dedup_ray.functions.minhash import (
    band_keys,
    minhash_signatures,
    simhash_signatures,
)
from hyrise_generalized_dedup_ray.functions.pairs import (
    UnionFind,
    band_group_candidates,
    chunk_with_anchor,
    emit_group_pairs,
)
from hyrise_generalized_dedup_ray.functions.substr import (
    _sliding_min,
    cross_doc_repeats,
    gram_hashes,
    winnow_fingerprints,
)
from hyrise_generalized_dedup_ray.functions.text import (
    batch_shingles,
    jaccard_sorted,
    shingle_hashes,
    tokenize_batch,
    unique_shingle_sets,
)

CFG = SignatureConfig()


def test_hash_strings_deterministic():
    a = hash_strings(["foo", "bar", "foo"])
    b = hash_strings(["foo", "bar", "foo"])
    assert np.array_equal(a, b)
    assert a[0] == a[2] and a[0] != a[1]
    assert a.dtype == np.uint64


def test_splitmix_mix2_shapes():
    x = np.arange(10, dtype=np.uint64)
    assert len(np.unique(splitmix64(x))) == 10
    assert len(np.unique(mix2(x, x[::-1].copy()))) == 10


def test_tokenize_csr_layout():
    flat, off = tokenize_batch(["a b c", "", "d e"])
    assert list(np.diff(off)) == [3, 0, 2]
    assert len(flat) == 5


def test_shingles_respect_doc_boundaries():
    # two docs, n=3: no shingle may span the boundary
    flat, off = tokenize_batch(["a b c d", "e f g"])
    sh, soff = shingle_hashes(flat, off, 3)
    assert list(np.diff(soff)) == [2, 1]
    # boundary-crossing trigram (c d | e) absent: recompute single-doc
    sh_one, _ = shingle_hashes(*tokenize_batch(["a b c d"]), 3)
    assert np.array_equal(sh[:2], sh_one)


def test_short_doc_has_zero_shingles():
    flat, off = batch_shingles(["one two", "one two three four five six"], 5)
    assert np.diff(off)[0] == 0 and np.diff(off)[1] == 2


def test_minhash_identical_and_disjoint():
    texts = ["w1 w2 w3 w4 w5 w6 w7 w8 " * 10,
             "w1 w2 w3 w4 w5 w6 w7 w8 " * 10,
             "x1 x2 x3 x4 x5 x6 x7 x8 " * 10]
    flat, off = batch_shingles(texts, CFG.shingle_n)
    sig = minhash_signatures(flat, off, CFG)
    assert np.array_equal(sig[0], sig[1])
    assert not np.array_equal(sig[0], sig[2])
    sim = simhash_signatures(flat, off, CFG)
    assert sim[0] == sim[1] != sim[2]
    bk = band_keys(sig, CFG)
    assert np.array_equal(bk[0], bk[1])
    assert not np.any(bk[0] == bk[2])


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(500)]
    base = [vocab[i] for i in rng.integers(0, 500, 400)]
    variant = list(base)
    for pos in rng.integers(0, 400, 20):  # 5% substitutions
        variant[pos] = vocab[int(rng.integers(0, 500))]
    texts = [" ".join(base), " ".join(variant)]
    flat, off = batch_shingles(texts, CFG.shingle_n)
    sets = unique_shingle_sets(flat, off)
    true_j = jaccard_sorted(sets[0], sets[1])
    sig = minhash_signatures(flat, off, CFG)
    est = float(np.mean(sig[0] == sig[1]))
    assert abs(est - true_j) < 0.15


def test_winnow_guarantee_50_bytes():
    shared = "sharedrunofbytesabcdefghijklmnopqrstuvwxyz0123456789"  # 52 bytes
    assert len(shared) >= 50
    t1 = "prefix one unrelated words " + shared + " tail aaa"
    t2 = "other doc totally different " + shared + " zzz ending"
    assert len(np.intersect1d(winnow_fingerprints(t1), winnow_fingerprints(t2))) > 0


def test_winnow_no_shared_fp_for_short_overlap():
    # shared run of only ~20 bytes: guarantee does not apply; usually no fp
    t1 = "aaaa bbbb cccc dddd shortsharedrun eeee ffff gggg hhhh iiii jjjj"
    t2 = "kkkk llll mmmm nnnn shortsharedrun oooo pppp qqqq rrrr ssss tttt"
    inter = np.intersect1d(winnow_fingerprints(t1), winnow_fingerprints(t2))
    assert len(inter) == 0


def test_sliding_min_brute():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 10**6, 257).astype(np.uint64)
    for w in (1, 2, 19, 64):
        got = _sliding_min(x, w)
        brute = np.array([x[i:i + w].min() for i in range(len(x) - w + 1)],
                         dtype=np.uint64)
        assert np.array_equal(got, brute)


def test_gram_hash_equal_windows():
    data = b"abcdefgh" * 10
    h = gram_hashes(data, 8)
    assert h[0] == h[8]
    assert h[0] != h[1]


def test_gram_hashes_csr_bit_identical_to_per_doc():
    from hyrise_generalized_dedup_ray.functions import substr as sub

    rng = np.random.default_rng(7)
    docs = [bytes(rng.integers(32, 127, size=n, dtype=np.uint8))
            for n in (0, 3, 49, 50, 51, 400, 5000, 1, 80)]
    flat = np.frombuffer(b"".join(docs), dtype=np.uint8)
    offs = np.concatenate(
        [[0], np.cumsum([len(d) for d in docs])]).astype(np.int64)
    # force several chunks to exercise the boundary-aligned splitting
    old = sub._GRAM_CHUNK_BYTES
    sub._GRAM_CHUNK_BYTES = 512
    try:
        H = sub.gram_hashes_csr(flat, offs, 50)
    finally:
        sub._GRAM_CHUNK_BYTES = old
    for i, d in enumerate(docs):
        cnt = max(0, len(d) - 50 + 1)
        got = H[offs[i]: offs[i] + cnt]
        np.testing.assert_array_equal(got, gram_hashes(d, 50))


def test_cross_doc_repeats_finds_and_clamps():
    shared = b"X" * 0 + b"the entire shared verbatim substring is long enough!!"
    assert len(shared) >= 50
    t1 = b"aaa " + shared + b" bbb"
    t2 = b"ccc " + shared + b" ddd"
    t3 = b"totally unrelated content with nothing shared at all, padding"
    assert cross_doc_repeats([t1, t2, t3], 50) == [(0, 1)]
    # below threshold: nothing
    assert cross_doc_repeats([t1, t2, t3], len(shared) + 10) == []


def test_cross_doc_repeats_no_cross_boundary_match():
    # identical *concatenation boundaries* must not fabricate matches
    a = b"A" * 30
    b = b"B" * 30
    assert cross_doc_repeats([a + b"|" + b, a + b"|" + b], 50) != []  # true dup
    assert cross_doc_repeats([a, b], 50) == []


def test_emit_group_pairs_cap_and_connectivity():
    ids = np.arange(10, dtype=np.int64)
    pairs, trunc = emit_group_pairs(ids, 100)
    assert not trunc and len(pairs) == 45
    pairs, trunc = emit_group_pairs(ids, 10)
    assert trunc
    # star+ring preserves connectivity
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    assert len({uf.find(i) for i in range(10)}) == 1


def test_band_group_candidates_salting_connectivity():
    ids = np.arange(1000, dtype=np.int64)
    pairs, salted, _ = band_group_candidates(ids, salt_threshold=256,
                                             salt_buckets=16, pair_cap=10_000)
    assert salted
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    assert len({uf.find(i) for i in range(1000)}) == 1


def test_chunk_with_anchor():
    ids = np.arange(100, dtype=np.int64)
    chunks = chunk_with_anchor(ids, 10)
    assert all(len(c) <= 10 for c in chunks)
    assert all(c[0] == 0 for c in chunks)
    covered = {x for c in chunks for x in c}
    assert covered == set(range(100))


def test_union_find_min_label():
    uf = UnionFind()
    uf.union(5, 3)
    uf.union(3, 9)
    uf.union(100, 200)
    labels = uf.labels([3, 5, 9, 100, 200, 7])
    assert labels[3] == labels[5] == labels[9] == 3
    assert labels[100] == labels[200] == 100
    assert labels[7] == 7


def test_chunks_kernel_matches_loop_reference():
    """Vectorized chunks_kernel ≡ the per-group chunk_with_anchor loop:
    same (docset, chunk, doc_id) multiset for a mix of singleton,
    small, exactly-cap and way-oversized groups."""
    import pyarrow as pa
    from hyrise_generalized_dedup_ray.functions.pairs import SUBSTR_MAX_GROUP
    from hyrise_generalized_dedup_ray.stages.suffix import chunks_kernel

    rng = np.random.default_rng(7)
    rows_set, rows_id = [], []
    group_sizes = [1, 2, 5, SUBSTR_MAX_GROUP, SUBSTR_MAX_GROUP + 1,
                   3 * SUBSTR_MAX_GROUP + 7, 500]
    for g, size in enumerate(group_sizes):
        ids = rng.choice(10_000, size=size, replace=False)
        # include duplicate membership rows: the kernel dedups them
        ids = np.concatenate([ids, ids[: size // 3]])
        rows_set.extend([g * 11 + 3] * len(ids))
        rows_id.extend(ids.tolist())
    part = pa.table({"docset": pa.array(rows_set, pa.int64()),
                     "doc_id": pa.array(rows_id, pa.int64())})
    out = chunks_kernel(part)

    expected = []
    for g, size in enumerate(group_sizes):
        key = g * 11 + 3
        mask = np.asarray(rows_set) == key
        uniq = np.unique(np.asarray(rows_id)[mask])
        for ci, chunk in enumerate(chunk_with_anchor(uniq,
                                                     SUBSTR_MAX_GROUP)):
            expected.extend((key, ci, int(d)) for d in chunk)
    got = list(zip(out.column("docset").to_pylist(),
                   out.column("chunk").to_pylist(),
                   out.column("doc_id").to_pylist()))
    assert sorted(got) == sorted(expected)
    # every chunk respects the cap
    import collections
    per_chunk = collections.Counter((s, c) for s, c, _ in got)
    assert max(per_chunk.values()) <= SUBSTR_MAX_GROUP


def test_chunks_kernel_empty():
    import pyarrow as pa
    from hyrise_generalized_dedup_ray.stages.suffix import chunks_kernel
    part = pa.table({"docset": pa.array([], pa.int64()),
                     "doc_id": pa.array([], pa.int64())})
    assert chunks_kernel(part).num_rows == 0


def test_jaccard_many_matches_scalar():
    """Grouped pair-Jaccard kernel is bit-identical to the per-pair
    scalar, including empty-set and repeated-pair edge cases."""
    from hyrise_generalized_dedup_ray.functions.text import jaccard_many

    rng = np.random.default_rng(11)
    sets = [np.unique(rng.integers(0, 40, size=rng.integers(0, 30),
                                   dtype=np.uint64).astype(np.uint64))
            for _ in range(12)]
    sets.append(np.empty(0, dtype=np.uint64))   # empty set edge
    k = len(sets)
    ia = rng.integers(0, k, size=200).astype(np.int64)
    ib = rng.integers(0, k, size=200).astype(np.int64)
    # force repeats (the dedupe branch) and a both-empty pair
    ia[:10] = ia[0]; ib[:10] = ib[0]
    ia[10] = k - 1; ib[10] = k - 1
    got = jaccard_many(sets, ia, ib)
    want = np.array([jaccard_sorted(sets[x], sets[y])
                     for x, y in zip(ia, ib)])
    assert got.shape == want.shape
    assert np.array_equal(got, want)   # bit-identical, not just close


def test_jaccard_many_empty_pairs():
    from hyrise_generalized_dedup_ray.functions.text import jaccard_many

    out = jaccard_many([], np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=np.int64))
    assert out.shape == (0,)


def test_verify_shingle_kernel_matches_text_kernel():
    """The signer-shingle verify kernel and the text-payload kernel
    produce identical edges on the same pair shard (the 2M-scale
    pipeline A/B, miniaturized)."""
    import pyarrow as pa

    from hyrise_generalized_dedup_ray.functions.text import (
        batch_shingles,
        unique_shingle_sets,
    )
    from hyrise_generalized_dedup_ray.stages.verify import (
        _verify_kernel,
        _verify_shingle_kernel,
    )

    texts = ["the quick brown fox jumps over the lazy dog again and again",
             "the quick brown fox jumps over the lazy dog again and again",
             "the quick brown fox leaps over the lazy dog again and again",
             "completely different content with no overlap whatsoever here",
             "the quick brown fox jumps over the lazy cat again and again"]
    ids = [10, 20, 30, 40, 50]
    pairs = [(10, 20), (10, 30), (10, 40), (20, 50), (30, 50), (40, 50)]
    flat, off = batch_shingles(texts, CFG.shingle_n)
    sets = unique_shingle_sets(flat, off)
    n_p, n_d = len(pairs), len(ids)
    soffs = np.zeros(n_d + 1, dtype=np.int32)
    np.cumsum([len(s) for s in sets], out=soffs[1:])
    sh_col = pa.ListArray.from_arrays(
        pa.array(soffs),
        pa.array(np.concatenate(sets).view(np.int64), type=pa.int64()))
    kind = [0] * n_p + [1] * n_d
    a = [p[0] for p in pairs] + [None] * n_d
    b = [p[1] for p in pairs] + [None] * n_d
    did = [None] * n_p + ids
    shingle_part = pa.table({
        "pkey": pa.array([0] * (n_p + n_d), type=pa.int64()),
        "kind": pa.array(kind, type=pa.int64()),
        "a": pa.array(a, type=pa.int64()),
        "b": pa.array(b, type=pa.int64()),
        "doc_id": pa.array(did, type=pa.int64()),
        "shingles": pa.concat_arrays(
            [pa.nulls(n_p, type=pa.list_(pa.int64())), sh_col]),
    })
    text_part = pa.table({
        "pkey": pa.array([0] * (n_p + n_d), type=pa.int64()),
        "kind": pa.array(kind, type=pa.int64()),
        "a": pa.array(a, type=pa.int64()),
        "b": pa.array(b, type=pa.int64()),
        "doc_id": pa.array(did, type=pa.int64()),
        "text": pa.array([None] * n_p + texts, type=pa.string()),
    })
    e1 = _verify_shingle_kernel(shingle_part, CFG)
    e2 = _verify_kernel(text_part, CFG, batch_size=3)
    p1 = sorted(zip(e1.column("a").to_pylist(), e1.column("b").to_pylist()))
    p2 = sorted(zip(e2.column("a").to_pylist(), e2.column("b").to_pylist()))
    assert p1 == p2 and len(p1) >= 1
