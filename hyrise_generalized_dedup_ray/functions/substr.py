"""Exact ≥L-byte shared-substring detection kernels.

Two pieces, shared verbatim by the distributed stage
(`stages/suffix.py`) and the sequential oracle:

1. **Winnowing fingerprints** (Schleimer/Wilkerson/Aiken, "Winnowing:
   Local Algorithms for Document Fingerprinting", SIGMOD 2003 — public
   algorithm): rolling-hash every k-byte gram, then keep the minimum
   hash of every w-gram window.  Guarantee: any verbatim match of
   length ≥ k + w - 1 bytes between two documents yields at least one
   *identical sampled fingerprint* in both.  With k=32, w=19 the
   guarantee length is 50 = ``SignatureConfig.min_substring_bytes``.
   Fingerprints are the partitioning key of the suffix-array stage, so
   co-location of substring-duplicates is content-driven — there is no
   "same url-hash bucket" recall boundary.

2. **Per-partition suffix array**: concatenate a partition's texts with
   \\x00 sentinels, build a suffix array (prefix-doubling, O(n log^2 n),
   fully vectorized argsort passes), compute adjacent-suffix LCPs via
   the rank tables (O(log n) vector ops total), clamp LCPs at sentinel
   boundaries, and emit cross-document adjacent pairs with LCP ≥ L.
   Chaining adjacent pairs connects every document interval that shares
   a run — exactly what downstream union-find needs.

This recasts the reference's LZ4 encoder idea — a zstd dictionary
*trained over all values of the segment* so blocks dedup common
substrings against it (lz4_encoder.hpp:40-59,98-105) — as an explicit
shared-substring discovery pass.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_GRAM_A = _U64(0x100000001B3)  # FNV-ish odd multiplier for byte-polynomial hash

SUBSTR_K = 32  # gram bytes
SUBSTR_W = 19  # winnowing window (guarantee = K + W - 1 = 50 bytes)


def gram_hashes(data: bytes, k: int = SUBSTR_K) -> np.ndarray:
    """uint64 polynomial rolling hash of every k-byte gram of ``data``.

    pre[i] = pre[i-1]*A + b[i];  H[i] = pre[i+k-1] - pre[i-1]*A^k
    (wraparound uint64 arithmetic), all vectorized.
    """
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    num = n - k + 1
    h = np.zeros(num, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):  # k is small (32): k in-place mul-add passes
            h *= _GRAM_A
            h += b[j : j + num]
    return h


def _sliding_min(h: np.ndarray, w: int) -> np.ndarray:
    """Minimum of each w-length window of h — O(n), two-pass block trick."""
    n = len(h)
    if n < w:
        return np.empty(0, dtype=h.dtype)
    pad = (-n) % w
    hp = np.concatenate([h, np.full(pad, np.iinfo(np.uint64).max, dtype=h.dtype)])
    blocks = hp.reshape(-1, w)
    pref = np.minimum.accumulate(blocks, axis=1).ravel()[:n]
    suff = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()[:n]
    out = np.minimum(suff[: n - w + 1], pref[w - 1 :])
    return out


def winnow_fingerprints(text: str, k: int = SUBSTR_K, w: int = SUBSTR_W) -> np.ndarray:
    """Sorted unique winnowed fingerprints (uint64) of ``text``.

    Any two texts sharing a verbatim run of ≥ k+w-1 bytes share at
    least one fingerprint (winnowing guarantee).
    """
    h = gram_hashes(text.encode("utf-8"), k)
    if len(h) < w:
        return np.unique(h)
    return np.unique(_sliding_min(h, w))


def batch_winnow_fingerprints(
    texts: list[str], k: int = SUBSTR_K, w: int = SUBSTR_W
) -> list[np.ndarray]:
    """Winnowed fingerprints for a WHOLE batch, bit-identical to
    ``[winnow_fingerprints(t) for t in texts]`` (which stays the
    oracle's reference form).

    The k in-place rolling-hash passes run ONCE over the concatenated
    byte buffer instead of once per document — per-doc gram hashes are
    exactly the in-document slices of the buffer's hash array, because
    a gram at offset i only reads bytes [i, i+k) and we only keep
    offsets whose gram lies inside one document.  Only the tiny
    per-doc sliding-min + unique remain in the Python loop."""
    datas = [t.encode("utf-8") for t in texts]
    lens = np.array([len(d) for d in datas], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    buf = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint64)
    n = len(buf)
    num = n - k + 1
    if num > 0:
        h = np.zeros(num, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h *= _GRAM_A
                h += buf[j : j + num]
    out: list[np.ndarray] = []
    empty = np.empty(0, dtype=np.uint64)
    for i in range(len(datas)):
        cnt = lens[i] - k + 1
        if cnt <= 0:
            out.append(empty)
            continue
        hh = h[offs[i] : offs[i] + cnt]
        out.append(np.unique(hh) if cnt < w else np.unique(_sliding_min(hh, w)))
    return out


# ---------------------------------------------------------------------------
# Per-partition suffix array


def suffix_array(s: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """Prefix-doubling suffix array of an int array ``s``.

    Returns ``(sa, rank_tables)`` where ``rank_tables[t]`` is the rank
    of each position under comparison of the first 2^t characters —
    kept so LCPs can later be computed in O(log n) vector ops.
    """
    n = len(s)
    rank = np.argsort(np.argsort(s, kind="stable"), kind="stable")
    # correct dense rank assignment:
    order = np.argsort(s, kind="stable")
    sorted_vals = s[order]
    new = np.zeros(n, dtype=np.int64)
    new[1:] = np.cumsum(sorted_vals[1:] != sorted_vals[:-1])
    rank = np.empty(n, dtype=np.int64)
    rank[order] = new
    tables = [rank.copy()]
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed = np.zeros(n, dtype=np.int64)
        changed[1:] = np.cumsum((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1]))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = changed
        tables.append(rank.copy())
        if rank[order[-1]] == n - 1:
            break
        k <<= 1
    sa = np.argsort(rank, kind="stable")
    return sa, tables


def adjacent_lcp(sa: np.ndarray, tables: list[np.ndarray], n: int) -> np.ndarray:
    """LCP of each adjacent suffix pair in SA order, via the rank tables.

    For each adjacent pair (i, j): greedily extend by the largest 2^t
    block whose ranks agree — O(log n) vectorized rounds over all pairs
    at once.
    """
    i = sa[:-1].copy()
    j = sa[1:].copy()
    lcp = np.zeros(len(i), dtype=np.int64)
    for t in range(len(tables) - 1, -1, -1):
        step = 1 << t
        rank_t = tables[t]
        ok = (i + step <= n) & (j + step <= n)
        # in-bounds compare of rank at current offsets
        ii = np.where(ok, i, 0)
        jj = np.where(ok, j, 0)
        match = ok & (rank_t[ii] == rank_t[jj])
        i = i + np.where(match, step, 0)
        j = j + np.where(match, step, 0)
        lcp += np.where(match, step, 0)
    return lcp


# groups within BOTH bounds use pairwise L-gram intersection instead of
# a suffix array.  SHARED SEMANTIC CONSTANTS (oracle runs the same
# kernel): inside the bounds the edge set is ALL qualifying pairs;
# outside, the suffix array emits adjacent-in-SA pairs (a
# connectivity-equivalent subset).  The byte budget keeps the pairwise
# path's g × total_bytes work under the suffix array's
# total_bytes × log² crossover: at ≤64 docs × ≤512 KiB the pairwise
# form measured ~10× faster (it never re-sorts the shared boilerplate
# template g times the way prefix doubling effectively does).
PAIRWISE_MAX_GROUP = 64
PAIRWISE_MAX_BYTES = 512 * 1024


def _small_group_repeats(
    texts: list[bytes], min_len: int
) -> list[tuple[int, int]] | None:
    """Exact ≥min_len shared-run pairs for a SMALL group without a
    suffix array: two docs share a run of length ≥ L iff they share an
    L-gram, tested by intersecting rolling-hash sets and byte-verifying
    one witness per pair.  Returns None when some pair's common hashes
    all fail byte-verification (a 64-bit collision) — the caller falls
    back to the suffix array for an exact answer.  This is the hot
    path: fingerprint docsets are overwhelmingly 2-10 documents, and
    the full prefix-doubling suffix array paid ~10-50× more per group."""
    uniqs: list[np.ndarray | None] = []
    firsts: list[np.ndarray | None] = []
    for t in texts:
        if len(t) < min_len:
            uniqs.append(None)
            firsts.append(None)
            continue
        u, i = np.unique(gram_hashes(t, min_len), return_index=True)
        uniqs.append(u)
        firsts.append(i)
    pairs: list[tuple[int, int]] = []
    for i in range(len(texts)):
        if uniqs[i] is None:
            continue
        for j in range(i + 1, len(texts)):
            if uniqs[j] is None:
                continue
            common, ci, cj = np.intersect1d(
                uniqs[i], uniqs[j], return_indices=True)
            if len(common) == 0:
                continue
            ti, tj = texts[i], texts[j]
            fi, fj = firsts[i], firsts[j]
            for p1, p2 in zip(fi[ci], fj[cj]):
                if ti[p1:p1 + min_len] == tj[p2:p2 + min_len]:
                    pairs.append((i, j))
                    break
            else:
                return None  # collisions only — ambiguous
    return pairs


def cross_doc_repeats(
    texts: list[bytes], min_len: int
) -> list[tuple[int, int]]:
    """Find cross-document verbatim repeats of length ≥ ``min_len``.

    Concatenates ``texts`` with \\x00 sentinels, builds the suffix
    array, clamps each adjacent LCP at the distance to the next
    sentinel (so matches never cross document boundaries), and returns
    the set of adjacent-in-SA-order document pairs (a, b), a < b, with
    clamped LCP ≥ min_len.  Pairs chain transitively inside union-find,
    so adjacent pairs are sufficient for connectivity of every interval
    of suffixes sharing a run.
    """
    if len(texts) < 2:
        return []
    if (len(texts) <= PAIRWISE_MAX_GROUP
            and sum(len(t) for t in texts) <= PAIRWISE_MAX_BYTES):
        # small groups: pairwise L-gram intersection.  For 2 docs this
        # is provably the suffix array's answer (adjacent cross-doc
        # LCP ≥ L ⟺ shared L-gram); for larger groups it emits ALL
        # qualifying pairs — a superset of the SA's adjacent pairs
        # with identical transitive connectivity, and identical in
        # both engines because the oracle runs this same kernel.
        fast = _small_group_repeats(texts, min_len)
        if fast is not None:
            return fast
    parts = []
    doc_of = []
    for d, t in enumerate(texts):
        parts.append(np.frombuffer(t, dtype=np.uint8).astype(np.int64) + 1)
        parts.append(np.zeros(1, dtype=np.int64))  # sentinel 0
        doc_of.append(np.full(len(t) + 1, d, dtype=np.int64))
    s = np.concatenate(parts)
    doc_of = np.concatenate(doc_of)
    n = len(s)
    # distance from each position to the next sentinel (inclusive scan right-to-left)
    dist = np.zeros(n, dtype=np.int64)
    sent = s == 0
    idx_next = np.where(sent, np.arange(n), n)
    idx_next = np.minimum.accumulate(idx_next[::-1])[::-1]
    dist = idx_next - np.arange(n)

    sa, tables = suffix_array(s)
    lcp = adjacent_lcp(sa, tables, n)
    clamp = np.minimum(dist[sa[:-1]], dist[sa[1:]])
    lcp = np.minimum(lcp, clamp)
    da = doc_of[sa[:-1]]
    db = doc_of[sa[1:]]
    hit = (lcp >= min_len) & (da != db)
    pairs = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(da[hit], db[hit])
    }
    return sorted(pairs)
