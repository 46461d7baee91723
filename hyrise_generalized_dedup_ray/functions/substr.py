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


# A is odd ⇒ invertible mod 2^64: the prefix-polynomial form below
# needs A^-1 to rebase each byte's contribution to position 0
_GRAM_A_INV = _U64(pow(int(_GRAM_A), -1, 1 << 64))

# cached power tables (grow-on-demand): [0][i] = A^i, [1][i] = A^-i.
# Kept as ONE tuple global so a concurrent reader (driver branch
# threads share this module) can never observe a grown _POW paired
# with a stale shorter _POWINV.
_POWERS: tuple[np.ndarray, np.ndarray] = (
    np.ones(1, dtype=np.uint64), np.ones(1, dtype=np.uint64))


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    global _POWERS
    pw = _POWERS
    if len(pw[0]) < n:
        m = max(n, 2 * len(pw[0]))
        with np.errstate(over="ignore"):
            p = np.empty(m, dtype=np.uint64)
            p[0] = 1
            np.cumprod(np.full(m - 1, _GRAM_A, dtype=np.uint64), out=p[1:])
            q = np.empty(m, dtype=np.uint64)
            q[0] = 1
            np.cumprod(np.full(m - 1, _GRAM_A_INV, dtype=np.uint64),
                       out=q[1:])
        pw = (p, q)
        _POWERS = pw
    return pw


def _gram_hashes_raw(b: np.ndarray, k: int) -> np.ndarray:
    """:func:`_gram_hashes_from_u64` WITHOUT the errstate guard — for
    hot per-document callers that hoist ONE ``np.errstate(over=
    "ignore")`` around their whole loop (the context manager costs
    ~14 µs/call, which dominated the suffix kernel at 200k+ calls per
    shard sweep)."""
    n = len(b)
    num = n - k + 1
    if num <= 0:
        return np.empty(0, dtype=np.uint64)
    powa, powi = _powers(n + 1)
    s = np.cumsum(b * powi[:n], dtype=np.uint64)
    pre = s * powa[:n]
    h = pre[k - 1:].copy()
    ak = powa[k]
    h[1:] -= pre[:num - 1] * ak
    return h


def _gram_hashes_from_u64(b: np.ndarray, k: int) -> np.ndarray:
    """Shared core of :func:`gram_hashes`/:func:`batch_winnow_fingerprints`:
    H[i] = Σ_{j<k} b[i+j]·A^(k-1-j), every window at once via the
    prefix-polynomial identity  pre[i] = A^i · Σ_{j≤i} b[j]·A^-j  and
    H[i] = pre[i+k-1] − pre[i-1]·A^k  — O(n) in ~4 vector passes
    (wraparound uint64 arithmetic is exact mod 2^64; A odd ⇒ A^-j
    exists), bit-identical to the k-pass mul-add loop it replaced."""
    with np.errstate(over="ignore"):
        return _gram_hashes_raw(b, k)


def gram_hashes(data: bytes, k: int = SUBSTR_K) -> np.ndarray:
    """uint64 polynomial rolling hash of every k-byte gram of ``data``.

    pre[i] = pre[i-1]*A + b[i];  H[i] = pre[i+k-1] - pre[i-1]*A^k
    (wraparound uint64 arithmetic), all vectorized.
    """
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    return _gram_hashes_from_u64(b, k)


# chunk budget for gram_hashes_csr: power tables grow to the largest
# single hashing pass ever seen (module-global cache), so bounding the
# pass bounds their memory — 2 MiB ⇒ ≤32 MiB of cached tables/worker.
_GRAM_CHUNK_BYTES = 2 * 1024 * 1024


def gram_hashes_csr(flat: np.ndarray, offs: np.ndarray,
                    k: int) -> np.ndarray:
    """Gram hashes of EVERY document of a CSR batch in one call:
    returns ``H`` with ``len(flat)`` slots where doc ``i``'s k-gram
    hashes are ``H[offs[i] : offs[i] + max(0, len_i - k + 1)]`` —
    bit-identical to per-doc :func:`gram_hashes` (a gram at offset p
    reads bytes [p, p+k) only, and the valid slices never cross a
    document boundary).  Slots past a doc's last gram are undefined.

    Chunked at document boundaries (~2 MiB) so the cached power tables
    stay small however large the batch."""
    n = len(flat)
    H = np.empty(n, dtype=np.uint64)
    if n < k:
        return H
    ndocs = len(offs) - 1
    lo = 0
    while lo < ndocs:
        hi = int(np.searchsorted(
            offs, offs[lo] + _GRAM_CHUNK_BYTES, side="right")) - 1
        hi = min(max(hi, lo + 1), ndocs)
        o0, o1 = int(offs[lo]), int(offs[hi])
        if o1 - o0 >= k:
            h = _gram_hashes_from_u64(flat[o0:o1].astype(np.uint64), k)
            H[o0:o0 + len(h)] = h
        lo = hi
    return H


def text_hashes_csr(flat: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-document u64 polynomial hash of CSR utf-8 bytes, splitmix-
    finalized — a process-stable identity for cache keys / routing,
    computed in one vectorized pass per ~2 MiB chunk with NO Python
    string materialization.  h(doc) = Σ b[j]·A^(L-1-j) mod 2^64 via
    the same prefix identity as :func:`_gram_hashes_raw` (the doc is
    one variable-length "gram")."""
    from hyrise_generalized_dedup_ray.functions.hashing import splitmix64

    ndocs = len(offs) - 1
    out = np.zeros(ndocs, dtype=np.uint64)
    if ndocs == 0 or len(flat) == 0:
        return splitmix64(out)
    lo = 0
    with np.errstate(over="ignore"):
        while lo < ndocs:
            hi = int(np.searchsorted(
                offs, offs[lo] + _GRAM_CHUNK_BYTES, side="right")) - 1
            hi = min(max(hi, lo + 1), ndocs)
            o0 = int(offs[lo])
            b = flat[o0:int(offs[hi])].astype(np.uint64)
            m = len(b)
            if m == 0:
                lo = hi
                continue
            powa, powi = _powers(m + 1)
            S = np.cumsum(b * powi[:m], dtype=np.uint64)
            e = (offs[lo:hi + 1] - o0).astype(np.int64)
            st, en = e[:-1], e[1:]
            Se = S[np.maximum(en - 1, 0)]
            Sp = np.where(st > 0, S[np.maximum(st - 1, 0)], _U64(0))
            h = (Se - Sp) * powa[np.maximum(en - 1, 0)]
            out[lo:hi] = np.where(en > st, h, _U64(0))
            lo = hi
    return splitmix64(out)


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
    flat = np.frombuffer(b"".join(datas), dtype=np.uint8)
    return winnow_fingerprints_csr(flat, offs, k, w)


def winnow_fingerprints_csr(
    flat: np.ndarray, offs: np.ndarray, k: int = SUBSTR_K,
    w: int = SUBSTR_W,
) -> list[np.ndarray]:
    """CSR core of :func:`batch_winnow_fingerprints` — feed it Arrow
    string buffers directly (functions/text.utf8_csr) to skip the
    encode + join copies entirely."""
    buf = flat.astype(np.uint64)
    ndocs = len(offs) - 1
    lens = np.diff(offs)
    n = len(buf)
    num = n - k + 1
    S = None
    if num > 0:
        h = _gram_hashes_from_u64(buf, k)
        if len(h) >= w:
            # ONE global two-pass sliding min: a window starting
            # inside doc i's valid gram slots [offs[i], offs[i]+cnt)
            # reads only those slots (p + w <= offs[i] + cnt), so the
            # per-doc output is exactly S[offs[i] : offs[i]+cnt-w+1] —
            # bit-identical to per-doc _sliding_min, without ~8 numpy
            # calls per document (the signer's hottest per-doc loop)
            S = _sliding_min(h, w)
    out: list[np.ndarray] = []
    empty = np.empty(0, dtype=np.uint64)
    for i in range(ndocs):
        cnt = lens[i] - k + 1
        if cnt <= 0:
            out.append(empty)
            continue
        if cnt < w or S is None:
            out.append(np.unique(h[offs[i] : offs[i] + cnt]))
        else:
            out.append(np.unique(S[offs[i] : offs[i] + cnt - w + 1]))
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


def doc_grams(t: bytes, min_len: int) -> tuple[np.ndarray, np.ndarray] | None:
    """(sorted unique min_len-gram hashes, first offset of each) of one
    doc — the per-doc build side of :func:`_small_group_repeats`,
    exposed so callers processing many overlapping groups (a doc sits
    in every docset chunk it fingerprint-matches) can compute each
    doc's set ONCE and pass it to every group."""
    if len(t) < min_len:
        return None
    u, i = np.unique(gram_hashes(t, min_len), return_index=True)
    return u, i


def _small_group_repeats(
    texts: list[bytes], min_len: int,
    grams: list[tuple[np.ndarray, np.ndarray] | None] | None = None,
) -> list[tuple[int, int]] | None:
    """Exact ≥min_len shared-run pairs for a SMALL group without a
    suffix array: two docs share a run of length ≥ L iff they share an
    L-gram, tested by intersecting rolling-hash sets and byte-verifying
    one witness per pair.  Returns None when some pair's common hashes
    all fail byte-verification (a 64-bit collision) — the caller falls
    back to the suffix array for an exact answer.  This is the hot
    path: fingerprint docsets are overwhelmingly 2-10 documents, and
    the full prefix-doubling suffix array paid ~10-50× more per group.

    ``grams``: optional precomputed :func:`doc_grams` per text (same
    order) — identical results, skips the per-group rebuild."""
    if grams is None:
        grams = [doc_grams(t, min_len) for t in texts]
    pairs: list[tuple[int, int]] = []
    for i in range(len(texts)):
        if grams[i] is None:
            continue
        ui, fi = grams[i]
        for j in range(i + 1, len(texts)):
            if grams[j] is None:
                continue
            uj, fj = grams[j]
            # sorted-set intersection via searchsorted (both sides are
            # np.unique outputs): no concat+re-sort per pair the way
            # np.intersect1d pays
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
                continue
            ti, tj = texts[i], texts[j]
            for p1, p2 in zip(fi[ci], fj[cj]):
                if ti[p1:p1 + min_len] == tj[p2:p2 + min_len]:
                    pairs.append((i, j))
                    break
            else:
                return None  # collisions only — ambiguous
    return pairs


def cross_doc_repeats(
    texts: list[bytes], min_len: int,
    grams: list[tuple[np.ndarray, np.ndarray] | None] | None = None,
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
        fast = _small_group_repeats(texts, min_len, grams=grams)
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
