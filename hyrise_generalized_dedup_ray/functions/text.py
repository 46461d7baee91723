"""Tokenization and shingle hashing — the "fingerprint of the base" step.

In the reference's generalized-dedup framing, a record is split into a
*base* (deduplicated via a fingerprint lookup table — the dictionary
encoder, dictionary_encoder.hpp:61-66) and a *deviation*.  Here the
analog of the fingerprint table entry is the set of hashed token
n-gram shingles of a document; the LSH band keys derived from them
(functions/minhash.py) are the lookup keys, and the exact-Jaccard
verification is the deviation check.

All functions operate on a whole batch of documents at once and return
flat arrays plus per-document offsets (CSR layout), ready for
`np.minimum.reduceat`-style segmented reductions.
"""

from __future__ import annotations

import numpy as np

from hyrise_generalized_dedup_ray.functions.hashing import splitmix64

_U64 = np.uint64
# odd multiplier for the degree-(n-1) polynomial combine of token hashes
_SHINGLE_A = _U64(0x9E3779B97F4A7C15)


# ASCII-whitespace lookup table for the byte-level tokenizer
_WS_LUT = np.zeros(256, dtype=bool)
_WS_LUT[[0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20]] = True
_WS_LUT_NEG = ~_WS_LUT
# modular inverse of _SHINGLE_A mod 2**64 (A is odd → invertible):
# lets the per-token polynomial hash be computed from two prefix scans
# instead of a Python loop over tokens.
_SHINGLE_A_INV = _U64(pow(int(_SHINGLE_A), -1, 1 << 64))


# byte budget per vectorized tokenizer chunk: the kernel's uint64
# prefix-scan scratch is ~45× the chunk's byte length, so the chunk
# must stay SMALL — this sandbox faults fresh anonymous pages at only
# ~5-20 MB/s, making scratch first-touch (per worker process) the
# dominant cost of any large-chunk variant (measured: an 8 MiB chunk
# ⇒ ~570 MB scratch ⇒ ~30 s one-time per worker).  256 KiB ⇒ ~12 MB
# scratch (sub-second warmup, L2/L3-resident steady state); the
# per-chunk Python dispatch (~30 numpy calls) is noise at this size.
_TOKENIZE_CHUNK_BYTES = 256 << 10


def tokenize_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a batch of strings.

    Returns ``(flat_token_hashes, doc_offsets)`` where ``doc_offsets``
    has length ``len(texts)+1`` and doc i's token hashes are
    ``flat[offsets[i]:offsets[i+1]]`` (CSR).

    Fully vectorized over the concatenated utf-8 bytes: tokens are
    maximal runs of non-ASCII-whitespace bytes, and each token's hash
    is a degree-(L-1) polynomial of its bytes extracted from two prefix
    scans (cumprod of powers + cumsum of weighted bytes, exact mod
    2^64), finished with splitmix64 so the token hashes carry no
    residual polynomial structure into the shingle combine.  The
    earlier implementation built a Python list of every token string
    and SipHashed the object array — ~2 µs/token, the measured
    bottleneck of both the signature and verify stages.  Large batches
    are processed in ≤``_TOKENIZE_CHUNK_BYTES`` chunks split at
    document boundaries (hashes are per-token, so chunking is exact).
    """
    flat, offs = _encode_csr(texts)
    return tokenize_csr(flat, offs)


def _encode_csr(texts) -> tuple[np.ndarray, np.ndarray]:
    """Python strings → (flat utf-8 uint8, int64 CSR doc offsets)."""
    ndocs = len(texts)
    offsets = np.zeros(ndocs + 1, dtype=np.int64)
    if ndocs == 0:
        return np.empty(0, dtype=np.uint8), offsets
    bufs = [t.encode("utf-8") if t else b"" for t in texts]
    np.cumsum(np.fromiter((len(b) for b in bufs), dtype=np.int64,
                          count=ndocs), out=offsets[1:])
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return flat, offsets


def utf8_csr(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column → (flat utf-8 uint8, int64 CSR offsets),
    zero-copy straight from the array's offsets/data buffers — no
    Python string objects, no re-encode (the lines.py:50-61 pattern
    promoted to the shared tokenizer entry point).  Nulls read as
    empty documents."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    off_dt = (np.int64 if pa.types.is_large_string(col.type)
              else np.int32)
    bufs = col.buffers()
    o = np.frombuffer(bufs[1], dtype=off_dt)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    return data[o[0]: o[-1]], o - o[0]


def tokenize_csr(flat: np.ndarray,
                 offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """CSR core of :func:`tokenize_batch`: flat utf-8 bytes + doc
    offsets → (flat token hashes, token CSR offsets).  Bit-identical
    to the string-list path (token hashes are position-invariant, so
    dropping the old join-separator bytes changes nothing)."""
    ndocs = len(offsets) - 1
    out_offsets = np.zeros(ndocs + 1, dtype=np.int64)
    if ndocs == 0 or len(flat) == 0:
        return np.empty(0, dtype=np.uint64), out_offsets
    counts = np.empty(ndocs, dtype=np.int64)
    hash_parts: list[np.ndarray] = []
    lo = 0
    while lo < ndocs:
        # chunk split at document boundaries within the byte budget
        hi = int(np.searchsorted(
            offsets, offsets[lo] + _TOKENIZE_CHUNK_BYTES, side="right")) - 1
        hi = max(hi, lo + 1)
        th, tc = _tokenize_chunk(flat[offsets[lo]: offsets[hi]],
                                 offsets[lo: hi + 1] - offsets[lo])
        hash_parts.append(th)
        counts[lo:hi] = tc
        lo = hi
    np.cumsum(counts, out=out_offsets[1:])
    flat_h = (np.concatenate(hash_parts) if len(hash_parts) > 1
              else hash_parts[0])
    return flat_h, out_offsets


class _TokenizerScratch:
    """Per-process reusable buffers for :func:`_tokenize_chunk`.

    Buffers above glibc's mmap threshold are mmap'd fresh on every
    ``np.empty`` and unmapped on free, so a naive kernel pays first-touch
    page faults for ~35× the text size on EVERY chunk — measured as the
    dominant cost of the verify stage in this sandbox.  Keeping one
    capacity-doubling scratch per process makes the fault cost one-time.
    The power tables are data-independent, so they are *computed* once
    per capacity as well."""

    def __init__(self):
        self.cap = 0

    def grow(self, n: int) -> None:
        cap = max(1024, 1 << int(n - 1).bit_length())
        self.cap = cap
        self.is_tok = np.empty(cap, dtype=bool)
        self.mask = np.empty(cap, dtype=bool)
        self.b64 = np.empty(cap, dtype=np.uint64)
        self.csum = np.empty(cap + 1, dtype=np.uint64)
        # token-level temps (≤ cap//2 + 1 tokens possible)
        self.t1 = np.empty(cap // 2 + 2, dtype=np.uint64)
        self.t2 = np.empty(cap // 2 + 2, dtype=np.uint64)
        with np.errstate(over="ignore"):
            self.apow = np.full(cap, _SHINGLE_A, dtype=np.uint64)
            self.apow[0] = 1
            np.cumprod(self.apow, out=self.apow)      # apow[j] = A^j
            self.ainv = np.full(cap, _SHINGLE_A_INV, dtype=np.uint64)
            self.ainv[0] = 1
            np.cumprod(self.ainv, out=self.ainv)      # ainv[j] = A^-j


_SCRATCH = _TokenizerScratch()


def _splitmix64_inplace(x: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer computed in place (``tmp`` same shape as
    ``x``) — the allocating :func:`~.hashing.splitmix64` spends more on
    page faults than arithmetic for multi-MB arrays in this sandbox."""
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        np.right_shift(x, _U64(30), out=tmp)
        x ^= tmp
        x *= _U64(0xBF58476D1CE4E5B9)
        np.right_shift(x, _U64(27), out=tmp)
        x ^= tmp
        x *= _U64(0x94D049BB133111EB)
        np.right_shift(x, _U64(31), out=tmp)
        x ^= tmp
    return x


def _tokenize_chunk(
    flat: np.ndarray, offs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """One bounded chunk of :func:`tokenize_csr` (flat bytes + local
    doc offsets): returns the chunk's flat token hashes plus per-doc
    token counts.  Documents are adjacent with NO separator bytes;
    token runs are additionally split at document boundaries (the
    forced start/end masks below), which is exactly what the earlier
    join-with-one-space representation encoded positionally."""
    ndocs = len(offs) - 1
    total = len(flat)
    counts = np.zeros(ndocs, dtype=np.int64)
    if total == 0:
        return np.empty(0, dtype=np.uint64), counts
    if _SCRATCH.cap < total:
        _SCRATCH.grow(total)
    s = _SCRATCH
    is_tok = np.take(_WS_LUT_NEG, flat, out=s.is_tok[:total])
    if not np.any(is_tok):
        return np.empty(0, dtype=np.uint64), counts
    # token starts: non-ws preceded by ws/BOF; ends: non-ws followed by
    # ws/EOF — plus forced boundaries at document starts/ends so a run
    # spanning adjacent documents splits into one token per document
    mask = s.mask[:total]
    np.greater(is_tok[1:], is_tok[:-1], out=mask[1:])
    mask[0] = is_tok[0]
    ds_pos = offs[:-1][offs[:-1] < total]
    mask[ds_pos] = is_tok[ds_pos]
    starts = np.flatnonzero(mask)
    np.greater(is_tok[:-1], is_tok[1:], out=mask[:-1])
    mask[total - 1] = is_tok[total - 1]
    de_pos = offs[1:] - 1
    de_pos = de_pos[de_pos >= 0]
    mask[de_pos] = is_tok[de_pos]
    ends = np.flatnonzero(mask)      # inclusive last byte; +1 applied below
    m = len(starts)

    with np.errstate(over="ignore"):
        b64 = s.b64[:total]
        np.copyto(b64, flat, casting="unsafe")
        b64 *= s.ainv[:total]                         # b[k]·A^-k in place
        csum = s.csum[: total + 1]
        csum[0] = 0
        np.cumsum(b64, out=csum[1:])                  # Σ b[k]·A^-k
        # token [s,e): Σ b[k]·A^(e-1-k) = A^(e-1)·(csum[e]-csum[s])
        h, t2 = s.t1[:m], s.t2[:m]
        np.take(csum[1:], ends, out=h)                # csum[e] (ends = e-1)
        np.subtract(h, np.take(csum, starts, out=t2), out=h)
        h *= np.take(s.apow, ends, out=t2)            # apow[e-1]
        tok_hash = _splitmix64_inplace(h, t2).copy()

    tok_doc = np.searchsorted(offs, starts, side="right") - 1
    counts = np.bincount(tok_doc, minlength=ndocs).astype(np.int64)
    return tok_hash, counts


def shingle_hashes(
    token_hashes: np.ndarray, doc_offsets: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hash every n-gram of consecutive tokens per document.

    Computed over the flat token array with one vectorized polynomial
    pass (``h = ((h*A)+t)`` over the n window positions), then windows
    crossing document boundaries are masked out.  Returns the CSR pair
    ``(flat_shingle_hashes, shingle_offsets)``; a doc with fewer than
    ``n`` tokens has zero shingles.
    """
    total = len(token_hashes)
    ndocs = len(doc_offsets) - 1
    if total < n:
        return np.empty(0, dtype=np.uint64), np.zeros(ndocs + 1, dtype=np.int64)

    num_windows = total - n + 1
    h = np.zeros(num_windows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h = h * _SHINGLE_A + token_hashes[j : j + num_windows]

    doc_lens = np.diff(doc_offsets)
    shingle_counts = np.maximum(doc_lens - (n - 1), 0)
    shingle_offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(shingle_counts, out=shingle_offsets[1:])

    # valid window starts: positions p with p >= doc_start and p+n <= doc_end
    valid = np.zeros(num_windows, dtype=bool)
    starts = doc_offsets[:-1]
    ends = starts + shingle_counts
    for i in range(ndocs):           # ndocs iterations of slice-assign (cheap)
        if shingle_counts[i]:
            valid[starts[i] : ends[i]] = True
    return h[valid], shingle_offsets


def batch_shingles(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """texts → (flat shingle hashes, per-doc CSR offsets)."""
    tok, off = tokenize_batch(texts)
    return shingle_hashes(tok, off, n)


def batch_shingles_arrow(col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column → (flat shingle hashes, CSR offsets) without
    materializing Python strings (bit-identical to
    :func:`batch_shingles` on the same values)."""
    flat, offs = utf8_csr(col)
    tok, toff = tokenize_csr(flat, offs)
    return shingle_hashes(tok, toff, n)


def char_shingles(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash every n-gram of consecutive *bytes* (utf-8) per document —
    the character-level counterpart of :func:`batch_shingles`, used by
    the n-gram-Jaccard dedup operator.  One vectorized polynomial pass
    over the concatenated byte array, windows crossing document
    boundaries masked out.  CSR return like :func:`batch_shingles`."""
    bufs = [t.encode("utf-8") if t else b"" for t in texts]
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    total = len(flat)
    ndocs = len(bufs)
    if total < n:
        return np.empty(0, dtype=np.uint64), np.zeros(ndocs + 1, dtype=np.int64)
    num_windows = total - n + 1
    h = np.zeros(num_windows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h = h * _SHINGLE_A + flat[j : j + num_windows]
    doc_lens = np.diff(offsets)
    counts = np.maximum(doc_lens - (n - 1), 0)
    sh_offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=sh_offsets[1:])
    valid = np.zeros(num_windows, dtype=bool)
    starts = offsets[:-1]
    ends = starts + counts
    for i in range(ndocs):
        if counts[i]:
            valid[starts[i] : ends[i]] = True
    return h[valid], sh_offsets


def unique_shingle_sets(
    flat: np.ndarray, offsets: np.ndarray
) -> list[np.ndarray]:
    """Per-document sorted unique shingle hashes (for exact Jaccard)."""
    return [
        np.unique(flat[offsets[i] : offsets[i + 1]])
        for i in range(len(offsets) - 1)
    ]


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two *sorted unique* uint64 arrays.

    |A∩B| = adjacent-equal count of the sorted concatenation (inputs
    are unique, so every common value appears exactly twice) — what
    intersect1d computes minus its value-extraction pass; the count is
    the same integer, so results are bit-identical."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    c = np.concatenate((a, b))
    c.sort()
    inter = int(np.count_nonzero(c[1:] == c[:-1]))
    return inter / (len(a) + len(b) - inter)


def jaccard_many(sets: list, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Exact Jaccard for MANY pairs at once, bit-identical to calling
    :func:`jaccard_sorted` per pair (same intersection integer, same
    float64 division), with NO per-pair Python iteration.

    ``sets`` are sorted unique uint64 arrays (typically the per-batch
    dictionary of distinct texts — far fewer than pairs); ``ia``/``ib``
    index into it, one entry per candidate pair.

    Kernel: (1) dedupe pairs by a packed unordered (code, code) key —
    boilerplate clusters repeat the same two texts across thousands
    of pairs; (2) dictionary-encode the shingle values to 32-bit
    codes (one searchsorted per DISTINCT set against the batch
    union); (3) pack (pair ordinal << 32 | value code) into one u64
    array and VALUE-sort it — ~8× cheaper than an argsort-based
    lexsort, and counts are all we need; (4) adjacent equal packed
    keys ⇒ intersection members (per-set values unique, so a common
    value appears exactly twice per pair); bincount per pair.
    Everything after the reference-gather is bulk numpy; the only
    Python-level loops touch the (few) distinct sets, not the pairs."""
    n = len(ia)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    lo = np.minimum(ia, ib).astype(np.uint64)
    hi = np.maximum(ia, ib).astype(np.uint64)
    upk, inv = np.unique((lo << np.uint64(32)) | hi, return_inverse=True)
    ua = (upk >> np.uint64(32)).astype(np.int64)
    ub = (upk & np.uint64(0xFFFFFFFF)).astype(np.int64)
    m = len(ua)
    lens = np.fromiter((len(s) for s in sets), dtype=np.int64,
                       count=len(sets))
    allv = np.concatenate(sets) if len(sets) else np.empty(0, np.uint64)
    # ONE unique(return_inverse) encodes every set's values to dense
    # codes (a per-set searchsorted loop measured 4.5 s / 120k calls
    # on 4 shards — it dominated); per-pair gathers are then pure
    # index arithmetic on the flat code array via range-concat
    uvals, codes_flat = np.unique(allv, return_inverse=True)
    codes_flat = codes_flat.astype(np.uint64)
    # batch-local invariants of the 32-bit packings (sets and pairs
    # are per-verify-chunk, orders of magnitude below 2^32)
    assert len(uvals) < (1 << 32) and len(sets) < (1 << 32)
    set_offs = np.concatenate([[0], np.cumsum(lens)])

    def seg_gather(idxs: np.ndarray) -> np.ndarray:
        ls = lens[idxs]
        tot = int(ls.sum())
        if tot == 0:
            return np.empty(0, dtype=np.uint64)
        base = np.concatenate([[0], np.cumsum(ls)[:-1]])
        pos = np.arange(tot, dtype=np.int64) + np.repeat(
            set_offs[idxs] - base, ls)
        return codes_flat[pos]

    la, lb = lens[ua], lens[ub]
    packed = np.concatenate([seg_gather(ua), seg_gather(ub)])
    pid = np.concatenate([np.repeat(np.arange(m, dtype=np.uint64), la),
                          np.repeat(np.arange(m, dtype=np.uint64), lb)])
    packed |= pid << np.uint64(32)
    packed.sort()
    if len(packed) > 1:
        dup = packed[1:] == packed[:-1]
        inter = np.bincount(
            (packed[1:][dup] >> np.uint64(32)).astype(np.int64),
            minlength=m)
    else:
        inter = np.zeros(m, dtype=np.int64)
    union = la + lb - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    return jac[inv]


def distinct_shingles(texts, n: int):
    """Per-document DISTINCT word-n-gram hashes, flattened:
    ``(doc_idx, gram_hash, per_doc_distinct_count, per_doc_total)`` —
    the shared kernel behind the prefix-filter set-similarity join
    (stages/setsim.py) and the intra-doc repetition stats
    (functions/textstats.repetition_features).  One shingle pass, then
    per-doc dedup via lexsort boundaries."""
    texts = list(texts)
    ndocs = len(texts)
    flat, off = batch_shingles(texts, n)
    total = np.diff(off).astype(np.int64)
    doc_idx = np.repeat(np.arange(ndocs), total)
    order = np.lexsort((flat, doc_idx))
    d_s, f_s = doc_idx[order], flat[order]
    keep = np.ones(len(f_s), dtype=bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
    d_u, f_u = d_s[keep], f_s[keep]
    distinct = np.bincount(d_u, minlength=ndocs).astype(np.int64)
    return d_u, f_u, distinct, total
