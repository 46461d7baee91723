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

from hyrise_generalized_dedup_ray.functions.hashing import hash_strings

_U64 = np.uint64
# odd multiplier for the degree-(n-1) polynomial combine of token hashes
_SHINGLE_A = _U64(0x9E3779B97F4A7C15)


def tokenize_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a batch of strings.

    Returns ``(flat_token_hashes, doc_offsets)`` where ``doc_offsets``
    has length ``len(texts)+1`` and doc i's token hashes are
    ``flat[offsets[i]:offsets[i+1]]`` (CSR).  `str.split()` (C level)
    per doc + one vectorized SipHash over the flattened token array.
    """
    token_lists = [t.split() if t else [] for t in texts]
    lengths = np.fromiter((len(ts) for ts in token_lists), dtype=np.int64, count=len(token_lists))
    offsets = np.zeros(len(token_lists) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat: list[str] = [tok for ts in token_lists for tok in ts]
    return hash_strings(flat), offsets


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
    """Exact Jaccard of two *sorted unique* uint64 arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (len(a) + len(b) - inter)
