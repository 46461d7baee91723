"""MinHash, SimHash and LSH band keys — vectorized over a whole batch.

The per-batch layout is CSR (flat shingle array + per-doc offsets), so
the 128 permutations reduce with `np.minimum.reduceat` — one pass of
~|batch shingles| uint64 ops per permutation, no per-document Python
loop and no (perms × shingles) matrix materialization.

Reference anchors (SURVEY.md §0): the MinHash signature plays the role
of the dictionary encoder's fingerprint table entry
(dictionary_encoder.hpp:61-66); banding the signature into (band_id,
band_hash) keys is the base/deviation split of
frame_of_reference_segment.hpp:43-55 — the band key is the shared
*base*, exact-Jaccard verification measures the *deviation*.
"""

from __future__ import annotations

import numpy as np

from hyrise_generalized_dedup_ray.config import MERSENNE_P, SignatureConfig
from hyrise_generalized_dedup_ray.functions.hashing import mix2, splitmix64

_U64 = np.uint64
# sentinel signature slot for documents with zero shingles (< n tokens):
# MAX means "matches nothing" — such docs can still be exact duplicates
# (caught by the text-hash stage), never signature near-duplicates.
EMPTY_SLOT = _U64(0xFFFFFFFFFFFFFFFF)
_MOD = _U64(MERSENNE_P)


def minhash_signatures(
    flat: np.ndarray, offsets: np.ndarray, cfg: SignatureConfig
) -> np.ndarray:
    """(ndocs, num_perms) uint64 MinHash signature matrix.

    h_k(x) = (a_k * x + b_k) mod (2^61 - 1), minimized per document via
    segmented reduction.  Wraparound uint64 multiply is fine: the map
    x -> a*x+b (mod 2^64) then mod P is a fixed deterministic hash
    family — identical in oracle and pipeline, which is the contract.
    """
    ndocs = len(offsets) - 1
    sig = np.full((ndocs, cfg.num_perms), EMPTY_SLOT, dtype=np.uint64)
    if len(flat) == 0 or ndocs == 0:
        return sig
    a, b = cfg.perm_coefficients()
    counts = np.diff(offsets)
    nonempty = counts > 0
    # reduceat needs strictly valid start indices; restrict to non-empty docs
    starts = offsets[:-1][nonempty]
    # ONE reused buffer for the permuted values: the expression form
    # allocated three |flat|-sized temporaries per permutation, and at
    # 128 perms the alloc/fault churn measured 1.6× the kernel (the
    # modulo itself is fast — a Mersenne-fold rewrite measured SLOWER
    # than numpy's scalar %, see BASELINE.md round-4 negative results)
    hv = np.empty_like(flat)
    with np.errstate(over="ignore"):
        for k in range(cfg.num_perms):
            np.multiply(flat, a[k], out=hv)
            hv += b[k]
            np.remainder(hv, _MOD, out=hv)
            sig[nonempty, k] = np.minimum.reduceat(hv, starts)
    return sig


def simhash_signatures(
    flat: np.ndarray, offsets: np.ndarray, cfg: SignatureConfig
) -> np.ndarray:
    """(ndocs,) uint64 SimHash fingerprints (set-weighted, 64 bit).

    Bit j of the fingerprint is 1 iff more than half of the document's
    (seed-remixed) shingle hashes have bit j set.  Documents with zero
    shingles get fingerprint 0.
    """
    assert cfg.simhash_bits == 64, "only 64-bit SimHash is implemented"
    ndocs = len(offsets) - 1
    out = np.zeros(ndocs, dtype=np.uint64)
    if len(flat) == 0 or ndocs == 0:
        return out
    remixed = splitmix64(flat + _U64(cfg.seed))
    counts = np.diff(offsets)
    nonempty = counts > 0
    starts = offsets[:-1][nonempty]
    # one 1-D pass per bit (shift+mask+segmented sum) — identical
    # results to a (nshingles, bits) matrix but ~bits× less transient
    # allocation, which matters because this kernel runs on every
    # signing batch
    fingerprint = np.zeros(ndocs, dtype=np.uint64)
    half = counts[nonempty].astype(np.float64) / 2.0
    fp_ne = np.zeros(int(nonempty.sum()), dtype=np.uint64)
    bit = np.empty_like(remixed)  # reused per-bit buffer (see minhash)
    for j in range(64):
        np.right_shift(remixed, _U64(j), out=bit)
        np.bitwise_and(bit, _U64(1), out=bit)
        sums = np.add.reduceat(bit.view(np.int64), starts)
        fp_ne |= (sums > half).astype(np.uint64) << _U64(j)
    fingerprint[nonempty] = fp_ne
    out[:] = fingerprint
    return out


def band_keys(sig: np.ndarray, cfg: SignatureConfig) -> np.ndarray:
    """(ndocs, bands) uint64 LSH band keys.

    Band k of a signature hashes its ``rows_per_band`` contiguous slots
    into one uint64, then mixes in the band index so identical row
    values in different bands never collide.  Documents with zero
    shingles (all-EMPTY signature) would all share the same keys —
    callers must exclude them from banding (filter num_shingles > 0),
    as both the LSH stage and the oracle do.
    """
    ndocs = sig.shape[0]
    keys = np.empty((ndocs, cfg.bands), dtype=np.uint64)
    r = cfg.rows_per_band
    with np.errstate(over="ignore"):
        for band in range(cfg.bands):
            block = sig[:, band * r : (band + 1) * r]
            h = np.full(ndocs, _U64(0x51_7CC1B7_2722_0A95), dtype=np.uint64)
            for j in range(r):
                h = mix2(h, block[:, j])
            keys[:, band] = mix2(h, np.full(ndocs, _U64(band)))
    return keys


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 SimHash fingerprints."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64) if x.ndim == 0 else _popcount64(x)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    m1 = _U64(0x5555555555555555)
    m2 = _U64(0x3333333333333333)
    m4 = _U64(0x0F0F0F0F0F0F0F0F)
    h01 = _U64(0x0101010101010101)
    with np.errstate(over="ignore"):
        x -= (x >> _U64(1)) & m1
        x = (x & m2) + ((x >> _U64(2)) & m2)
        x = (x + (x >> _U64(4))) & m4
        return ((x * h01) >> _U64(56)).astype(np.int64)
