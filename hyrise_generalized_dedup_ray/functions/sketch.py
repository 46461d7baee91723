"""Mergeable sketches: HyperLogLog approximate distinct counting.

The mergeable-sketch shape every 100-TB aggregation wants: each block
reduces to a tiny fixed-size state (2^p byte registers), states merge
associatively (elementwise max), and the final estimate reads one
merged state — no value ever crosses the wire twice.  This is the
partial-aggregation discipline of the engine's AggregateHash
(aggregate_hash.cpp's per-chunk pre-aggregation) taken to its
sublinear extreme.

Algorithm: Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007), with the
standard small-range linear-counting correction.  Deterministic: the
value hash is the engine-wide SipHash (functions/hashing.py), so the
estimate is reproducible across runs and partitionings.

Relative error ≈ 1.04/√(2^p): p=12 → 4096 B state, ~1.6%.
"""

from __future__ import annotations

import numpy as np

from hyrise_generalized_dedup_ray.functions.hashing import hash_strings

_U64 = np.uint64


def hll_empty(p: int = 12) -> np.ndarray:
    if not 12 <= p <= 18:
        raise ValueError(
            f"hll p={p} out of range [12, 18]: p >= 12 keeps the "
            "64-p rest bits exactly representable as float64 (frexp "
            "rho trick), p <= 18 bounds register state at 256 KiB")
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(regs: np.ndarray, h: np.ndarray, p: int) -> None:
    """Fold u64 hashes into the register array in place (vectorized)."""
    if p < 12:
        raise ValueError(f"hll p={p} < 12: rest would exceed 2^52 and "
                         "the float64 floor(log2) below could round up")
    if not len(h):
        return
    m_bits = 64 - p
    idx = (h >> _U64(m_bits)).astype(np.int64)
    rest = h & ((_U64(1) << _U64(m_bits)) - _U64(1))
    # floor(log2(rest)) exactly: p >= 12 (guarded above) makes
    # rest < 2^52 exactly representable as a double; frexp's
    # exponent e satisfies value = m·2^e, m∈[.5,1)
    _, e = np.frexp(rest.astype(np.float64))
    rho = np.where(rest > 0, m_bits - (e - 1), m_bits + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)


def hll_add_values(regs: np.ndarray, values, p: int) -> None:
    hll_add_hashes(regs, hash_strings(np.asarray(values, dtype=object)), p)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)   # linear counting
    return float(est)
