"""Stable 64-bit hashing utilities.

Everything here is deterministic across processes, machines and runs
(no PYTHONHASHSEED dependence): string hashing goes through pandas'
SipHash-1-3 with its fixed default key (`pd.util.hash_array`), and
integer mixing uses splitmix64.  The reference relies on deterministic
hash/dictionary state the same way (its dictionary encoder sorts
distinct values into a canonical order — dictionary_encoder.hpp:61-66);
determinism is what makes our checkpoints resumable and the
distributed-vs-oracle comparison exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U64 = np.uint64


def hash_strings(values) -> np.ndarray:
    """Stable uint64 hash of an array-like of Python strings.

    SipHash-1-3 with pandas' fixed key — deterministic across runs and
    processes, vectorized in C.
    """
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — good avalanche for integer keys; used for
    salting, bucketing and band-key mixing (vectorized, wraparound)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        x = x ^ (x >> _U64(31))
    return x


def mix2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Combine two uint64 arrays into one well-mixed uint64 (order-sensitive)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return splitmix64(a * _U64(0xC2B2AE3D27D4EB4F) + splitmix64(b))
