"""Configuration dataclasses shared by the distributed pipeline and the
sequential reference oracle.

The reference embodies "generalized deduplication" as encoder state built
once and reused per scan (dictionary / frame-of-reference / zstd-dict
encoders, see SURVEY.md §0).  Our analog of that shared, build-once state
is this config object: every seed, permutation, band layout and threshold
lives here, so the distributed Ray pipeline and the single-process oracle
(`pipelines/reference.py`) are guaranteed to use *identical*
shingle/signature parameters — the north-rule recall target (≥0.99) is
defined at "identical shingle/signature config".
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

import numpy as np

# Mersenne prime 2^61 - 1: modulus for the universal-hash MinHash
# permutation family h_i(x) = (a_i * x + b_i) mod P  (a_i != 0).
MERSENNE_P = (1 << 61) - 1
_MAX_HASH = np.uint64((1 << 61) - 1)


@dataclass(frozen=True)
class SignatureConfig:
    """Shingle + MinHash + SimHash + LSH parameters.

    Defaults follow the north star: 5-gram (token) shingles, 128
    permutations, 64-bit SimHash.  bands*rows must equal num_perms.
    b=32, r=4 puts the LSH S-curve threshold at (1/32)^(1/4) ≈ 0.42 so
    that near-duplicates at Jaccard ≥ 0.6 are recalled with
    probability ≥ 0.988 (≥ 0.998 at J ≥ 0.65); precision is restored by
    the exact-Jaccard verification stage, mirroring how the reference
    always verifies candidates exactly (no approximate aggregates exist
    in the reference — SURVEY.md §2.6).
    """

    shingle_n: int = 5            # tokens per shingle (5-gram)
    num_perms: int = 128          # MinHash permutations
    bands: int = 32               # LSH bands
    rows_per_band: int = 4        # rows per band; bands*rows == num_perms
    simhash_bits: int = 64
    jaccard_threshold: float = 0.6   # verification threshold on exact shingle Jaccard
    min_substring_bytes: int = 50    # suffix-array stage: min exact repeat length
    seed: int = 0x5EED_CAFE

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"!= num_perms ({self.num_perms})"
            )

    def perm_coefficients(self) -> tuple[np.ndarray, np.ndarray]:
        """(a, b) uint64 arrays of shape (num_perms,), derived from seed.

        Deterministic across processes/machines (seeded PCG64); a_i is
        guaranteed non-zero so each permutation is injective mod P.
        """
        rng = np.random.default_rng(self.seed)
        a = rng.integers(1, MERSENNE_P, size=self.num_perms, dtype=np.uint64)
        b = rng.integers(0, MERSENNE_P, size=self.num_perms, dtype=np.uint64)
        return a, b

    def config_hash(self) -> str:
        """Stable hash of the full config — stamped into checkpoint
        lineage manifests so stale checkpoints self-invalidate."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def signature_hash(self) -> str:
        """Hash of only the fields the *signature stage* depends on
        (shingles/perms/bands/simhash/seed).  Verification thresholds
        don't change signatures, so tightening ``jaccard_threshold``
        must not invalidate a signatures checkpoint."""
        fields = {
            "shingle_n": self.shingle_n,
            "num_perms": self.num_perms,
            "bands": self.bands,
            "rows_per_band": self.rows_per_band,
            "simhash_bits": self.simhash_bits,
            "seed": self.seed,
        }
        payload = json.dumps(fields, sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


@dataclass(frozen=True)
class EngineConfig:
    """Execution-side knobs — everything that affects HOW (not WHAT) is
    computed, so changing these must never change results."""

    signature_batch_size: int = 1024     # docs per signing batch (task-based)
    band_salt_threshold: int = 256       # band groups larger than this get salted
    band_salt_buckets: int = 16          # sub-buckets for a hot band
    max_pairs_per_band: int = 10_000     # hard cap on pairs emitted per (possibly salted) band group; overflow is logged
    cc_max_rounds: int = 64              # star-contraction round cap (log n expected)
    simhash_block_cap: int = 2048        # SimHash pigeonhole blocks larger than this are
                                         # split into deterministic sub-blocks (O(g·cap)
                                         # instead of O(g²) on boilerplate mega-blocks)
    suffix_buckets: int = 16             # hash(url) buckets for the suffix-array stage
    suffix_max_bucket_bytes: int = 64 * 1024 * 1024  # text cap per suffix-array partition
    suffix_rotations: int = 2            # hash-rotated re-bucketing rounds (recall for cross-bucket repeats)
    verify_batch_size: int = 2048        # candidate pairs per verification batch
    join_partition_cap: int = 16         # Dataset.join fan-out cap: per-partition aggregator
                                         # fixed costs beat width gains below ~32 MB/partition
                                         # (measured 16 > 32 ≈ 8 at the 60k-doc payload);
                                         # raise for real multi-node payloads
    small_cc_threshold: int = 25_000_000  # below this many edges, finish union-find on the driver (vectorized Shiloach-Vishkin, ~16 B/edge: 25M edges = 400 MB + a few vector rounds)

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


DEFAULT_SIGNATURE_CONFIG = SignatureConfig()
DEFAULT_ENGINE_CONFIG = EngineConfig()
