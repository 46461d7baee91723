"""Signature stage: stateful actor pool computing per-document
shingles → MinHash (128 perms) + SimHash (64 bit) + LSH band keys +
winnowing fingerprints + text hash — one pass over each batch.

This is the pipeline's analog of the reference's build-once encoder /
index state (SURVEY.md §2.4): the permutation coefficient matrix is
derived from ``SignatureConfig`` once per actor in ``__init__`` and
reused for every batch (``map_batches(SignerActor, concurrency=N,
batch_size=B)``), exactly the Hyrise pattern of constructing a
GroupKeyIndex once and probing it per scan
(group_key_index.hpp:53).

Output schema (doc_id:int64, url:string, band_keys:list<int64>[bands],
simhash:int64, num_shingles:int64, text_hash:int64,
fingerprints:list<int64>, text:string).  All hash values are uint64 in
the kernels and bit-cast to int64 at this boundary — Ray-visible
schemas carry no uint64 (sort/shuffle boundary sampling is happier and
pandas round-trips stay lossless).  The MinHash signature itself
is not shipped — only its band keys are needed downstream, which cuts
the shuffled signature payload from 128 to ``bands`` u64s per doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from hyrise_generalized_dedup_ray.config import SignatureConfig
from hyrise_generalized_dedup_ray.functions.hashing import hash_strings
from hyrise_generalized_dedup_ray.functions.minhash import (
    band_keys,
    minhash_signatures,
    simhash_signatures,
)
from hyrise_generalized_dedup_ray.functions.substr import (
    winnow_fingerprints,
    winnow_fingerprints_csr,
)
from hyrise_generalized_dedup_ray.functions.text import (
    batch_shingles,
    shingle_hashes,
    tokenize_csr,
    utf8_csr,
)


def doc_ids_for_urls(urls) -> np.ndarray:
    """Deterministic int64 doc id from the url (stable across runs and
    engines — the oracle uses the same function).  Top bit cleared so
    ids are non-negative; 63-bit space is collision-safe at sandbox
    scale (at a real 10^12-doc deployment this would widen to 128-bit)."""
    return (hash_strings(urls) >> np.uint64(1)).astype(np.int64)


class SignerActor:
    """Callable class for ``map_batches`` actor pools."""

    def __init__(self, cfg: SignatureConfig, with_fingerprints: bool = True):
        self.cfg = cfg
        self.with_fingerprints = with_fingerprints
        # build the permutation family once per actor (not per batch)
        self.perm_a, self.perm_b = cfg.perm_coefficients()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        text_col = batch.column("text")
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
        if "doc_id" in batch.column_names:
            # documents-style input: ids provided by the table
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            url_col = (batch.column("url")
                       if "url" in batch.column_names
                       else pa.array([f"doc://{int(i)}" for i in ids],
                                     type=pa.string()))
        else:
            url_col = batch.column("url")
            ids = doc_ids_for_urls(
                url_col.to_numpy(zero_copy_only=False))
        if isinstance(url_col, pa.ChunkedArray):
            url_col = url_col.combine_chunks()

        # zero-copy Arrow buffers → CSR kernels: no Python string
        # objects, no utf-8 re-encode (round-3 profile: the
        # to_pylist round-trip was pure overhead in the pipeline's
        # most expensive stage).  SipHash for text_hash / doc ids
        # still reads object arrays — pandas' SipHash-1-3 is the
        # engine-wide stable string hash and keeps oracle parity.
        flat_u8, doc_offs = utf8_csr(text_col)
        tok, toff = tokenize_csr(flat_u8, doc_offs)
        flat, offsets = shingle_hashes(tok, toff, cfg.shingle_n)
        sig = minhash_signatures(flat, offsets, cfg)
        sim = simhash_signatures(flat, offsets, cfg)
        bands = band_keys(sig, cfg)
        n_shingles = np.diff(offsets)
        text_hash = hash_strings(text_col.to_numpy(zero_copy_only=False))

        # per-doc SORTED UNIQUE shingle sets, carried in the signer
        # output so the near-dup verify consumes them directly instead
        # of re-tokenizing + re-shingling every melted text (~half the
        # verify stage's CPU at the 2M point).  ~8 B per distinct
        # shingle ≈ the text's own size; the exact/substring branches
        # keep using the text column.
        ndocs = len(offsets) - 1
        uniq_sets = [np.unique(flat[offsets[i]:offsets[i + 1]])
                     for i in range(ndocs)]
        soffs = np.zeros(ndocs + 1, dtype=np.int32)
        np.cumsum([len(u) for u in uniq_sets], out=soffs[1:])
        flat_u = (np.concatenate(uniq_sets) if uniq_sets
                  else np.empty(0, np.uint64))
        shingle_col = pa.ListArray.from_arrays(
            pa.array(soffs), pa.array(flat_u.view(np.int64),
                                      type=pa.int64()))

        cols: dict[str, pa.Array] = {
            "doc_id": pa.array(ids, type=pa.int64()),
            "url": url_col,
            "band_keys": _list_of_u64(bands),
            "simhash": pa.array(sim.view(np.int64), type=pa.int64()),
            "num_shingles": pa.array(n_shingles, type=pa.int64()),
            "text_hash": pa.array(text_hash.view(np.int64), type=pa.int64()),
            "shingles": shingle_col,
        }
        if self.with_fingerprints:
            fps = winnow_fingerprints_csr(flat_u8, doc_offs)
            offs = np.zeros(len(fps) + 1, dtype=np.int32)
            np.cumsum([len(f) for f in fps], out=offs[1:])
            flat_fp = (np.concatenate(fps) if fps else np.empty(0, np.uint64))
            cols["fingerprints"] = pa.ListArray.from_arrays(
                pa.array(offs), pa.array(flat_fp.view(np.int64), type=pa.int64())
            )
        cols["text"] = text_col
        return pa.table(cols)


# Per-worker-process signer cache: signing runs as plain TASKS (which
# reuse Ray's warm worker processes and scale elastically with the CPU
# count) while the permutation matrix is still built once per process —
# the build-once-state benefit of an actor pool without paying a fresh
# process spawn per actor.  A dedicated actor pool remains the right
# shape only for state that is expensive to rebuild (models, big
# indexes — cf. the broadcast joiner in relational/operators.py);
# SignatureConfig state is two 128-element u64 arrays.
_PROCESS_SIGNERS: dict[str, "SignerActor"] = {}


def sign_batch(batch: pa.Table, cfg: SignatureConfig,
               with_fingerprints: bool = True) -> pa.Table:
    key = f"{cfg.config_hash()}-{with_fingerprints}"
    signer = _PROCESS_SIGNERS.get(key)
    if signer is None:
        signer = _PROCESS_SIGNERS.setdefault(
            key, SignerActor(cfg, with_fingerprints))
    return signer(batch)


def _list_of_u64(mat: np.ndarray) -> pa.Array:
    """(n, k) uint64 matrix → Arrow list<int64> array (bit-cast values)."""
    n, k = mat.shape
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
    values = pa.array(mat.ravel().view(np.int64), type=pa.int64())
    return pa.ListArray.from_arrays(offsets, values)
