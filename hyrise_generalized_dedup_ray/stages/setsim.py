"""Exact set-similarity self-join via prefix filtering (All-Pairs /
PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08 — public
algorithms).

The LSH dedup family (stages/lsh.py) trades recall for one shuffle;
this operator is its LOSSLESS sibling: it returns EXACTLY the pairs
with word-n-gram Jaccard ≥ τ, so it can be oracle-checked against a
brute-force SQL twin.  The cost is three hash exchanges of the exploded
(gram, doc) table plus one of the prefix rows — the honest price of
exactness; use the LSH path when approximate recall is acceptable.

Pipeline (all stages on the engine's hash exchange, every kernel
numpy-vectorized):

1. **gram rows** — per batch: tokenize (functions/text.py byte
   tokenizer), hash word n-grams, per-doc DISTINCT → flat
   (gram, doc_id, size) rows;
2. **document frequency** — exchange on gram: each gram's rows
   co-locate, kernel appends df (needed for the canonical ordering);
3. **prefix selection** — exchange on doc_id: per doc, order grams by
   (df asc, gram) — rarest first, the classic All-Pairs ordering that
   keeps candidate lists short — and keep the first
   ``size - ceil(τ·size) + 1`` (prefix-filter lemma: any pair with
   J ≥ τ shares a prefix gram under ANY global total order; rarest-
   first minimizes collisions);
4. **candidates** — exchange prefix rows on gram: per-gram all pairs
   (a < b) with the size-ratio prune ``τ·|A| ≤ |B|``;
5. **verify** — dedupe pairs, attach texts (stages/verify machinery),
   recompute both gram sets and keep pairs with exact J ≥ τ,
   emitting (a, b, n_common, jacc_e6).

Determinism: gram identity is the 64-bit polynomial token-hash
n-gram (functions/text.shingle_hashes) — deterministic across runs and
processes; a 64-bit collision would perturb counts but is ~1e-7 even
at 10^6 distinct grams and the comparison is reproducible either way.

Scale contract: each exchange moves the exploded gram table once; a
gram shared by m mutually-similar docs yields m² candidate pairs —
that is the OUTPUT size of exact all-pairs semantics, not avoidable
overhead.  τ·size prefixing keeps per-gram groups short for everything
except genuine duplicate clusters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.functions.text import batch_shingles
from hyrise_generalized_dedup_ray.stages.exchange import hash_exchange

_I64 = pa.int64()
_G_SCHEMA = pa.schema([("gram", _I64), ("doc_id", _I64), ("size", _I64)])
_GD_SCHEMA = pa.schema([("gram", _I64), ("doc_id", _I64), ("size", _I64),
                        ("df", _I64)])
_PAIR_SCHEMA = pa.schema([("a", _I64), ("b", _I64)])
_OUT_SCHEMA = pa.schema([("a", _I64), ("b", _I64), ("n_common", _I64),
                         ("jacc_e6", _I64)])


def _distinct_gram_rows(text_col: str, id_col: str, n: int):
    """batch → one row per (doc, distinct gram) with the doc's distinct
    gram count."""

    def fn(batch: pa.Table) -> pa.Table:
        from hyrise_generalized_dedup_ray.functions.text import \
            distinct_shingles

        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        d_u, f_u, sizes, _ = distinct_shingles(texts, n)
        return pa.Table.from_arrays(
            [pa.array(f_u.view(np.int64), type=_I64),
             pa.array(ids[d_u], type=_I64),
             pa.array(sizes[d_u], type=_I64)], schema=_G_SCHEMA)
    return fn


def _df_kernel(part: pa.Table) -> pa.Table:
    """All rows of a gram are co-located: append its document
    frequency."""
    if part.num_rows == 0:
        return _GD_SCHEMA.empty_table()
    g = part.column("gram").to_numpy(zero_copy_only=False)
    order = np.argsort(g, kind="stable")
    gs = g[order]
    brk = np.ones(len(gs), dtype=bool)
    brk[1:] = gs[1:] != gs[:-1]
    gid = np.cumsum(brk) - 1
    df = np.bincount(gid)
    t = part.take(pa.array(order))
    return pa.Table.from_arrays(
        [t.column("gram"), t.column("doc_id"), t.column("size"),
         pa.array(df[gid], type=_I64)], schema=_GD_SCHEMA)


def _prefix_kernel(tau: float):
    """All grams of a doc are co-located: keep the per-doc prefix of
    length size - ceil(τ·size) + 1 under (df asc, gram) order."""

    def kernel(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _G_SCHEMA.empty_table()
        d = part.column("doc_id").to_numpy(zero_copy_only=False)
        g = part.column("gram").to_numpy(zero_copy_only=False)
        df = part.column("df").to_numpy(zero_copy_only=False)
        sz = part.column("size").to_numpy(zero_copy_only=False)
        order = np.lexsort((g, df, d))
        d_s, sz_s = d[order], sz[order]
        brk = np.ones(len(d_s), dtype=bool)
        brk[1:] = d_s[1:] != d_s[:-1]
        starts = np.flatnonzero(brk)
        rank = np.arange(len(d_s)) - np.repeat(starts, np.diff(
            np.concatenate([starts, [len(d_s)]])))
        p = sz_s - np.ceil(tau * sz_s).astype(np.int64) + 1
        keep = order[rank < p]
        t = part.take(pa.array(keep))
        return pa.Table.from_arrays(
            [t.column("gram"), t.column("doc_id"), t.column("size")],
            schema=_G_SCHEMA)
    return kernel


def _pair_kernel(tau: float):
    """All prefix rows of a gram are co-located: emit every (a < b)
    doc pair sharing the gram, pruned by the size-ratio condition
    τ·|larger| ≤ |smaller| (necessary for J ≥ τ)."""

    def kernel(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        g = part.column("gram").to_numpy(zero_copy_only=False)
        d = part.column("doc_id").to_numpy(zero_copy_only=False)
        sz = part.column("size").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        gs, ds, ss = g[order], d[order], sz[order]
        brk = np.ones(len(gs), dtype=bool)
        brk[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.concatenate([starts, [len(gs)]]))
        m = counts - 1
        # pairs per group: i-th member pairs with every later member
        reps = np.repeat(m, counts) - (
            np.arange(len(gs)) - np.repeat(starts, counts))
        ai = np.repeat(np.arange(len(gs)), reps)
        total = int(reps.sum())
        excl = np.concatenate([[0], np.cumsum(reps)[:-1]]) if len(reps) \
            else np.empty(0, dtype=np.int64)
        bi = ai + 1 + (np.arange(total) - np.repeat(excl, reps))
        a, b = ds[ai], ds[bi]
        sa, sb = ss[ai], ss[bi]
        lo = np.minimum(sa, sb).astype(np.float64)
        hi = np.maximum(sa, sb).astype(np.float64)
        ok = (a != b) & (lo >= tau * hi)
        a, b = a[ok], b[ok]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.Table.from_arrays(
            [pa.array(a2, type=_I64), pa.array(b2, type=_I64)],
            schema=_PAIR_SCHEMA)
    return kernel


def exact_jaccard_join(docs: Dataset, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       tau: float = 0.6,
                       num_partitions: int | None = None) -> Dataset:
    """EXACT word-n-gram Jaccard self-join: all (a < b, n_common,
    jacc_e6) with J ≥ τ.  See module docstring for the staged plan."""
    from hyrise_generalized_dedup_ray.stages.lsh import dedupe_pairs
    from hyrise_generalized_dedup_ray.stages.verify import attach_texts

    cpus = int(ray.cluster_resources().get("CPU", 8))
    P = num_partitions or max(2, cpus)
    doc2 = docs.select_columns([id_col, text_col])

    grams = doc2.map_batches(_distinct_gram_rows(text_col, id_col, n),
                             batch_format="pyarrow", zero_copy_batch=True)
    with_df = hash_exchange(grams, lambda b: b, "gram", _df_kernel, P,
                            _G_SCHEMA)
    prefix = hash_exchange(with_df, lambda b: b, "doc_id",
                           _prefix_kernel(tau), P, _GD_SCHEMA)
    cand = hash_exchange(prefix, lambda b: b, "gram", _pair_kernel(tau),
                         P, _G_SCHEMA)
    pairs = dedupe_pairs(cand, num_partitions=P)

    if id_col != "doc_id":  # attach_texts expects docs keyed by doc_id
        doc2 = doc2.rename_columns({id_col: "doc_id"})
    if text_col != "text":
        doc2 = doc2.rename_columns({text_col: "text"})
    with_text = attach_texts(pairs, doc2, num_partitions=P)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        fa, oa = batch_shingles(ta, n)
        fb, ob = batch_shingles(tb, n)
        k = batch.num_rows
        inter = np.empty(k, dtype=np.int64)
        sa = np.empty(k, dtype=np.int64)
        sb = np.empty(k, dtype=np.int64)
        for i in range(k):  # per candidate PAIR (not per row of data)
            ua = np.unique(fa[oa[i]:oa[i + 1]])
            ub = np.unique(fb[ob[i]:ob[i + 1]])
            sa[i], sb[i] = len(ua), len(ub)
            inter[i] = np.intersect1d(ua, ub, assume_unique=True).size
        denom = (sa + sb - inter).astype(np.float64)
        denom[denom == 0] = 1.0  # both empty → J defined as 0 here
        j = inter / denom
        ok = j >= tau
        # i * 1e6 / d (NOT (i/d)*1e6): the exact double expression the
        # SQL twin computes, so FLOOR(x + 0.5) matches bit-for-bit
        e6 = np.floor(inter * 1_000_000.0 / denom + 0.5).astype(np.int64)
        return pa.Table.from_arrays(
            [batch.column("a").filter(pa.array(ok)),
             batch.column("b").filter(pa.array(ok)),
             pa.array(inter[ok], type=_I64),
             pa.array(e6[ok], type=_I64)], schema=_OUT_SCHEMA)

    return with_text.map_batches(verify, batch_format="pyarrow",
                                 zero_copy_batch=True)
