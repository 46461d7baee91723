"""Text-analysis kernels for the large-scale training-data pipeline:
token counting, quality scoring, language ID, document fingerprints.

All the hot paths are vectorized: Arrow's RE2 kernels
(``pc.count_substring_regex``, ``pc.utf8_length``) for the countable
features, numpy for the scoring.  The same RE2 patterns are used by the
DuckDB oracles (`regexp_extract_all`) so counts match exactly — both
engines run RE2 semantics.

The reference has no text analytics (its only string functions are
SUBSTR/CONCAT/LIKE, function_expression.hpp:8-11); this module is part
of the engine's training-data extension surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# whitespace tokens; identical pattern in oracles
TOKEN_RE = r"\S+"
# BPE-ish pieces: letter runs, single digits, single punctuation marks —
# a cheap proxy for byte-pair tokenizer piece counts
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^\w\s]"

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ich", "ein", "mit", "zu"),
    "fr": ("le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un", "por", "con"),
    "zh": ("的", "是", "了", "我", "在", "有", "和", "不", "人", "这"),
}


def token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace-token count per string (RE2 ``\\S+``)."""
    return pc.count_substring_regex(texts, TOKEN_RE)


def bpe_piece_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """BPE-ish piece count per string."""
    return pc.count_substring_regex(texts, BPE_RE)


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document quality features, one vectorized pass:
    n_chars, n_tokens, n_bpe_pieces, n_punct, mean_token_len.

    ``mean_token_len`` = non-whitespace chars / tokens (0 for empty)."""
    t = batch.column(text_col)
    chars = pc.cast(pc.utf8_length(t), pa.int64())
    toks = pc.cast(token_counts(t), pa.int64())
    bpe = pc.cast(bpe_piece_counts(t), pa.int64())
    punct = pc.cast(pc.count_substring_regex(t, PUNCT_RE), pa.int64())
    ws = pc.cast(pc.count_substring_regex(t, r"\s"), pa.int64())
    nonws = pc.subtract(chars, ws)
    toks_np = toks.to_numpy(zero_copy_only=False).astype(np.float64)
    nonws_np = nonws.to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mtl = np.where(toks_np > 0, nonws_np / toks_np, 0.0)
    return pa.table({
        "n_chars": chars, "n_tokens": toks, "n_bpe_pieces": bpe,
        "n_punct": punct, "mean_token_len": pa.array(mtl, type=pa.float64()),
    })


def language_scores(texts: list[str] | pa.Array) -> tuple[list[str], np.ndarray]:
    """Stopword-hit language ID: per text, the language whose stopword
    list matches the most tokens (ties → lexicographic language code;
    zero hits → 'und').  Returns (pred_langs, hit_count_matrix).

    Fully vectorized: one lowercase + whitespace-split pass (Arrow
    kernels), then per-language ``pc.is_in`` over the flattened token
    array with per-document sums via ``np.add.reduceat`` — no per-token
    Python loop (identical results to the naive
    ``for w in t.lower().split()`` definition)."""
    langs = sorted(STOPWORDS)
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(texts), type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    toks = pc.utf8_split_whitespace(pc.utf8_lower(arr))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    hits = np.zeros((n, len(langs)), dtype=np.int64)
    nonempty = offsets[:-1] < offsets[1:]
    for j, code in enumerate(langs):
        m = pc.is_in(flat, value_set=pa.array(list(STOPWORDS[code])))
        mi = pc.cast(m, pa.int64()).to_numpy(zero_copy_only=False)
        if len(mi):
            sums = np.add.reduceat(mi, np.minimum(offsets[:-1], len(mi) - 1))
            hits[:, j] = np.where(nonempty, sums, 0)
    best = hits.argmax(axis=1)
    any_hit = hits.max(axis=1) > 0
    preds = [langs[int(b)] if h else "und" for b, h in zip(best, any_hit)]
    return preds, hits


def repetition_features(texts, ns=(2, 3)) -> dict[str, np.ndarray]:
    """Intra-document repetition (the Gopher-style quality rule,
    Rae et al. 2021 §A1.1 — public): per doc and per n in ``ns``,
    total word-n-grams, DISTINCT word-n-grams, and the duplicate
    fraction as ``floor((total-distinct)*1e6/total + 0.5)`` (0 when the
    doc has no n-grams) — the exact integer/double expression a SQL
    twin computes.  Vectorized: one shingle pass per n, per-doc
    distinct via lexsort boundaries; n-gram identity is the 64-bit
    polynomial token hash (collision odds ~1e-13 per doc, same
    determinism note as stages/setsim.py)."""
    from hyrise_generalized_dedup_ray.functions.text import distinct_shingles

    out: dict[str, np.ndarray] = {}
    texts = list(texts)
    for n in ns:
        _, _, distinct, total = distinct_shingles(texts, n)
        denom = np.maximum(total, 1).astype(np.float64)
        frac = np.floor((total - distinct) * 1_000_000.0 / denom + 0.5)
        out[f"n_{n}grams"] = total.astype(np.int64)
        out[f"n_distinct_{n}grams"] = distinct.astype(np.int64)
        out[f"dup_{n}gram_frac_e6"] = np.where(total > 0, frac, 0.0) \
            .astype(np.int64)
    return out
