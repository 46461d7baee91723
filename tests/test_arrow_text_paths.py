"""Bit-identity of the zero-copy Arrow text paths vs the Python-list
reference forms (round-4: the signer/verify/extract hot paths moved
off ``to_pylist`` onto Arrow-buffer CSR kernels — these tests pin that
the hash values did NOT move)."""

import numpy as np
import pyarrow as pa
import pytest

from hyrise_generalized_dedup_ray.functions.substr import (
    batch_winnow_fingerprints,
    winnow_fingerprints_csr,
)
from hyrise_generalized_dedup_ray.functions.text import (
    batch_shingles,
    batch_shingles_arrow,
    tokenize_batch,
    tokenize_csr,
    utf8_csr,
)
from hyrise_generalized_dedup_ray.stages.extract import (
    extract_batch,
    extract_text_from_html,
)

CASES = [
    [],
    [""],
    ["hello world", "", "  leading and trailing  ", "one"],
    ["a", "b", "c"],                       # adjacent 1-byte docs
    ["abc", "def"],                        # non-ws doc boundary must split
    ["tab\tnewline\nmix", " \t\n ", "x y"],
    ["unicode héllo wörld ∀x∈ℝ", "emoji 😀 test"],
    ["word " * 1000, "tiny"],
    ["ends-nonws", "starts-nonws more"],
    [f"doc {i} " + (f"tok{i} " * (i % 37)) for i in range(2000)],
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_tokenize_and_shingle_parity(i):
    texts = CASES[i]
    col = pa.array(texts, type=pa.string())
    f1, o1 = tokenize_batch(texts)
    f2, o2 = tokenize_csr(*utf8_csr(col))
    assert np.array_equal(o1, o2)
    assert np.array_equal(f1, f2)
    s1 = batch_shingles(texts, 5)
    s2 = batch_shingles_arrow(col, 5)
    assert np.array_equal(s1[0], s2[0])
    assert np.array_equal(s1[1], s2[1])


def test_winnow_csr_parity():
    texts = [t for case in CASES for t in case][:300]
    col = pa.array(texts, type=pa.string())
    w1 = batch_winnow_fingerprints(texts)
    w2 = winnow_fingerprints_csr(*utf8_csr(col))
    assert len(w1) == len(w2)
    for a, b in zip(w1, w2):
        assert np.array_equal(a, b)


def test_utf8_csr_nulls_sliced_large():
    col = pa.array(["aa bb", None, "cc"], type=pa.string())
    f, o = utf8_csr(col)
    assert o.tolist() == [0, 5, 5, 7]           # null reads as empty
    col2 = pa.array(["xx", "aa bb", "cc dd"]).slice(1, 2)
    f1, o1 = tokenize_csr(*utf8_csr(col2))
    f0, o0 = tokenize_batch(["aa bb", "cc dd"])
    assert np.array_equal(f0, f1) and np.array_equal(o0, o1)
    col3 = pa.array(["x y", "z"], type=pa.large_string())
    f1, o1 = tokenize_csr(*utf8_csr(col3))
    f0, o0 = tokenize_batch(["x y", "z"])
    assert np.array_equal(f0, f1) and np.array_equal(o0, o1)


def test_extract_batch_vectorized_parity():
    htmls = [
        b"<html><main>hello world</main></html>",
        b"no markers here",
        b"<main>unclosed",
        b"</main><main>close-before-open</main>tail",   # re-search path
        b"<main></main>",
        b"prefix<main>unicode h\xc3\xa9llo</main>suffix",
        b"",
        b"</main>only close",
        b"<main>a</main><main>b</main>",                 # first body wins
    ]
    tab = pa.table({
        "url": [f"u{i}" for i in range(len(htmls))],
        "html": pa.array(htmls, type=pa.binary()),
        "text": ["stale"] * len(htmls),
    })
    out = extract_batch(tab)
    assert out.column("text").to_pylist() == [
        extract_text_from_html(h) for h in htmls]
    assert out.column_names == ["url", "text"]
    out2 = extract_batch(tab.slice(2, 5))
    assert out2.column("text").to_pylist() == [
        extract_text_from_html(h) for h in htmls[2:7]]
