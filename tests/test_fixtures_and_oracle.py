"""Fixture generator determinism + sequential oracle vs planted truth."""

from collections import defaultdict

import numpy as np
import pytest

from hyrise_generalized_dedup_ray.pipelines.reference import reference_dedup
from hyrise_generalized_dedup_ray.sources.fixtures import generate_pages
from hyrise_generalized_dedup_ray.stages.extract import extract_text_from_html


def pairs_from_labels(labels: dict[int, int]) -> set:
    clusters = defaultdict(list)
    for d, c in labels.items():
        clusters[c].append(d)
    out = set()
    for m in clusters.values():
        m.sort()
        out.update((m[i], m[j]) for i in range(len(m)) for j in range(i + 1, len(m)))
    return out


def test_generator_deterministic(pages_500):
    pages, truth = pages_500
    pages2, truth2 = generate_pages(500, seed=42)
    assert pages.equals(pages2)
    assert truth.equals(truth2)


def test_generator_schema(pages_500):
    pages, truth = pages_500
    import pyarrow as pa

    assert pages.schema.field("url").type == pa.string()
    assert pages.schema.field("warc_ts").type == pa.timestamp("us")
    assert pages.schema.field("html").type == pa.binary()
    assert pages.schema.field("text").type == pa.string()
    assert pages.schema.field("lang").type == pa.string()
    assert pages.num_rows == 500
    assert len(set(pages["url"].to_pylist())) == 500  # urls unique


def test_extraction_byte_identical(pages_500):
    """input_hint invariant: extract(html) == text, byte for byte."""
    pages, _ = pages_500
    for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text_from_html(html) == text


def test_oracle_matches_planted_truth(pages_500):
    pages, truth = pages_500
    texts = pages["text"].to_pylist()
    res = reference_dedup(list(range(len(texts))), texts)

    tc = truth["truth_cluster"].to_pylist()
    truth_labels = {i: c for i, c in enumerate(tc)}
    truth_pairs = pairs_from_labels(truth_labels)
    found = res.dup_pairs
    tp = len(truth_pairs & found)
    recall = tp / max(1, len(truth_pairs))
    precision = tp / max(1, len(found))
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.99, f"precision {precision}"


def test_oracle_deterministic(pages_500):
    pages, _ = pages_500
    texts = pages["text"].to_pylist()[:200]
    r1 = reference_dedup(list(range(200)), texts)
    r2 = reference_dedup(list(range(200)), texts)
    assert r1.labels == r2.labels
