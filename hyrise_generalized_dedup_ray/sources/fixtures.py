"""Deterministic synthetic web-page fixture generator (FIXTURES.md §4).

Produces the flagship dedup input table
``pages(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` plus the sidecar ``pages_truth(url, truth_cluster)``
(never shipped inside ``pages``), with planted duplicate structure:

- ~60% unique documents (truth cluster of size 1)
- ~15% exact duplicates (same text, different url; cluster sizes 2-10)
- ~15% near duplicates (≤5% token edits of a base doc; cluster sizes 2-5)
- ~5% boilerplate-heavy pages sharing one mega-template (~2/3 of each
  page's shingles) — a hot-LSH-band / skew fixture whose pairwise
  Jaccard ≈ 0.5 sits *above* the LSH S-curve but *below* the 0.6
  verification threshold, so they flood candidate generation yet are
  each their own truth cluster
- ~5% pairs sharing only a ≥50-byte verbatim substring inside otherwise
  different text — invisible to MinHash, must be caught by the
  suffix-array stage; the pair is one truth cluster

Everything is derived from a single integer seed (PCG64); no wall-clock
anywhere.  The ``html`` column is a deterministic template wrapper with
the body between ``<main>``/``</main>`` markers so that
``stages.extract.extract_text(html) == text`` **byte-identically** —
the per-row invariant from BASELINE.json's input_hint.  Generated text
uses a lowercase-word vocabulary, so it never contains markup
characters and needs no escaping.

Role mirrors the reference's golden-fixture generators
(resources/test_data/tbl/*, src/benchmarklib/tpch/tpch_table_generator.cpp):
small deterministic inputs with known expected structure.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]
_EPOCH_US = int(datetime(2024, 1, 1).timestamp() * 1_000_000)


def _make_vocab(rng: np.random.Generator, size: int = 8192) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = set()
    while len(vocab) < size:
        need = size - len(vocab)
        lens = rng.integers(3, 9, size=need)
        for ln in lens:
            vocab.add("".join(rng.choice(letters, size=ln)))
    return sorted(vocab)


def _doc_tokens(rng: np.random.Generator, vocab: list[str]) -> list[str]:
    # log-normal char-length target 200..5000 → token count at ~6.5 chars/token
    chars = float(np.clip(rng.lognormal(mean=6.9, sigma=0.7), 200, 5000))
    n_tokens = max(20, int(chars / 6.5))
    idx = rng.integers(0, len(vocab), size=n_tokens)
    return [vocab[i] for i in idx]


def _near_edit(rng: np.random.Generator, tokens: list[str], vocab: list[str]) -> list[str]:
    """≤5% token swaps/insertions/substitutions."""
    out = list(tokens)
    n_edits = max(1, int(len(out) * rng.uniform(0.01, 0.05)))
    for _ in range(n_edits):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, len(out)))
        if op == 0:  # substitute
            out[pos] = vocab[int(rng.integers(0, len(vocab)))]
        elif op == 1:  # insert
            out.insert(pos, vocab[int(rng.integers(0, len(vocab)))])
        elif len(out) > 21:  # swap adjacent
            j = min(pos + 1, len(out) - 1)
            out[pos], out[j] = out[j], out[pos]
    return out


def generate_pages(n_docs: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Return ``(pages, pages_truth)`` pyarrow tables with ``n_docs`` rows."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)

    texts: list[str] = []
    clusters: list[int] = []
    next_cluster = 0

    n_exact = int(n_docs * 0.15)
    n_near = int(n_docs * 0.15)
    n_boiler = int(n_docs * 0.05)
    n_substr = int(n_docs * 0.05) // 2 * 2  # even: pairs

    # exact-duplicate groups (sizes 2-10)
    while n_exact > 0:
        size = int(rng.integers(2, 11))
        size = min(size, max(2, n_exact))
        body = " ".join(_doc_tokens(rng, vocab))
        for _ in range(size):
            texts.append(body)
            clusters.append(next_cluster)
        next_cluster += 1
        n_exact -= size

    # near-duplicate groups (sizes 2-5): base + ε-edited variants
    while n_near > 0:
        size = int(rng.integers(2, 6))
        size = min(size, max(2, n_near))
        base = _doc_tokens(rng, vocab)
        texts.append(" ".join(base))
        clusters.append(next_cluster)
        for _ in range(size - 1):
            texts.append(" ".join(_near_edit(rng, base, vocab)))
            clusters.append(next_cluster)
        next_cluster += 1
        n_near -= size

    # boilerplate-heavy pages: one shared mega-template ≈ 2/3 of tokens,
    # plus a per-page unique third.  Pairwise shingle Jaccard ≈ 0.5 (hot
    # LSH bands, rejected by the 0.6 verification threshold), but the
    # template is a long verbatim byte run, so under the engine's
    # substring criterion (shared ≥50-byte run ⇒ duplicate) they all
    # belong to ONE truth cluster — found via the suffix-array stage.
    template = _doc_tokens(rng, vocab) * 3  # make it long
    template = template[: max(120, len(template))]
    boiler_cluster = next_cluster
    next_cluster += 1
    for _ in range(n_boiler):
        unique_part = _doc_tokens(rng, vocab)[: max(30, len(template) // 2)]
        texts.append(" ".join(template + unique_part))
        clusters.append(boiler_cluster)

    # substring pairs: two different docs sharing one ≥50-byte verbatim run
    for _ in range(n_substr // 2):
        shared = _doc_tokens(rng, vocab)
        # ensure ≥ 50 bytes but small relative to both docs (Jaccard
        # stays low): widen the slice until the joined run is long
        # enough, topping up tokens when the doc itself is short
        k = 12
        while len(" ".join(shared[:k])) < 60:
            if k >= len(shared):
                shared = shared + _doc_tokens(rng, vocab)
            k += 1
        shared = shared[:k]
        for _ in range(2):
            host_tokens = _doc_tokens(rng, vocab)
            cut = int(rng.integers(5, max(6, len(host_tokens) - 5)))
            doc = host_tokens[:cut] + shared + host_tokens[cut:]
            texts.append(" ".join(doc))
            clusters.append(next_cluster)
        next_cluster += 1

    # unique remainder
    while len(texts) < n_docs:
        texts.append(" ".join(_doc_tokens(rng, vocab)))
        clusters.append(next_cluster)
        next_cluster += 1
    texts = texts[:n_docs]
    clusters = clusters[:n_docs]

    # deterministic shuffle so cluster members aren't block-adjacent
    perm = rng.permutation(n_docs)
    texts = [texts[i] for i in perm]
    clusters = [clusters[i] for i in perm]

    # urls: Zipf-distributed hosts (drives suffix-array bucketing + skew)
    n_hosts = max(10, n_docs // 50)
    host_ranks = rng.zipf(1.3, size=n_docs) % n_hosts
    urls = [
        f"https://host{int(h):04d}.example.com/p{i:08d}"
        for i, h in enumerate(host_ranks)
    ]
    ts = pa.array(_EPOCH_US + np.arange(n_docs, dtype=np.int64) * 1_000_000,
                  type=pa.timestamp("us"))
    langs = [_LANGS[int(i)] for i in rng.integers(0, len(_LANGS), size=n_docs)]
    htmls = [_render_html(u, t, h) for u, t, h in zip(urls, texts, host_ranks)]

    pages = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": ts,
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })
    truth = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "truth_cluster": pa.array(clusters, type=pa.int64()),
    })
    return pages, truth


def _render_html(url: str, text: str, host_rank: int) -> bytes:
    host = f"host{int(host_rank):04d}.example.com"
    return (
        f'<html><head><title>{host}</title><meta charset="utf-8"></head>'
        f'<body><nav>home | about | {host}</nav>'
        f"<main>{text}</main>"
        f"<footer>&copy; 2024 {host}</footer></body></html>"
    ).encode("utf-8")


def documents_as_pages(documents) -> "ray.data.Dataset":  # noqa: F821
    """Deterministically re-shape the TPC-H-ish ``documents`` test table
    into the flagship ``pages`` schema (url, warc_ts, html, text, lang)
    from BASELINE.json's input_hint: url derives from (source, doc_id),
    warc_ts from the epoch + doc_id, html from the same template wrapper
    as :func:`generate_pages` — so ``extract_text(html) == text``
    byte-identically and the flagship pipeline runs unmodified over
    driver testdata.  Streaming map_batches; no driver materialization."""
    import pyarrow as pa  # local: keep module import-light

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        urls = [f"https://{s}.example.com/doc/{i}" for s, i in zip(sources, ids)]
        ts = pa.array([_EPOCH_US + int(i) * 1_000_000 for i in ids],
                      type=pa.timestamp("us"))
        htmls = [
            (f'<html><head><title>{s}</title></head><body>'
             f"<main>{t}</main></body></html>").encode("utf-8")
            for s, t in zip(sources, texts)
        ]
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        })

    return documents.map_batches(to_pages, batch_format="pyarrow",
                                 zero_copy_batch=True)


def pages_parquet_dir(n_docs: int, seed: int = 42, root: str = "/tmp/hgd_fixtures") -> str:
    """Write (or reuse) the pages fixture as Parquet; returns the directory.

    Memoized on disk by (n_docs, seed) — generation is deterministic so
    an existing directory is always valid.  Files: ``pages.parquet``,
    ``pages_truth.parquet``.
    """
    out = os.path.join(root, f"pages_n{n_docs}_s{seed}_sharded")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        os.makedirs(os.path.join(out, "pages"), exist_ok=True)
        pages, truth = generate_pages(n_docs, seed)
        # MANY FILES, not one: Ray reads one Parquet FILE per task
        # (override_num_blocks only re-slices the output), so a
        # single-file corpus serializes the read no matter the cluster
        # size.  64 shard files is also the realistic web-corpus layout
        # (WARC shards) the 10^12-doc design point assumes.
        n_shards = min(64, max(1, n_docs // 512))
        per = -(-n_docs // n_shards)
        for s in range(n_shards):
            part = pages.slice(s * per, per)
            if len(part):
                pq.write_table(
                    part,
                    os.path.join(out, "pages", f"part-{s:05d}.parquet"),
                    row_group_size=max(256, per // 4))
        pq.write_table(truth, os.path.join(out, "pages_truth.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return out
