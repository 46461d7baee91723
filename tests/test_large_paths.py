"""Scale-path parity: the non-broadcast fallbacks (hash-join text
attach in verify/suffix/exact, Dataset-labels join in _attach_labels)
must produce the SAME results as the broadcast paths that small inputs
take.  At 10^12 docs the fallbacks ARE the pipeline, so they get the
same oracle-parity gate — thresholds are monkeypatched to 0 to force
them on the 500-page planted fixture.
"""

from collections import defaultdict

import pytest
import ray.data

from hyrise_generalized_dedup_ray.pipelines.dedup import dedup_pages
from hyrise_generalized_dedup_ray.pipelines.reference import reference_dedup
from hyrise_generalized_dedup_ray.stages.signatures import doc_ids_for_urls


def _labels_of(df):
    return dict(zip(df["doc_id"], df["cluster"]))


@pytest.fixture(scope="module")
def oracle_labels(pages_500):
    pages, _ = pages_500
    ids = doc_ids_for_urls(pages["url"].to_pylist())
    return reference_dedup(list(ids), pages["text"].to_pylist()).labels


def test_large_fallback_paths_match_oracle(ray_session, pages_500,
                                           oracle_labels, monkeypatch):
    """Force every size-guarded stage onto its large-corpus path."""
    import hyrise_generalized_dedup_ray.pipelines.dedup as D
    import hyrise_generalized_dedup_ray.stages.suffix as S
    import hyrise_generalized_dedup_ray.stages.verify as V

    monkeypatch.setattr(V, "BROADCAST_PAIRS_MAX", 0)
    monkeypatch.setattr(S, "BROADCAST_GROUPS_MAX", 0)
    monkeypatch.setattr(D, "BROADCAST_LABELS_MAX", 0)

    pages, _ = pages_500
    ds = ray.data.from_arrow(pages).repartition(8)
    labels, metrics = dedup_pages(ds, num_partitions=4)
    got = _labels_of(labels.to_pandas())
    assert got == oracle_labels


def test_distributed_cc_path_matches_oracle(ray_session, pages_500,
                                            oracle_labels):
    """Star-contraction (the >small_cc_threshold path) end-to-end."""
    pages, _ = pages_500
    ds = ray.data.from_arrow(pages).repartition(8)
    labels, metrics = dedup_pages(ds, num_partitions=4,
                                  force_distributed_cc=True)
    assert metrics["cc_mode"] == "star_contraction"
    got = _labels_of(labels.to_pandas())
    assert got == oracle_labels


def test_prune_preserves_connectivity_across_chunked_docsets(ray_session):
    """Subset pruning + >SUBSTR_MAX_GROUP chunked docsets together:
    a 150-doc boilerplate cluster (one docset split into anchored
    chunks) plus subset docsets nested inside it must still produce
    ONE substring component, and pruning must actually fire."""
    import numpy as np
    import pyarrow as pa
    import ray

    from hyrise_generalized_dedup_ray.config import DEFAULT_SIGNATURE_CONFIG
    from hyrise_generalized_dedup_ray.pipelines.docs import sign_docs
    from hyrise_generalized_dedup_ray.stages.suffix import (
        prune_subset_chunks,
        fingerprint_groups,
        substring_edges,
    )

    # 150 docs sharing one 300-byte run (pad makes each doc unique);
    # docs 0-1 additionally share a second long run (a nested docset)
    shared = ("the boilerplate navigation header that every page of "
              "this website repeats verbatim on top of its content "
              "area including menu links footer notices and legal "
              "disclaimers for all visitors everywhere " * 2)
    extra = ("an additional shared paragraph only the first two pages "
             "carry in their body text area " * 2)
    texts, ids = [], []
    for i in range(150):
        t = shared + f" unique trailer {i} " + "x" * (i % 7)
        if i < 2:
            t += extra
        texts.append(t)
        ids.append(1000 + i)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    sigs = sign_docs(docs).materialize()
    gt = pa.concat_tables(ray.get(
        fingerprint_groups(sigs, 8).to_arrow_refs()))
    pruned = prune_subset_chunks(gt)
    assert pruned.num_rows < gt.num_rows  # subsets existed and died
    edges = substring_edges(sigs, DEFAULT_SIGNATURE_CONFIG,
                            num_partitions=8)
    a = edges.to_pandas()
    # union-find over the edges: everything must join one component
    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a["a"], a["b"]):
        parent[find(int(x))] = find(int(y))
    roots = {find(d) for d in ids}
    assert len(roots) == 1, f"{len(roots)} components"
