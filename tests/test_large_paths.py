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
