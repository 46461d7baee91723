"""Distributed star-contraction vs driver union-find parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from hyrise_generalized_dedup_ray.config import EngineConfig
from hyrise_generalized_dedup_ray.functions.pairs import UnionFind
from hyrise_generalized_dedup_ray.stages.components import connected_components


def random_edges(n_nodes: int, n_edges: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    return pa.table({"a": pa.array(lo), "b": pa.array(hi)})


def expected_labels(tbl: pa.Table) -> dict[int, int]:
    uf = UnionFind()
    for x, y in zip(tbl["a"].to_pylist(), tbl["b"].to_pylist()):
        uf.union(x, y)
    nodes = set(tbl["a"].to_pylist()) | set(tbl["b"].to_pylist())
    return uf.labels(nodes)


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 50, 40), (2, 200, 150), (3, 1000, 900)])
def test_star_contraction_matches_union_find(ray_session, seed, n_nodes, n_edges):
    tbl = random_edges(n_nodes, n_edges, seed)
    edges = ray.data.from_arrow(tbl)
    labels_ds, metrics = connected_components(
        edges, EngineConfig(), force_distributed=True
    )
    assert metrics["cc_mode"] == "star_contraction"
    got = dict(zip(*[labels_ds.to_pandas()[c] for c in ("doc_id", "cluster")]))
    want = expected_labels(tbl)
    assert got == want


def test_long_chain_converges(ray_session):
    # worst case for naive propagation: a path graph 0-1-2-...-99
    n = 100
    tbl = pa.table({
        "a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "b": pa.array(np.arange(1, n, dtype=np.int64)),
    })
    labels_ds, metrics = connected_components(
        ray.data.from_arrow(tbl), EngineConfig(), force_distributed=True
    )
    df = labels_ds.to_pandas()
    assert set(df["cluster"]) == {0}
    assert len(df) == n
    assert metrics["cc_rounds"] <= 12  # log-round convergence


def test_driver_path_used_for_small_inputs(ray_session):
    tbl = random_edges(20, 15, 9)
    labels_ds, metrics = connected_components(
        ray.data.from_arrow(tbl), EngineConfig()
    )
    assert metrics["cc_mode"] == "driver_union_find"
    got = dict(zip(*[labels_ds.to_pandas()[c] for c in ("doc_id", "cluster")]))
    assert got == expected_labels(tbl)
