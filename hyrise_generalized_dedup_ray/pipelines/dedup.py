"""Flagship pipeline: near-duplicate detection + clustering over
Parquet web pages — the Ray-Data recast of the reference's
generalized-dedup encoders (SURVEY.md §0, §7).

        read_parquet(pages)
          → map_batches(extract)            stateless tasks (drops html)
          → map_batches(sign_batch)         tasks + per-process state cache:
                                            shingles → MinHash/SimHash/
                                            band keys/fingerprints
          → [exact edges]   groupby(text_hash)
          → [LSH pairs]     band explode → hot-band count → salted groupby
                            → candidates → join texts → exact Jaccard
          → [substr edges]  fingerprint groupby → docset dedup → join texts
                            → per-partition suffix array
          → union-find      star-contraction rounds (or driver finisher)
          → labels          (url, doc_id, cluster)

Every wide step's key is documented in the stage module; the html
binary column is dropped at extraction so no shuffle ever carries it.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.config import (
    DEFAULT_ENGINE_CONFIG,
    DEFAULT_SIGNATURE_CONFIG,
    EngineConfig,
    SignatureConfig,
)
from hyrise_generalized_dedup_ray.stages.components import connected_components
from hyrise_generalized_dedup_ray.stages.extract import extract_batch
from hyrise_generalized_dedup_ray.stages.lsh import candidate_pairs
from hyrise_generalized_dedup_ray.stages.signatures import SignerActor
from hyrise_generalized_dedup_ray.stages.suffix import substring_edges
from hyrise_generalized_dedup_ray.stages.verify import exact_dup_edges, verify_pairs


def compute_signatures(
    pages: Dataset,
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
) -> Dataset:
    """pages(url, warc_ts, html, …) → signer output (see stages.signatures)."""
    import functools

    from hyrise_generalized_dedup_ray.stages.signatures import sign_batch

    extracted = pages.map_batches(
        extract_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    # task-based with per-worker-process signer cache (signatures.py):
    # scales with whatever CPUs the session has, no actor-spawn cost
    return extracted.map_batches(
        functools.partial(sign_batch, cfg=cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=eng.signature_batch_size,
    )


def dedup_pages(
    pages: Dataset,
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
    num_partitions: int | None = None,
    force_distributed_cc: bool = False,
) -> tuple[Dataset, dict]:
    """Full flagship pipeline.  Returns ``(labels, metrics)`` where
    ``labels`` has one row per input page: (url, doc_id, cluster) with
    cluster = min doc_id of the duplicate component (own id when
    unique).

    ``num_partitions=None`` sizes the shuffle fan-out from the corpus:
    small inputs take few partitions (fixed per-partition overhead
    dominates below ~1k docs/partition), capped at 256 for the scale
    path where it would be set explicitly per cluster size."""
    metrics: dict = {}
    t0 = time.perf_counter()

    # signer output feeds four consumers — pin it once in the object
    # store instead of re-running read+extract+sign per consumer.
    signatures = compute_signatures(pages, cfg, eng).materialize()
    metrics["docs"] = signatures.count()
    metrics["t_signatures_s"] = round(time.perf_counter() - t0, 3)
    if num_partitions is None:
        num_partitions = int(min(256, max(4, metrics["docs"] // 1000)))
    metrics["num_partitions"] = num_partitions
    # joins cap their fan-out separately: every Dataset.join spawns ONE
    # AGGREGATOR ACTOR PER PARTITION (hash_shuffle.py caps at 64) — at
    # num_partitions=60 a two-join stage spawns 120 worker processes
    # whose startup dwarfs the data work at sandbox scale.  Scale with
    # the session's CPU count (on a multi-node cluster this is the
    # fleet-wide core count, which is the right fan-out order).
    cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    join_partitions = min(num_partitions, max(4, cluster_cpus))

    docs = signatures.select_columns(["doc_id", "text"])

    t1 = time.perf_counter()
    # each edge branch materializes on its own: fusing three
    # shuffle+actor-pool graphs into one union pipeline can deadlock
    # Ray's streaming executor under tight CPU budgets (the sort-based
    # map_groups samples boundaries with a blocking ray.get inside the
    # scheduling loop while actor pools hold the CPUs)
    exact = exact_dup_edges(signatures, num_partitions).materialize()
    metrics["t_exact_s"] = round(time.perf_counter() - t1, 3)
    tx = time.perf_counter()
    pairs, lsh_metrics = candidate_pairs(signatures, eng, num_partitions)
    metrics.update(lsh_metrics)
    pairs = pairs.materialize()
    metrics["n_candidate_pairs"] = pairs.count()
    metrics["t_lsh_s"] = round(time.perf_counter() - tx, 3)
    tx = time.perf_counter()
    near = verify_pairs(pairs, docs, cfg,
                        batch_size=eng.verify_batch_size,
                        num_partitions=join_partitions,
                        concurrency=eng.verify_concurrency).materialize()
    metrics["t_verify_s"] = round(time.perf_counter() - tx, 3)
    tx = time.perf_counter()
    substr = substring_edges(signatures, cfg, join_partitions).materialize()
    metrics["t_substr_s"] = round(time.perf_counter() - tx, 3)

    edges = exact.union(near).union(substr).materialize()
    metrics["edges"] = edges.count()
    metrics["t_edges_s"] = round(time.perf_counter() - t1, 3)

    t2 = time.perf_counter()
    labels, cc_metrics = connected_components(
        edges, eng, force_distributed=force_distributed_cc
    )
    metrics.update(cc_metrics)

    # every page gets a label; non-duplicates label themselves
    from hyrise_generalized_dedup_ray.util import heal_blocks

    universe = signatures.select_columns(["url", "doc_id"])
    joined = universe.join(
        heal_blocks(labels, max(2, join_partitions // 4)),
        join_type="left_outer", num_partitions=join_partitions,
        on=("doc_id",),
    )

    def fill_own(batch: pa.Table) -> pa.Table:
        cluster = pc.coalesce(batch.column("cluster"), batch.column("doc_id"))
        return batch.set_column(
            batch.column_names.index("cluster"), "cluster", cluster
        )

    result = joined.map_batches(fill_own, batch_format="pyarrow",
                                zero_copy_batch=True)
    result = result.materialize()
    metrics["t_cluster_s"] = round(time.perf_counter() - t2, 3)
    metrics["t_total_s"] = round(time.perf_counter() - t0, 3)
    return result, metrics


def dedup_pages_from_path(path: str, **kwargs) -> tuple[Dataset, dict]:
    return dedup_pages(ray.data.read_parquet(path), **kwargs)


def run_dedup_checkpointed(
    path: str,
    ckpt_dir: str,
    cfg: SignatureConfig = DEFAULT_SIGNATURE_CONFIG,
    eng: EngineConfig = DEFAULT_ENGINE_CONFIG,
    num_partitions: int = 32,
    force_distributed_cc: bool = False,
) -> tuple[Dataset, dict]:
    """Resumable flagship run: each stage persists to
    ``<ckpt_dir>/<stage>/`` with a lineage manifest
    (state/checkpoint.py); a rerun after a crash (or a config change in
    a *later* stage) resumes from the last completed checkpoint —
    downstream consumers stream from Parquet, upstream work is skipped.

    Stages: signatures → edges → labels.
    """
    from hyrise_generalized_dedup_ray.state.checkpoint import (
        checkpoint_stage,
        input_fingerprint_for_path,
    )

    metrics: dict = {}
    t0 = time.perf_counter()
    in_fp = input_fingerprint_for_path(path)
    sig_hash = cfg.signature_hash()
    eng_hash = f"{cfg.config_hash()}-{eng.config_hash()}-p{num_partitions}"

    signatures, resumed_sig = checkpoint_stage(
        "signatures", ckpt_dir, sig_hash, in_fp,
        lambda: compute_signatures(ray.data.read_parquet(path), cfg, eng),
    )
    metrics["resumed_signatures"] = resumed_sig
    metrics["docs"] = signatures.count()
    metrics["t_signatures_s"] = round(time.perf_counter() - t0, 3)

    t1 = time.perf_counter()

    def build_edges() -> Dataset:
        # sequential branch materialization — see dedup_pages comment
        docs = signatures.select_columns(["doc_id", "text"])
        exact = exact_dup_edges(signatures, num_partitions).materialize()
        pairs, lsh_metrics = candidate_pairs(signatures, eng, num_partitions)
        metrics.update(lsh_metrics)
        jp = min(num_partitions,
                 max(4, int(ray.cluster_resources().get("CPU", 8))))
        near = verify_pairs(pairs, docs, cfg,
                            batch_size=eng.verify_batch_size,
                            num_partitions=jp,
                            concurrency=eng.verify_concurrency).materialize()
        substr = substring_edges(signatures, cfg, jp).materialize()
        return exact.union(near).union(substr)

    edges, resumed_edges = checkpoint_stage(
        "edges", ckpt_dir, eng_hash, in_fp, build_edges,
    )
    metrics["resumed_edges"] = resumed_edges
    metrics["edges"] = edges.count()
    metrics["t_edges_s"] = round(time.perf_counter() - t1, 3)

    t2 = time.perf_counter()

    def build_labels() -> Dataset:
        from hyrise_generalized_dedup_ray.util import heal_blocks

        labels, cc_metrics = connected_components(
            edges, eng, force_distributed=force_distributed_cc
        )
        metrics.update(cc_metrics)
        jp = min(num_partitions,
                 max(4, int(ray.cluster_resources().get("CPU", 8))))
        universe = signatures.select_columns(["url", "doc_id"])
        joined = universe.join(
            heal_blocks(labels, max(2, jp // 4)),
            join_type="left_outer", num_partitions=jp,
            on=("doc_id",),
        )

        def fill_own(batch: pa.Table) -> pa.Table:
            cluster = pc.coalesce(batch.column("cluster"), batch.column("doc_id"))
            return batch.set_column(
                batch.column_names.index("cluster"), "cluster", cluster
            )

        return joined.map_batches(fill_own, batch_format="pyarrow",
                                  zero_copy_batch=True)

    result, resumed_labels = checkpoint_stage(
        "labels", ckpt_dir, eng_hash, in_fp, build_labels,
    )
    metrics["resumed_labels"] = resumed_labels
    metrics["t_cluster_s"] = round(time.perf_counter() - t2, 3)
    metrics["t_total_s"] = round(time.perf_counter() - t0, 3)
    return result, metrics
