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

import numpy as np
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
    # read-side parallelism comes from the input layout: one read task
    # per row-group bundle, so a many-row-group / many-file corpus
    # (the only kind at scale) spreads extract+sign across the cluster
    # with no extra pass.  (A repartition here was tried and removed:
    # it cost more than it parallelized — see util.spread_blocks for
    # the single-row-group fallback.)
    # task-based with per-worker-process signer cache (signatures.py):
    # scales with whatever CPUs the session has, no actor-spawn cost
    return extracted.map_batches(
        functools.partial(sign_batch, cfg=cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=eng.signature_batch_size,
    )


def _edge_branch_builders(
    signatures: Dataset,
    cfg: SignatureConfig,
    eng: EngineConfig,
    num_partitions: int,
    join_partitions: int,
    metrics: dict,
) -> dict:
    """The three edge-branch thunks (exact, LSH→verify, substring),
    each returning its materialized edge Dataset.  Exposed separately
    so the checkpointed runner can persist each branch under its own
    lineage manifest (a crash mid-substring resumes with the exact and
    near branches skipped) while the in-memory runner unions them."""
    # the fused verify exchange melts doc_id/text straight out of the
    # materialized signer blocks — no select_columns projection pass
    docs = signatures

    # exchange width follows the CLUSTER (stages/exchange: shard count
    # is a task/object-count trade, not a data-layout property) — the
    # docs-derived `num_partitions` only caps it for tiny corpora
    cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    xp = min(num_partitions, max(4, 2 * cluster_cpus))

    def run_exact() -> Dataset:
        t = time.perf_counter()
        ds = exact_dup_edges(signatures, xp).materialize()
        metrics["t_exact_s"] = round(time.perf_counter() - t, 3)
        return ds

    def run_lsh_verify() -> Dataset:
        t = time.perf_counter()
        # dedupe=True: the distributed pair dedup runs as one cheap
        # exchange over 16-byte rows, so the driver-side collect in the
        # verifier's broadcast path only ever sees unique pairs (the
        # raw LSH pair stream is ~10× larger on boilerplate corpora)
        pairs, lsh_metrics = candidate_pairs(signatures, eng, xp,
                                             dedupe=True)
        pairs = pairs.materialize()
        metrics.update(lsh_metrics)
        metrics["n_candidate_rows"] = pairs.count()
        metrics["t_lsh_s"] = round(time.perf_counter() - t, 3)
        t2 = time.perf_counter()
        near = verify_pairs(pairs, docs, cfg,
                            batch_size=eng.verify_batch_size,
                            num_partitions=join_partitions,
                            pre_deduped=True).materialize()
        metrics["t_verify_s"] = round(time.perf_counter() - t2, 3)
        return near

    def run_substr() -> Dataset:
        t = time.perf_counter()
        ds = substring_edges(signatures, cfg, join_partitions).materialize()
        metrics["t_substr_s"] = round(time.perf_counter() - t, 3)
        return ds

    return {"exact": run_exact, "near": run_lsh_verify,
            "substr": run_substr}


def _edge_branches(
    signatures: Dataset,
    cfg: SignatureConfig,
    eng: EngineConfig,
    num_partitions: int,
    join_partitions: int,
    metrics: dict,
) -> Dataset:
    """Run the three edge branches CONCURRENTLY on driver threads and
    return the union of their materialized edge Datasets.

    Each branch is its own Dataset execution (own StreamingExecutor);
    running them from separate threads lets Ray interleave their tasks,
    so one branch's narrow tail (small groupbys, join aggregator
    spawns) overlaps another branch's wide middle instead of leaving
    most of the cluster idle between sequential ``materialize()``
    calls — this was the single largest scaling-efficiency loss in the
    sequential revision (fusing the graphs into one union pipeline is
    NOT equivalent: the sort-based map_groups stages block on boundary
    sampling inside one executor's scheduling loop and can deadlock it
    under tight CPU budgets; three independent executors cannot)."""
    from concurrent.futures import ThreadPoolExecutor

    builders = _edge_branch_builders(signatures, cfg, eng,
                                     num_partitions, join_partitions,
                                     metrics)
    with ThreadPoolExecutor(max_workers=3) as pool:
        futures = [pool.submit(b) for b in builders.values()]
        exact, near, substr = [f.result() for f in futures]
    return exact.union(near).union(substr)


# labels tables up to this many rows (≈16 B/row of index state, one
# shared-memory copy per node) are broadcast; larger ones take the
# left-outer hash join — the same size-guarded strategy selection as
# stages/verify.attach_texts.
BROADCAST_LABELS_MAX = 50_000_000


@ray.remote
def _build_label_index(refs: list) -> dict:
    """(doc_id, cluster) blocks → sorted lookup arrays, concatenated
    inside a task so the driver never materializes the labels."""
    tables = [t for t in ray.get(list(refs)) if t.num_columns > 0]
    lt = pa.concat_tables(tables) if tables else pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "cluster": pa.array([], type=pa.int64())})
    ids = lt.column("doc_id").to_numpy(zero_copy_only=False)
    cl = lt.column("cluster").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    return {"ids": ids[order], "cl": cl[order]}


def _attach_labels(universe: Dataset, labels: Dataset,
                   join_partitions: int) -> Dataset:
    """(url, doc_id) × (doc_id, cluster) → (url, doc_id, cluster) with
    cluster = own doc_id when unlabeled (non-duplicates)."""
    from hyrise_generalized_dedup_ray.stages.exchange import exchange_join

    # pin: count + the chosen strategy both consume `labels`
    labels = labels.materialize()
    if labels.count() <= BROADCAST_LABELS_MAX:
        # index built INSIDE a task (embed_dedup._build_corpus
        # pattern): the driver holds only the object ref, never the
        # label table — at 256 nodes the driver NIC stays out of it
        ref = _build_label_index.remote(list(labels.to_arrow_refs()))

        def attach(batch: pa.Table) -> pa.Table:
            st = ray.get(ref)
            d = batch.column("doc_id").to_numpy(zero_copy_only=False)
            if len(st["ids"]):
                pos = np.searchsorted(st["ids"], d)
                pos_c = np.minimum(pos, len(st["ids"]) - 1)
                found = st["ids"][pos_c] == d
                cluster = np.where(found, st["cl"][pos_c], d)
            else:
                cluster = d
            return batch.append_column(
                "cluster", pa.array(cluster, type=pa.int64()))

        return universe.map_batches(attach, batch_format="pyarrow",
                                    zero_copy_batch=True)

    joined = exchange_join(
        universe, labels, on=["doc_id"], how="left_outer",
        num_partitions=join_partitions,
    )

    def fill_own(batch: pa.Table) -> pa.Table:
        cluster = pc.coalesce(batch.column("cluster"), batch.column("doc_id"))
        return batch.set_column(
            batch.column_names.index("cluster"), "cluster", cluster
        )

    return joined.map_batches(fill_own, batch_format="pyarrow",
                              zero_copy_batch=True)


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
    from hyrise_generalized_dedup_ray.util import tune_data_context

    tune_data_context()
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
    # AGGREGATOR ACTOR PER PARTITION with fixed spawn + concat costs,
    # so width only pays off once each partition carries real payload
    # (~32 MB+).  Width follows the cluster CPU count up to
    # eng.join_partition_cap (raise the cap for real multi-node
    # payloads; the formula keeps scaling with fleet cores).
    cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    join_partitions = min(num_partitions,
                          max(4, min(eng.join_partition_cap,
                                     cluster_cpus // 2)))

    t1 = time.perf_counter()
    edges = _edge_branches(signatures, cfg, eng, num_partitions,
                           join_partitions, metrics).materialize()
    metrics["edges"] = edges.count()
    metrics["t_edges_s"] = round(time.perf_counter() - t1, 3)

    t2 = time.perf_counter()
    labels, cc_metrics = connected_components(
        edges, eng, force_distributed=force_distributed_cc
    )
    metrics.update(cc_metrics)

    # every page gets a label; non-duplicates label themselves
    universe = signatures.select_columns(["url", "doc_id"])
    result = _attach_labels(universe, labels, join_partitions).materialize()
    metrics["t_cluster_s"] = round(time.perf_counter() - t2, 3)
    metrics["t_total_s"] = round(time.perf_counter() - t0, 3)

    # feed the meta_exec/meta_log virtual tables (reference analog:
    # operators report runtimes to meta_exec_table.hpp:13)
    from hyrise_generalized_dedup_ray.state import execlog

    for k, v in metrics.items():
        if k.startswith("t_") and k.endswith("_s"):
            execlog.record_exec(f"dedup.{k[2:-2]}", v,
                                metrics.get("docs", -1))
    execlog.log(f"dedup_pages: {metrics['docs']} docs, "
                f"{metrics['edges']} edges, {metrics['t_total_s']}s")
    return result, metrics


def dedup_pages_from_path(path: str, **kwargs) -> tuple[Dataset, dict]:
    return dedup_pages(ray.data.read_parquet(path), **kwargs)


def _input_parquet_files(path: str) -> list[str]:
    """Parquet files of an input path, sorted — the per-partition
    checkpoint unit of the signatures stage.  (At fleet scale a
    partition would be a row-group bundle; file granularity matches
    the resumable-output contract of every writer in this engine —
    one directory of part files per stage.)"""
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet"))
    return [path]


def _sign_file_part(files: list[str], i: int, *, cfg: SignatureConfig,
                    eng: EngineConfig):
    """Extract + sign ONE input parquet file — the ``build_part`` of
    the signatures stage's per-partition checkpoint.  Batch-for-batch
    identical to :func:`compute_signatures` over the same file (same
    extract/sign kernels, same batch size)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hyrise_generalized_dedup_ray.stages.signatures import sign_batch

    pf = pq.ParquetFile(files[i])
    out = []
    for rb in pf.iter_batches(batch_size=eng.signature_batch_size):
        t = extract_batch(pa.Table.from_batches([rb]))
        out.append(sign_batch(t, cfg=cfg))
    if not out:
        empty = pf.schema_arrow.empty_table()
        return sign_batch(extract_batch(empty), cfg=cfg)
    return pa.concat_tables(out)


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
    import functools

    from hyrise_generalized_dedup_ray.state.checkpoint import (
        checkpoint_partitioned,
        checkpoint_stage,
        input_fingerprint_for_path,
    )
    from hyrise_generalized_dedup_ray.util import tune_data_context

    tune_data_context()
    metrics: dict = {}
    t0 = time.perf_counter()
    in_fp = input_fingerprint_for_path(path)
    sig_hash = cfg.signature_hash()
    eng_hash = f"{cfg.config_hash()}-{eng.config_hash()}-p{num_partitions}"

    # the signer is embarrassingly parallel over input files, so it
    # checkpoints per PARTITION (one part per input parquet file): a
    # kill at 90% recomputes only the missing 10% on resume
    sig_files = _input_parquet_files(path)
    signatures, sig_info = checkpoint_partitioned(
        "signatures", ckpt_dir, sig_hash, in_fp, len(sig_files),
        functools.partial(_sign_file_part, sig_files, cfg=cfg, eng=eng),
    )
    resumed_sig = sig_info["resumed"]
    metrics["sig_parts_skipped"] = sig_info["parts_skipped"]
    metrics["sig_parts_built"] = sig_info["parts_built"]
    # pin in the object store: the edge branches' exchanges each pull
    # the signer blocks by ref — unmaterialized, every branch would
    # re-read the checkpoint parquet from storage
    signatures = signatures.materialize()
    metrics["resumed_signatures"] = resumed_sig
    metrics["docs"] = signatures.count()
    metrics["t_signatures_s"] = round(time.perf_counter() - t0, 3)

    t1 = time.perf_counter()

    # each edge branch (exact / LSH→verify / substring) checkpoints
    # under its OWN lineage manifest, still overlapped on driver
    # threads: a crash mid-substring (the longest branch at scale)
    # resumes with the exact and near branches skipped
    from concurrent.futures import ThreadPoolExecutor

    jp = min(num_partitions,
             max(4, min(eng.join_partition_cap,
                        int(ray.cluster_resources().get("CPU", 8)) // 2)))
    builders = _edge_branch_builders(signatures, cfg, eng,
                                     num_partitions, jp, metrics)

    def run_branch(name: str, build) -> tuple[Dataset, bool]:
        return checkpoint_stage(f"edges_{name}", ckpt_dir, eng_hash,
                                in_fp, build)

    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        futs = {n: pool.submit(run_branch, n, b)
                for n, b in builders.items()}
        branch_out = {n: f.result() for n, f in futs.items()}
    edges = functools.reduce(lambda a, b: a.union(b),
                             [ds for ds, _ in branch_out.values()])
    metrics["resumed_edges"] = all(r for _, r in branch_out.values())
    metrics["edge_branches_resumed"] = {n: r for n, (_, r)
                                        in branch_out.items()}
    metrics["edges"] = edges.count()
    metrics["t_edges_s"] = round(time.perf_counter() - t1, 3)

    t2 = time.perf_counter()

    def build_labels() -> Dataset:
        labels, cc_metrics = connected_components(
            edges, eng, force_distributed=force_distributed_cc
        )
        metrics.update(cc_metrics)
        jp = min(num_partitions,
                 max(4, min(eng.join_partition_cap,
                            int(ray.cluster_resources().get("CPU", 8)) // 2)))
        universe = signatures.select_columns(["url", "doc_id"])
        return _attach_labels(universe, labels, jp)

    result, resumed_labels = checkpoint_stage(
        "labels", ckpt_dir, eng_hash, in_fp, build_labels,
    )
    metrics["resumed_labels"] = resumed_labels
    metrics["t_cluster_s"] = round(time.perf_counter() - t2, 3)
    metrics["t_total_s"] = round(time.perf_counter() - t0, 3)
    return result, metrics
