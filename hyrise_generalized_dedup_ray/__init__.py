"""hyrise_generalized_dedup_ray — a Ray-Data-native data-processing engine.

A from-scratch re-expression of the query and data-processing
capabilities of the AgileCloudLab/hyrise-generalized-dedup reference
(a Hyrise fork; see SURVEY.md) as idiomatic `ray.data.Dataset`
pipelines, plus a flagship near-duplicate detection + clustering
pipeline (MinHash/LSH + SimHash + per-partition suffix-array substring
pass + distributed union-find) over Parquet web-page tables.

Layout
------
- ``config``     — SignatureConfig / EngineConfig dataclasses (all seeds live here)
- ``sources``    — table catalog readers + deterministic fixture generators
- ``functions``  — vectorized kernels: stable hashing, shingles, MinHash,
                   SimHash, text statistics (pure NumPy / Arrow, no Ray)
- ``stages``     — Ray Data stage builders: extraction, signatures (actor
                   pool), LSH banding + salting, Jaccard verification,
                   connected components, suffix-array, relational operators
- ``pipelines``  — composed end-to-end pipelines (flagship dedup, queries)
                   and the sequential reference oracle
- ``state``      — per-partition Parquet checkpoints with lineage manifests

No module in this package calls ``ray.init()`` — the driver, bench.py, or
the test fixture owns the Ray session (Ray Data auto-inits otherwise).
"""

def _tune_process_allocator() -> None:
    """Per-process, once: keep Arrow's jemalloc pages resident for 10 s
    instead of returning them to the OS on every free.

    The engine's kernels allocate/free MBs per batch; with default
    decay every worker's freed pages are madvised away and re-faulted
    (zeroed) on the next batch — measured as ~10 cores of SYSTEM time
    at 32-way concurrency (page-fault + zone-lock contention), the
    single largest serial-ish overhead in the scaling runs.  This runs
    at package import, which happens in every Ray worker the moment it
    unpickles one of our stage functions."""
    try:
        import pyarrow as _pa

        _pa.jemalloc_set_decay_ms(10_000)
    except Exception:
        pass  # non-jemalloc build: nothing to tune


_tune_process_allocator()

from hyrise_generalized_dedup_ray.config import EngineConfig, SignatureConfig  # noqa: E402

__all__ = ["SignatureConfig", "EngineConfig"]
__version__ = "0.1.0"
