"""Persistent pipeline state: per-partition Parquet checkpoints with
lineage manifests (the engine's replacement for the reference's
in-memory-only, no-checkpoint execution — SURVEY.md §4.1)."""
