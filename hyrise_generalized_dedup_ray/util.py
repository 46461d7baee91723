"""Small engine-wide utilities."""

from __future__ import annotations

from ray.data import Dataset


def heal_blocks(ds: Dataset, num_partitions: int = 8) -> Dataset:
    """Workaround for a Ray Data quirk: hash-shuffle groupby/aggregate
    emits ZERO-COLUMN empty blocks for partitions that received no rows,
    and a downstream ``Dataset.join`` then fails its key-field lookup
    ("No match or multiple matches for key field …") when it
    concatenates them.  ``repartition`` rebuilds blocks under a unified
    schema, dropping the schema-less empties.  Apply to any
    groupby-derived Dataset that feeds a join."""
    return ds.repartition(num_partitions)
