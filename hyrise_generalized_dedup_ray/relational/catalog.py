"""Table catalog — name → Dataset, with pruning pushed into the read.

The reference's GetTable applies chunk/column pruning lists at the leaf
(src/lib/operators/get_table.hpp:21,27-35); our equivalent is
``read_parquet(columns=…, filter=…)``: column pruning = ``columns``,
chunk pruning = Parquet row-group predicate pushdown via a
``pyarrow.dataset`` expression.  At 100 TB this is the single most
important operator — a scan that ships unused columns loses before the
first transform runs.
"""

from __future__ import annotations

import os

import ray
from ray.data import Dataset

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    filter=None,  # pyarrow.dataset.Expression
) -> Dataset:
    """StorageManager.get_table analog (storage_manager.hpp:23-34) with
    GetTable's pruning folded in."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns, filter=filter)
