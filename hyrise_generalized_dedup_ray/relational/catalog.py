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


def import_file(path: str, file_type: str = "auto", **kwargs) -> Dataset:
    """Import operator (import.hpp:21): load file → Dataset, format by
    extension like the reference's FileType::Auto (file_type.hpp:7).
    Formats: parquet, csv (RFC-4180 via Arrow's parallel reader — the
    reference's CsvParser, csv_parser.hpp:21-34), json lines."""
    if file_type == "auto":
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        file_type = {"pq": "parquet"}.get(ext, ext) or "parquet"
    readers = {
        "parquet": ray.data.read_parquet,
        "csv": ray.data.read_csv,
        "json": ray.data.read_json,
    }
    if file_type not in readers:
        raise ValueError(f"unsupported import type: {file_type}")
    return readers[file_type](path, **kwargs)


def export_table(ds: Dataset, path: str, file_type: str = "parquet",
                 **kwargs) -> None:
    """Export operator (export.hpp:23): Dataset → files.  Parquet is
    the engine's binary format (replaces the reference's private binary
    writer, binary_writer.cpp); CSV matches CsvWriter."""
    writers = {
        "parquet": ds.write_parquet,
        "csv": ds.write_csv,
        "json": ds.write_json,
    }
    if file_type not in writers:
        raise ValueError(f"unsupported export type: {file_type}")
    writers[file_type](path, **kwargs)
