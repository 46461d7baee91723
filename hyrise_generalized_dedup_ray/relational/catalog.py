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


_TBL_TYPES = {
    "int": "int32", "long": "int64", "float": "float32",
    "double": "float64", "string": "string",
}


def load_tbl(path: str) -> Dataset:
    """Reference ``.tbl`` golden-file loader (load_table.cpp:20-47,
    resources/test_data/tbl/*): line 1 = '|'-separated column names,
    line 2 = types (``int long float double string``, optional
    ``_null`` suffix ⇒ nullable, literal ``null`` ⇒ NULL), then
    '|'-separated rows.  Unlocks running the reference's golden
    fixtures directly against this engine."""
    import pyarrow as pa
    from pyarrow import csv as pacsv

    with open(path) as f:
        names = f.readline().rstrip("\n").split("|")
        raw_types = f.readline().rstrip("\n").split("|")
        first_row = f.readline().rstrip("\n")
    # TPC-H-style rows end with a trailing '|' (dbgen output); read the
    # phantom empty field into a dummy column and drop it after
    trailing = first_row.endswith("|")
    types, nullable = [], []
    for t in raw_types:
        base, _, suffix = t.partition("_")
        types.append(_TBL_TYPES[base])
        nullable.append(suffix == "null")
    schema = {n: pa.type_for_alias(t) for n, t in zip(names, types)}
    read_names = names + ["__tbl_trail"] if trailing else names
    ds = ray.data.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=read_names,
                                       skip_rows=2),
        parse_options=pacsv.ParseOptions(delimiter="|"),
        convert_options=pacsv.ConvertOptions(
            column_types=schema, null_values=["null"],
            strings_can_be_null=True,
            include_columns=names if trailing else None),
    )
    # the reference treats the literal "null" as NULL only in _null
    # columns — restore it in non-nullable string columns
    restore = [n for n, t, nl in zip(names, types, nullable)
               if t == "string" and not nl]
    if restore:
        import pyarrow.compute as pc

        def unnull(batch: pa.Table) -> pa.Table:
            for n in restore:
                i = batch.column_names.index(n)
                batch = batch.set_column(
                    i, n, pc.fill_null(batch.column(n), "null"))
            return batch

        ds = ds.map_batches(unnull, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds


# Arrow's str(type) names, not the alias names used in _TBL_TYPES
# (str(pa.float64()) == "double", str(pa.float32()) == "float").
_TBL_NAMES = {
    "int32": "int", "int64": "long", "float": "float",
    "double": "double", "string": "string", "large_string": "string",
}


def export_tbl(ds: Dataset, path: str) -> None:
    """Write the reference ``.tbl`` golden-file format (inverse of
    :func:`load_tbl`; load_table.cpp:20-47): 2-line header (names,
    types with ``_null`` suffix for nullable columns), '|'-separated
    rows, literal ``null`` for NULLs.  Collects to the driver — golden
    files are small test fixtures by definition."""
    import pyarrow as pa

    tables = []
    for ref in ds.to_arrow_refs():
        t = ray.get(ref)
        if t.num_columns > 0:
            tables.append(t)
    tbl = pa.concat_tables(tables) if tables else None
    if tbl is None:
        raise ValueError("export_tbl: empty dataset with no schema")
    names = tbl.column_names
    types = []
    for f in tbl.schema:
        base = _TBL_NAMES.get(str(f.type))
        if base is None:
            raise ValueError(f"export_tbl: unsupported type {f.type}")
        types.append(base + ("_null" if tbl.column(f.name).null_count else ""))
    with open(path, "w") as out:
        out.write("|".join(names) + "\n")
        out.write("|".join(types) + "\n")
        cols = [tbl.column(n).to_pylist() for n in names]
        for row in zip(*cols):
            out.write("|".join(
                "null" if v is None else str(v) for v in row) + "\n")


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
        "tbl": lambda p, **kw: load_tbl(p),
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


# --------------------------------------------------------------------------
# Views + prepared plans (§2.9): the reference stores views as
# uninstantiated LQPs replayed at reference time (create_view.hpp:14,
# drop_view.hpp:13, storage_manager.hpp:36-44); prepared plans are
# parameterized LQPs (create_prepared_plan.hpp:8).  Datasets are lazy
# plans already, so a view is a *builder function* re-invoked per
# reference — semantics match: the view tracks underlying data, is not
# a materialized snapshot, and parameters bind at execution.

_VIEWS: dict = {}


def create_view(name: str, builder, or_replace: bool = False) -> None:
    """CreateView analog.  ``builder(sf_dir, **params) -> Dataset``."""
    if not or_replace and name in _VIEWS:
        raise ValueError(f"view {name!r} already exists")
    if name in TABLES:
        raise ValueError(f"{name!r} is a base table")
    _VIEWS[name] = builder


def drop_view(name: str, if_exists: bool = False) -> None:
    """DropView analog (drop_view.hpp:13)."""
    if name not in _VIEWS:
        if if_exists:
            return
        raise KeyError(f"view {name!r} does not exist")
    del _VIEWS[name]


def load_view(sf_dir: str, name: str, **params) -> Dataset:
    """Instantiate a view/prepared plan — the StorageManager lookup +
    LQP deep-copy replay (storage_manager.hpp:36-44), with ``params``
    bound like prepared-plan placeholders."""
    return _VIEWS[name](sf_dir, **params)


def list_views() -> list:
    return sorted(_VIEWS)
