"""Write path: CREATE/DROP TABLE, INSERT, DELETE, UPDATE (§2.9).

The reference's read-write operators (insert.cpp, delete.cpp,
update.cpp — Update IS delete+insert there, update.cpp:23-27 — plus
maintenance/create_table.cpp, drop_table.cpp) sit on row-level MVCC
(validate.cpp: begin/end-commit-id visibility).  Row-level MVCC does
not survive the move to immutable-object distributed storage; the
idiomatic Ray/lakehouse recast is SNAPSHOT VERSIONING:

- a mutable table is a directory of immutable parquet data files plus
  numbered manifest files ``v{N}.manifest.json`` listing the files
  (and row count) that make up version N;
- ``_current`` names the committed version and is replaced atomically
  (write-temp + ``os.replace``), so a reader holding version N streams
  a consistent snapshot forever — exactly what Validate gives a
  transaction, at version rather than row granularity;
- INSERT appends new data files and a manifest that REUSES every
  existing file (no copying — append is O(new data));
- DELETE / UPDATE stream the table through filter / column-assignment
  transforms into new files and commit a manifest of only those
  (document: at 100 TB you'd hash-partition the data files on a key
  and rewrite only the partitions whose min/max stats admit matches —
  the manifest layout already supports per-file replacement).

Readers never lock writers and vice versa; concurrent writers are NOT
arbitrated (last ``_current`` wins) — the reference's conflict story
(commit-id CAS) needs a transaction service that is out of scope per
SURVEY.md §3.3.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray
from ray.data import Dataset

from hyrise_generalized_dedup_ray.relational.operators import table_scan

_CURRENT = "_current"


def _table_dir(root: str, name: str) -> str:
    return os.path.join(root, name)


def _commit(tdir: str, version: int, files: list[str], rows: int) -> None:
    manifest = {"version": version, "files": files, "rows": rows,
                "committed_at": time.time()}
    mpath = os.path.join(tdir, f"v{version}.manifest.json")
    tmp = mpath + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    cur_tmp = os.path.join(tdir, f"{_CURRENT}.tmp.{uuid.uuid4().hex}")
    with open(cur_tmp, "w") as f:
        f.write(str(version))
    os.replace(cur_tmp, os.path.join(tdir, _CURRENT))


def current_version(root: str, name: str) -> int:
    with open(os.path.join(_table_dir(root, name), _CURRENT)) as f:
        return int(f.read().strip())


def _manifest(root: str, name: str, version: int | None = None) -> dict:
    v = current_version(root, name) if version is None else version
    with open(os.path.join(_table_dir(root, name),
                           f"v{v}.manifest.json")) as f:
        return json.load(f)


def _write_data_files(tdir: str, ds: Dataset) -> tuple[list[str], int]:
    """Stream ``ds`` into new immutable data files; returns (relative
    paths, row count).  One file per block — partitioned output, so a
    re-run never clobbers committed files (fresh uuids)."""
    sub = f"data-{uuid.uuid4().hex[:12]}"
    out = os.path.join(tdir, sub)
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        # write_parquet creates no directory for zero rows; a DELETE
        # matching everything must still commit an (empty) version
        os.makedirs(out, exist_ok=True)
        sch = ds.schema()
        sch = getattr(sch, "base_schema", sch)
        pq.write_table(sch.empty_table(), os.path.join(out, "empty.parquet"))
    else:
        ds.write_parquet(out)
    files = sorted(os.path.join(sub, f) for f in os.listdir(out))
    # the file list comes from a driver-side listdir, which requires the
    # table root to live on storage shared by every worker (object store
    # / NFS on a real cluster).  Verify the manifest covers every row:
    # if workers wrote files the driver cannot see, fail loudly instead
    # of committing a silently inconsistent snapshot.
    if n > 0:
        covered = sum(pq.ParquetFile(os.path.join(tdir, f))
                      .metadata.num_rows for f in files)
        if covered != n:
            raise RuntimeError(
                f"snapshot manifest covers {covered} of {n} rows — the "
                "table root must be on a filesystem shared between the "
                "driver and all workers")
    return files, n


def create_table(root: str, name: str, ds: Dataset | pa.Table | None = None,
                 schema: pa.Schema | None = None,
                 if_not_exists: bool = False) -> None:
    """CreateTable (maintenance/create_table.cpp — its
    ``if_not_exists`` flag is create_table.hpp's constructor arg):
    empty with a schema, or CREATE TABLE AS from a Dataset/Arrow table.
    With ``if_not_exists`` an existing table is left untouched (the
    second CREATE's schema is ignored, as in the reference runner's
    ``CREATE TABLE IF NOT EXISTS t (b INT)`` statement)."""
    tdir = _table_dir(root, name)
    if os.path.exists(os.path.join(tdir, _CURRENT)):
        if if_not_exists:
            return
        raise ValueError(f"table {name!r} already exists under {root}")
    os.makedirs(tdir, exist_ok=True)
    if ds is None:
        if schema is None:
            raise ValueError("create_table needs a Dataset or a schema")
        empty = os.path.join(tdir, "empty.parquet")
        pq.write_table(schema.empty_table(), empty)
        _commit(tdir, 0, ["empty.parquet"], 0)
        return
    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)
    files, rows = _write_data_files(tdir, ds)
    _commit(tdir, 0, files, rows)


def drop_table(root: str, name: str, if_exists: bool = False) -> None:
    """DropTable (maintenance/drop_table.cpp)."""
    import shutil
    tdir = _table_dir(root, name)
    if not os.path.exists(os.path.join(tdir, _CURRENT)):
        if if_exists:
            return
        raise ValueError(f"no such table {name!r} under {root}")
    shutil.rmtree(tdir)


def read_table(root: str, name: str, version: int | None = None,
               columns: list[str] | None = None) -> Dataset:
    """Snapshot read (GetTable + Validate recast): the manifest pins an
    immutable file list, so the stream is consistent regardless of
    concurrent commits."""
    tdir = _table_dir(root, name)
    m = _manifest(root, name, version)
    paths = [os.path.join(tdir, f) for f in m["files"]]
    return ray.data.read_parquet(paths, columns=columns)


def insert_into(root: str, name: str, ds: Dataset | pa.Table) -> int:
    """Insert (insert.cpp): append-only — new files + a manifest that
    reuses every committed file.  Returns the new version."""
    tdir = _table_dir(root, name)
    if isinstance(ds, pa.Table):
        ds = ray.data.from_arrow(ds)
    m = _manifest(root, name)
    files, rows = _write_data_files(tdir, ds)
    v = m["version"] + 1
    _commit(tdir, v, list(m["files"]) + files, m["rows"] + rows)
    return v


def delete_where(root: str, name: str, predicate=None) -> int:
    """Delete (delete.cpp): matching rows vanish from the next version.
    Streams the snapshot through an inverted table_scan into new files
    (see module note on partition-pruned rewrites at scale).
    ``predicate=None`` is ``DELETE FROM t`` — truncate to an empty
    version (schema preserved)."""
    tdir = _table_dir(root, name)
    m = _manifest(root, name)
    if predicate is None:
        # truncate: take the schema from a committed data file (a
        # zero-row Dataset loses its schema on materialize)
        sch = pq.ParquetFile(os.path.join(tdir, m["files"][0])).schema_arrow
        sub = f"data-{uuid.uuid4().hex[:12]}"
        out = os.path.join(tdir, sub)
        os.makedirs(out, exist_ok=True)
        pq.write_table(sch.empty_table(), os.path.join(out, "empty.parquet"))
        v = m["version"] + 1
        _commit(tdir, v, [os.path.join(sub, "empty.parquet")], 0)
        return v
    kept = table_scan(read_table(root, name), ~predicate)
    files, rows = _write_data_files(tdir, kept)
    v = m["version"] + 1
    _commit(tdir, v, files, rows)
    return v


def update_where(root: str, name: str, predicate, assignments: dict) -> int:
    """Update (update.cpp — delete+insert in the reference; here ONE
    streamed pass): rows matching ``predicate`` get each column in
    ``assignments`` replaced by its expression's value; other rows pass
    through unchanged."""
    import pyarrow.compute as pc

    tdir = _table_dir(root, name)
    m = _manifest(root, name)

    def apply(batch: pa.Table) -> pa.Table:
        # predicate=None is UPDATE without WHERE: every row matches
        mask = pa.array([True] * batch.num_rows) if predicate is None \
            else pc.fill_null(predicate(batch), False)
        # SQL UPDATE evaluates EVERY right-hand side against the OLD
        # row (a,b = b,a swaps); compute all values first, then assign
        values = {}
        for col_name, expr in assignments.items():
            new = expr(batch) if callable(expr) else expr
            if not isinstance(new, (pa.Array, pa.ChunkedArray)):
                new = pa.array([new] * batch.num_rows)
            values[col_name] = pc.cast(new, batch.column(col_name).type)
        for col_name, new in values.items():
            old = batch.column(col_name)
            batch = batch.set_column(
                batch.column_names.index(col_name), col_name,
                pc.if_else(mask, new, old))
        return batch

    updated = read_table(root, name).map_batches(
        apply, batch_format="pyarrow", zero_copy_batch=True)
    files, rows = _write_data_files(tdir, updated)
    v = m["version"] + 1
    _commit(tdir, v, files, rows)
    return v


# -- SQL VIEWs --------------------------------------------------------
# The reference registers a view as a stored LOGICAL PLAN in the
# in-process StorageManager (storage_manager.hpp:38-46 add_view/
# drop_view/get_view over an in-memory map of LQPView, lqp_view.hpp:
# the LQP plus an optional column-alias list) — views are NOT durable
# across restarts there either.  The recast keeps those semantics: a
# view is a deferred Dataset builder (the "plan"); reading the view
# runs the builder, so it always reflects the CURRENT state of any
# snapshot tables it reads, and an optional column list renames the
# output like ``CREATE VIEW v (foo, bar) AS ...``.

_VIEWS: dict[str, tuple] = {}


def create_view(name: str, builder, columns: list[str] | None = None,
                or_replace: bool = False) -> None:
    """CreateView (maintenance/create_view.cpp): store the deferred
    plan; nothing executes until the view is read."""
    if name in _VIEWS and not or_replace:
        raise ValueError(f"view {name!r} already exists")
    _VIEWS[name] = (builder, list(columns) if columns else None)


def drop_view(name: str, if_exists: bool = False) -> None:
    """DropView (maintenance/drop_view.cpp)."""
    if name not in _VIEWS:
        if if_exists:
            return
        raise ValueError(f"no such view {name!r}")
    del _VIEWS[name]


def has_view(name: str) -> bool:
    return name in _VIEWS


def view_names() -> list[str]:
    """storage_manager.hpp:45 view_names()."""
    return sorted(_VIEWS)


def read_view(name: str) -> Dataset:
    """Expand the stored plan — the SQL translator substitutes the
    view's LQP wherever the view name appears in FROM
    (sql_translator.cpp resolves view names through StorageManager)."""
    builder, columns = _VIEWS[name]
    ds = builder()
    if columns is not None:
        names = ds.schema().names
        if len(columns) != len(names):
            raise ValueError(
                f"view {name!r}: {len(columns)} aliases for "
                f"{len(names)} columns")
        mapping = dict(zip(names, columns))
        ds = ds.map_batches(
            lambda b, m=mapping: b.rename_columns(
                [m[n] for n in b.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)
    return ds
