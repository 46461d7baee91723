"""Checkpointing with lineage manifests.

Layout per stage::

    <root>/<stage>/
        part-*.parquet        (Ray-written partition files)
        _lineage.json         {stage, config_hash, input_fingerprint,
                               rows, files, engine_version, completed}

Writes are atomic: the stage writes into ``<stage>.tmp/``, the manifest
is written last, then the directory is renamed — a crashed run leaves
either nothing or a complete, self-describing checkpoint.  A
checkpoint is reused only when its ``config_hash`` and
``input_fingerprint`` match; a config change silently invalidates all
downstream state (the manifest mismatch forces recompute).

This is the "resumable from checkpoint with per-partition lineage"
piece of the north rule.  The reference has no analog (failed query =
rerun, SURVEY.md §4.1); our model is closer to its BinaryWriter
persistence path (import_export/binary/binary_writer.cpp) but with
Parquet as the format and lineage as first-class metadata.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import ray
from ray.data import Dataset

# ray.data.read_parquet's path resolution probes
# fsspec.implementations.http on EVERY call (aiohttp is absent here, so
# the probe import fails, gets cleaned from sys.modules, and is
# re-attempted next call).  Two driver threads probing at once race the
# partial import: the loser resolves the half-initialized module and
# raises plain ImportError on the HTTPFileSystem name, which ray's
# `except ModuleNotFoundError` does not catch.  When the real import is
# unavailable, pin a sentinel module so the probe resolves
# deterministically (the sentinel class matches no real filesystem, so
# ray correctly treats every filesystem as non-HTTP; this sandbox has
# no network, so nothing can want the real one).
try:  # pragma: no cover - environment-dependent
    from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
except Exception:  # pragma: no cover
    import sys as _sys
    import types as _types

    _stub = _types.ModuleType("fsspec.implementations.http")

    class _SentinelHTTPFileSystem:
        """aiohttp absent: no object is ever an instance of this."""

    _stub.HTTPFileSystem = _SentinelHTTPFileSystem
    _sys.modules.setdefault("fsspec.implementations.http", _stub)

ENGINE_VERSION = "0.1.0"
MANIFEST = "_lineage.json"


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST)


def load_manifest(stage_dir: str) -> dict | None:
    try:
        with open(_manifest_path(stage_dir)) as f:
            m = json.load(f)
        return m if m.get("completed") else None
    except (OSError, json.JSONDecodeError):
        return None


def checkpoint_stage(
    stage: str,
    root: str,
    config_hash: str,
    input_fingerprint: str,
    build: Callable[[], Dataset],
    min_rows_per_file: int | None = None,
) -> tuple[Dataset, bool]:
    """Return ``(dataset, was_resumed)``.

    If a completed checkpoint with matching lineage exists, read it
    back (the stage is *skipped*).  Otherwise run ``build()``, persist
    its output, then read back from the checkpoint so every downstream
    consumer streams from Parquet rather than recomputing the stage.
    """
    stage_dir = os.path.join(root, stage)
    m = load_manifest(stage_dir)
    if m and m["config_hash"] == config_hash and m["input_fingerprint"] == input_fingerprint:
        return ray.data.read_parquet(stage_dir), True

    tmp_dir = stage_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)

    ds = build()
    kwargs = {}
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(tmp_dir, **kwargs)

    files = sorted(
        f for f in os.listdir(tmp_dir) if f.endswith(".parquet")
    )
    if not files:
        # a zero-row stage (e.g. an edge branch that found nothing)
        # writes no files; persist an empty typed file so the resume
        # read and downstream unions keep the schema
        import pyarrow.parquet as pq
        sch = ds.schema()
        sch = getattr(sch, "base_schema", sch)
        if sch is not None:
            pq.write_table(sch.empty_table(),
                           os.path.join(tmp_dir, "empty.parquet"))
            files = ["empty.parquet"]
    rows = ray.data.read_parquet(tmp_dir).count() if files else 0
    manifest = {
        "stage": stage,
        "config_hash": config_hash,
        "input_fingerprint": input_fingerprint,
        "rows": rows,
        "files": files,
        "engine_version": ENGINE_VERSION,
        "written_at": time.time(),
        "completed": True,
    }
    with open(_manifest_path(tmp_dir), "w") as f:
        json.dump(manifest, f, indent=2)
    os.rename(tmp_dir, stage_dir)
    return ray.data.read_parquet(stage_dir), False


PENDING = "_pending.json"


def _part_name(i: int) -> str:
    return f"part-{i:05d}.parquet"


def checkpoint_partitioned(
    stage: str,
    root: str,
    config_hash: str,
    input_fingerprint: str,
    n_partitions: int,
    build_part: Callable[[int], "object"],
    *,
    num_cpus: float = 1.0,
) -> tuple[Dataset, dict]:
    """Per-PARTITION resumable stage: returns ``(dataset, info)`` with
    ``info = {"resumed": bool, "parts_skipped": k, "parts_built": m}``.

    Unlike :func:`checkpoint_stage` (all-or-nothing), a killed run
    leaves every finished partition behind: partition ``i`` is built by
    a Ray task running ``build_part(i)`` (must return a pyarrow Table),
    written to ``part-i.parquet.tmp-<pid>`` and **renamed into place**
    — the atomic rename is the completion marker, so a crash mid-write
    can never leave a truncated part that a resume would trust.  On
    resume, parts already present under a matching ``_pending.json``
    (same config hash / input fingerprint / partition count) are
    skipped; only the missing ones recompute.  When the last part
    lands, the stage manifest is written and the directory renamed,
    after which :func:`checkpoint_stage` semantics apply.

    At fleet scale the same protocol runs against a shared filesystem
    or object store (rename → PUT-if-absent); partition granularity is
    the input shard, so a 90%-done stage redoes 10% of the work.
    """
    stage_dir = os.path.join(root, stage)
    m = load_manifest(stage_dir)
    if (m and m["config_hash"] == config_hash
            and m["input_fingerprint"] == input_fingerprint):
        return ray.data.read_parquet(stage_dir), {
            "resumed": True, "parts_skipped": n_partitions,
            "parts_built": 0}

    tmp_dir = stage_dir + ".tmp"
    shutil.rmtree(stage_dir, ignore_errors=True)
    pending = {
        "stage": stage,
        "config_hash": config_hash,
        "input_fingerprint": input_fingerprint,
        "n_partitions": n_partitions,
    }
    pending_path = os.path.join(tmp_dir, PENDING)
    try:
        with open(pending_path) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        prev = None
    if prev != pending:
        # different config/input (or first run): start clean
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        with open(pending_path, "w") as f:
            json.dump(pending, f)

    done = {
        f for f in os.listdir(tmp_dir)
        if f.endswith(".parquet")
    }
    missing = [i for i in range(n_partitions) if _part_name(i) not in done]

    @ray.remote(num_cpus=num_cpus)
    def _build(i: int) -> int:
        import pyarrow.parquet as pq

        table = build_part(i)
        tmp = os.path.join(tmp_dir, _part_name(i) + f".tmp-{os.getpid()}")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(tmp_dir, _part_name(i)))
        return table.num_rows

    refs = [_build.remote(i) for i in missing]
    try:
        ray.get(refs)
    except Exception:
        # Quiesce before surfacing the failure: sibling builds keep
        # running after the first error, and their rename-into-place
        # commits would otherwise race any caller that inspects (or
        # retries over) tmp_dir right after catching.  Completed parts
        # stay committed — only in-flight work is interrupted.
        for r in refs:
            ray.cancel(r, force=False)
        ray.wait(refs, num_returns=len(refs), timeout=60)
        raise

    files = sorted(
        f for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
    rows = ray.data.read_parquet(tmp_dir).count() if files else 0
    manifest = {
        "stage": stage,
        "config_hash": config_hash,
        "input_fingerprint": input_fingerprint,
        "rows": rows,
        "files": files,
        "n_partitions": n_partitions,
        "engine_version": ENGINE_VERSION,
        "written_at": time.time(),
        "completed": True,
    }
    os.remove(pending_path)
    with open(_manifest_path(tmp_dir), "w") as f:
        json.dump(manifest, f, indent=2)
    os.rename(tmp_dir, stage_dir)
    return ray.data.read_parquet(stage_dir), {
        "resumed": bool(done),
        "parts_skipped": n_partitions - len(missing),
        "parts_built": len(missing)}


def input_fingerprint_for_path(path: str) -> str:
    """Cheap, stable fingerprint of a Parquet input: file names + sizes
    + mtimes.  Content hashing 100 TB is not a checkpoint-time option;
    size+mtime is the standard staleness proxy."""
    entries = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                st = os.stat(os.path.join(path, name))
                entries.append((name, st.st_size, int(st.st_mtime)))
    else:
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, int(st.st_mtime)))
    import hashlib

    return hashlib.sha256(json.dumps(entries).encode()).hexdigest()[:16]
