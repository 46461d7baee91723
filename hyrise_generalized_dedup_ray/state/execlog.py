"""Cluster-wide execution log backing the meta_exec / meta_log tables.

The reference exposes operator runtimes and engine events as virtual
SQL tables (src/lib/utils/meta_tables/meta_exec_table.hpp:13,
meta_log_table.hpp:14) fed by its logging/plugin hooks.  Our analog:
driver-side records append to a local list (zero overhead, the common
case), while records made INSIDE Ray workers route fire-and-forget to
a detached zero-CPU sink actor; ``exec_rows``/``log_rows`` merge both,
so stage timings recorded in workers reach the driver's meta tables on
a real cluster too (round-2 review: the old driver-process-local lists
silently dropped them).  Like the reference's tables the content is
runtime-dependent, so the driver records a rows-only check (no SQL
oracle).
"""

from __future__ import annotations

import threading
import time

_LOCK = threading.Lock()
# (item_name, wall_s, rows_out) — one row per completed stage/operator
_EXEC: list[tuple[str, float, int]] = []
# (monotonic_ts, level, message)
_LOG: list[tuple[float, str, str]] = []

_SINK_NAME = "hgd_execlog_sink"
_NAMESPACE = "hgd_execlog"


def _ray():
    try:
        import ray
        return ray if ray.is_initialized() else None
    except ImportError:
        return None


def _in_ray_worker() -> bool:
    ray = _ray()
    if ray is None:
        return False
    try:
        return ray.get_runtime_context().worker.mode == ray.WORKER_MODE
    except Exception:
        return False


def _sink(create: bool):
    ray = _ray()
    if ray is None:
        return None
    try:
        return ray.get_actor(_SINK_NAME, namespace=_NAMESPACE)
    except ValueError:
        if not create:
            return None

    @ray.remote(num_cpus=0)
    class _ExecLogSink:
        def __init__(self):
            self._exec: list = []
            self._log: list = []

        def add_exec(self, item, wall_s, rows_out):
            self._exec.append((item, wall_s, rows_out))

        def add_log(self, ts, level, msg):
            self._log.append((ts, level, msg))

        def snapshot(self):
            return list(self._exec), list(self._log)

        def clear(self):
            self._exec.clear()
            self._log.clear()

    return _ExecLogSink.options(
        name=_SINK_NAME, namespace=_NAMESPACE,
        get_if_exists=True, lifetime="detached").remote()


def record_exec(item: str, wall_s: float, rows_out: int = -1) -> None:
    if _in_ray_worker():
        sink = _sink(create=True)
        if sink is not None:
            sink.add_exec.remote(item, float(wall_s), int(rows_out))
            return
    with _LOCK:
        _EXEC.append((item, float(wall_s), int(rows_out)))


def log(message: str, level: str = "info") -> None:
    if _in_ray_worker():
        sink = _sink(create=True)
        if sink is not None:
            sink.add_log.remote(time.monotonic(), level, message)
            return
    with _LOCK:
        _LOG.append((time.monotonic(), level, message))


def _sink_snapshot() -> tuple[list, list]:
    ray = _ray()
    sink = _sink(create=False)
    if ray is None or sink is None:
        return [], []
    try:
        return ray.get(sink.snapshot.remote(), timeout=10)
    except Exception:
        return [], []


def exec_rows() -> list[tuple[str, float, int]]:
    remote, _ = _sink_snapshot()
    with _LOCK:
        return list(_EXEC) + [tuple(r) for r in remote]


def log_rows() -> list[tuple[float, str, str]]:
    _, remote = _sink_snapshot()
    with _LOCK:
        return list(_LOG) + [tuple(r) for r in remote]


def clear() -> None:
    ray = _ray()
    sink = _sink(create=False)
    if ray is not None and sink is not None:
        try:
            ray.get(sink.clear.remote(), timeout=10)
        except Exception:
            pass
    with _LOCK:
        _EXEC.clear()
        _LOG.clear()
