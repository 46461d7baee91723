"""In-process execution log backing the meta_exec / meta_log tables.

The reference exposes operator runtimes and engine events as virtual
SQL tables (src/lib/utils/meta_tables/meta_exec_table.hpp:13,
meta_log_table.hpp:14) fed by its logging/plugin hooks.  Our analog is
a driver-process registry that pipeline stages append to; the
meta_exec/meta_log suite queries snapshot it as Arrow tables.  Like the
reference's tables the content is runtime-dependent, so the driver
records a rows-only check (no SQL oracle).
"""

from __future__ import annotations

import threading
import time

_LOCK = threading.Lock()
# (item_name, wall_s, rows_out) — one row per completed stage/operator
_EXEC: list[tuple[str, float, int]] = []
# (monotonic_ts, level, message)
_LOG: list[tuple[float, str, str]] = []


def record_exec(item: str, wall_s: float, rows_out: int = -1) -> None:
    with _LOCK:
        _EXEC.append((item, float(wall_s), int(rows_out)))


def log(message: str, level: str = "info") -> None:
    with _LOCK:
        _LOG.append((time.monotonic(), level, message))


def exec_rows() -> list[tuple[str, float, int]]:
    with _LOCK:
        return list(_EXEC)


def log_rows() -> list[tuple[float, str, str]]:
    with _LOCK:
        return list(_LOG)


def clear() -> None:
    with _LOCK:
        _EXEC.clear()
        _LOG.clear()
