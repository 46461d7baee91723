"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
callables use (only bench.py / CLI scripts / the pytest fixture own a
Ray session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship near-dup pipeline on /root/testdata/sf0.001: documents
    reshaped into the input_hint pages schema (url, warc_ts, html,
    text, lang), then extract → sign → LSH → verify → suffix-array →
    connected components → (url, doc_id, cluster) labels."""
    from hyrise_generalized_dedup_ray.pipelines.suite import flagship_dedup

    return flagship_dedup("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (registry lives in hyrise_generalized_dedup_ray/pipelines/suite.py)."""
    from hyrise_generalized_dedup_ray.pipelines.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query; the
    non-SQL-expressible ops (LSH/SimHash/suffix-array/ANN-LSH/
    multimodal/flagship) get the driver's rows-only check and are
    pytest-gated against the sequential reference oracle instead."""
    from hyrise_generalized_dedup_ray.pipelines.suite import ORACLE_SQL

    return dict(ORACLE_SQL)
