"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest
session (per task instructions); individual tests must never call
ray.init/shutdown."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_500(tmp_path_factory):
    """500-doc deterministic pages fixture (pages + truth tables)."""
    from hyrise_generalized_dedup_ray.sources.fixtures import generate_pages

    return generate_pages(500, seed=42)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
