"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest
session; no test or library code calls ray.init/shutdown itself."""

from __future__ import annotations

import warnings

import pytest

warnings.filterwarnings("ignore")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute full-pipeline runs (deselect with -m 'not slow')",
    )


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """(pages, truth) Arrow tables, ~240 rows, deterministic."""
    from ordinarydumpdeduplicator_ray.sources.synth import generate_pages

    return generate_pages(240, seed=42)


@pytest.fixture(scope="session")
def small_corpus():
    """(pages, truth) Arrow tables, ~1500 rows — oracle-scale."""
    from ordinarydumpdeduplicator_ray.sources.synth import generate_pages

    return generate_pages(1500, seed=7)
