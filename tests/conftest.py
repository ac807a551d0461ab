"""Session-scoped Ray for the whole test run (one init, one shutdown)."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    from robokop_build_ray.functions.ray_utils import local_init_kwargs

    ray.init(
        address="local",
        num_cpus=4,
        ignore_reinit_error=True,
        logging_level="ERROR",
        **local_init_kwargs(),
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    from robokop_build_ray.functions.ray_utils import (
        silence_empty_block_schema_warnings,
    )

    silence_empty_block_schema_warnings()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus():
    """Deterministic smoke-tier corpus paths (generated once, cached)."""
    from robokop_build_ray.sources.corpus import ensure_corpus

    return ensure_corpus("sf0.001")
