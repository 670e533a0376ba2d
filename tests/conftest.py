"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import pytest


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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def world():
    from decisions_knowledge_graph_data_ray.sources.transcripts import get_world

    return get_world()


@pytest.fixture(scope="session")
def tiny_transcripts():
    """~20 conversations, ~hot key included (FIXTURES.md 'tiny')."""
    from decisions_knowledge_graph_data_ray.sources.transcripts import generate_transcripts_table

    return generate_transcripts_table(20)


@pytest.fixture(scope="session")
def oracle_tiny(tiny_transcripts, world):
    from decisions_knowledge_graph_data_ray.pipelines.oracle import run_oracle

    return run_oracle(tiny_transcripts, world)
