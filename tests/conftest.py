"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_200():
    from folkscope_ray.synth import corpus_path

    return corpus_path(200)


@pytest.fixture(scope="session")
def kg_200(corpus_200):
    """One shared KG pipeline over the 200-file corpus (object-store cached)."""
    from folkscope_ray.pipelines.kg import build_kg

    return build_kg(corpus_200)
