import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per the driver contract)."""
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
def tiny_corpus():
    """Deterministic 200-row pages corpus + truth table (FIXTURES.md 'tiny')."""
    from image_deduplication_3m_images_ray.fixtures import generate_corpus

    return generate_corpus(200, seed=42)


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic 1200-row corpus for oracle conformance (FIXTURES.md 'small')."""
    from image_deduplication_3m_images_ray.fixtures import generate_corpus

    return generate_corpus(1200, seed=42)
