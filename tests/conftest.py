"""Session-scoped Ray fixture — init ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic tiny corpus (FIXTURES.md A3) shared across tests."""
    from tilers_tools_ray import corpus

    root = tmp_path_factory.mktemp("corpus_tiny")
    paths = corpus.generate(str(root), scale="tiny", seed=1234)
    return paths
