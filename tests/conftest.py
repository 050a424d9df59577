import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        log_to_driver=False,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_corpus(ray_session, tmp_path_factory):
    """The 32-doc smoke corpus (FIXTURES.md §5), generated once per session."""
    from tableextraction_ray.datagen import generate_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "t1")
    return generate_corpus(out, tier="t1")
