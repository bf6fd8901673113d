from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Small planted-duplicate corpus (FIXTURES.md §1), generated once."""
    from lsh_ray.fixtures import write_corpus
    d = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(d), n_docs=1200, seed=42)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
