import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract: library
    code never calls ray.init itself)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("FR_TEST_CPUS", "4")),
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
def tiny_corpus():
    from fundamental_ray.synth.materialize import materialize_corpus

    return materialize_corpus("sf0.001")


@pytest.fixture(scope="session")
def crawl_env(ray_session):
    """Tiny 4-chain corpus + fetch index shared by the crawl-layer tests."""
    from fundamental_ray.crawl.fetchstore import build_fetch_index
    from fundamental_ray.synth.materialize import materialize_corpus

    corpus = materialize_corpus("sf0.001", n_chains=4)
    idx = build_fetch_index(
        f"{corpus}/pages.parquet", "/tmp/fr_test_idx", num_buckets=8
    )
    return corpus, idx
