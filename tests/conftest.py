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
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus():
    from searchengine_ray.corpus import synthesize_corpus

    return synthesize_corpus(n_docs=120, seed=7)


@pytest.fixture(scope="session")
def built_index(ray_session, fixture_corpus, tmp_path_factory):
    """Index over the synthetic corpus, built once per test session."""
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig

    out = str(tmp_path_factory.mktemp("idx") / "index")
    tbl = fixture_corpus
    cfg = BuildConfig(doc_bucket_size=64, skip_block_docs=16, num_partitions=2)
    build_index(lambda: ray.data.from_arrow(tbl), out, cfg)
    return out


@pytest.fixture(scope="session")
def oracle(fixture_corpus):
    from searchengine_ray.oracle import Oracle

    return Oracle(fixture_corpus)
