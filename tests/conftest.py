import shutil

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def built_index(ray_session, tmp_path_factory):
    """sf0.001 corpus indexed once per session (5 segments of 100 docs)."""
    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.sources.corpus import corpus_dataset

    idx = str(tmp_path_factory.mktemp("index") / "idx")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(corpus_dataset(SF_DIR), idx, segment_size=100,
                lineage_source=SF_DIR, fields=("text", "title"))
    return idx


@pytest.fixture(scope="session")
def corpus_texts():
    """doc_id-ordered raw texts of the sf0.001 corpus (brute-force oracle)."""
    from lucene_kmp_ray.sources.corpus import corpus_table
    return corpus_table(SF_DIR).sort_by("doc_id")["text"].to_pylist()
