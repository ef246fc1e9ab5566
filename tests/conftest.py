import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_index(ray_session, tmp_path_factory):
    """A small code-mode index over the synthetic F1 corpus, built once."""
    from riot_ray.build import IndexWriter
    from riot_ray.config import EngineOpts
    from riot_ray.corpus import write_corpus

    root = tmp_path_factory.mktemp("corpus_index")
    src = write_corpus(str(root / "src" / "code.parquet"), 300, seed=42)
    opts = EngineOpts(mode="code", num_parts=8, num_shards=4, block_size=64)
    w = IndexWriter(str(root / "index"), opts)
    stats = w.build(src)
    return {"index_dir": str(root / "index"), "src": src, "stats": stats, "opts": opts}
