import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def synth_pages(tmp_path_factory):
    """Synthetic pages+gold fixture (seed 42, FIXTURES.md §A recipe)."""
    from ent_res_feedback_ray.sources.pages import write_synthetic_pages

    out = tmp_path_factory.mktemp("synthpages")
    pages_path, gold_path = write_synthetic_pages(str(out), n_entities=60, seed=42)
    return pages_path, gold_path
