import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = None
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_web(tmp_path_factory):
    """t1 smoke fixture (FIXTURES.md F7): 1e3 docs / 20 hosts, cached."""
    from web_scraping_script_ray.synthweb import WebParams, fixture_dir

    return fixture_dir(WebParams(n_docs=1000, n_hosts=20, seed=42))
