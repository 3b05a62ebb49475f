import pytest
import ray


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: scale-route rehearsal tests that synthesize enough rows to "
        "cross the size-routing thresholds (minutes, not seconds)")


@pytest.fixture(scope="session")
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()
