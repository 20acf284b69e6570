import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    # 6 CPUs, not 4: the three-actor-pool cheque pipeline (OCR +
    # field-extract + joiner) plus its read task and downstream task
    # pool saturates exactly 4 CPUs, and Ray's streaming executor can
    # flakily deadlock at exact saturation (observed once in ~5 full
    # suite runs: 30 min, zero blocks output, load 0).  Two spare
    # CPUs keep every pipeline shape schedulable while still forcing
    # the small-pool scheduling the suite is meant to exercise.
    ray.init(address="local", num_cpus=6, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
