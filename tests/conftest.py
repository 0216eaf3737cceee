import os

import pytest

# idle Ray worker/actor processes each burn ~29% CPU in their poll loops
# on this box, starving driver-side numpy 10-100x (BENCH/BASELINE.md) —
# reap idle workers fast and keep the warm pool small
os.environ.setdefault("RAY_idle_worker_killing_time_threshold_ms", "2000")
os.environ.setdefault("RAY_num_workers_soft_limit", "8")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from graph_data_science_ray.context import configure_ray_data

    configure_ray_data(shuffle_parallelism=4)
    yield
    ray.shutdown()
