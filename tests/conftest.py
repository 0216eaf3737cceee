import pytest


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
