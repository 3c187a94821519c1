import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from gdal_ray.util import tune_data_context

    tune_data_context()
    yield
    ray.shutdown()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
