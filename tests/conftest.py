import pytest

from gotsdb_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running whole-registry execution smoke"
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("gotsdb-tests", cpus=8)
    yield spark


@pytest.fixture()
def sf_dir():
    return SF_SMOKE
