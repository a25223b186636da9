import pytest

from relational_data_loader_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rdl-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")
