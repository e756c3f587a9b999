import pytest

from datacontract_cli_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dcspark-tests", master="local[4]", shuffle_partitions=4)
    yield s
