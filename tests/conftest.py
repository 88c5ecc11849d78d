import pytest

from binance_futures_data_lake_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bfdl-tests", master="local[8]", shuffle_partitions=8)
    yield s
