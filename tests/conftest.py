import pytest


@pytest.fixture(scope="session")
def spark():
    from metastore_spark.session import get_spark

    s = get_spark("metastore-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
