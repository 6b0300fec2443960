import pytest


@pytest.fixture(scope="session")
def spark():
    from zellige_spark.session import get_spark

    s = get_spark(app="zellige-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
