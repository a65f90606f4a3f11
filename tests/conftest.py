import pytest

from incubator_sedona_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="iss-tests", master="local[4]", shuffle_partitions=4)
    yield s
