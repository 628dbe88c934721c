import pytest

from parrsb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="parrsb-tests", shuffle_partitions=8)
    yield s
    s.stop()
