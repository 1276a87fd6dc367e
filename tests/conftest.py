import pytest

from borges_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="borges_spark_tests", shuffle_partitions=8)
    yield s
