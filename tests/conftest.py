import pytest

from datax_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        "datax-spark-tests",
        cores=4,
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()
