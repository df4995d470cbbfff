import pytest

from hypertrace_ingester_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sequences(spark):
    from hypertrace_ingester_spark import datagen

    return datagen.generate_sequences(spark, 2000, partitions=8).cache()
