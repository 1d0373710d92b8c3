import pytest


@pytest.fixture(scope="session")
def spark():
    from rdf_to_text_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
