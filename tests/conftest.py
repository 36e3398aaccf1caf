import pytest

from gtfs2lc_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="gtfs2lc-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def feed(spark):
    from gtfs2lc_spark import fixtures

    return fixtures.entity_dfs(spark)


@pytest.fixture(scope="session")
def connections(spark, feed):
    from gtfs2lc_spark import pipeline

    return pipeline.convert(
        feed["stop_times"],
        feed["trips"],
        feed["routes"],
        feed["stops"],
        feed["calendar"],
        feed["calendar_dates"],
        salt_n=8,
    ).cache()


@pytest.fixture(scope="session")
def jsonld(connections):
    from gtfs2lc_spark import sinks

    return sinks.connections_to_jsonld(connections).cache()
