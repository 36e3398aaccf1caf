"""P13/P14 tooling operators (reference lib/DatasetConfiguration.js,
scripts/build-sncb.js:120-136; tests test/buildDataset.test.js,
test/buildSncb.test.js)."""

import pytest
from pyspark.sql import functions as F

from gtfs2lc_spark import tooling


def test_slugify():
    assert tooling.slugify("Ma Société (Bruxelles)!") == "ma-societe-bruxelles"
    assert tooling.slugify("a" * 200) == "a" * 80
    assert tooling.slugify("Hello  World") == "hello-world"


def test_slugify_col(spark):
    df = spark.createDataFrame([("My Agency (Test)!",)], "n string")
    assert df.select(tooling.slugify_col(F.col("n")).alias("s")).first().s == "my-agency-test"


def test_validate_namespace():
    tooling.validate_namespace("https://example.org/x")
    with pytest.raises(ValueError):
        tooling.validate_namespace("ftp://example.org")
    with pytest.raises(ValueError):
        tooling.validate_namespace("not a uri")


def test_constrain_calendar(spark, feed):
    cal, cd = tooling.constrain_calendar(
        feed["calendar"], feed["calendar_dates"], "20070201", "20070228"
    )
    rows = {r.service_id: (r.start_date, r.end_date) for r in cal.collect()}
    assert rows["FULLW"] == ("20070201", "20070228")
    assert cd.count() == 0  # all exceptions are in June

    cal2, cd2 = tooling.constrain_calendar(
        feed["calendar"], feed["calendar_dates"], "20070601", "20070630"
    )
    assert cd2.count() == 4

    cal3, _ = tooling.constrain_calendar(
        feed["calendar"], feed["calendar_dates"], "20080101", "20080131"
    )
    assert cal3.count() == 0  # window outside all calendars
