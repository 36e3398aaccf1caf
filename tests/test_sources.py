"""S1 alternate input mode: plain GTFS feed directory (the reference's
CLI input), end-to-end to the same 3,472 connections."""

import pytest

from gtfs2lc_spark import fixtures, pipeline, sources


@pytest.fixture(scope="module")
def gtfs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feed")
    for fname, text in fixtures.SAMPLE_FEED_CSV.items():
        (d / fname).write_text(text)
    return str(d)


def test_read_gtfs_dir_end_to_end(spark, gtfs_dir):
    e = sources.read_gtfs_dir(spark, gtfs_dir, feed_id="dirfeed")
    conns = pipeline.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"], salt_n=8,
    )
    assert conns.count() == fixtures.SAMPLE_FEED_CONNECTIONS


def test_missing_required_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        sources.read_gtfs_dir(spark, str(tmp_path))


def test_missing_optional_ok(spark, gtfs_dir, tmp_path):
    import shutil

    d = tmp_path / "feed2"
    shutil.copytree(gtfs_dir, d)
    (d / "calendar.txt").unlink()
    e = sources.read_gtfs_dir(spark, str(d))
    assert e["calendar"].count() == 0
    conns = pipeline.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"], salt_n=None,
    )
    # only calendar_dates added days survive (FULLW exceptions)
    assert {r.service_date for r in conns.select("service_date").distinct().collect()} == {
        "20070605", "20070606", "20070607"
    }
