"""Layer A — GTFS detection/extraction from web pages.

input_hint invariants: vectorized pandas UDF detection, pure function of
``text``, byte-identical extracted content per url run-to-run."""

from pyspark.sql import functions as F

from gtfs2lc_spark import extraction, fixtures, pipeline


def _pages(spark):
    return fixtures.pages_df(spark, noise_pages=25, n_partitions=8)


def test_detector_skips_noise(spark):
    pages = _pages(spark)
    detected = extraction.detect_pages(pages)
    urls = {r.url for r in detected.select("url").collect()}
    assert len(urls) == 6  # exactly one page per GTFS file
    assert all("transit.example.org" in u for u in urls)


def test_extracted_tables_match_direct_synthesis(spark, feed):
    pages = _pages(spark)
    entities = extraction.extract_entities(pages)
    for name, direct in feed.items():
        got = {tuple(r) for r in entities[name].collect()}
        want = {tuple(r) for r in direct.collect()}
        assert got == want, f"{name} mismatch"


def test_byte_identical_per_url(spark):
    """Extraction is deterministic: two runs yield identical bytes per url."""
    pages = _pages(spark)

    def snapshot():
        return {
            r.url: (r.gtfs_file, r.feed_id, r.header, r.body)
            for r in extraction.detect_pages(pages).collect()
        }

    a, b = snapshot(), snapshot()
    assert a == b
    # and the body is byte-identical to the synthesized CSV payload
    for fname, csv_text in fixtures.SAMPLE_FEED_CSV.items():
        url = fixtures.page_url("samplefeed", fname)
        header, _, body = csv_text.partition("\n")
        assert a[url][2] == header
        assert a[url][3] == body


def test_pages_to_connections_end_to_end(spark):
    """Full graft path: pages -> extraction -> pipeline -> 3,472 connections."""
    pages = _pages(spark)
    e = extraction.extract_entities(pages)
    conns = pipeline.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"], salt_n=8,
    )
    assert conns.count() == fixtures.SAMPLE_FEED_CONNECTIONS


def test_quoted_csv_fields(spark):
    """from_csv must honor GTFS quoting: embedded commas and escaped
    quotes survive extraction intact (the reference uses fast-csv with
    quote '\"' — lib/stoptimes/StopTimes2Cxs.js:31-33)."""
    from datetime import datetime, timezone

    from gtfs2lc_spark.schemas import PAGES_SCHEMA

    csv = (
        "stop_id,stop_name,stop_desc,stop_lat,stop_lon,zone_id,stop_url\n"
        'S1,"Main St, Platform ""A""",desc,1.0,2.0,,\n'
    )
    text = f"{fixtures.GTFS_MARKER} stops.txt feed=qf\n{csv}"
    ts = datetime(2026, 1, 15, tzinfo=timezone.utc)
    pages = spark.createDataFrame([("u", ts, b"", text, "en")], PAGES_SCHEMA)
    stops = extraction.extract_entities(pages, persist=False)["stops"]
    row = stops.first()
    assert row.stop_name == 'Main St, Platform "A"'
    assert row.stop_id == "S1"


def test_multi_feed_scoping(spark):
    """Two feeds extract independently; all joins are feed_id-scoped."""
    pages = fixtures.pages_df(spark, n_feeds=2, noise_pages=5)
    e = extraction.extract_entities(pages)
    conns = pipeline.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"], salt_n=8,
    )
    per_feed = {r.feed_id: r["count"] for r in conns.groupBy("feed_id").count().collect()}
    assert per_feed == {
        "samplefeed-0": fixtures.SAMPLE_FEED_CONNECTIONS,
        "samplefeed-1": fixtures.SAMPLE_FEED_CONNECTIONS,
    }


def _page(spark, url, text):
    return spark.createDataFrame(
        [(url, None, None, text, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def test_crlf_pages_extract(spark):
    """CRLF bodies and a '\r'-terminated header line must not defeat
    extraction (ADVICE r1)."""
    text = (
        "#gtfs-file: stops.txt feed=crlf\r\n"
        "stop_id,stop_code,stop_name,stop_desc,stop_lat,stop_lon,zone_id,stop_url\r\n"
        "S1,,Alpha,,1.0,2.0,,\r\n"
        "S2,,Beta,,3.0,4.0,,\r\n"
    )
    e = extraction.extract_entities(_page(spark, "http://x/crlf", text))
    rows = {r.stop_id: r.stop_name for r in e["stops"].collect()}
    assert rows == {"S1": "Alpha", "S2": "Beta"}


def test_header_mapped_by_name(spark):
    """Reordered + extra columns map by name (fast-csv headers:true
    semantics); canonical columns absent from the header fill ''."""
    text = (
        "#gtfs-file: stops.txt feed=reorder\n"
        "stop_name,stop_id,wheelchair_boarding\n"
        "Gamma,S9,1\n"
    )
    e = extraction.extract_entities(_page(spark, "http://x/reorder", text))
    row = e["stops"].collect()[0]
    assert (row.stop_id, row.stop_name, row.stop_desc) == ("S9", "Gamma", "")


def test_missing_required_column_dropped_and_counted(spark, caplog):
    """A header without the entity's required key columns is rejected —
    loudly (warning carries the page count and the missing columns)."""
    import logging

    text = "#gtfs-file: trips.txt feed=bad\nroute_id,service_id\nR1,S1\n"
    with caplog.at_level(logging.WARNING, logger="gtfs2lc_spark.extraction"):
        e = extraction.extract_entities(_page(spark, "http://x/bad", text))
        assert e["trips"].count() == 0
    assert any("trip_id" in r.message and "trips.txt" in r.message for r in caplog.records)


def test_malformed_pages_yield_nothing(spark):
    """Marker + garbage body / None text: no crash, no rows."""
    pages = _page(spark, "http://x/g1", "#gtfs-file: stops.txt feed=g\n\x00\x01garbage").unionByName(
        _page(spark, "http://x/g2", None)
    )
    e = extraction.extract_entities(pages)
    assert e["stops"].count() == 0


def test_recrawled_page_newest_wins_batch_path(spark):
    """Common-Crawl re-crawls: two crawls of the same stop_times url in
    one batch pages table must yield ONE detected row (the newest), not
    doubled stop_times rows that corrupt the lag pairing."""
    from pyspark.sql import functions as F

    from gtfs2lc_spark import fixtures, pipeline
    from gtfs2lc_spark.extraction import detect_pages, extract_entities

    pages = fixtures.pages_df(spark, noise_pages=0)
    older = pages.where(F.col("url").contains("stop_times")).select(
        "url",
        (F.col("warc_ts") - F.expr("interval 365 days")).alias("warc_ts"),
        "html", "text", "lang",
    )
    doubled = pages.unionByName(older)

    det = detect_pages(doubled, detect_partitions=2)
    assert det.groupBy("url").count().agg(F.max("count")).first()[0] == 1
    # the NEWEST crawl's timestamp survives
    st = det.where(F.col("url").contains("stop_times")).first()
    orig_ts = pages.where(F.col("url").contains("stop_times")).first().warc_ts
    assert st.warc_ts == orig_ts

    e = extract_entities(doubled)
    conns = pipeline.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"], salt_n=8,
    )
    assert conns.count() == fixtures.SAMPLE_FEED_CONNECTIONS


def test_hostile_header_variant_count_stays_linear(spark):
    """VERDICT r3 #5: ~100 header variants of one gtfs file must NOT
    produce ~100 union branches or a ~100-row driver collect — the
    MAX_HEADER_BRANCHES most common headers get dedicated branches and
    the tail routes through ONE generic name-mapping branch. Values
    must come out identical either way."""
    import itertools

    base_cols = ["stop_id", "stop_name", "stop_desc", "stop_lat", "stop_lon"]
    rows = []
    perms = itertools.permutations(base_cols)
    for i, perm in enumerate(itertools.islice(perms, 100)):
        hdr = ",".join(perm)
        vals = {
            "stop_id": f"S{i:03d}",
            "stop_name": f"Stop {i}",
            "stop_desc": f"desc{i}",
            "stop_lat": "1.0",
            "stop_lon": "2.0",
        }
        body = ",".join(vals[c] for c in perm)
        text = f"{fixtures.GTFS_MARKER} stops.txt feed=hostile\n{hdr}\n{body}\n"
        rows.append((f"http://x/h{i:03d}", text))
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    e = extraction.extract_entities(pages, persist=False)
    stops = e["stops"]
    got = {r.stop_id: (r.stop_name, r.stop_desc) for r in stops.collect()}
    assert len(got) == 100
    assert got["S042"] == ("Stop 42", "desc42")

    # plan stays linear: one posexplode per branch — at most the
    # dedicated cap + ONE generic tail branch, NOT one per variant
    # (inlined per-column from_csv copies are deduped at runtime by
    # codegen subexpression elimination; branch count is the metric
    # that scales with variants)
    plan = stops._jdf.queryExecution().optimizedPlan().toString().lower()
    from gtfs2lc_spark.extraction import MAX_HEADER_BRANCHES
    assert 0 < plan.count("posexplode") <= MAX_HEADER_BRANCHES + 1


def test_generic_tail_branch_required_check_and_quoting(spark):
    """The generic branch enforces REQUIRED_COLS in-plan and parses
    quoted fields exactly like the dedicated path."""
    import itertools

    base_cols = ["stop_id", "stop_name", "stop_desc", "stop_lat", "stop_lon"]
    rows = []
    # 20 variants so stops.txt overflows MAX_HEADER_BRANCHES=16
    for i, perm in enumerate(itertools.islice(itertools.permutations(base_cols), 20)):
        hdr = ",".join(perm)
        vals = {
            "stop_id": f"Q{i:02d}",
            "stop_name": f'"quoted, ""name"" {i}"',
            "stop_desc": "d",
            "stop_lat": "0",
            "stop_lon": "0",
        }
        body = ",".join(vals[c] for c in perm)
        rows.append((f"http://x/q{i}", f"{fixtures.GTFS_MARKER} stops.txt feed=q\n{hdr}\n{body}\n"))
    # plus a tail header MISSING the required stop_id -> rows dropped in-plan
    rows.append((
        "http://x/bad-tail",
        f"{fixtures.GTFS_MARKER} stops.txt feed=q\nstop_name,stop_desc\nX,Y\n",
    ))
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    e = extraction.extract_entities(pages, persist=False)
    got = {r.stop_id: r.stop_name for r in e["stops"].collect()}
    assert len(got) == 20 and "X" not in got.values()
    assert got["Q07"] == 'quoted, "name" 7'
