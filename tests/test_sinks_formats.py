"""Format sinks: mongo extended JSON (S8), message-counter framing (W4),
N-Triples rendering, jsonld_lines with nextConnection."""

import json

from pyspark.sql import functions as F

from gtfs2lc_spark import sinks


def test_raw_json_format(connections):
    """Reference 'json' format: nested full stop/trip/route rows; the
    regression the reference pins is arrivalStop.stop_id == 'AMV' for
    the first AAMV1 connection (test/resultStream.test.js:49-52)."""
    line = sinks.raw_json_lines(
        connections.where(
            (F.col("trip_id") == "AAMV1") & (F.col("service_date") == "20070106")
        )
    ).first().line
    obj = json.loads(line)
    assert obj["arrivalStop"]["stop_id"] == "AMV"
    assert obj["departureStop"]["stop_name"] == "Nye County Airport (Demo)"
    assert obj["departureTime"] == "2007-01-06T07:00:00.000Z"
    assert obj["trip"]["startTime"] == "2007-01-06T07:00:00.000Z"
    assert obj["trip"]["service_id"] == "WE"
    assert obj["route"]["route_long_name"] == "Airport - Amargosa Valley"
    assert obj["stop_sequence"] == "1"


def test_mongo_lines(jsonld):
    line = sinks.mongo_lines(
        jsonld.where(F.col("id").contains("/AAMV1")).limit(1)
    ).first().line
    obj = json.loads(line)
    assert "_id" in obj and "@id" not in obj
    assert set(obj["departureTime"]) == {"$date"}
    assert obj["departureTime"]["$date"].endswith("Z")


def test_message_counter(connections):
    framed = sinks.triples_with_message_counter(connections.limit(500))
    rows = framed.select("subj", "message_counter").distinct().collect()
    per_subj = {}
    for r in rows:
        per_subj.setdefault(r.subj, set()).add(r.message_counter)
    # one counter per connection, dense from 0
    assert all(len(v) == 1 for v in per_subj.values())
    counters = sorted(next(iter(v)) for v in per_subj.values())
    assert counters == list(range(len(per_subj)))


def test_ntriples_lines(connections):
    lines = sinks.triples_to_ntriples_lines(
        sinks.connections_to_triples(connections.limit(2))
    ).collect()
    for r in lines:
        assert r.line.startswith("<http://example.org/connections/")
        assert r.line.endswith(" .")
    typed = [r.line for r in lines if "departureTime" in r.line]
    assert all('^^<http://www.w3.org/2001/XMLSchema#dateTime>' in ln for ln in typed)


def test_jsonld_lines_with_next_connection(spark, jsonld):
    from gtfs2lc_spark import postprocess

    base = jsonld.drop("feed_id", "type", "departure_ts", "arrival_ts")
    linked = postprocess.join_and_sort(
        base.where(F.col("gtfs_trip").contains("/CITY1/")).where(
            F.col("departureTime").startswith("2007-01-02")
        )
    )
    lines = [json.loads(r.line) for r in sinks.jsonld_lines(linked).collect()]
    with_next = [o for o in lines if "nextConnection" in o]
    assert len(with_next) == 3  # 4 connections chain 1->2->3->4
    assert all(isinstance(o["nextConnection"], list) for o in with_next)
