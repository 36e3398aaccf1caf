"""Event sessionization (datapipe/events.py) and URL canonicalization
(datapipe/web.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gtfs2lc_spark.datapipe import events as dp_events
from gtfs2lc_spark.datapipe import web


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(t), u, v) for i, t, u, v in rows],
        "event_id bigint, ts timestamp_ntz, user_id bigint, value double",
    )


def test_sessionize_gap_boundary_is_exclusive(spark):
    """Gap == threshold stays in-session; threshold + 1 us splits."""
    base = "2026-01-01T00:00:00"
    rows = [
        (1, base, 1, 0.0),
        (2, "2026-01-01T00:30:00", 1, 0.0),          # exactly 1800 s
        (3, "2026-01-01T01:00:00.000001", 1, 0.0),   # 1800 s + 1 us
    ]
    got = {
        r["event_id"]: r["session_idx"]
        for r in dp_events.sessionize(_ev(spark, rows), gap_seconds=1800).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1}


def test_sessionize_is_per_user(spark):
    rows = [
        (1, "2026-01-01T00:00:00", 1, 0.0),
        (2, "2026-01-01T09:00:00", 1, 0.0),
        (3, "2026-01-01T00:00:00", 2, 0.0),
    ]
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in dp_events.sessionize(_ev(spark, rows), gap_seconds=3600).collect()
    }
    assert got == {(1, 1): 0, (1, 2): 1, (2, 3): 0}


def test_session_stats_rollup_and_value_sum(spark):
    rows = [
        (1, "2026-01-01T00:00:00", 1, 1.5),
        (2, "2026-01-01T00:10:00", 1, 2.5),
        (3, "2026-01-01T05:00:00", 1, 4.0),
    ]
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in dp_events.session_stats(
            _ev(spark, rows), gap_seconds=3600, value_col="value"
        ).collect()
    }
    s0 = out[(1, 0)]
    assert s0["n_events"] == 2
    assert s0["duration_us"] == 600 * 1_000_000
    assert s0["total_value"] == 4.0
    assert out[(1, 1)]["n_events"] == 1
    assert out[(1, 1)]["duration_us"] == 0


def test_session_stats_single_exchange(spark):
    """Both windows and the (user, session) rollup must share ONE
    user-keyed shuffle."""
    df = _ev(spark, [(1, "2026-01-01T00:00:00", 1, 0.0)])
    plan = (
        dp_events.session_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def _canon(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(web.canonicalize_url(F.lit(url)).alias("c"))
        .collect()[0]["c"]
    )


def test_canonicalize_url_cases(spark):
    cases = {
        # case + default port + www + utm + fragment
        "HTTPS://WWW.Example.COM:443/Path/1?utm_source=a&ref=2&utm_campaign=b#frag":
            "https://example.com/Path/1?ref=2",
        # trailing slash + http default port
        "http://example.com:80/path/3/": "http://example.com/path/3",
        # bare authority -> root path
        "https://Example.com": "https://example.com/",
        # root slash kept
        "http://example.com/": "http://example.com/",
        # non-default port kept; non-utm params kept in order
        "http://example.com:8080/a?x=1&y=2": "http://example.com:8080/a?x=1&y=2",
        # all params are tracking -> no '?'
        "http://example.com/a?utm_s=1": "http://example.com/a",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, raw


def test_registered_domain(spark):
    got = (
        spark.createDataFrame(
            [("a.b.example.com",), ("example.org",), ("localhost",)], "h string"
        )
        .select(web.registered_domain(F.col("h")).alias("d"))
        .collect()
    )
    assert [r["d"] for r in got] == ["example.com", "example.org", ""]


def test_url_ops_zero_shuffle(spark):
    """Canonicalization is a pure mapper — no Exchange anywhere."""
    df = spark.range(10).select(
        web.canonicalize_url(
            F.concat(F.lit("http://example.com/p/"), F.col("id"))
        ).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tumbling_stats_bucket_boundaries(spark):
    """An event exactly on the hour opens the NEXT bucket (windows are
    [start, end)); counts, sums, and distinct users are per (window,
    type)."""
    rows = [
        (1, "2024-01-01T00:00:00", 1, 1.5, "view"),
        (2, "2024-01-01T00:59:59.999999", 2, 2.0, "view"),
        (3, "2024-01-01T01:00:00", 1, 4.0, "view"),  # next bucket
        (4, "2024-01-01T00:30:00", 1, 8.0, "click"),
        (5, "2024-01-01T00:45:00", 1, 16.0, "view"),  # same user as 1
    ]
    df = spark.createDataFrame(
        [
            (i, dt.datetime.fromisoformat(t), u, v, ty)
            for i, t, u, v, ty in rows
        ],
        "event_id bigint, ts timestamp_ntz, user_id bigint,"
        " value double, event_type string",
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value, r.n_users)
        for r in dp_events.tumbling_stats(df, window_seconds=3600).collect()
    }
    h0 = 1704067200  # 2024-01-01T00:00:00Z
    assert got == {
        (h0, "view"): (3, 19.5, 2),
        (h0, "click"): (1, 8.0, 1),
        (h0 + 3600, "view"): (1, 4.0, 1),
    }


def test_anchor_text_topk_count_and_tiebreak(spark):
    """Per-target top-k by link count; count ties break toward the
    lexicographically smaller anchor; rank k+1 is cut."""
    links = spark.createDataFrame(
        [("t1", "beta"), ("t1", "beta"), ("t1", "alpha"), ("t1", "alpha"),
         ("t1", "gamma"), ("t2", "solo")],
        "dst string, anchor string",
    )
    rows = {
        (r.dst, r.anchor): (r.n_links, r.rank)
        for r in web.anchor_text_topk(links, k=2).collect()
    }
    assert rows == {
        ("t1", "alpha"): (2, 1),   # tie with beta at 2 -> alpha first
        ("t1", "beta"): (2, 2),
        ("t2", "solo"): (1, 1),
    }


def test_anchor_text_topk_single_agg_before_window(spark):
    """The raw link multiset must collapse in a hash aggregation before
    the per-dst window (never a window over raw links): in the printed
    tree (parent-first) the Window is an ancestor of the
    HashAggregate."""
    links = spark.createDataFrame(
        [("t1", "a")] * 10, "dst string, anchor string"
    )
    plan = web.anchor_text_topk(links, k=1)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert plan.index("Window") < plan.index("HashAggregate")


def _asof_frames(spark):
    l = spark.createDataFrame(
        [(1, 5, 10), (1, 2, 20), (2, 9, 30), (3, 4, 40)], "k int, ts int, v int"
    )
    r = spark.createDataFrame(
        [(1, 3, 100), (1, 5, 200), (2, 1, 300)], "k int, ts int, p int"
    )
    return l, r


def test_asof_join_inclusive_match_and_left_semantics(spark):
    """Latest right.ts <= left.ts per key; equal timestamps match
    (inclusive); keys/times with no preceding right row keep NULLs."""
    l, r = _asof_frames(spark)
    got = {
        (row.k, row.ts): (row.v, row.ts_asof, row.p_asof)
        for row in dp_events.asof_join(l, r, key_col="k", ts_col="ts").collect()
    }
    assert got == {
        (1, 2): (20, None, None),     # before first right row
        (1, 5): (10, 5, 200),         # inclusive: right at ts=5 wins over ts=3
        (2, 9): (30, 1, 300),
        (3, 4): (40, None, None),     # key absent on the right
    }


def test_asof_join_duplicate_right_ts_is_deterministic(spark):
    """Two right rows on one (key, ts) collapse to the max payload
    before the join — the result is a pure function of the multiset."""
    l = spark.createDataFrame([(1, 9, 0)], "k int, ts int, v int")
    r = spark.createDataFrame(
        [(1, 4, 7), (1, 4, 3)], "k int, ts int, p int"
    )
    rows = dp_events.asof_join(l, r, key_col="k", ts_col="ts").collect()
    assert len(rows) == 1 and rows[0].p_asof == 7


def test_asof_join_single_key_exchange_no_range_join(spark):
    """The plan is one key-clustered window over the union — no
    broadcast-nested-loop / cartesian range probe anywhere."""
    l, r = _asof_frames(spark)
    plan = (
        dp_events.asof_join(l, r, key_col="k", ts_col="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") == 1


def test_url_filter_reasons_precedence_and_drop(spark):
    """Domain block outranks path block; default mode drops blocked
    rows with the input schema; keep_signals retains reasons."""
    pages = spark.createDataFrame(
        [
            (1, "http://ok.example.org/fine"),
            (2, "http://www.bad.example.com/fine"),        # domain
            (3, "http://ok.example.org/casino/night"),     # path
            (4, "http://sub.bad.example.com/casino"),      # both -> domain
        ],
        "doc_id long, url string",
    )
    audited = {
        r.doc_id: (r.url_keep, r.url_reject_reason)
        for r in web.url_filter(
            pages,
            blocked_domains=["example.com"],
            blocked_path_pattern="casino",
            keep_signals=True,
        ).collect()
    }
    assert audited == {
        1: (True, "pass"),
        2: (False, "domain"),
        3: (False, "path"),
        4: (False, "domain"),
    }
    kept = web.url_filter(
        pages, blocked_domains=["example.com"], blocked_path_pattern="casino"
    )
    assert kept.columns == ["doc_id", "url"]
    assert [r.doc_id for r in kept.collect()] == [1]


def test_url_filter_zero_shuffle(spark):
    pages = spark.createDataFrame([(1, "http://a.b/c")], "doc_id long, url string")
    plan = (
        web.url_filter(pages, blocked_domains=["b.c"], blocked_path_pattern="x")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_asof_join_null_keys_and_ts_never_match(spark):
    """SQL ASOF equality/inequality semantics: NULL keys and NULL
    timestamps match nothing on either side."""
    l = spark.createDataFrame(
        [(None, 5, 1), (1, None, 2), (1, 7, 3)], "k int, ts int, v int"
    )
    r = spark.createDataFrame(
        [(None, 3, 100), (1, None, 200), (1, 4, 300)], "k int, ts int, p int"
    )
    got = {
        row.v: (row.ts_asof, row.p_asof)
        for row in dp_events.asof_join(l, r, key_col="k", ts_col="ts").collect()
    }
    assert got == {
        1: (None, None),   # NULL left key
        2: (None, None),   # NULL left ts
        3: (4, 300),       # normal row unaffected; NULL-ts right row ignored
    }


def test_asof_join_output_collision_raises(spark):
    import pytest as _pytest

    l = spark.createDataFrame([(1, 5, 9)], "k int, ts int, p_asof int")
    r = spark.createDataFrame([(1, 3, 8)], "k int, ts int, p int")
    with _pytest.raises(ValueError, match="already"):
        dp_events.asof_join(l, r, key_col="k", ts_col="ts")


def test_url_filter_port_query_and_schemeless(spark):
    """Ports cannot dodge the domain blocklist; the path probe ignores
    the query string; non-absolute URLs hit neither probe."""
    pages = spark.createDataFrame(
        [
            (1, "http://adsite.biz:8080/x"),          # port-stripped -> domain
            (2, "http://ok.example.org/page?ref=casino"),  # query only -> pass
            (3, "casino-reviews.example/about"),       # schemeless -> pass
            (4, "http://ok.example.org/casino#x"),     # path (fragment cut)
        ],
        "doc_id long, url string",
    )
    audited = {
        r.doc_id: r.url_reject_reason
        for r in web.url_filter(
            pages,
            blocked_domains=["adsite.biz"],
            blocked_path_pattern="casino",
            keep_signals=True,
        ).collect()
    }
    assert audited == {1: "domain", 2: "pass", 3: "pass", 4: "path"}


def test_trailing_stats_range_frame_and_ties(spark):
    import datetime

    from gtfs2lc_spark.datapipe import events as ev

    ts = datetime.datetime.fromisoformat
    rows = [
        # user 1: 00:00, 00:30, 01:00 (exactly at the 3600s boundary:
        # RANGE 3600 PRECEDING is inclusive), 02:30 (window slid past)
        (1, ts("2026-01-01T00:00:00"), 1, "a", 1.0, ""),
        (2, ts("2026-01-01T00:30:00"), 1, "a", 2.0, ""),
        (3, ts("2026-01-01T01:00:00"), 1, "a", 4.0, ""),
        (4, ts("2026-01-01T02:30:00"), 1, "a", 8.0, ""),
        # user 2: two events in the SAME second — RANGE frame includes
        # the tie for BOTH rows
        (5, ts("2026-01-01T00:00:00"), 2, "a", 1.0, ""),
        (6, ts("2026-01-01T00:00:00"), 2, "a", 2.0, ""),
    ]
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    got = {
        r["event_id"]: (r["n_trailing"], r["sum_value_trailing"])
        for r in ev.trailing_stats(df, window_seconds=3600).collect()
    }
    assert got[1] == (1, 1.0)
    assert got[2] == (2, 3.0)
    assert got[3] == (3, 7.0)   # 01:00 still sees 00:00 (inclusive bound)
    assert got[4] == (1, 8.0)   # slid past everything
    assert got[5] == (2, 3.0) and got[6] == (2, 3.0)  # same-second ties


def test_interval_overlap_join_exact_and_blocking_lossless(spark):
    from gtfs2lc_spark.datapipe import events as ev

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 1000, 1100), (3, 5000, 5100)],
        ["lid", "l_start", "l_end"],
    )
    right = spark.createDataFrame(
        [
            (10, 100, 150),    # touches interval 1 exactly at its end (closed)
            (11, 101, 150),    # starts 1 past interval 1's end -> no overlap
            (12, 900, 1000),   # touches interval 2 at its start across a bucket line
            (13, 4000, 4999),  # ends 1 before interval 3 -> no overlap
        ],
        ["rid", "r_start", "r_end"],
    )
    got = {
        (r["lid"], r["rid"])
        for r in ev.interval_overlap_join(left, right, bucket_seconds=64).collect()
    }
    assert got == {(1, 10), (2, 12)}
    # a one-bucket config must give the same answer (blocking lossless)
    got_wide = {
        (r["lid"], r["rid"])
        for r in ev.interval_overlap_join(left, right, bucket_seconds=10**6).collect()
    }
    assert got_wide == got


def test_interval_overlap_join_plan_no_cartesian(spark):
    from gtfs2lc_spark.datapipe import events as ev

    left = spark.range(100).select(
        F.col("id").alias("lid"),
        (F.col("id") * 60).alias("l_start"),
        (F.col("id") * 60 + 30).alias("l_end"),
    )
    right = spark.range(100).select(
        F.col("id").alias("rid"),
        (F.col("id") * 45).alias("r_start"),
        (F.col("id") * 45 + 30).alias("r_end"),
    )
    plan = ev.interval_overlap_join(left, right, bucket_seconds=300)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_preserves_duplicate_rows(spark):
    """Review regression: duplicate input rows must yield duplicate
    output pairs (the old whole-row distinct silently merged them);
    multi-bucket pairs still emit exactly once (first-shared-bucket
    emission, no distinct at all)."""
    from gtfs2lc_spark.datapipe import events as ev

    left = spark.createDataFrame(
        [(0, 100), (0, 100)], ["l_start", "l_end"]  # identical rows, no id
    )
    right = spark.createDataFrame([(50, 150)], ["r_start", "r_end"])
    out = ev.interval_overlap_join(left, right, bucket_seconds=16).collect()
    assert len(out) == 2  # one pair per duplicate left row


def test_ab_metrics_deterministic_and_partitions_users(spark):
    from gtfs2lc_spark.datapipe import events as ev

    rows = [(i, None, i % 40, "a", float(i % 7), "") for i in range(400)]
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    a = sorted(map(tuple, ev.ab_metrics(df, n_arms=2).collect()))
    b = sorted(map(tuple, ev.ab_metrics(df.repartition(7), n_arms=2).collect()))
    assert a == b  # assignment independent of partitioning
    assert sum(r[1] for r in a) == 40   # every user in exactly one arm
    assert sum(r[2] for r in a) == 400  # every event counted once
    assert len(a) == 2


def test_interval_overlap_join_fanout_guard_and_ambiguity(spark):
    """ADVICE r4: an open-ended sentinel interval must fail with a clear
    message (not an opaque array-cap error), and shared non-how_cols
    column names must be rejected at plan time."""
    import pytest
    from gtfs2lc_spark.datapipe import events as ev

    left = spark.createDataFrame(
        [(1, 0, 100), (2, 0, 2**40)], ["lid", "l_start", "l_end"]
    )
    right = spark.createDataFrame([(10, 50, 80)], ["rid", "r_start", "r_end"])
    ok = ev.interval_overlap_join(
        left.where("lid = 1"), right, bucket_seconds=64, max_fanout=10
    ).collect()
    assert {(r["lid"], r["rid"]) for r in ok} == {(1, 10)}
    with pytest.raises(Exception, match="max_fanout"):
        ev.interval_overlap_join(
            left, right, bucket_seconds=64, max_fanout=1000
        ).collect()

    both = left.withColumnRenamed("lid", "id")
    other = right.withColumnRenamed("rid", "id")
    with pytest.raises(ValueError, match="ambiguous"):
        ev.interval_overlap_join(both, other, bucket_seconds=64)


def test_gap_fill_forward_fills_and_flags(spark):
    from gtfs2lc_spark.datapipe import events as ev

    rows = [
        # user 1: active day 0 (two events), gap days 1-2, active day 3
        (1, dt.datetime(2024, 1, 1, 5, 0, 0), 2.0),
        (1, dt.datetime(2024, 1, 1, 9, 0, 0), 3.0),
        (1, dt.datetime(2024, 1, 4, 1, 0, 0), 7.0),
        # user 2: single active day -> single row, no fill
        (2, dt.datetime(2024, 1, 2, 0, 0, 0), 1.5),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r["user_id"], r["bucket_start"]): (r["value"], r["observed"])
        for r in ev.gap_fill(df, step_seconds=86400).collect()
    }
    d0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    day = 86400
    assert got[(1, d0)] == (5.0, True)
    assert got[(1, d0 + day)] == (5.0, False)       # carried forward
    assert got[(1, d0 + 2 * day)] == (5.0, False)   # carried forward
    assert got[(1, d0 + 3 * day)] == (7.0, True)
    assert got[(2, d0 + day)] == (1.5, True)
    assert len(got) == 5


def test_gap_fill_fanout_guard(spark):
    import pytest

    from gtfs2lc_spark.datapipe import events as ev

    rows = [
        (1, dt.datetime(2024, 1, 1), 1.0),
        (1, dt.datetime(2030, 1, 1), 2.0),  # ~2192-day gap
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    with pytest.raises(Exception, match="max_fill"):
        ev.gap_fill(df, step_seconds=86400, max_fill=100).collect()


def test_zscore_outliers_flags_and_degenerates(spark):
    from gtfs2lc_spark.datapipe import events as ev

    rows = (
        # group 'a': nine 10s and one 100 -> the 100 is the outlier
        [(i, "a", 10.0) for i in range(9)] + [(9, "a", 100.0)]
        # group 'b': constant -> stddev 0 -> emits nothing
        + [(20 + i, "b", 5.0) for i in range(4)]
        # group 'c': single row -> stddev NULL -> emits nothing
        + [(30, "c", 42.0)]
    )
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    got = ev.zscore_outliers(df, threshold=2.0).collect()
    assert [(r["event_id"], r["group"]) for r in got] == [(9, "a")]
    # z of the outlier: (100-19)/std; std=round(stddev_samp,6)
    import statistics

    vals = [10.0] * 9 + [100.0]
    want_z = round((100.0 - round(statistics.fmean(vals), 6))
                   / round(statistics.stdev(vals), 6), 6)
    assert got[0]["z"] == want_z


def test_transition_matrix_counts_and_rows_sum_to_one(spark):
    import datetime as _dt

    from gtfs2lc_spark.datapipe import events as ev

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a -> b ; user 2: b -> c
        (1, t0, 1, "a"), (2, t0.replace(minute=1), 1, "b"),
        (3, t0.replace(minute=2), 1, "a"), (4, t0.replace(minute=3), 1, "b"),
        (5, t0, 2, "b"), (6, t0.replace(minute=5), 2, "c"),
        # same-ts tie broken by event_id: 7 before 8
        (7, t0, 3, "c"), (8, t0, 3, "a"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in ev.transition_matrix(df).collect()}
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 0.5)
    assert got[("b", "c")] == (1, 0.5)
    assert got[("c", "a")] == (1, 1.0)
    # rows normalize: sum of p per from_type == 1
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_association_rules_metrics(spark):
    from gtfs2lc_spark.datapipe import events as ev

    # baskets: u1={a,b}, u2={a,b}, u3={a,c}, u4={b}
    rows = [(1, "a"), (1, "b"), (1, "b"),  # dup event collapses
            (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "b")]
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    got = {(r["antecedent"], r["consequent"]): r
           for r in ev.association_rules(df).collect()}
    ab = got[("a", "b")]
    # n(a,b)=2, n_baskets=4, n(a)=3, n(b)=3
    assert ab["n_pair"] == 2
    assert ab["support"] == 0.5
    assert ab["confidence"] == round(2 / 3, 6)
    assert ab["lift"] == round((2 / 3) / (3 / 4), 6)
    # symmetric pair counts, asymmetric confidence
    ba = got[("b", "a")]
    assert ba["n_pair"] == 2 and ba["confidence"] == round(2 / 3, 6)
    assert ("b", "c") not in got
    # min_support prunes
    pruned = ev.association_rules(df, min_support=0.4).collect()
    assert all(r["support"] >= 0.4 for r in pruned)


def test_frequent_paths_and_decay_scores(spark):
    import datetime as _dt

    import pytest as _pytest

    from gtfs2lc_spark.datapipe import events as ev

    t0 = _dt.datetime(2024, 1, 31)  # one day before the decay anchor
    rows = [
        # user 1: a b c a b c -> paths a>b>c x2, b>c>a x1, c>a>b x1
        (i, t0.replace(minute=i), 1, "abcabc"[i], 1.0) for i in range(6)
    ] + [
        # user 2: two events only -> no 3-path
        (10, t0, 2, "a", 4.0), (11, t0.replace(minute=1), 2, "b", 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    paths = {r["path"]: r["n"] for r in ev.frequent_paths(df, length=3).collect()}
    assert paths == {"a>b>c": 2, "b>c>a": 1, "c>a>b": 1}
    with _pytest.raises(ValueError):
        ev.frequent_paths(df, length=1)
    # decay: user 2's 4.0-value event sits exactly one half-life back
    # (anchor 2024-02-01, half-life 1 day) -> weight 0.5
    got = {r["user_id"]: r for r in ev.decay_scores(df).collect()}
    assert got[2]["n_events"] == 2
    assert abs(got[2]["decay_score"] - 2.0) < 1e-3
