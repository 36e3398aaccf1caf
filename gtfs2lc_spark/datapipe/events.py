"""Event-stream operators over the (event_id, ts, user_id, ...) shape.

The reference's domain is schedule data, but the same engine ingests
the crawl-side event exhaust (fetch logs, page interactions) that a
web-scale KG-construction pipeline tracks alongside the corpus; gap
sessionization is the canonical such query.

Scale posture: ONE shuffle on the user key.  The boundary-flag window,
the running-sum window, and the per-session aggregation all require
clustering by ``user_col`` (the aggregation keys are a superset), so
Catalyst reuses the single exchange for all three — asserted in
tests/test_kg.py's plan check.  Sessions are user-local, so skew is
bounded by the hottest single user; a hostile bot user concentrates
its rows on one task, which is inherent to gap semantics (a session
cannot be split across tasks) — cap bot users upstream if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "session_stats",
    "tumbling_stats",
    "asof_join",
    "scd2_intervals",
    "hopping_stats",
]


def _micros(c):
    return F.unix_micros(c.cast("timestamp_ltz"))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-user session index to every event: a new session
    starts when the gap since the previous event exceeds
    ``gap_seconds``.  Ties in ``ts`` break on ``id_col`` so the lag
    order (and therefore the session boundaries) is deterministic.

    Adds ``session_idx`` (0-based per user).  Pure window algebra —
    no UDFs, whole-stage codegen throughout.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    # exact microsecond arithmetic — second-floor differences would
    # misclassify gaps within 1 s of the threshold.  unix_micros needs
    # TIMESTAMP_LTZ; parquet event times are NTZ, and with the session
    # tz pinned UTC the cast is the identity instant mapping.
    boundary = (
        prev_ts.isNotNull()
        & (
            _micros(F.col(ts_col)) - _micros(prev_ts)
            > F.lit(int(gap_seconds) * 1_000_000).cast("bigint")
        )
    ).cast("bigint")
    return events.withColumn(
        "session_idx",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: event count, start/end, duration seconds,
    and (optionally) a value sum.  Shares the sessionize exchange —
    the groupBy keys (user, session_idx) are clustered by the window's
    user partitioning, so no second shuffle."""
    s = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(_micros(F.col(ts_col))) - F.min(_micros(F.col(ts_col)))
        ).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return s.groupBy(user_col, "session_idx").agg(*aggs)


def tumbling_stats(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
    window_seconds: int = 3600,
) -> DataFrame:
    """Fixed tumbling-window rollup via the NATIVE ``F.window``
    assigner — the batch twin of the streaming watermark aggregation
    (streaming.py uses the same assigner on the live path, so batch
    backfill and live dashboards share one windowing semantics).

    Emits one row per (window, event type): event count, value sum
    (rounded 6 dp) and distinct users.  ``window_start`` is epoch
    seconds (bigint) — integer bucket arithmetic is engine-portable,
    no timestamp rendering involved.

    Scale shape: one map-side-combinable hash aggregation keyed on
    (window, type); the distinct-user count expands on (window, type,
    user) so hot windows spread across the cluster before the final
    rollup.  The window assignment itself is pure codegen — tumbling
    windows assign exactly one bucket per row, no explode.
    """
    w = F.window(F.col(ts_col), f"{int(window_seconds)} seconds")
    return (
        events.groupBy(w.alias("_w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.countDistinct(user_col).alias("n_users"),
        )
        .select(
            # parquet event times are NTZ; with the session tz pinned
            # UTC the LTZ cast is the identity instant mapping (same
            # contract as sessionize._micros)
            (_micros(F.col("_w.start")) / F.lit(1_000_000))
            .cast("long")
            .alias("window_start"),
            type_col,
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Temporal as-of join: attach to every left row the LATEST right
    row with ``right.ts <= left.ts`` in the same key (left-join
    semantics — unmatched rows keep NULLs).  The point-in-time lookup
    of event pipelines (last config change before this fetch, last
    error before this click, latest quote before this trade) and a
    core engine op the DataFrame API lacks natively.

    Spark-first formulation: a UNION of both streams, one window
    pass.  Right rows carry their payload; left rows carry NULL; a
    ``last(payload, ignorenulls=True)`` over (key) ordered by
    (ts, side) — right sorts BEFORE a left row at the same timestamp,
    so the match is inclusive (<=), exactly DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``.  This is the sort-based
    carry-forward shape (kdb aj / Flink temporal join), NOT a range
    join: no per-row range probe, no candidate explosion.

    Determinism: several right rows on one (key, ts) collapse first to
    the MAX payload struct (lexicographic over (ts, *value_cols)) in a
    map-side-combinable pre-aggregation, so the answer is a pure
    function of the input multisets.

    NULL semantics match SQL ASOF equality/inequality: right rows with
    a NULL key or NULL timestamp can never match and are dropped from
    the probe side; left rows with a NULL key or NULL timestamp get
    NULL payloads (NULLs sort first under the ascending window order,
    before any surviving right row, so the carry-forward is naturally
    empty for them).  Raises ``ValueError`` if an output column name
    (``<col><suffix>``) collides with an existing left column.

    Scale posture: ONE shuffle clustering both streams by ``key_col``
    (the pre-agg shuffles right on (key, ts), map-side combined); the
    window sort is per-key and spills; skew is bounded by the hottest
    key, inherent to as-of semantics.  Output: every left column, plus
    ``<ts_col><suffix>`` and ``<v><suffix>`` for each value column.
    """
    vals = value_cols if value_cols is not None else [
        c for c in right.columns if c not in (key_col, ts_col)
    ]
    clash = [c for c in [ts_col] + vals if f"{c}{suffix}" in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output columns {[c + suffix for c in clash]} already "
            "exist on the left side; pass a different suffix"
        )
    payload = F.struct(
        F.col(ts_col).alias("_r_ts"), *[F.col(c) for c in vals]
    )
    r = (
        right.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(key_col, ts_col)
        .agg(F.max(payload).alias("_p"))
    )
    p_type = r.schema["_p"].dataType
    l_struct = F.struct(*[left[c] for c in left.columns])
    l_type = left.select(l_struct.alias("_l")).schema["_l"].dataType
    u = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        l_struct.alias("_l"),
        F.lit(None).cast(p_type).alias("_p"),
    ).unionByName(
        r.select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).alias("_ts"),
            F.lit(0).alias("_is_left"),
            F.lit(None).cast(l_type).alias("_l"),
            F.col("_p"),
        )
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_c", F.last("_p", ignorenulls=True).over(w))
    return carried.where(F.col("_is_left") == 1).select(
        F.col("_l.*"),
        F.col("_c._r_ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_c.{c}").alias(f"{c}{suffix}") for c in vals],
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Build slowly-changing-dimension type-2 validity intervals from a
    change log: each event (a new observed version of ``key_col``'s
    state — a re-crawl of a url, a profile update) is valid from its
    own timestamp until the NEXT event for the same key; the latest
    version per key is open-ended and flagged current.

    This is the warehouse step that turns the crawl's append-only
    snapshot stream into point-in-time queryable history (the interval
    twin of the as-of join — :func:`asof_join` answers "which version
    was live at time T" against exactly these intervals).

    Pure window algebra: one ``lead`` over (key, ts, id) — a single
    key-clustered exchange, no joins, no UDFs. Ties in ``ts`` break on
    ``id_col`` so interval chaining is deterministic. Timestamps are
    emitted as epoch MICROSECONDS (bigint) — exact integer arithmetic,
    engine-portable, no rendering semantics in the compare.

    Output: (key, id, valid_from_us, valid_to_us NULL-for-current,
    is_current).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    nxt = F.lead(F.col(ts_col)).over(w)
    return events.select(
        F.col(key_col),
        F.col(id_col),
        _micros(F.col(ts_col)).alias("valid_from_us"),
        _micros(nxt).alias("valid_to_us"),
        nxt.isNull().cast("boolean").alias("is_current"),
    )


def hopping_stats(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    window_seconds: int = 3600,
    slide_seconds: int = 900,
) -> DataFrame:
    """Hopping (sliding) window rollup via the NATIVE ``F.window``
    assigner with a slide — each event lands in exactly
    ``window_seconds / slide_seconds`` overlapping windows (the
    assigner requires the size to be a multiple of the slide here so
    the fan-out is a fixed small constant, asserted).

    The overlap factor is a *bounded explode inside the scan* (Spark
    plans it as a generator over the window list), after which the
    rollup is one map-side-combinable hash aggregation keyed on
    (window_start, type) — hot windows combine per-task before the
    exchange exactly like the tumbling path. ``window_start`` is epoch
    seconds (bigint): integer bucket arithmetic, engine-portable.

    Output: (window_start, type, n_events, sum_value rounded 6 dp).
    """
    size, slide = int(window_seconds), int(slide_seconds)
    if size % slide != 0:
        raise ValueError(
            f"window_seconds ({size}) must be a multiple of "
            f"slide_seconds ({slide}) for the fixed-fan-out hopping shape"
        )
    w = F.window(F.col(ts_col), f"{size} seconds", f"{slide} seconds")
    return (
        events.groupBy(w.alias("_w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            (_micros(F.col("_w.start")) / F.lit(1_000_000))
            .cast("long")
            .alias("window_start"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def funnel_times(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for every user who performed
    ``steps[0]``, the earliest time of each subsequent step STRICTLY
    after the previous step's time (the classic product funnel — here
    it audits the crawl/ingest event exhaust the same way: fetch ->
    parse -> emit). Emits one row per step-0 user with epoch-microsecond
    times, NULL from the first step the user never completed.

    Scale shape: one staged min-aggregation per step — each stage
    filters the fact table by type (predicate pushed to the scan),
    equi-joins the previous stage's (user, t) frame on the user key,
    and min-aggregates map-side. Every stage clusters on ``user_col``,
    so the per-stage exchanges are the same partitioning end to end;
    no windows, no per-user event collection (a bot user with 10^8
    events costs its aggregation only).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    t0 = f"t_{steps[0]}"
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(_micros(F.col(ts_col))).alias(t0))
    )
    prev = t0
    for step in steps[1:]:
        tn = f"t_{step}"
        nxt = (
            events.where(F.col(type_col) == step)
            .select(F.col(user_col), _micros(F.col(ts_col)).alias("_t"))
            .join(cur.select(user_col, prev), user_col)
            .where(F.col("_t") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("_t").alias(tn))
        )
        cur = cur.join(nxt, user_col, "left")
        prev = tn
    return cur


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86400,
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity period
    (cohort), counted once per later period they return in. Output
    (cohort_period, period_offset, n_users) — the classic retention
    triangle, period buckets as integer epoch divisions (engine-exact).

    Scale shape: first-activity is one map-side-combinable min per
    user; activity periods deduplicate map-side as distinct
    (user, period); the user-keyed equi-join clusters both on the same
    key; the final count expands on (cohort, offset, user) before the
    tiny triangle rollup — hot cohorts spread, nothing single-reducer.
    """
    p = F.lit(int(period_seconds) * 1_000_000).cast("bigint")
    per = (_micros(F.col(ts_col)) / p).cast("long")
    first = events.groupBy(user_col).agg(F.min(per).alias("cohort_period"))
    active = events.select(F.col(user_col), per.alias("_p")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_period",
            (F.col("_p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def trailing_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window_seconds: int = 3600,
) -> DataFrame:
    """Per-event TRAILING aggregate over a time-range frame: for every
    event, the count and value-sum of the same user's events in the
    preceding ``window_seconds`` (inclusive of the current row and of
    same-second ties — RANGE frame semantics, which both engines
    define identically; a ROWS frame would be tie-order ambiguous).

    This is the remaining window-frame surface: W1-W4 use lag/lead and
    unbounded running frames; this is ``Window.rangeBetween`` on an
    integer event-time key — sliding feature windows (fraud velocity
    checks, rate limits, rolling engagement) without self-joins.
    One user-keyed exchange; frame evaluation is a per-partition
    two-pointer scan, never quadratic.
    """
    sec = (_micros(F.col(ts_col)) / F.lit(1_000_000).cast("bigint")).cast("long")
    w = (
        Window.partitionBy(user_col)
        .orderBy(sec)
        .rangeBetween(-int(window_seconds), 0)
    )
    return events.select(
        id_col,
        user_col,
        sec.alias("epoch_sec"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
        F.round(F.sum(F.col(value_col)).over(w), 6).alias("sum_value_trailing"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    bucket_seconds: int = 3600,
    how_cols: tuple = (),
    max_fanout: int = 100_000,
) -> DataFrame:
    """Generic interval-overlap (range) join without a cartesian
    product: every interval explodes to the fixed-width time buckets
    it covers, candidates meet through a bucket equi-join, and the
    exact overlap predicate verifies. A pair that shares several
    buckets is emitted exactly once WITHOUT any distinct: only the
    FIRST bucket both intervals cover —
    ``floor(max(l_start, r_start) / bucket)``, which any overlapping
    pair necessarily shares — emits it, so duplicate input rows
    survive as duplicate output pairs (a whole-row distinct would
    silently merge them) and the dedup shuffle disappears entirely.
    Overlap is the closed-interval test
    ``l_start <= r_end AND r_start <= l_end`` (integer units).

    Per-row fan-out is ``len/bucket_seconds + 1`` — pick the bucket
    near the TYPICAL interval length: too small multiplies the
    explode, too large turns a bucket into a mini cross product (a
    bucket's cost is |left∩bucket| x |right∩bucket|, the same
    locality economics as the geo grid join). Columns listed in
    ``how_cols`` additionally equi-join (e.g. a tenant key), tightening
    the blocking for free.

    Start/end columns must be integer epoch units (callers produce
    them via ``_micros``-style exact arithmetic).

    ``max_fanout`` bounds the per-row explode width: one open-ended
    sentinel interval (e.g. end = INT64_MAX) would otherwise make
    F.sequence emit billions of elements on a single row and die with
    an opaque array-length error — instead the row fails the job with
    a message naming the row's span and this knob. Clamp sentinel ends
    (or raise bucket_seconds) rather than raising max_fanout past
    Spark's ~2^31 array cap.

    The two inputs' column names must be disjoint apart from
    ``how_cols`` (checked at plan time): the raw join would otherwise
    return ambiguous duplicate columns.
    """
    b = int(bucket_seconds)
    dup = (set(left.columns) & set(right.columns)) - set(how_cols)
    if dup:
        raise ValueError(
            "interval_overlap_join: columns present on BOTH sides would "
            f"be ambiguous in the output: {sorted(dup)}; rename/prefix "
            "one side (only how_cols may be shared)"
        )

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        span = (F.col(e) / b).cast("long") - (F.col(s) / b).cast("long") + 1
        guard = F.when(
            span > int(max_fanout),
            F.raise_error(
                F.format_string(
                    "interval_overlap_join: interval spans %d buckets of "
                    f"{b}s (max_fanout={int(max_fanout)}); clamp sentinel "
                    "end values or raise bucket_seconds",
                    span,
                )
            ),
        )
        return df.withColumn(
            "_bk",
            F.explode(
                F.coalesce(
                    guard.cast("array<long>"),
                    F.sequence(
                        (F.col(s) / b).cast("long"), (F.col(e) / b).cast("long")
                    ),
                )
            ),
        )
    lb = bucketed(left, l_start, l_end)
    rb = bucketed(right, r_start, r_end)
    on = ["_bk", *how_cols]
    first_shared = (
        F.greatest(F.col(l_start), F.col(r_start)) / b
    ).cast("long")
    return (
        lb.join(rb, on)
        .where(
            (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
        )
        .where(F.col("_bk") == first_shared)
        .drop("_bk")
    )


def ab_metrics(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    n_arms: int = 2,
    seed: str = "ab-v1",
) -> DataFrame:
    """Experiment readout: users deterministically assigned to arms by
    the engine-portable seeded hash (same stability contract as
    hash_split — membership never changes across runs, engines, or
    corpus growth), then per-arm exposure and outcome metrics. The
    assignment is a pure narrow expression on the fact table; the
    readout is one combinable aggregation (distinct users expands on
    (arm, user) before the n_arms-row rollup, so a hot arm never
    single-tasks the distinct).

    Output: (arm, n_users, n_events, mean_value rounded 6 dp).
    """
    from .dedup import portable_hash32

    arm = F.pmod(
        portable_hash32(
            F.concat(F.lit(seed), F.lit("|"), F.col(user_col).cast("string"))
        ),
        F.lit(int(n_arms)),
    ).alias("arm")
    per_user = events.select(arm, F.col(user_col).alias("u"), F.col(value_col).alias("v"))
    return (
        per_user.groupBy("arm")
        .agg(
            F.count_distinct("u").cast("long").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("v"), 6).alias("mean_value"),
        )
    )


def gap_fill(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 86400,
    max_fill: int = 100_000,
) -> DataFrame:
    """Dense per-key time series with forward fill: aggregate
    ``value_col`` into fixed ``step_seconds`` buckets per key, then
    emit EVERY bucket between each key's first and last observed
    bucket, carrying the last observed aggregate across gaps — the
    resample/ffill step feature pipelines need before windowed models
    (ML feature matrices want one row per (key, period), not a sparse
    event log).

    Forward fill WITHOUT a second join or an unbounded-window scan:
    after the bucket rollup, ``lead(bucket)`` per key bounds each
    observed row's fill run, and one map-side ``sequence`` explode
    emits the run carrying that row's value — so the whole operator is
    the rollup exchange plus ONE key-ordered window pass; the explode
    adds rows but never shuffles them again.

    ``observed`` marks real buckets (false = carried forward). A gap
    longer than ``max_fill`` steps raises at runtime with the offending
    key and knob named (an open-ended sentinel timestamp would
    otherwise explode millions of rows per input row — same guard
    contract as :func:`interval_overlap_join`).

    Output: ``(user_id, bucket_start: long epoch sec, value, observed)``.
    """
    step = int(step_seconds)
    # FLOOR division of the epoch micros (ADVICE r5 #1): the oracle
    # buckets via epoch_us // (step * 1e6); a double-divide +
    # cast('long') truncates toward zero, mis-bucketing pre-1970
    # timestamps. pmod is non-negative, so (micros - pmod) is the exact
    # floor multiple and the remaining division is exact (multiples of
    # step_us are < 2^53 for any realistic epoch).
    mic = _micros(F.col(ts_col))
    step_us = F.lit(step * 1_000_000).cast("bigint")
    floor_q = ((mic - F.pmod(mic, step_us)) / step_us).cast("long")
    bucket = (floor_q * step).alias("_bucket")
    rolled = (
        events.select(F.col(user_col), bucket, F.col(value_col).alias("_v"))
        .groupBy(user_col, "_bucket")
        .agg(F.round(F.sum("_v"), 6).alias("_sum"))
    )
    w = Window.partitionBy(user_col).orderBy("_bucket")
    # window result staged as a column first — a generator argument may
    # not contain a window expression
    staged = rolled.withColumn(
        "_end",
        F.coalesce(F.lead("_bucket").over(w) - F.lit(step), F.col("_bucket")),
    )
    guarded_end = F.when(
        (F.col("_end") - F.col("_bucket")) / F.lit(step) > F.lit(int(max_fill)),
        F.raise_error(
            F.concat(
                F.lit(f"gap_fill: fill run exceeds max_fill={int(max_fill)} steps for key "),
                F.col(user_col).cast("string"),
                F.lit("; raise max_fill or pre-filter sentinel timestamps"),
            )
        ).cast("long"),
    ).otherwise(F.col("_end"))
    filled = staged.select(
        F.col(user_col),
        F.col("_bucket"),
        F.col("_sum"),
        F.explode(F.sequence(F.col("_bucket"), guarded_end, F.lit(step))).alias(
            "bucket_start"
        ),
    )
    return filled.select(
        user_col,
        "bucket_start",
        F.col("_sum").alias("value"),
        (F.col("bucket_start") == F.col("_bucket")).alias("observed"),
    )


def zscore_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 2.0,
) -> DataFrame:
    """Per-group z-score anomaly flagging: events whose value deviates
    from their group's mean by ≥ ``threshold`` sample standard
    deviations — the cheap first-pass outlier screen before anything
    model-based (value-corruption detection in training corpora, metric
    spike triage).

    One exchange: both moments come from an unbounded window over the
    group key, so the stats and the per-row z share a single partition
    pass — no aggregate-then-join-back. Mean and stddev are rounded at
    the 6-dp boundary BEFORE the z computation (the round-at-boundary
    determinism contract of text.train_quality_classifier: the division
    would amplify last-bit FP-sum-order differences across engines; the
    raw value itself is bit-exact in both). Degenerate groups
    (stddev 0 or a single row) emit nothing — there is no deviation to
    score.

    Output: ``(event_id, group, value, z)``, z rounded 6 dp, filtered
    on the ROUNDED |z| so the threshold is engine-exact.
    """
    w = Window.partitionBy(group_col)
    mean_r = F.round(F.avg(value_col).over(w), 6)
    std_r = F.round(F.stddev_samp(value_col).over(w), 6)
    z = F.round((F.col(value_col) - mean_r) / std_r, 6)
    return (
        events.select(
            F.col(id_col),
            F.col(group_col).alias("group"),
            F.col(value_col).alias("value"),
            std_r.alias("_std"),
            z.alias("z"),
        )
        .where(F.col("_std") > 0)
        .where(F.abs(F.col("z")) >= float(threshold))
        .drop("_std")
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix of an event stream: for
    every ordered (from_type, to_type) pair of CONSECUTIVE events of
    the same user, the transition count and the row-normalized
    probability — the session-model fingerprint (journey analysis,
    bot-vs-human separation, next-event prediction baselines).

    Consecutiveness is per user under the (ts, id) total order (the
    sessionize tie-break contract, so boundaries are deterministic).
    One user-keyed window pass emits the lag pairs; the count matrix
    is a map-side-combinable groupBy with at most |types|² rows, and
    the row normalization is a window over that tiny matrix — no
    second pass over the events. The probability is a ratio of two
    exact integers (IEEE division is exactly rounded, engine-portable)
    rounded to 6 dp.

    Output: ``(from_type, to_type, n, p)``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row), 6).alias("p"),
    )


def association_rules(
    events: DataFrame,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_support: float = 0.0,
) -> DataFrame:
    """Market-basket association rules over (basket, item) data: for
    every ordered pair of DISTINCT items co-present in a basket,
    support / confidence / lift — the classic co-occurrence mining
    family (content recommendation, "users who hit X also hit Y"),
    distinct from PMI collocations (which score ADJACENT token pairs,
    not basket co-presence).

    Shape: dedup to distinct (basket, item) — one map-side-combinable
    exchange — then a basket-keyed self-equi-join producing only
    within-basket pairs (per-basket fan-out is |distinct items|², and
    the item vocabulary is bounded, so no quadratic blowup in corpus
    size; a hostile basket with ALL items contributes |items|² rows
    once, not per event). Rule metrics are exact-integer ratios
    (IEEE-exact division) rounded 6 dp:

        support(X→Y)    = n(X,Y) / n_baskets
        confidence(X→Y) = n(X,Y) / n(X)
        lift(X→Y)       = confidence / (n(Y) / n_baskets)

    ``min_support`` prunes on the rounded support. Output:
    ``(antecedent, consequent, n_pair, support, confidence, lift)``.
    """
    bi = (
        # NULL baskets/items are excluded: a NULL basket can never
        # produce a pair (the equi-join drops it) but WOULD otherwise
        # inflate n_baskets, skewing support/lift
        events.where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    n_baskets = F.broadcast(bi.select("_b").distinct().agg(F.count(F.lit(1)).alias("_nb")))
    item_n = bi.groupBy("_i").agg(F.count(F.lit(1)).alias("_ni"))
    pairs = (
        bi.alias("l")
        .join(bi.alias("r"), "_b")
        .where(F.col("l._i") != F.col("r._i"))
        .groupBy(
            F.col("l._i").alias("antecedent"), F.col("r._i").alias("consequent")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    ante = F.broadcast(item_n.select(F.col("_i").alias("antecedent"), F.col("_ni").alias("_na")))
    cons = F.broadcast(item_n.select(F.col("_i").alias("consequent"), F.col("_ni").alias("_nc")))
    out = (
        pairs.join(ante, "antecedent")
        .join(cons, "consequent")
        .crossJoin(n_baskets)
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.round(F.col("n_pair") / F.col("_nb"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("_na"), 6).alias("confidence"),
            F.round(
                (F.col("n_pair") / F.col("_na")) / (F.col("_nc") / F.col("_nb")), 6
            ).alias("lift"),
        )
    )
    if min_support > 0:
        out = out.where(F.col("support") >= float(min_support))
    return out


def frequent_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    length: int = 3,
    top_k: int = 50,
) -> DataFrame:
    """Top-k most frequent length-``length`` CONSECUTIVE event-type
    paths across all users — sequence mining one step beyond
    :func:`transition_matrix`'s bigrams (the "what do journeys
    actually look like" report; funnel_times checks ONE prescribed
    path, this discovers them).

    One user-keyed window pass emits ``length-1`` lags per event
    (consecutiveness under the (ts, id) sessionize tie-break order —
    deterministic); the path count is a map-side-combinable groupBy
    over at most |types|^length keys, and top-k resolves via
    TakeOrderedAndProject under the (count DESC, path ASC) total
    order — no global sort.

    Output: ``(path: "a>b>c", n)``.
    """
    if length < 2:
        raise ValueError(f"length must be >= 2, got {length}")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = [
        F.lag(type_col, length - 1 - i).over(w) for i in range(length - 1)
    ] + [F.col(type_col)]
    # NULL-PROPAGATING concatenation (ADVICE r5 #2): the oracle builds
    # the path with '||', so a window containing a NULL event_type
    # yields a NULL path (one grouped row), not a silently shorter
    # path — concat matches that; concat_ws would skip the NULL and
    # count e.g. 'a>b' as a 3-path. NULLS LAST on the tiebreak mirrors
    # DuckDB's ASC default so the top-k boundary agrees too.
    sep = F.lit(">")
    interleaved: list = []
    for s in steps[:-1]:
        interleaved += [s, sep]
    path = F.concat(*interleaved, steps[-1])
    first = steps[0]
    return (
        events.select(path.alias("path"), first.alias("_first"))
        .where(F.col("_first").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_last("path"))
        .limit(int(top_k))
    )


def decay_scores(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_seconds: float = 86400.0,
    as_of_ts: str = "2024-02-01 00:00:00",
) -> DataFrame:
    """Per-user exponentially time-decayed engagement score:
    ``Σ value · 2^(-Δt / half_life)`` with Δt measured back from a
    FIXED ``as_of_ts`` — the recency-weighted activity signal behind
    ranking and churn features (a click yesterday counts ~2x a click
    two half-lives ago).

    Determinism note: the per-event weight is a fixed double
    expression over exact inputs (both engines' pow/exp2 agree to the
    last ulp or below the 6-dp round), but the per-user SUM is
    FP-order-dependent, so the score is rounded 6 dp — same contract
    as every FP aggregate in the gate (pmi, nll). ``as_of_ts`` must
    be explicit, not now(): a moving anchor makes the operator
    non-reproducible across runs.

    One map-side-combinable aggregation; zero joins.
    Output: ``(user_id, n_events, decay_score)``.
    """
    dt = (
        F.unix_micros(F.to_timestamp(F.lit(as_of_ts)).cast("timestamp_ltz"))
        - _micros(F.col(ts_col))
    ) / F.lit(1_000_000.0)
    weight = F.pow(F.lit(2.0), -dt / F.lit(float(half_life_seconds)))
    return (
        events.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value_col) * weight), 6).alias("decay_score"),
        )
    )
