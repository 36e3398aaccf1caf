"""Structured Streaming ingest: a growing pages table -> incremental
Linked Connections.

The reference is strictly batch (SURVEY.md §2.7) — this is the Spark-
native extension a continuously-crawled corpus needs. Shape:

    readStream(pages dir) ──▶ foreachBatch:
        detect_pages(batch)                     (pandas-UDF, batch only)
        stage detected pages                    (staging/batch=N, overwrite)
        entities_from_detected(staged ∪)        (ALL staged pages of the
                                                 feeds touched this batch)
        pipeline.convert(...)                   (same batch algebra)
        HistoryStore.differential(< batch N)    (delta vs earlier batches)
        write delta                             (output/batch=N, overwrite)
        HistoryStore.commit(snapshot_id = N)

Why stage-and-reconvert instead of converting each batch in isolation:
a feed spans 4-6 GTFS files, and the file source (maxFilesPerTrigger)
can split them across micro-batches — converting only the batch's pages
would silently drop stop_times whose trips/stops/calendar pages arrive
in another batch, and the source never re-reads files. Staging the
(tiny, post-detection) pages and reconverting the feeds *touched by
this batch* makes late-arriving entity pages retroactively productive:
the history anti-join emits exactly the connections that became newly
derivable. Per-trigger cost is proportional to the touched feeds, not
the corpus (feed_id predicate pushdown on the staging parquet; at real
scale the staging table would be bucketed by feed_id).

Exactly-once output, including mid-batch crashes: every effect of batch
N is keyed by N with overwrite semantics —

- staging/batch=N        (overwrite: replay re-stages identical rows)
- output/batch=N         (overwrite: replay rewrites, never appends)
- history snapshot=N     (overwrite commit marker last)

and the delta is computed against history snapshots with id < N only,
so a replayed batch reproduces its original delta byte-for-byte even
when its own history commit already landed. A crash at ANY point
between effects therefore converges on replay (tested by
tests/test_streaming.py::test_crash_between_output_and_commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from . import pipeline, sinks
from .checkpoint import HistoryStore
from .extraction import detect_pages, entities_from_detected
from .materialize import materialize, sweep_staging
from .schemas import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(pages_dir)
    )


def process_pages_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store: HistoryStore,
    staging_dir: str,
    output_dir: str,
    feed_tz: str = "Europe/Brussels",
    salt_n: int | None = 16,
) -> None:
    """One idempotent micro-batch step (see module docstring). Public so
    tests can drive crash/replay scenarios without a streaming query."""
    if batch.isEmpty():
        return
    detected = materialize(detect_pages(batch), "stream-detected")
    feeds = [r.feed_id for r in detected.select("feed_id").distinct().collect()]
    detected.write.mode("overwrite").parquet(f"{staging_dir}/batch={batch_id}")
    if not feeds:
        return
    # A re-crawled url (same url detected again in a later batch — the
    # natural update path for a continuously-crawled corpus) must
    # REPLACE its earlier staged rows, not union with them. Order of
    # operations matters three times over:
    #
    # - newest-per-url is taken over ALL staged rows BEFORE the feed_id
    #   filter: a url whose newest crawl moved to a different feed must
    #   not resurrect its stale snapshot when its old feed is touched;
    # - "newest" is decided by warc_ts FIRST (the crawl time), exactly
    #   like the batch path (detect_pages): a later-arriving batch that
    #   backfills an OLDER crawl of a url does NOT replace the staged
    #   newer snapshot. Batch id then content break warc_ts ties, so
    #   two crawls of one url in the SAME batch still resolve to a
    #   deterministic row and a crash-replayed batch reproduces its
    #   delta byte-for-byte.
    #
    # (A url whose newer crawl no longer contains GTFS content is not
    # re-detected, so its last detected snapshot remains staged —
    # retraction would need an explicit tombstone, out of scope.)
    staged_all = spark.read.parquet(staging_dir)
    data_cols = [c for c in staged_all.columns if c != "batch"]
    # cheap per-trigger preselect (2-column pruned scan): urls that have
    # EVER carried a touched feed — the full-width body scan below only
    # reads these urls' rows, keeping per-trigger cost proportional to
    # the touched feeds, not the corpus
    touched_urls = (
        staged_all.select("url", "feed_id")
        .where(F.col("feed_id").isin(feeds))
        .select("url")
        .distinct()
    )
    staged = (
        staged_all.join(F.broadcast(touched_urls), "url")
        .groupBy("url")
        .agg(
            F.max(
                F.struct(
                    F.col("warc_ts").alias("_ts"),
                    F.col("batch").cast("long").alias("_b"),
                    *[F.col(c).alias(c) for c in data_cols],
                )
            ).alias("_s")
        )
        .select("_s.*")
        .drop("_ts", "_b")
        # the WINNER's feed decides membership: a url whose newest crawl
        # moved to an untouched feed is dropped here, not resurrected
        .where(F.col("feed_id").isin(feeds))
    )
    # materialize once: entities_from_detected embeds this subtree
    # into ~6 entity lineages plus two driver collects — Catalyst
    # doesn't share sub-plans (same rationale as extract_entities)
    staged = materialize(staged, "stream-staged")
    e = entities_from_detected(staged)
    conns = pipeline.convert(
        e["stop_times"], e["trips"], e["routes"], e["stops"],
        e["calendar"], e["calendar_dates"],
        feed_tz=feed_tz, salt_n=salt_n,
    )
    delta = store.differential(conns, before_snapshot=batch_id)
    # persist: consumed twice (output + history commit)
    delta = materialize(delta, "stream-delta")
    sinks.jsonld_lines(sinks.connections_to_jsonld(delta)).write.mode(
        "overwrite"
    ).text(f"{output_dir}/batch={batch_id}")
    store.commit(
        delta, run_info={"stream_batch_id": batch_id}, snapshot_id=batch_id
    )
    # batch barrier: output + history are committed, so this batch's
    # parquet-strategy staging dirs (detected/staged/delta) are garbage
    # — sweep them or a long-running stream leaks one intermediate copy
    # per materialize() call (no-op under local/reliable strategies)
    sweep_staging(spark)


def departure_volume_stream(
    spark: SparkSession,
    connections_dir: str,
    watermark: str = "1 hour",
    window: str = "15 minutes",
) -> DataFrame:
    """Event-time windowed aggregation over a stream of connections:
    departures per ``window`` of event time (departure_ts), with a
    ``watermark`` bounding how late a connection may arrive and still
    count. The standard Structured Streaming shape — withWatermark +
    window() groupBy — so state is bounded and, in append mode, a
    window emits exactly once when the watermark passes it (late rows
    inside the watermark are still aggregated; older ones are dropped).

    Input: a directory of connection parquet (e.g. the pipeline's
    triples-parquet staging or any sink that keeps departure_ts).
    Returns the unstarted streaming DataFrame; callers pick the sink.
    """
    schema = (
        "feed_id string, trip_id string, departure_ts timestamp, "
        "arrival_ts timestamp, dep_stop_id string, arr_stop_id string"
    )
    s = spark.readStream.schema(schema).option("maxFilesPerTrigger", "8").parquet(
        connections_dir
    )
    return (
        s.withWatermark("departure_ts", watermark)
        .groupBy(F.window("departure_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_departures"),
            F.approx_count_distinct("trip_id").alias("n_trips_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_departures",
            "n_trips_approx",
        )
    )


def trip_session_stream(
    spark: SparkSession,
    connections_dir: str,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): a
    running per-trip session — connection count + first departure /
    last arrival epoch — maintained in the state store across
    micro-batches AND query restarts. Each batch emits the updated
    session row for every trip it touched (update semantics).

    The Arrow-batched state path is the Spark-native replacement for
    hand-rolled per-key stream state (the reference's in-process Maps,
    e.g. tripsLastConnection in bin/linkedconnections-sort.js:138).
    """
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = (
        "feed_id string, trip_id string, departure_ts timestamp, "
        "arrival_ts timestamp, dep_stop_id string, arr_stop_id string"
    )
    s = spark.readStream.schema(schema).option("maxFilesPerTrigger", "8").parquet(
        connections_dir
    )

    out_schema = (
        "feed_id string, trip_id string, n_connections long, "
        "first_departure_epoch long, last_arrival_epoch long"
    )
    state_schema = "n long, first_dep long, last_arr long"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, first_dep, last_arr = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            dep = (pdf["departure_ts"].astype("int64") // 10**9).min()
            arr = (pdf["arrival_ts"].astype("int64") // 10**9).max()
            first_dep = int(dep) if first_dep is None else min(first_dep, int(dep))
            last_arr = int(arr) if last_arr is None else max(last_arr, int(arr))
        state.update((n, first_dep, last_arr))
        yield pd.DataFrame(
            [
                {
                    "feed_id": key[0],
                    "trip_id": key[1],
                    "n_connections": n,
                    "first_departure_epoch": first_dep,
                    "last_arrival_epoch": last_arr,
                }
            ]
        )

    return s.groupBy("feed_id", "trip_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def user_session_stream(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap sessionization — the Structured Streaming twin of
    datapipe.events.sessionize, using the NATIVE ``session_window``
    dynamic-gap state operator: a user's session grows while events
    keep arriving within ``gap``; when the watermark passes the
    session's close it emits exactly once (append mode).

    Built-in session windows keep the merge logic (overlapping
    sessions coalescing as late events arrive) in the JVM state store
    — no Python state path, bounded by the watermark.  The batch
    operator remains the replay/backfill tool; this is the live view.
    """
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    s = spark.readStream.schema(schema).option("maxFilesPerTrigger", "8").parquet(
        events_dir
    )
    return (
        s.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "session_start",
            "session_end",
            "total_value",
        )
    )


def start_incremental_conversion(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    history_dir: str,
    stream_checkpoint_dir: str,
    staging_dir: str | None = None,
    feed_tz: str = "Europe/Brussels",
    salt_n: int | None = 16,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream pages -> append newly-discovered connection JSON-LD lines
    under ``output_dir/batch=N`` (read them with a ``batch=*`` glob)."""
    store = HistoryStore(spark, history_dir)
    staging_dir = staging_dir or f"{stream_checkpoint_dir}_staging"

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        process_pages_batch(
            spark, batch, batch_id, store, staging_dir, output_dir,
            feed_tz=feed_tz, salt_n=salt_n,
        )

    writer = (
        read_pages_stream(spark, pages_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", stream_checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming corpus dedup: the live twin of datapipe/incremental.py.
# Same exactly-once protocol as the connection stream above — every
# effect of batch N keyed by N with overwrite semantics, delta computed
# against history snapshots < N only.

DOCS_STREAM_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def process_docs_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store,
    output_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One idempotent corpus-dedup micro-batch: within-batch min-id
    winners + anti-join against the fingerprint history of EARLIER
    batches (``before_snapshot=batch_id`` — a crash-replayed batch
    recomputes its original delta even after its own commit landed),
    survivors written to ``output_dir/batch=N`` (overwrite), fingerprint
    snapshot committed LAST (metrics file = commit marker). Public so
    tests can drive crash/replay without a streaming query."""
    from .datapipe.incremental import commit_batch, dedupe_batch

    if batch.isEmpty():
        return
    survivors = materialize(
        dedupe_batch(
            batch, store, text_col=text_col, id_col=id_col,
            before_snapshot=batch_id,
        ),
        "stream-dedup-survivors",
    )
    survivors.write.mode("overwrite").parquet(f"{output_dir}/batch={batch_id}")
    commit_batch(survivors, store, snapshot_id=batch_id)
    sweep_staging(spark)


def start_corpus_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    output_dir: str,
    history_dir: str,
    stream_checkpoint_dir: str,
    schema: str = DOCS_STREAM_SCHEMA,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream a growing documents directory -> append cross-batch-unique
    documents (with their ``fp``) under ``output_dir/batch=N``. The
    history side is the skinny fingerprint store — per-trigger cost is
    one fingerprint scan of the batch plus an anti-join whose build
    side compacts (store.compact()) as batches accumulate."""
    from .datapipe.incremental import CorpusDedupStore

    store = CorpusDedupStore(spark, history_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        process_docs_batch(spark, batch, batch_id, store, output_dir)

    writer = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(docs_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", stream_checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def click_attribution_stream(
    spark: SparkSession,
    events_dir: str,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """STREAM-STREAM event-time interval join — the remaining
    Structured Streaming join surface: each click paired with every
    view by the same user in the preceding ``max_delay`` (ad/referrer
    attribution shape). Both sides carry a watermark and the join
    condition carries the event-time interval, so Spark can size the
    join state exactly: a buffered view is dropped once the click-side
    watermark passes ``view_ts + max_delay``, and state never grows
    with the corpus — the property that keeps this runnable on an
    unbounded stream.

    Both sides derive from ONE file stream filtered by event_type (the
    planner still executes a genuine stream-stream join; two separate
    sources would work identically). Inner join: a click with no view
    inside the window emits nothing — the batch twin for last-touch
    picking (and the oracle-checked semantics) is datapipe's asof_join.
    Returns the unstarted streaming DataFrame (append mode).
    """
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    s = spark.readStream.schema(schema).option("maxFilesPerTrigger", "8").parquet(
        events_dir
    )
    views = (
        s.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        s.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = clicks.join(
        views,
        F.expr(
            f"""
            c_user = v_user
            AND view_ts <= click_ts
            AND view_ts >= click_ts - interval {max_delay}
            """
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "click_value",
        "view_id",
        "view_ts",
    )


def dedup_events_stream(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Native streaming dedup: ``dropDuplicatesWithinWatermark`` on the
    event id — the JVM state-store twin of the corpus dedup stream for
    the at-least-once-delivery case (a re-delivered event inside the
    watermark horizon is dropped by keyed state; state for ids older
    than the watermark is evicted, so memory is bounded by the horizon
    x arrival rate, not the stream's lifetime). Use the history-store
    stream for exactly-once dedup across arbitrary time; use this for
    cheap in-flight duplicate suppression."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    s = spark.readStream.schema(schema).option("maxFilesPerTrigger", "8").parquet(
        events_dir
    )
    return s.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
