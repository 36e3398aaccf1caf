"""Structured Streaming ingest: a growing pages table -> incremental
Linked Connections.

The reference is strictly batch (SURVEY.md §2.7) — this is the Spark-
native extension a continuously-crawled corpus needs. Shape:

    readStream(pages dir) ──▶ foreachBatch:
        extraction.extract_entities(batch)      (pure fn of text)
        pipeline.convert(...)                   (same batch algebra)
        HistoryStore.differential + commit      (exactly-once-ish:
                                                 snapshot commit marker
                                                 + idempotent anti-join)
        append delta to the output sink

foreachBatch (not a continuous stateful query) is the right primitive
here: every micro-batch carries WHOLE GTFS files (a page is a complete
file), so no cross-batch stream state is needed — cross-RUN dedup is
the history store's job, and it already survives kills (commit marker).
A page that never arrives simply contributes nothing; late pages are
new deltas. Trigger availableNow gives catch-up batch semantics; a
processingTime trigger gives a live tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from . import pipeline, sinks
from .checkpoint import HistoryStore
from .extraction import extract_entities
from .schemas import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(pages_dir)
    )


def start_incremental_conversion(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    history_dir: str,
    stream_checkpoint_dir: str,
    feed_tz: str = "Europe/Brussels",
    salt_n: int | None = 16,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream pages -> append newly-discovered connection JSON-LD lines.

    Exactly-once story: Spark's streaming checkpoint makes each source
    file processed once per query; the history store's anti-join makes
    REPROCESSING idempotent (a replayed batch emits an empty delta), so
    a crash between batch output and stream-checkpoint commit cannot
    double-emit.
    """
    store = HistoryStore(spark, history_dir)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        e = extract_entities(batch)
        conns = pipeline.convert(
            e["stop_times"], e["trips"], e["routes"], e["stops"],
            e["calendar"], e["calendar_dates"],
            feed_tz=feed_tz, salt_n=salt_n,
        )
        delta = store.differential(conns)
        # persist: consumed twice (output + history commit)
        delta = delta.localCheckpoint(eager=True)
        sinks.jsonld_lines(sinks.connections_to_jsonld(delta)).write.mode(
            "append"
        ).text(output_dir)
        store.commit(delta, run_info={"stream_batch_id": batch_id})

    writer = (
        read_pages_stream(spark, pages_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", stream_checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
