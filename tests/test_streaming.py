"""Structured Streaming incremental conversion: pages arrive over time;
each micro-batch emits only newly-discovered connections."""

import json

from gtfs2lc_spark import fixtures, streaming


def _write_feed_pages(spark, pages_dir, feed_id, subdir):
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
    return [json.loads(r.value) for r in spark.read.text(f"{tmp}/out").collect()]


def test_incremental_stream(spark, tmp_path):
    tmp = str(tmp_path)
    _write_feed_pages(spark, f"{tmp}/pages", "feedA", "batch0")
    _run_stream(spark, tmp)
    out1 = _read_out(spark, tmp)
    assert len(out1) == fixtures.SAMPLE_FEED_CONNECTIONS

    # second feed arrives later; restart (availableNow) picks up ONLY it
    _write_feed_pages(spark, f"{tmp}/pages", "feedB", "batch1")
    _run_stream(spark, tmp)
    out2 = _read_out(spark, tmp)
    assert len(out2) == 2 * fixtures.SAMPLE_FEED_CONNECTIONS
    feeds = {o["@id"].split("/connections/")[0] for o in out2}
    assert len(feeds) == 1  # default templates: same namespace...

    # re-running with nothing new emits nothing (history + stream ckpt)
    _run_stream(spark, tmp)
    assert len(_read_out(spark, tmp)) == 2 * fixtures.SAMPLE_FEED_CONNECTIONS
