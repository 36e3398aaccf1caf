"""Cross-batch incremental corpus dedup (datapipe/incremental.py) on
the generalized single-key HistoryStore."""

from __future__ import annotations

from gtfs2lc_spark.datapipe import incremental


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_incremental_dedupe_two_batches(spark, tmp_path):
    store = incremental.CorpusDedupStore(spark, str(tmp_path / "store"))
    b1 = _docs(spark, [(1, "alpha text"), (2, "beta text"), (3, "Alpha   TEXT ")])
    s1 = incremental.dedupe_batch(b1, store)
    # within-batch: doc 3 normalizes to doc 1's fingerprint -> min id wins
    assert {r["doc_id"] for r in s1.collect()} == {1, 2}
    incremental.commit_batch(s1, store, snapshot_id=0)

    b2 = _docs(
        spark,
        [
            (10, "beta text"),       # dup of history -> dropped
            (11, "gamma text"),      # new -> survives
            (12, "gamma  text"),     # within-batch dup of 11 -> dropped
            (13, "delta text"),      # new -> survives
        ],
    )
    s2 = incremental.dedupe_batch(b2, store)
    assert {r["doc_id"] for r in s2.collect()} == {11, 13}
    incremental.commit_batch(s2, store, snapshot_id=1)

    # a third batch sees BOTH prior batches' fingerprints
    b3 = _docs(spark, [(20, "alpha text"), (21, "delta text"), (22, "epsilon")])
    assert {
        r["doc_id"] for r in incremental.dedupe_batch(b3, store).collect()
    } == {22}


def test_incremental_replay_determinism(spark, tmp_path):
    """A replayed batch with before_snapshot pinned recomputes its
    ORIGINAL delta even after its own commit landed (streaming
    exactly-once contract, same as the connection history)."""
    store = incremental.CorpusDedupStore(spark, str(tmp_path / "store"))
    b0 = _docs(spark, [(1, "one"), (2, "two")])
    incremental.commit_batch(incremental.dedupe_batch(b0, store), store, snapshot_id=0)

    b1 = _docs(spark, [(10, "two"), (11, "three")])
    first = {r["doc_id"] for r in
             incremental.dedupe_batch(b1, store, before_snapshot=1).collect()}
    incremental.commit_batch(
        incremental.dedupe_batch(b1, store, before_snapshot=1), store, snapshot_id=1
    )
    replay = {r["doc_id"] for r in
              incremental.dedupe_batch(b1, store, before_snapshot=1).collect()}
    assert first == replay == {11}
    # without the bound, the landed commit hides the whole batch
    assert incremental.dedupe_batch(b1, store).count() == 0


def test_fp_store_load_schema_and_compaction(spark, tmp_path):
    store = incremental.CorpusDedupStore(spark, str(tmp_path / "store"))
    for sid, txt in enumerate(["a", "b", "c"]):
        incremental.commit_batch(
            incremental.dedupe_batch(_docs(spark, [(sid, txt)]), store),
            store,
            snapshot_id=sid,
        )
    hist = store.load()
    assert hist.columns == ["fp"]
    assert hist.count() == 3
    store.compact()
    assert store.compacted_through() == 1
    assert store.load().count() == 3  # answers unchanged across the boundary


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("append").parquet(path)


def _run_dedup_stream(spark, tmp):
    from gtfs2lc_spark import streaming

    q = streaming.start_corpus_dedup_stream(
        spark, f"{tmp}/docs", f"{tmp}/out", f"{tmp}/history", f"{tmp}/ckpt"
    )
    q.awaitTermination(120)


def test_corpus_dedup_stream_end_to_end(spark, tmp_path):
    tmp = str(tmp_path)
    _write_docs(spark, f"{tmp}/docs", [(1, "alpha"), (2, "beta"), (3, "alpha")])
    _run_dedup_stream(spark, tmp)
    out1 = spark.read.parquet(f"{tmp}/out/batch=*")
    assert {r["doc_id"] for r in out1.collect()} == {1, 2}

    # later files: cross-batch duplicates dropped, new text survives
    _write_docs(spark, f"{tmp}/docs", [(10, "beta"), (11, "gamma")])
    _run_dedup_stream(spark, tmp)
    out2 = spark.read.parquet(f"{tmp}/out/batch=*")
    assert {r["doc_id"] for r in out2.collect()} == {1, 2, 11}

    # nothing new -> nothing emitted
    _run_dedup_stream(spark, tmp)
    assert {r["doc_id"] for r in
            spark.read.parquet(f"{tmp}/out/batch=*").collect()} == {1, 2, 11}


def test_docs_batch_replay_is_idempotent(spark, tmp_path):
    """Crash between output write and history commit: replaying the
    SAME batch id rewrites identical output and re-commits the same
    snapshot — no double-drop, no double-emit."""
    from gtfs2lc_spark import streaming
    from gtfs2lc_spark.datapipe import incremental

    tmp = str(tmp_path)
    store = incremental.CorpusDedupStore(spark, f"{tmp}/history")
    b0 = spark.createDataFrame(
        [(1, "one", "en", "s", 3), (2, "two", "en", "s", 3)],
        streaming.DOCS_STREAM_SCHEMA,
    )
    streaming.process_docs_batch(spark, b0, 0, store, f"{tmp}/out")
    b1 = spark.createDataFrame(
        [(10, "two", "en", "s", 3), (11, "three", "en", "s", 5)],
        streaming.DOCS_STREAM_SCHEMA,
    )
    streaming.process_docs_batch(spark, b1, 1, store, f"{tmp}/out")
    first = {r["doc_id"] for r in
             spark.read.parquet(f"{tmp}/out/batch=1").collect()}
    # replay batch 1 (its commit already landed)
    streaming.process_docs_batch(spark, b1, 1, store, f"{tmp}/out")
    replay = {r["doc_id"] for r in
              spark.read.parquet(f"{tmp}/out/batch=1").collect()}
    assert first == replay == {11}
    assert store.snapshots() == [0, 1]
