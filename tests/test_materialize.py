"""Pluggable materialization (VERDICT r3 #4): the lineage-cutting
materialize() sites must switch between sandbox-fast local checkpoints
and cluster-safe reliable checkpoint / parquet staging with ONE conf."""

import contextlib

import pytest
from pyspark.sql import functions as F

from gtfs2lc_spark import materialize as mat


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {}
    for k, v in kv.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _probe_df(spark):
    return spark.range(100).withColumn("v", F.col("id") * 2)


def test_local_default(spark):
    out = mat.materialize(_probe_df(spark))
    assert out.count() == 100
    # lineage is cut: the plan scans the checkpointed RDD, not Range
    assert "Range" not in out._jdf.queryExecution().executedPlan().toString()


def test_reliable_checkpoint(spark, tmp_path):
    with _conf(spark, **{mat.CONF_KEY: "reliable"}):
        # unconfigured checkpoint dir must fail loudly, not silently
        # degrade to an executor-storage checkpoint
        if spark.sparkContext.getCheckpointDir() is None:
            with pytest.raises(ValueError, match="setCheckpointDir"):
                mat.materialize(_probe_df(spark))
        spark.sparkContext.setCheckpointDir(str(tmp_path / "reliable"))
        out = mat.materialize(_probe_df(spark))
        assert sorted(r.v for r in out.collect()) == [2 * i for i in range(100)]
        # the checkpoint landed in the fault-tolerant dir
        assert any((tmp_path / "reliable").rglob("*"))


def test_parquet_staging(spark, tmp_path):
    with _conf(spark, **{mat.CONF_KEY: "parquet"}):
        with pytest.raises(ValueError, match="materialize.dir"):
            mat.materialize(_probe_df(spark))
        with _conf(spark, **{mat.CONF_DIR_KEY: str(tmp_path / "stage")}):
            out = mat.materialize(_probe_df(spark), "probe")
            assert out.count() == 100
            # staged as real files; repeated calls don't collide
            out2 = mat.materialize(_probe_df(spark), "probe")
            assert out2.count() == 100
            dirs = list((tmp_path / "stage").iterdir())
            assert len(dirs) == 2 and all(d.name.startswith("probe-") for d in dirs)


def test_unknown_strategy_raises(spark):
    with _conf(spark, **{mat.CONF_KEY: "nope"}):
        with pytest.raises(ValueError, match="nope"):
            mat.materialize(_probe_df(spark))


def test_pipeline_runs_under_parquet_strategy(spark, tmp_path):
    """End-to-end: the extract->convert->postprocess path produces the
    same rows under the cluster-safe parquet strategy as under the
    default — the strategy changes durability, never semantics."""
    from gtfs2lc_spark import extraction, fixtures, pipeline, postprocess, sinks

    def run():
        e = extraction.extract_entities(
            fixtures.pages_df(spark, feed_id="matfeed", noise_pages=2)
        )
        jl = sinks.connections_to_jsonld(
            pipeline.convert(
                e["stop_times"], e["trips"], e["routes"], e["stops"],
                e["calendar"], e["calendar_dates"], salt_n=8,
            )
        ).drop("feed_id", "type", "departure_ts", "arrival_ts")
        return postprocess.join_and_sort(jl).collect()

    base = run()
    with _conf(
        spark,
        **{mat.CONF_KEY: "parquet", mat.CONF_DIR_KEY: str(tmp_path / "pq")},
    ):
        alt = run()
    assert [r.id for r in base] == [r.id for r in alt]
    assert 0 < len(base) <= fixtures.SAMPLE_FEED_CONNECTIONS  # J8 merged


def test_connected_components_under_parquet_strategy(spark, tmp_path):
    """VERDICT r4 #3: the iterative CC loop must route every round
    through materialize(), so reliable/parquet strategies govern it on
    a real cluster (a raw localCheckpoint dies with a lost executor).
    Clusters must be identical under both strategies."""
    import os

    from gtfs2lc_spark.datapipe import dedup

    # two chains + a singleton edge: {1,2,3,4}, {10,11}, {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a int, id_b int"
    )
    base = sorted(
        (r.id, r.cluster_id) for r in dedup.connected_components(pairs).collect()
    )
    mat.sweep_staging(spark)
    with _conf(
        spark,
        **{mat.CONF_KEY: "parquet", mat.CONF_DIR_KEY: str(tmp_path / "cc")},
    ):
        alt = sorted(
            (r.id, r.cluster_id)
            for r in dedup.connected_components(pairs).collect()
        )
        # the loop actually staged through parquet (edges + labels +
        # >=1 round), and the dirs are registered for sweeping
        staged = os.listdir(tmp_path / "cc")
        assert len(staged) >= 3
        assert any(d.startswith("cc-round-") for d in staged)
        mat.sweep_staging(spark)
    assert base == alt
    assert base == [
        (1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (20, 20), (21, 20),
    ]


def test_sweep_staging(spark, tmp_path):
    """parquet staging dirs are registered and reclaimed by
    sweep_staging(); local strategy has nothing to sweep."""
    import os

    # drain paths registered by earlier tests on the shared session
    mat.sweep_staging(spark)
    with _conf(
        spark,
        **{mat.CONF_KEY: "parquet", mat.CONF_DIR_KEY: str(tmp_path)},
    ):
        a = mat.materialize(_probe_df(spark), "sweep-a")
        b = mat.materialize(_probe_df(spark), "sweep-b")
        assert a.count() == 100 and b.count() == 100
        staged = sorted(os.listdir(tmp_path))
        assert len(staged) == 2
        swept = mat.sweep_staging(spark)
        assert len(swept) == 2
        assert os.listdir(tmp_path) == []
        # idempotent: second sweep is a no-op
        assert mat.sweep_staging(spark) == []
    # local strategy registers nothing
    mat.materialize(_probe_df(spark))
    assert mat.sweep_staging(spark) == []


def test_vacuum_staging_orphans_only(spark, tmp_path):
    """VERDICT r4 #8: vacuum sweeps CRASHED drivers' staging dirs —
    matching the <label>-<12 hex> pattern AND older than min_age —
    and nothing else."""
    import os
    import time

    base = tmp_path / "stage"
    base.mkdir()
    orphan = base / "j7-delta-0123456789ab"
    fresh = base / "pages-abcdef012345"
    unrelated = base / "user-data"
    for d in (orphan, fresh, unrelated):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    os.utime(unrelated, (old, old))  # old but NOT ours: must survive

    would = mat.vacuum_staging(spark, str(base), min_age_s=3600, dry_run=True)
    assert [p.rsplit("/", 1)[-1] for p in would] == ["j7-delta-0123456789ab"]
    assert orphan.exists()  # dry run touched nothing

    swept = mat.vacuum_staging(spark, str(base), min_age_s=3600)
    assert [p.rsplit("/", 1)[-1] for p in swept] == ["j7-delta-0123456789ab"]
    assert not orphan.exists()
    assert fresh.exists() and unrelated.exists()

    # live-driver safety: a dir created by materialize() right now is
    # younger than the horizon, so a concurrent vacuum skips it
    with _conf(spark, **{mat.CONF_KEY: "parquet",
                         mat.CONF_DIR_KEY: str(base)}):
        out = mat.materialize(_probe_df(spark), "live")
        assert mat.vacuum_staging(spark, str(base), min_age_s=3600) == []
        assert out.count() == 100
