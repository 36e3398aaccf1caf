"""Bloom bitmap filter / lossless semi-join prefilter (datapipe/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from gtfs2lc_spark.datapipe import sketch


def _semi(df, keys):
    return df.join(keys.select(F.col("k").alias("key")), "key", "left_semi")


def test_bloom_semi_join_equals_plain_semi_join(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("key"), F.col("id").alias("v")
    )
    keys = spark.range(0, 120).select((F.col("id") * 7).alias("k"))
    got = sketch.bloom_semi_join(big, "key", keys, "k").orderBy("key", "v")
    want = _semi(big, keys).orderBy("key", "v")
    assert got.collect() == want.collect()


def test_bloom_semi_join_lossless_under_heavy_false_positives(spark):
    # m_bits=64 (one word) saturates: every probe passes the bitmap,
    # so correctness rides entirely on the confirm join
    big = spark.range(0, 2000).select(
        (F.col("id") % 500).alias("key"), F.col("id").alias("v")
    )
    keys = spark.range(0, 10).select((F.col("id") * 13).alias("k"))
    got = sketch.bloom_semi_join(big, "key", keys, "k", m_bits=64, k=1)
    want = _semi(big, keys)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_probe_never_drops_members_and_prunes(spark):
    big = spark.range(0, 20000).select(F.col("id").alias("key"))
    keys = spark.range(0, 50).select((F.col("id") * 401).alias("key"))
    bitmap = sketch.bitmap_build(keys, "key")
    surv = sketch.bloom_probe(big, "key", bitmap)
    # every true member survives
    missing = keys.join(surv, "key", "left_anti").count()
    assert missing == 0
    # and the prefilter actually prunes (fp rate way below 1% here)
    assert surv.count() < 200


def test_bitmap_build_bounds_and_nulls(spark):
    keys = spark.createDataFrame(
        [(1,), (2,), (None,)], "k: bigint"
    )
    bm = sketch.bitmap_build(keys, "k", m_bits=1 << 10, k=2)
    rows = bm.collect()
    # ≤ n_keys * k words, every word index inside the bitmap
    assert 1 <= len(rows) <= 4
    assert all(0 <= r["word_idx"] < (1 << 10) // 64 for r in rows)
    # NULL keys don't crash the probe and never match
    big = spark.createDataFrame([(1,), (None,), (3,)], "key: bigint")
    got = sketch.bloom_semi_join(big, "key", keys, "k").collect()
    assert [r["key"] for r in got] == [1]


def test_bloom_probe_plan_no_exchange_on_fact_side(spark):
    """The probe must prune pre-shuffle: its plan is k broadcast hash
    joins + bit tests with ZERO hash-partition exchanges on the fact
    side (the only exchanges belong to the bitmap build's groupBy and
    the broadcast itself)."""
    big = spark.range(0, 1000).select(F.col("id").alias("key"))
    keys = spark.range(0, 20).select(F.col("id").alias("k"))
    bitmap = sketch.bitmap_build(keys, "k", k=2)
    plan = (
        sketch.bloom_probe(big, "key", bitmap, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    # the fact side's lineage (spark.range -> probe filters) never
    # hash-partitions; the only hashpartitioning exchange feeds the
    # bitmap build's bit_or aggregation (word_idx), once per probe reuse
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "word_idx" in line
    assert "SortMergeJoin" not in plan


def test_bloom_param_validation(spark):
    keys = spark.range(0, 5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        sketch.bitmap_build(keys, "k", m_bits=100)
    with pytest.raises(ValueError):
        sketch.bitmap_build(keys, "k", k=0)


def test_bloom_semi_join_rejects_mismatched_key_types(spark):
    big = spark.range(0, 10).select(F.col("id").cast("double").alias("key"))
    keys = spark.range(0, 5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="key types differ"):
        sketch.bloom_semi_join(big, "key", keys, "k")
