"""Explicit skew handling (skew.py): salted two-phase aggregation and
salted replicated joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gtfs2lc_spark import skew


def test_salted_agg_matches_plain_groupby(spark):
    # one zipf-hot key (90% of rows) plus a tail
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    got = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in skew.salted_agg(
            df, ["k"],
            {"n": ("count", "v"), "total": ("sum", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")},
            n_salts=8,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("k").agg(
            F.count("v").alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()
    }
    assert got == want


def test_salted_agg_two_exchanges_second_is_tiny(spark):
    df = spark.range(100).select(F.lit("k").alias("k"), F.col("id").alias("v"))
    plan = skew.salted_agg(
        df, ["k"], {"n": ("count", "v")}, n_salts=4
    )._jdf.queryExecution().executedPlan().toString()
    # phase 1 keyed on (k, _salt), phase 2 on k: two hash aggregations
    assert plan.count("HashAggregate") >= 4  # partial+final per phase


def test_salted_agg_rejects_non_decomposable(spark):
    df = spark.range(10).select(F.lit("k").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        skew.salted_agg(df, ["k"], {"m": ("avg", "v")})


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 3000).select(
        F.when(F.col("id") % 5 < 4, F.lit(1)).otherwise(F.col("id") % 50)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    got = {
        (r["k"], r["payload"], r["dim"])
        for r in skew.salted_join(big, small, "k", n_salts=4).collect()
    }
    want = {
        (r["k"], r["payload"], r["dim"])
        for r in big.join(small, "k").collect()
    }
    assert got == want and len(got) == 3000


def test_salted_join_left_semantics_and_outer_guard(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (99, "orphan")], "k bigint, payload string"
    )
    small = spark.createDataFrame([(1, "dim1")], "k bigint, dim string")
    rows = skew.salted_join(big, small, "k", n_salts=4, how="left").collect()
    # unmatched left row appears exactly ONCE, null-extended
    orphans = [r for r in rows if r["payload"] == "orphan"]
    assert len(orphans) == 1 and orphans[0]["dim"] is None
    assert len(rows) == 3
    with pytest.raises(ValueError):
        skew.salted_join(big, small, "k", how="full")
