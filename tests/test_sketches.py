"""Portable HLL (operators/sketches.py): accuracy in both estimator branches,
duplication-invariance (the sketch sees sets, not bags), and hash sanity."""

from __future__ import annotations

import pyspark.sql.functions as F

from a5pg_spark.operators.sketches import hll_distinct, portable_hash31


def _est(df):
    row = hll_distinct(df, "k", ["g"], p=8).collect()
    return {r.g: r.est_distinct for r in row}


def test_hll_large_range_accuracy(spark):
    # 20k distinct keys >> 2.5*m -> raw harmonic-mean branch; 1.04/sqrt(256)
    # gives ~6.5 % expected error, assert a loose 15 %
    df = spark.range(20_000).select(F.lit("a").alias("g"), F.col("id").alias("k"))
    est = _est(df)["a"]
    assert abs(est - 20_000) / 20_000 < 0.15, est


def test_hll_small_range_correction(spark):
    # 100 distinct keys < 2.5*m -> linear-counting branch
    df = spark.range(100).select(F.lit("a").alias("g"), F.col("id").alias("k"))
    est = _est(df)["a"]
    assert abs(est - 100) / 100 < 0.15, est


def test_hll_is_duplication_invariant(spark):
    df = spark.range(5_000).select(F.lit("a").alias("g"), F.col("id").alias("k"))
    assert _est(df) == _est(df.union(df).union(df))


def test_hll_groups_are_independent(spark):
    a = spark.range(3_000).select(F.lit("a").alias("g"), F.col("id").alias("k"))
    b = spark.range(50).select(F.lit("b").alias("g"), (F.col("id") + 9_000_000).alias("k"))
    both = _est(a.union(b))
    assert both["a"] == _est(a)["a"] and both["b"] == _est(b)["b"]


def test_portable_hash_mixes(spark):
    # consecutive keys must not collide and must spread over buckets
    out = spark.range(4_096).select(
        F.pmod(portable_hash31(F.col("id")), F.lit(256)).alias("b")
    )
    n = out.distinct().count()
    assert n == 256, n
