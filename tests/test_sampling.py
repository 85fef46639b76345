"""Deterministic sampling (operators/sampling.py): retry-stability (same
input ⇒ same SET, always), cross-table consistency (the property df.sample
cannot give), rate accuracy, salt independence, and fixed-size-per-group
exactness with uniformity sanity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from a5pg_spark.operators.sampling import group_sample_k, hash_sample


def _ids(df):
    return sorted(r.k for r in df.select("k").collect())


def test_sample_is_deterministic_and_rate_accurate(spark):
    df = spark.range(20_000).select(F.col("id").alias("k"))
    a = _ids(hash_sample(df, "k", 0.3))
    b = _ids(hash_sample(df, "k", 0.3))
    assert a == b  # retry-stable: the sample is a function of the keys
    assert abs(len(a) / 20_000 - 0.3) < 0.02


def test_sample_is_cross_table_consistent(spark):
    """A user sampled in the users table is sampled in the events table —
    membership depends on the key only."""
    users = spark.range(5_000).select(F.col("id").alias("k"))
    events = spark.range(50_000).select((F.col("id") % 5_000).alias("k"),
                                        F.col("id").alias("eid"))
    su = set(_ids(hash_sample(users, "k", 0.2)))
    se = set(r.k for r in hash_sample(events, "k", 0.2).select("k").collect())
    assert se == {k for k in se if k in su} and se <= su
    # and every sampled user with events appears
    assert su == se


def test_sample_rates_are_nested(spark):
    """Threshold semantics: the 10% sample is a subset of the 30% sample
    (same salt) — lets pipelines scale a sample up without resampling."""
    df = spark.range(10_000).select(F.col("id").alias("k"))
    s10 = set(_ids(hash_sample(df, "k", 0.1)))
    s30 = set(_ids(hash_sample(df, "k", 0.3)))
    assert s10 <= s30


def test_salts_give_independent_samples(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    a = set(_ids(hash_sample(df, "k", 0.2, salt=0)))
    b = set(_ids(hash_sample(df, "k", 0.2, salt=12345)))
    overlap = len(a & b) / (0.2 * 0.2 * 10_000)  # expect ≈ 1.0 if independent
    assert 0.5 < overlap < 1.6, overlap


def test_group_sample_k_exact_size_and_determinism(spark):
    df = spark.range(3_000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("k"))
    s1 = group_sample_k(df, ["g"], "k", 10)
    s2 = group_sample_k(df, ["g"], "k", 10)
    got1 = sorted((r.g, r.k) for r in s1.select("g", "k").collect())
    assert got1 == sorted((r.g, r.k) for r in s2.select("g", "k").collect())
    sizes = {r.g: r.n for r in s1.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(n == 10 for n in sizes.values()) and len(sizes) == 7


def test_group_sample_k_small_group_keeps_all(spark):
    df = spark.range(3).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    assert group_sample_k(df, ["g"], "k", 10).count() == 3


def test_hash_sample_rejects_bad_rate():
    with pytest.raises(ValueError):
        hash_sample(None, "k", 1.5)
