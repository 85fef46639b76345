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


def _cms(spark, df, keys, width):
    from a5pg_spark.operators.sketches import cms_counters, cms_estimate

    c = cms_counters(df, "k", width=width)
    return {
        r.k: r.est_n
        for r in cms_estimate(c, keys, "k", width=width).collect()
    }, c


def test_cms_is_one_sided_and_tight_when_wide(spark):
    import pyspark.sql.functions as F

    # skewed multiset: key i appears (i % 17) + 1 times
    base = spark.range(500).select(F.col("id").alias("k"))
    df = base.withColumn("n", F.pmod(F.col("k"), F.lit(17)) + 1) \
             .select(F.explode(F.expr("array_repeat(k, int(n))")).alias("k"))
    truth = {r.k: r.cnt for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    keys = base
    est, counters = _cms(spark, df, keys, width=1024)
    assert all(est[k] >= truth[k] for k in truth)          # one-sided law
    over = sum(est[k] - truth[k] for k in truth)
    assert over / sum(truth.values()) < 0.25, over         # tight at w >> n
    # bounded state: never more than d*width counter rows
    assert counters.count() <= 4 * 1024


def test_cms_counters_merge_by_addition(spark):
    import pyspark.sql.functions as F

    from a5pg_spark.operators.sketches import cms_counters

    a = spark.range(300).select(F.col("id").alias("k"))
    b = spark.range(150, 450).select(F.col("id").alias("k"))
    whole = cms_counters(a.union(b), "k", width=256)
    merged = (
        cms_counters(a, "k", width=256)
        .union(cms_counters(b, "k", width=256))
        .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_hll_merge_law(spark):
    import pyspark.sql.functions as F

    from a5pg_spark.operators.sketches import (
        hll_estimate, hll_merge, hll_registers)

    a = spark.range(4_000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    b = spark.range(2_000, 7_000).select(
        F.lit("g").alias("g"), F.col("id").alias("k"))
    merged = hll_merge(
        hll_registers(a, "k", ["g"]),
        hll_registers(b, "k", ["g"]),
        group_cols=["g"],
    )
    got = hll_estimate(merged, ["g"]).collect()[0]
    want = hll_estimate(hll_registers(a.union(b), "k", ["g"]), ["g"]).collect()[0]
    # merge of sketch states == sketch of the unioned data, EXACTLY
    assert (got.nonzero_buckets, got.est_distinct) == (
        want.nonzero_buckets, want.est_distinct)


def test_histogram_merge_law(spark):
    import pyspark.sql.functions as F

    from a5pg_spark.operators.sketches import histogram_counts

    a = spark.range(1_000).select(F.lit("g").alias("g"), (F.col("id") * 7 % 997).alias("v"))
    b = spark.range(1_500).select(F.lit("g").alias("g"), (F.col("id") * 13 % 997).alias("v"))
    # mergeability requires a shared binning — the fixed-domain single-pass
    # mode exists exactly for this (per-slice derived lo/hi would differ)
    u = a.union(b)
    dom = (0, 996)
    whole = histogram_counts(u, "v", ["g"], bins=64, domain=dom)
    h1 = histogram_counts(u.where(F.col("v") % 2 == 0), "v", ["g"], bins=64, domain=dom)
    h2 = histogram_counts(u.where(F.col("v") % 2 == 1), "v", ["g"], bins=64, domain=dom)
    merged = (
        h1.select("g", "__bin", "cnt").union(h2.select("g", "__bin", "cnt"))
        .groupBy("g", "__bin").agg(F.sum("cnt").alias("cnt"))
    )
    assert (
        whole.select("g", "__bin", "cnt").exceptAll(merged).count() == 0
        and merged.exceptAll(whole.select("g", "__bin", "cnt")).count() == 0
    )


def test_histogram_quantile_error_bounded_by_bin_width(spark):
    import numpy as np
    import pyspark.sql.functions as F

    from a5pg_spark.operators.sketches import histogram_quantiles

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 100_000, 4_000)
    df = spark.createDataFrame(
        [("g", int(v)) for v in vals], "g string, v long")
    [row] = histogram_quantiles(df, "v", ["g"], bins=256).collect()
    lo, hi = int(vals.min()), int(vals.max())
    width = (hi - lo + 1) / 256
    s = np.sort(vals)
    for name, q in (("est_p50", 0.5), ("est_p90", 0.9), ("est_p99", 0.99)):
        exact = s[int(np.ceil(q * len(s))) - 1]
        assert abs(row[name] - exact) <= width + 1e-9, (name, row[name], exact)


def test_histogram_state_bounded(spark):
    import pyspark.sql.functions as F

    from a5pg_spark.operators.sketches import histogram_counts

    df = spark.range(50_000).select(
        F.lit("g").alias("g"), (F.col("id") % 9973).alias("v"))
    h = histogram_counts(df, "v", ["g"], bins=128)
    assert h.count() <= 128
    assert h.agg(F.sum("cnt")).collect()[0][0] == 50_000


def test_exact_quantile_via_histogram_equals_full_sort(spark):
    import numpy as np
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from a5pg_spark.operators.sketches import exact_quantile_via_histogram

    rng = np.random.default_rng(11)
    rows = [("a", int(v)) for v in rng.integers(0, 1_000_000, 3_000)]
    rows += [("b", int(v)) for v in rng.integers(-500, 500, 777)]
    rows += [("c", 42)] * 5  # constant group: lo == hi degenerate domain
    df = spark.createDataFrame(rows, "g string, v long")
    for num, den in ((1, 2), (9, 10), (99, 100), (1, 1)):
        got = {
            r.g: r.q_exact
            for r in exact_quantile_via_histogram(df, "v", ["g"], num, den).collect()
        }
        w = Window.partitionBy("g").orderBy("v")
        wn = Window.partitionBy("g")
        want = {
            r.g: r.v
            for r in df.withColumn("rn", F.row_number().over(w))
            .withColumn("nn", F.count(F.lit(1)).over(wn))
            .where(F.expr(f"rn = (nn * {num} + {den} - 1) DIV {den}"))
            .collect()
        }
        assert got == want, (num, den, got, want)
