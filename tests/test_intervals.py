"""Bucketized range join (operators/intervals.py): equality with the naive
cross-join reference on random data, exactly-once pair production, boundary
semantics, and the plan guarantee the operator exists for — no nested-loop
join anywhere in the physical plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from a5pg_spark.operators.intervals import range_join_points


def _rand_frames(spark, seed, n_pts=400, n_iv=60, span=10_000):
    import numpy as np

    rng = np.random.default_rng(seed)
    pts = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(rng.integers(0, span, n_pts))],
        "pid long, t long",
    )
    starts = rng.integers(0, span, n_iv)
    lens = rng.integers(1, 900, n_iv)
    iv = spark.createDataFrame(
        [(int(i), int(s), int(s + l)) for i, (s, l) in enumerate(zip(starts, lens))],
        "iid long, s long, e long",
    )
    return pts, iv


def test_range_join_matches_naive_cross_join(spark):
    pts, iv = _rand_frames(spark, 11)
    got = (
        range_join_points(pts, iv, "t", "s", "e", bucket_width=500)
        .select("pid", "iid").orderBy("pid", "iid").collect()
    )
    naive = (
        pts.crossJoin(iv)
        .filter((F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")))
        .select("pid", "iid").orderBy("pid", "iid").collect()
    )
    assert got == naive and len(got) > 50


def test_range_join_produces_each_pair_once(spark):
    # bucket width much smaller than interval length -> heavy replication,
    # yet each qualifying pair must appear exactly once
    pts, iv = _rand_frames(spark, 12)
    out = range_join_points(pts, iv, "t", "s", "e", bucket_width=50)
    assert out.count() == out.select("pid", "iid").distinct().count()


def test_range_join_boundary_semantics(spark):
    pts = spark.createDataFrame([(0, 10), (1, 20)], "pid long, t long")
    iv = spark.createDataFrame([(0, 10, 20)], "iid long, s long, e long")
    inc = range_join_points(pts, iv, "t", "s", "e", 7, inclusive_end=True)
    exc = range_join_points(pts, iv, "t", "s", "e", 7, inclusive_end=False)
    assert inc.count() == 2 and exc.count() == 1


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    import __spark_entry__ as E

    df = E.queries()["events_range_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan
    assert df.limit(3).count() > 0
