"""Bucketed co-located joins (plans/bucketing.py): join equality with the
plain shuffle join, and the layout guarantee the module exists for — a
co-bucketed equi-join whose physical plan has ZERO Exchange and (with the
scan-ordering flag) ZERO Sort, plus one sorted file per bucket on disk."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F
import pytest

from a5pg_spark.plans.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bkt")
    fact = spark.range(20_000).select(
        F.col("id").alias("fid"), (F.col("id") % 997).alias("k"),
        (F.col("id") * 31 % 1000).alias("x"))
    dim = spark.range(997).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("tag"))
    write_bucketed(fact, "t_fact_bkt", "k", 4, str(d / "fact"))
    write_bucketed(dim, "t_dim_bkt", "dk", 4, str(d / "dim"))
    return fact, dim, d


def _scoped(spark):
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.legacy.bucketedTableScan.outputOrdering": spark.conf.get(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return saved


def test_join_equals_plain_join(spark, bucketed):
    fact, dim, _ = bucketed
    saved = _scoped(spark)
    try:
        got = (
            bucketed_join(spark, "t_fact_bkt", "t_dim_bkt", "k", "dk")
            .select("fid", "tag").orderBy("fid").collect()
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    want = (
        fact.join(dim, fact["k"] == dim["dk"])
        .select("fid", "tag").orderBy("fid").collect()
    )
    assert got == want and len(got) == 20_000


def test_plan_has_no_exchange_and_no_sort(spark, bucketed):
    saved = _scoped(spark)
    try:
        j = bucketed_join(spark, "t_fact_bkt", "t_dim_bkt", "k", "dk")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-partitioned by layout: shuffle-free
    sorts = [
        ln for ln in plan.splitlines()
        if ln.strip().lstrip(":+- ").startswith("Sort ")
    ]
    assert sorts == []  # co-sorted by layout: sort-free


def test_one_sorted_file_per_bucket(spark, bucketed):
    _, _, d = bucketed
    files = sorted(glob.glob(str(d / "fact") + "/part-*"))
    assert len(files) == 4
    # per-bucket sortBy order is real: each file's k column is non-decreasing
    import pandas as pd

    for f in files:
        ks = pd.read_parquet(f, columns=["k"])["k"].to_numpy()
        assert (ks[1:] >= ks[:-1]).all()
