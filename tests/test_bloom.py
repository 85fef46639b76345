"""Bloom-filter join pruning (plans/bloom.py): the result-neutrality law
(no false negatives ⇒ pruned join ≡ plain join), the cross-engine replay
contract (DuckDB reproduces the exact pass set from the same hash SQL), a
false-positive-rate sanity bound, and the plan guarantee the module exists
for — the bloom probe filters the fact side BEFORE its exchange, as a
broadcast of one bounded bitmap row."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from a5pg_spark.plans.bloom import (
    bloom_build,
    bloom_pass_sql,
    bloom_prune,
    bloom_pruned_join,
)


def _frames(spark, seed=7, n_fact=5000, n_dim=3000, sel=150):
    import numpy as np

    rng = np.random.default_rng(seed)
    fact = spark.createDataFrame(
        [(int(i), int(k)) for i, k in enumerate(rng.integers(0, n_dim, n_fact))],
        "fid long, key long",
    )
    keys = rng.choice(n_dim, size=sel, replace=False)
    dim = spark.createDataFrame([(int(k), f"d{k}") for k in keys], "dkey long, tag string")
    return fact, dim


def test_bloom_join_equals_plain_join(spark):
    fact, dim = _frames(spark, 7)
    got = (
        bloom_pruned_join(fact, dim, "key", "dkey", m_bits=1024, k=3)
        .select("fid", "dkey").orderBy("fid").collect()
    )
    want = (
        fact.join(dim, fact["key"] == dim["dkey"])
        .select("fid", "dkey").orderBy("fid").collect()
    )
    assert got == want and len(got) > 0


def test_bloom_pass_set_replays_in_duckdb(spark, tmp_path):
    fact, dim = _frames(spark, 23)
    bm = bloom_build(dim, "dkey", m_bits=1024, k=3)
    passed = sorted(
        r.fid for r in bloom_prune(fact, "key", bm, m_bits=1024, k=3).collect()
    )
    fact.toPandas().to_parquet(tmp_path / "fact.parquet")
    dim.toPandas().to_parquet(tmp_path / "dim.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW fact AS SELECT * FROM '{tmp_path}/fact.parquet'")
    con.execute(f"CREATE VIEW dim AS SELECT * FROM '{tmp_path}/dim.parquet'")
    cte, checks = bloom_pass_sql("key", "SELECT * FROM dim", "dkey", m_bits=1024, k=3)
    oracle = [
        r[0]
        for r in con.sql(
            f"WITH {cte} SELECT fid FROM fact WHERE {checks} ORDER BY fid"
        ).fetchall()
    ]
    assert passed == oracle


def test_false_positive_rate_bounded(spark):
    # n=150 keys, k=3 into m=4096 bits: theoretical FPR (1-e^(-kn/m))^3 ≈ 0.1%;
    # assert an order-of-magnitude cushion, and no false negatives ever.
    fact, dim = _frames(spark, 41, n_fact=8000, n_dim=4000, sel=150)
    bm = bloom_build(dim, "dkey", m_bits=4096, k=3)
    passed = bloom_prune(fact, "key", bm, m_bits=4096, k=3)
    n_pass = passed.count()
    n_true = fact.join(
        dim.select(F.col("dkey").alias("key")), "key", "left_semi"
    ).count()
    assert n_pass >= n_true  # no false negatives
    n_nonmatch = fact.count() - n_true
    assert (n_pass - n_true) <= max(0.01 * n_nonmatch, 8)


def test_bitmap_is_bounded_and_prune_precedes_exchange(spark):
    fact, dim = _frames(spark, 57)
    bm = bloom_build(dim, "dkey", m_bits=1024, k=3)
    [row] = bm.collect()
    assert len(row.bitmap) == 1024 // 64  # state bounded regardless of |dim|
    pruned = bloom_prune(fact, "key", bm, m_bits=1024, k=3)
    # force a shuffle downstream of the prune; the probe must sit below it
    plan = (
        pruned.repartition(8, "key")._jdf.queryExecution().executedPlan().toString()
    )
    ex = plan.find("Exchange hashpartitioning")
    probe = plan.find("BroadcastNestedLoopJoin")  # the 1-row bitmap attach
    assert ex != -1 and probe != -1 and probe > ex  # deeper in tree = later in text
    # and the filter with the bit test is also below the exchange
    flt = plan.find("shiftright(element_at(bitmap")
    assert flt != -1 and flt > ex


def test_m_bits_must_be_word_aligned():
    with pytest.raises(ValueError):
        bloom_build(None, "k", m_bits=1000)
