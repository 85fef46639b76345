"""Z-order layout (plans/zorder.py) + multi-column snapshot stats
(sources/table.py stats_cols / scan_box).

The load-bearing test is COMPARATIVE: the same data written day-sorted
prunes a two-dimensional box on day only (user_id spans its whole domain in
every file), while the z-ordered layout prunes on BOTH dimensions — that
delta is the entire point of Morton clustering."""

from __future__ import annotations

import pyspark.sql.functions as F

from a5pg_spark.plans.zorder import zorder_layout, zvalue
from a5pg_spark.sources.table import SnapshotTable


def _morton_py(a: int, b: int, bits: int = 21) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(int(a), int(b)) for a, b in rng.integers(0, 1 << 21, (200, 2))]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    assert [r.z for r in got] == [_morton_py(a, b) for a, b in rows]


def _grid(spark, n=64, reps=24):
    # n*n keys, reps rows each — enough rows that 32 output files all carry
    # a meaningful extent of the (x, y) domain
    return (
        spark.range(n * n * reps)
        .select(
            F.pmod(F.col("id"), F.lit(n)).alias("x"),
            F.pmod(F.floor(F.col("id") / n), F.lit(n)).alias("y"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
    )


def test_zorder_prunes_both_dims_where_single_sort_cannot(spark, tmp_path):
    df = _grid(spark)
    box = {"x": (8, 15), "y": (40, 47)}  # one aligned 8x8 quad = 1/64 domain

    # the snapshot writer files by repartitionByRange(shuffle.partitions) —
    # pin 32 so per-file extents are fine enough for the comparison to bite
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        lin = SnapshotTable.create(
            str(tmp_path / "lin"), df, sort_col="y", stats_cols=("x", "y")
        )
        zt = SnapshotTable.create(
            str(tmp_path / "z"),
            zorder_layout(df, "x", "y", bits=6),
            sort_col="zv",
            stats_cols=("x", "y"),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    lk, lt = lin.pruned_file_count_box(box)
    zk, zt_total = zt.pruned_file_count_box(box)
    assert lt == zt_total and lt >= 16
    # y-sorted layout: y prunes, x doesn't -> reads ~ box_y fraction of files
    # z-ordered layout: both prune -> strictly fewer files than single-sort
    assert zk < lk, (zk, lk)
    assert zk <= zt_total // 4, (zk, zt_total)


def test_scan_box_equals_plain_filter(spark, tmp_path):
    df = _grid(spark, n=32, reps=8)
    t = SnapshotTable.create(
        str(tmp_path / "t"),
        zorder_layout(df, "x", "y", bits=5),
        sort_col="zv",
        stats_cols=("x", "y"),
    )
    box = {"x": (3, 9), "y": (20, 28)}
    got = t.scan_box(spark, box).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    want = df.filter("x between 3 and 9 and y between 20 and 28").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (want.n, want.s) and got.n > 0


def test_stats_cols_survive_append_and_compact(spark, tmp_path):
    df = _grid(spark, n=16, reps=2)
    z = zorder_layout(df, "x", "y", bits=4)
    t = SnapshotTable.create(
        str(tmp_path / "t"), z, sort_col="zv", stats_cols=("x", "y")
    )
    t.append(z.limit(50).coalesce(1))  # inherits stats_cols from manifest
    assert all("stats" in f for f in t.manifest()["files"])
    t.compact(spark, small_rows=10_000)
    m = t.manifest()
    assert m["operation"] == "compact" and m["stats_cols"] == ["x", "y"]
    assert all("stats" in f for f in m["files"])
    n = t.scan_box(spark, {"x": (0, 15), "y": (0, 15)}).count()
    assert n == df.count() + 50


def test_scan_box_rejects_untracked_column(spark, tmp_path):
    import pytest

    df = _grid(spark, n=8, reps=1)
    t = SnapshotTable.create(
        str(tmp_path / "t"), df, sort_col="x", stats_cols=("x",)
    )
    with pytest.raises(ValueError, match="no stats tracked"):
        t.scan_box(spark, {"y": (0, 3)})
