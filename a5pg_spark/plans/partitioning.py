"""Skew control and layout for cell-keyed tables (SURVEY.md §2.4.5).

Hot cells (dense cities at coarse resolutions) skew any shuffle keyed by
cell.  Two engine-owned levers:

* **salted repartition on cell prefix**: partition key =
  (cell_to_parent(cell, coarse_res), pmod(salt_src, S)) — prefix keeps
  spatial locality (Hilbert ids are range-coherent), salt splits hot
  prefixes S ways.  Pure bit math, whole-stage codegen.
* **AQE skew-join** is enabled session-wide (session.py); salting is for
  aggregations and writes, where AQE's join splitter doesn't apply.

Layout: `sort_within_partitions(cell)` before writing parquet gives min/max
file statistics the role of the reference's B-tree index
(tests/elephant_a5_cells.sql:112-113) — range pruning on Hilbert-ordered ids
is spatially coherent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_input_bytes(df: DataFrame) -> int | None:
    """Total bytes of the frame's input files when they are local (the
    sandbox / CI case); ``None`` when any file is non-local or unlistable —
    callers treat unknown as "big" (production object stores)."""
    import os
    from urllib.parse import urlparse

    total = 0
    try:
        files = df.inputFiles()
    except Exception:
        return None
    for f in files:
        p = urlparse(f).path or f
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


def fan_out_scan(df: DataFrame, target: int | None = None,
                 min_input_bytes: int = 3 * 1024 * 1024) -> DataFrame:
    """Round-robin repartition a scan-rooted frame to the session's full
    parallelism when the scan itself cannot provide it (guide §2.5 "input
    skew — repartition immediately after the read").

    Parquet scan parallelism is bounded by ROW GROUPS, not bytes: a file
    written as one row group yields ONE task no matter how small
    ``spark.sql.files.maxPartitionBytes`` is set.  The bench corpus is
    written with 1–6 row groups per table, so every CPU-heavy map chain
    rooted at a scan (the 25-projection native encode, PIP refinement,
    64-dim similarity folds) ran on ≤6 of the 32 cores — measured on the
    elephant spatial join: probe-stage task median 23 ms, max 4.3 s (one
    task did everything).  The fix is one cheap shuffle of the SLIM scan
    output (project first!) that unlocks cores for the expensive chain
    above it.

    Scale-adaptive by construction: ``target`` defaults to
    ``sparkContext.defaultParallelism`` (i.e. the cluster's core count —
    local[N] and a real cluster both resolve correctly), and the repartition
    is SKIPPED when the frame already has at least that many partitions —
    at 100 TB the scan has thousands of row groups and this is a no-op, so
    the extra Exchange only ever exists where the input layout starves the
    CPUs.  An explicit partition count is used (not a bare ``repartition()``)
    so AQE's advisory-size coalescing cannot re-merge the partitions: these
    rows are compute-heavy, not byte-heavy, and 64 MB/partition heuristics
    judge them wrongly.

    ``min_input_bytes`` keeps the fix from over-firing at tiny scale: below
    it the whole map chain costs less than the extra exchange (measured at
    sf0.1: fanning the 0.3 MB customer scan cost +0.34 s on route_cells
    while the same call saves ~2 s at sf1.0).  Unknown input size (remote
    storage) counts as big — at real scale the partition check above
    short-circuits anyway.  Callers with unusually LIGHT per-row work pass
    a higher threshold (e.g. the quantile binning at 32 MB).
    """
    sc = df.sparkSession.sparkContext
    n = int(target) if target else sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    nbytes = _local_input_bytes(df)
    if nbytes is not None and nbytes < min_input_bytes:
        return df
    return df.repartition(n)


def salted_repartition_by_prefix(
    df: DataFrame,
    cell_col: str = "cell",
    coarse_res: int = 4,
    salt_buckets: int = 8,
    salt_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (cell prefix, salt).  ``salt_col`` defaults to the cell
    itself (its low Hilbert bits are uniform within a hot prefix)."""
    prefix = F.call_function(
        "a5_cell_to_parent", F.col(cell_col), F.lit(coarse_res)
    ).alias("__prefix")
    salt_src = F.col(salt_col) if salt_col else F.col(cell_col)
    salt = F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)).alias("__salt")
    out = df.withColumn("__prefix", prefix).withColumn("__salt", salt)
    if num_partitions:
        out = out.repartition(num_partitions, "__prefix", "__salt")
    else:
        out = out.repartition("__prefix", "__salt")
    return out.drop("__prefix", "__salt")


def write_cell_sorted(df: DataFrame, path: str, cell_col: str = "cell",
                      coarse_res: int = 3, mode: str = "overwrite") -> None:
    """Write parquet partitioned by coarse cell prefix, sorted by cell within
    files — file skipping via min/max plays the B-tree-index role."""
    (
        df.withColumn(
            "cell_prefix",
            F.call_function("a5_cell_to_parent", F.col(cell_col), F.lit(coarse_res)),
        )
        .sortWithinPartitions(cell_col)
        .write.mode(mode)
        .partitionBy("cell_prefix")
        .parquet(path)
    )


def skew_ratio(df: DataFrame, key_col: str) -> float:
    """max/median rows per key — the lineage-metrics skew indicator."""
    counts = df.groupBy(key_col).count()
    stats = counts.agg(
        F.max("count").alias("mx"),
        F.expr("percentile_approx(count, 0.5)").alias("md"),
    ).first()
    return float(stats.mx) / max(float(stats.md), 1.0)
