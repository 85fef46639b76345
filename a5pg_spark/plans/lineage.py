"""Checkpoint-resume with per-partition lineage manifests + metrics
(north-star requirement: "every stage is checkpoint-resumable with
per-partition lineage manifests and metrics … written alongside snapshots").

A *stage checkpoint* is a parquet snapshot plus ``_lineage.json``:

    {stage, snapshot_id, inputs: [...], rows, n_partitions,
     partitions: [{pid, rows, bytes}], metrics: {rows, cells, bytes,
     skew_ratio}, config}

``run_stage`` is idempotent: if the snapshot directory already holds a
manifest with the same ``snapshot_id`` (a deterministic hash of stage name +
inputs + config), the stage is skipped and re-read — re-running a failed
pipeline resumes from the last complete stage.

Relationship to ``sources.table.run_stage`` (round 3): this module is the
PATH-level form — inputs are opaque strings, output is a plain parquet dir,
one checkpoint per path.  The table-level form keys the resume on exact
input *snapshot ids* of versioned SnapshotTables (so committing new input
data auto-invalidates), writes the lineage into the table's own commit
manifest, and composes with time travel / file pruning.  New pipelines over
snapshot tables should prefer the table-level API; this one remains for
stages whose inputs aren't snapshot tables (raw files, external dirs).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_id(stage: str, inputs: list, config: dict) -> str:
    payload = json.dumps({"stage": stage, "inputs": inputs, "config": config},
                         sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_lineage.json")


def is_complete(path: str, snap_id: str) -> bool:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return False
    try:
        return json.load(open(mp)).get("snapshot_id") == snap_id
    except (json.JSONDecodeError, OSError):
        return False


def write_manifest(spark: SparkSession, path: str, stage: str, snap_id: str,
                   inputs: list, config: dict, cell_col: str | None) -> dict:
    df = spark.read.parquet(path)
    per_part = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    rows = sum(r["count"] for r in per_part)
    n_cells = None
    skew = None
    if cell_col and cell_col in df.columns:
        n_cells = df.select(cell_col).distinct().count()
        counts = df.groupBy(cell_col).count()
        s = counts.agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.5)").alias("md"),
        ).first()
        skew = round(float(s.mx) / max(float(s.md), 1.0), 3)
    size_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    manifest = {
        "stage": stage,
        "snapshot_id": snap_id,
        "inputs": inputs,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "rows": rows,
        "n_partitions": len(per_part),
        "partitions": sorted(
            [{"pid": int(r["__pid"]), "rows": int(r["count"])} for r in per_part],
            key=lambda x: x["pid"],
        ),
        "metrics": {
            "rows": rows,
            "cells": n_cells,
            "bytes": size_bytes,
            "skew_ratio": skew,
        },
        "config": config,
    }
    with open(_manifest_path(path), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def run_stage(
    spark: SparkSession,
    stage: str,
    build: "callable",
    out_path: str,
    inputs: list | None = None,
    config: dict | None = None,
    cell_col: str | None = "cell",
) -> DataFrame:
    """Idempotent checkpointed stage: skip+reload when the snapshot for this
    exact (stage, inputs, config) already exists, else build → write →
    manifest.  ``build`` is a zero-arg callable returning the stage's
    DataFrame."""
    inputs = inputs or []
    config = config or {}
    snap = snapshot_id(stage, inputs, config)
    if is_complete(out_path, snap):
        return spark.read.parquet(out_path)
    df = build()
    df.write.mode("overwrite").parquet(out_path)
    write_manifest(spark, out_path, stage, snap, inputs, config, cell_col)
    return spark.read.parquet(out_path)
