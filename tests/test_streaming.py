"""Structured-streaming surface: watermarked cell rollups + stateful dedup.

Deterministic harness: parquet files dropped into a source dir, read with
maxFilesPerTrigger=1 (one micro-batch per file) under availableNow, memory
sink, awaitTermination — no clocks, no rate source.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_time", TimestampType()),
        StructField("image_id", StringType()),
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
        StructField("key", LongType()),
    ]
)


def _write_batch(spark, path, rows, n):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def src_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("stream_src"))


def _rows(batch, ids):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    return [
        (
            t0 + dt.timedelta(seconds=10 * batch + i),
            f"img-{k}",
            float(-74 + (k % 7) * 0.01),
            float(40 + (k % 5) * 0.01),
            int(k),
        )
        for i, k in enumerate(ids)
    ]


def test_streaming_dedup_across_microbatches(spark, src_dir, tmp_path_factory):
    from a5pg_spark.streaming.ingest import (
        drain_available_now, no_data_microbatches_disabled, streaming_dedup)

    # batch 1: ids 1,2,3 (+ in-batch dup of 1); batch 2: ids 2,3,4,5
    _write_batch(spark, src_dir, _rows(0, [1, 1, 2, 3]), 1)
    _write_batch(spark, src_dir, _rows(1, [2, 3, 4, 5]), 1)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming_dedup(stream, id_col="image_id")
    ck = str(tmp_path_factory.mktemp("ck1"))
    with no_data_microbatches_disabled(spark):
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q, timeout=120)
    got = {r.image_id for r in spark.sql("SELECT image_id FROM dedup_out").collect()}
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0].n
    assert got == {"img-1", "img-2", "img-3", "img-4", "img-5"}
    assert n == 5  # in-batch AND cross-batch duplicates dropped


def test_streaming_cell_counts_watermarked(spark, src_dir, tmp_path_factory):
    from a5pg_spark import functions as A
    from a5pg_spark.streaming.ingest import drain_available_now, streaming_cell_counts

    A.register(spark)
    _write_batch(spark, src_dir, _rows(0, [1, 2, 3, 4]), 1)
    _write_batch(spark, src_dir, _rows(3, [5, 6]), 1)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming_cell_counts(stream.select("event_time", "lon", "lat"), res=7)
    ck = str(tmp_path_factory.mktemp("ck2"))
    q = (
        out.writeStream.format("memory")
        .queryName("cells_out")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q, timeout=120)
    rows = spark.sql("SELECT * FROM cells_out").collect()
    assert sum(r.n for r in rows) == 6
    # all points land near NYC → one res-3 parent cell
    assert len({r.parent_cell for r in rows}) == 1
    # windows are 10s-aligned and non-overlapping
    for r in rows:
        assert (r.end - r.start).total_seconds() == 10.0


def test_streaming_cell_counts_append_emits_closed_windows(
    spark, src_dir, tmp_path_factory
):
    """APPEND-mode watermarked rollup under availableNow: finalized windows
    must be emitted.  This is the case the round-2/3 session-wide
    `noDataMicroBatches.enabled=false` silently broke (a closed window is
    only emitted once a LATER batch advances the watermark — with no-data
    batches off, availableNow ends before that happens); the conf is now
    scoped inside streaming_dedup, so append consumers get the default
    semantics and the trailing no-data micro-batch flushes closed windows."""
    from a5pg_spark import functions as A
    from a5pg_spark.streaming.ingest import drain_available_now, streaming_cell_counts

    A.register(spark)
    # streaming_dedup (possibly run earlier on this shared session) scopes
    # noDataMicroBatches=false onto the session; per its documented contract,
    # append-mode consumers on the same session re-enable it first
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    # batch 0: window [12:00:00, 12:00:10); batch 6 (60 s later) pushes the
    # 30 s watermark far past that window's end
    _write_batch(spark, src_dir, _rows(0, [1, 2, 3]), 1)
    _write_batch(spark, src_dir, _rows(6, [7]), 1)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming_cell_counts(stream.select("event_time", "lon", "lat"), res=7)
    ck = str(tmp_path_factory.mktemp("ck_append"))
    q = (
        out.writeStream.format("memory")
        .queryName("cells_append_out")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q, timeout=120)
    rows = spark.sql("SELECT * FROM cells_append_out").collect()
    # the first window is strictly below the final watermark -> emitted
    closed = [r for r in rows if r.start.second == 0 and r.start.minute == 0]
    assert sum(r.n for r in closed) == 3


def test_streaming_dedup_resumes_from_checkpoint(spark, src_dir, tmp_path_factory):
    """Checkpoint-resume: a second availableNow run over a grown directory
    picks up where the first stopped — previously-seen keys stay deduped."""
    from a5pg_spark.streaming.ingest import (
        drain_available_now, no_data_microbatches_disabled, streaming_dedup)

    ck = str(tmp_path_factory.mktemp("ck3"))
    sink = str(tmp_path_factory.mktemp("sink3"))
    _write_batch(spark, src_dir, _rows(0, [1, 2]), 1)

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        with no_data_microbatches_disabled(spark):
            q = (
                streaming_dedup(stream, id_col="image_id")
                .writeStream.format("parquet")
                .option("path", sink)
                .outputMode("append")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            drain_available_now(q, timeout=120)

    run()
    out1 = spark.read.parquet(sink)
    assert {r.image_id for r in out1.collect()} == {"img-1", "img-2"}
    _write_batch(spark, src_dir, _rows(1, [2, 3]), 1)  # one dup, one new
    run()
    out2 = spark.read.parquet(sink).collect()
    # the resumed run processed only the new file, and the restored state
    # still knows img-2 — the sink gains exactly img-3
    assert sorted(r.image_id for r in out2) == ["img-1", "img-2", "img-3"]


def test_stream_to_snapshot_exactly_once(spark, src_dir, tmp_path_factory):
    """foreachBatch → SnapshotTable: one append per micro-batch with batch
    lineage; a replayed batch is a metadata-only no-op; compaction then
    bin-packs the per-batch small files scan-identically."""
    from a5pg_spark.sources.table import SnapshotTable
    from a5pg_spark.streaming.ingest import drain_available_now, stream_to_snapshot

    base = str(tmp_path_factory.mktemp("snap_stream"))
    _write_batch(spark, src_dir, _rows(0, range(10)), 1)
    _write_batch(spark, src_dir, _rows(1, range(10, 25)), 1)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("cell", F.expr("a5_synth_cell(key, 7)"))
    )
    q = stream_to_snapshot(stream, f"{base}/t", f"{base}/ck",
                           sort_col="cell", cell_col="cell")
    drain_available_now(q)
    t = SnapshotTable(f"{base}/t")
    snaps = t.snapshots()
    assert [m["operation"] for m in snaps] == ["overwrite", "append"]
    assert [m["lineage"]["stream_batch"] for m in snaps] == [0, 1]
    assert t.scan(spark).count() == 25
    assert all("cells" in f for f in t.manifest()["files"])
    # replay: re-running an already-committed batch id must not duplicate
    batch0 = spark.read.parquet(src_dir).limit(5)
    before = t.manifest()["snapshot_id"]
    q2 = stream_to_snapshot(
        spark.readStream.schema(batch0.schema).parquet(src_dir),
        f"{base}/t", f"{base}/ck2_replayseed", sort_col="cell")
    # ck2 is a FRESH checkpoint, so batch_id restarts at 0 -> lineage hit
    drain_available_now(q2)
    assert t.manifest()["snapshot_id"] == before
    assert t.scan(spark).count() == 25
    # maintenance: compact the per-batch small files
    m = t.compact(spark, small_rows=10**9, cell_col="cell")
    assert m["operation"] == "compact"
    assert t.scan(spark).count() == 25
