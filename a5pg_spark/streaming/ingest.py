"""Structured-streaming ingest: continuous image/point arrival → A5 cell
assignment → watermarked windowed rollups.

The reference is strictly batch (SURVEY.md §2.2 — no streaming surface
anywhere in a5pg), so this module is engine-added capability: the same
vectorized encode UDF and native bit rollups run unchanged under
``readStream``; late data is bounded by an event-time watermark.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import a5_lonlat_to_cell


@contextlib.contextmanager
def no_data_microbatches_disabled(spark: SparkSession):
    """Save/restore wrapper for ``spark.sql.streaming.noDataMicroBatches
    .enabled``: OFF while the block runs, previous value restored after.

    Required around ``start()`` + :func:`drain_available_now` of any query
    holding ProcessingTimeTimeout state (``streaming_dedup``): with no-data
    batches ON, ``availableNow`` loops cleanup batches until every timeout
    fires and never terminates (measured 300 s+ vs 7 s).  A bare
    ``conf.set`` here would leak session-wide and silently withhold closed
    windows from LATER append-mode watermarked aggregations on the same
    session — the restore is the point of this wrapper.
    """
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def drain_available_now(q, timeout: int = 120) -> None:
    """Deterministically finish an ``availableNow`` query.

    ``awaitTermination`` alone can silently burn its whole timeout (and leak
    the still-running stream) if the engine keeps scheduling batches — e.g.
    pending state timeouts with no-data micro-batches enabled.  This helper
    (a) waits, (b) force-stops on overrun so no query ever outlives the call,
    and (c) raises so harnesses fail loudly instead of racing the sink.
    """
    ok = q.awaitTermination(timeout)
    if not ok:
        # Force-stop, but never let a stop()/await failure REPLACE the
        # timeout diagnosis — that diagnosis is the whole point of this
        # helper.  Chain any stop-side error as the cause instead.
        stop_err = None
        stopped = False
        try:
            q.stop()
            stopped = q.awaitTermination(30)
        except Exception as e:  # noqa: BLE001 — deliberately broad: py4j
            stop_err = e
        raise RuntimeError(
            f"availableNow query did not terminate within {timeout}s "
            f"(stop {'succeeded' if stopped else 'FAILED — stream may leak'}); "
            "check noDataMicroBatches / state timeouts"
        ) from stop_err


def rate_points_stream(spark: SparkSession, rows_per_sec: int = 1000) -> DataFrame:
    """Demo source: rate stream → deterministic capture points (same phash
    derivation as the images table)."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
    )
    return raw.select(
        F.col("timestamp").alias("event_time"),
        F.col("value").alias("key"),
        (F.pmod(F.col("value") * 2654435761, F.lit(360000000)) / 1e6 - 180.0).alias("lon"),
        (F.pmod(F.expr("(value * 2654435761) DIV 360000000"), F.lit(180000000)) / 1e6 - 90.0).alias("lat"),
    )


def streaming_cell_counts(
    points: DataFrame,
    res: int = 7,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """points stream (event_time, lon, lat) → per-(window, parent cell)
    arrival counts; watermark bounds state for late data.

    Output-mode note: under ``outputMode('append')`` a window is emitted only
    once the watermark passes its end, which requires a LATER batch — under
    ``availableNow`` the tail windows therefore arrive on the trailing
    no-data micro-batch.  Do not disable
    ``spark.sql.streaming.noDataMicroBatches.enabled`` for append-mode
    consumers of this rollup (``streaming_dedup`` drains require it off —
    which is exactly why that path uses the save/restore wrapper
    :func:`no_data_microbatches_disabled` instead of a bare session set);
    ``complete`` mode is unaffected.
    """
    cells = points.withColumn(
        "cell", a5_lonlat_to_cell(F.col("lon"), F.col("lat"), res)
    )
    return (
        cells.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window).alias("w"),
            F.call_function("a5_cell_to_parent", F.col("cell"), F.lit(3)).alias("parent_cell"),
        )
        .agg(F.count("*").alias("n"))
        .select("w.start", "w.end", "parent_cell", "n")
    )


def streaming_dedup(
    events: DataFrame,
    id_col: str = "image_id",
    ttl_minutes: int = 60,
) -> DataFrame:
    """Cross-micro-batch first-seen dedup via ``applyInPandasWithState``.

    Emits each key's FIRST row only, remembering seen keys in per-key state
    with a processing-time TTL (bounded state at 100 TB arrival rates: state
    is one byte-ish per key per TTL window, sharded by the shuffle on
    ``id_col``).  The engine-side analogue of the batch ``exact_dedup``
    for continuous ingest.

    Conf contract: run ``start()`` + the ``availableNow`` drain inside
    :func:`no_data_microbatches_disabled` — pending ProcessingTimeTimeout
    state (the TTL) otherwise makes ``availableNow`` loop no-data cleanup
    batches until every timeout fires and the query never terminates
    (measured 300 s+ vs 7 s).  This function no longer mutates the session
    conf itself: building a DataFrame must not leak a session-wide setting
    that silently withholds closed windows from later append-mode
    watermarked aggregations (``streaming_cell_counts``'s output-mode note).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = events.schema
    state_schema = StructType([StructField("seen", IntegerType())])

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        first = not state.exists
        for pdf in pdfs:
            if first and len(pdf) > 0:
                yield pdf.iloc[:1]
                first = False
        if not state.exists:
            state.update((1,))
        state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return events.groupBy(id_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_to_snapshot(stream_df: DataFrame, table_root: str,
                       checkpoint: str, sort_col: str | None = None,
                       cell_col: str | None = None):
    """Land a stream into a :class:`SnapshotTable` — one CAS-committed
    append per micro-batch, exactly-once.

    This is the canonical "streaming ingest → Iceberg" sink: Structured
    Streaming's ``foreachBatch`` replays the in-flight batch after a
    restart, so the sink must be idempotent.  Each commit records lineage
    ``{"sink": ..., "stream_batch": batch_id}``; a replayed batch finds its
    lineage already committed (metadata-only lookup) and skips the write.
    Combined with :meth:`SnapshotTable.compact`, this closes the classic
    small-files loop: ingest appends per batch, maintenance bin-packs them,
    readers time-travel across both.

    Returns the started ``StreamingQuery`` (``availableNow`` trigger —
    drain with :func:`drain_available_now`).
    """
    from ..sources.table import SnapshotTable

    def sink(batch_df, batch_id):
        t = SnapshotTable(table_root)
        key = {"sink": "stream_to_snapshot", "stream_batch": int(batch_id)}
        if t.manifest() is not None and t.snapshot_for_lineage(key):
            return                      # replayed batch — already committed
        if t.manifest() is None:
            t.overwrite(batch_df, sort_col=sort_col, cell_col=cell_col,
                        lineage=key)
        else:
            t.append(batch_df, cell_col=cell_col, lineage=key)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
