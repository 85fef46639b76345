"""Streaming session windows: an availableNow two-micro-batch file replay of
``session_window`` must equal the batch result bit-for-bit.  The two files
split events by parity, so almost every session has events in BOTH
micro-batches — the merge of in-flight session state across batches is the
property genuinely under test (a session is not a fixed window; the store
must extend/merge intervals as late members arrive)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _session_agg(df):
    return (
        df.groupBy("user_id", F.session_window(F.col("event_time"), "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("start"),
            "n_events",
            "sum_value",
        )
    )


def test_streaming_session_window_replay_equals_batch(spark, sf_dir, tmp_path):
    from a5pg_spark.streaming.ingest import (
        drain_available_now,
        no_data_microbatches_disabled,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.col("ts").cast("timestamp").alias("event_time"),
            "user_id",
            "value",
            "event_id",
        )
    )
    src = str(tmp_path / "src")
    ev.filter("pmod(event_id, 2) = 0").coalesce(1).write.parquet(src)
    ev.filter("pmod(event_id, 2) = 1").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("event_time", "3650 days")
    )
    with no_data_microbatches_disabled(spark):
        q = (
            _session_agg(stream)
            .writeStream.format("memory").queryName("sess_replay")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q, timeout=120)

    got = spark.table("sess_replay").orderBy("user_id", "start").collect()
    want = _session_agg(ev).orderBy("user_id", "start").collect()
    assert len(got) == len(want) and got == want
    # sanity: sessions did span micro-batches (bigger than either half alone)
    n_half = _session_agg(ev.filter("pmod(event_id, 2) = 0")).count()
    assert len(got) < n_half * 2
