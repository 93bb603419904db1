"""Streaming windowed aggregation (M3/M4 extension surface).

Batch-equivalence is the test contract: the streaming tumbling-window
aggregate over a static parquet directory, driven to completion with
``processAllAvailable``, must equal the batch
``windows.tumbling_window_agg`` over the same rows — which is exactly
what Structured Streaming's incremental execution model guarantees.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_tumbling_agg(spark: SparkSession, events_path: str,
                        minutes: int = 60,
                        watermark: str = "2 hours") -> DataFrame:
    """Run a tumbling-window count/sum aggregate over the events table
    as a bounded stream (memory sink, drained synchronously), returning
    the final result as a DataFrame.

    At scale the same plan runs unbounded: the watermark bounds state
    (windows older than it are finalized and evicted), and the memory
    sink becomes a real sink with ``Trigger.AvailableNow`` checkpoints.
    """
    # events.ts is parquet TIMESTAMP(NANOS): readable only as long
    # (see tables.NANOS_TS_COLS), converted to µs below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    nanos = [f.name for f in static.schema.fields
             if f.dataType.simpleString() == "bigint" and f.name == "ts"]
    # The file-stream source wants a directory or glob, not a bare
    # file — turn a single-file path into an exact-match glob.
    stream_path = events_path if os.path.isdir(events_path) else events_path + "*"
    stream = (spark.readStream.schema(static.schema)
              .format("parquet").load(stream_path))
    if nanos:  # events.ts read as long nanos (see tables.NANOS_TS_COLS)
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (stream
           .withWatermark("ts", watermark)
           .groupBy(F.window("ts", f"{minutes} minutes").alias("w"),
                    F.col("event_type"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                 .cast("double").alias("total_value")))
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table(name)
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "total_value"))


def stream_session_agg(spark: SparkSession, events_path: str,
                       gap_minutes: int = 30,
                       watermark: str = "24 hours") -> DataFrame:
    """Session-window streaming aggregate: ``F.session_window`` merges
    events of a user closer than ``gap`` into one session (state-store
    backed; the watermark bounds open-session state at scale).

    Equivalent batch semantics: the lag-gap sessionization
    (operators.windows.sessionize) with the same gap — which is the
    SQL oracle the driver checks."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    stream_path = (events_path if os.path.isdir(events_path)
                   else events_path + "*")
    stream = (spark.readStream.schema(static.schema)
              .format("parquet").load(stream_path))
    if dict((f.name, f.dataType.simpleString())
            for f in static.schema.fields).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (stream
           .withWatermark("ts", watermark)
           .groupBy(F.session_window("ts", f"{gap_minutes} minutes")
                    .alias("w"),
                    F.col("user_id"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                 .cast("double").alias("session_value")))
    name = f"stream_session_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table(name)
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    "n_events", "session_value"))
