"""Structured Streaming kernels over the events table.

The reference has no streaming surface (SURVEY.md §2.G) — this is the
engine's net-new capability for continuously-arriving crawl/event data.
Batch and stream share the SAME aggregation expressions, so the batch
path doubles as the oracle for the streaming path (tested by driving a
parquet readStream through a memory sink and diffing against the batch
result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _window_agg_exprs():
    return [
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    ]


def windowed_agg_batch(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """(window_start, event_type, n_events, sum_value, approx_users) —
    tumbling-window aggregate, batch form."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(*_window_agg_exprs())
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value", "approx_users")
    )


def windowed_agg_stream(
    spark,
    parquet_dir: str,
    schema,
    width: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "windowed_out",
):
    """readStream(parquet) → watermark → tumbling window agg → memory sink.
    Returns the started StreamingQuery; caller processAllAvailable()s and
    reads `SELECT * FROM <query_name>`. Watermark bounds state for late
    data — the production sink would be an append-mode table."""
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(*_window_agg_exprs())
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value", "approx_users")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, n_sessions, max_session_events) — gap-based sessionization:
    lag(ts) per user, new session when gap > threshold, cumsum session ids.
    The streaming equivalent is session_window(ts, gap); the batch window
    form is the deterministic oracle."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps may load as TIMESTAMP_NTZ (not castable to long);
    # route through a plain timestamp first (session TZ pinned to UTC)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w_user)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(w_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.max("n").alias("max_session_events")
    )
