"""Event-time streaming operators (SURVEY §2 B14) — the same logical
expressions as the batch catalog, applied to streaming DataFrames.

Each builder takes any events-shaped DataFrame (batch OR stream:
`ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, ...`)
so tests can assert batch ≡ stream on a parquet replay
(Trigger.AvailableNow — FIXTURES.md B4 convention).

Scale: watermark state is per-key-and-window in the state store; the
shuffle keys below (window, event_type / user_id) are exactly the state
partitioning. Late data beyond the watermark is dropped, bounding state
at any input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Windowed count/sum per event_type — the reference's WithStats
    (gomaxscale.go:120-135) generalized to event time.

    In streaming mode the watermark bounds state and admits late rows up
    to `watermark`; in batch mode withWatermark is a no-op, making the
    batch twin directly comparable."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.date_trunc("second", F.col("sw.start")).alias("session_start"), "n_events"
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state for older keys is evicted.
    (Batch mode: plain dropDuplicates.)"""
    wm = events.withWatermark("ts", watermark)
    if events.isStreaming:
        return wm.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def replay_parquet_stream(spark, path: str, schema) -> DataFrame:
    """Re-play a parquet table as a bounded stream (availableNow-style
    test harness — FIXTURES.md B4)."""
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
