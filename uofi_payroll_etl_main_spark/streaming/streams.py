"""Structured Streaming variants of the windowed analytics.

readStream -> watermark -> windowed agg -> writeStream.  The aggregation
expressions are shared with the batch module, so correctness validated
in batch mode carries over; the only streaming-specific pieces are the
watermark (bounds state for late data) and the sink trigger.

Tested with Trigger.AvailableNow over a parquet directory + memory sink
(tests/test_streaming.py): processes all existing files as a bounded
stream -- the recommended pattern for batch-backfill of a streaming
pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["EVENTS_SCHEMA", "read_event_stream", "streaming_tumbling_counts", "run_to_memory"]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a parquet directory (schema must be
    explicit for streaming reads)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def streaming_tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling counts with a watermark: state for windows older than
    max(event time) - watermark is finalized and dropped -- bounded state
    at any stream length."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def run_to_memory(sdf: DataFrame, name: str, timeout_s: int = 120) -> None:
    """Drain a bounded stream (AvailableNow) into an in-memory table
    `name` -- the test/validation sink."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
