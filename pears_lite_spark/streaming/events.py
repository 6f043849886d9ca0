"""Watermarked windowed aggregation over the events stream.

The index itself needs no watermark (no event-time aggregation —
SURVEY.md §2.10), but the engine exposes the standard late-data
pattern for the `events` table: readStream -> withWatermark ->
tumbling-window agg -> append sink. With Trigger.AvailableNow and
on-time data the result equals the batch `events_hourly` aggregate
(asserted in pytest); with late data, rows later than the watermark
are dropped exactly per Structured Streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """(event_type, window_start, n, sum_value) with event-time windows;
    works on both batch and streaming DataFrames (same plan — the
    batch twin is the oracle)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy("event_type",
                        F.window("ts", window).alias("w"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value_r"))
            .select("event_type", F.col("w.start").alias("window_start"),
                    "n", "sum_value_r"))


def stream_event_counts(spark: SparkSession, events_dir: str,
                        out_path: str, checkpoint_dir: str,
                        window: str = "1 hour",
                        watermark: str = "2 hours"):
    """Drain `events_dir` (parquet files of EVENTS_SCHEMA) into an
    append-mode parquet of finalized windows; returns the query after
    Trigger.AvailableNow completion. Append mode emits a window only
    once the watermark passes it — the exactly-once finalized-window
    contract a downstream consumer wants."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(events_dir))
    agg = windowed_event_counts(stream, window, watermark)
    q = (agg.writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start(out_path))
    q.awaitTermination()
    return q
