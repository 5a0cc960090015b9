"""Structured Streaming ingestion over the ``events`` table shape.

Three capabilities (SURVEY.md §2.10 table):

- ``stream_events``: file-source stream with an explicit schema (no
  inference scan — mandatory at scale).
- ``windowed_counts``: event-time tumbling/sliding windows with a
  watermark for late data (the reference has no analog; north star).
- ``merge_append_stream``: foreachBatch idempotent MERGE — the
  streaming form of jobs/update.incremental_append, giving exactly-once
  appends on replayed input.

The events fixture carries nanosecond timestamps; streaming state
needs a real TimestampType, so event time is derived as microsecond
truncation (documented loss < 1µs, irrelevant for windowing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Streaming-side schema: ts read as LONG nanos (the parquet files are
# TIMESTAMP(NANOS); with nanosAsLong the vectorized reader hands us
# the raw int64).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of events with event-time column derived
    from the nano timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )
    return raw.withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


def windowed_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation with a
    watermark bounding state for late data."""
    win = (
        F.window("event_time", window, slide)
        if slide
        else F.window("event_time", window)
    )
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Replay-safe dedup on the event key while bounding state —
    the streaming form of update_db's missing-game check."""
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def merge_append_stream(
    spark: SparkSession,
    events: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key: str = "event_id",
):
    """foreachBatch idempotent MERGE: each micro-batch left-anti joins
    the existing table on the key before appending — exactly-once
    appends even when the source replays (2_scrape_new_games.R:7-12
    as a stream)."""
    from nfl_data_pipeline_spark.jobs.update import incremental_append

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        incremental_append(spark, batch_df, table_path, key)

    return (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
