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


def session_windowed_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time session windows: rows closer than ``gap`` merge into
    one session per user; a session closes when the watermark passes
    its end. The streaming twin of the batch ``sessionize`` query
    (queries/sessions.py) — same gap semantics, engine-managed state
    instead of a lag-window cumsum."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession, changelog: bool = True) -> None:
    """Switch stateful streaming queries started after this call to the
    RocksDB state store.

    The default HDFSBackedStateStoreProvider keeps every key in JVM
    heap — fine for the reference-sized world, an OOM at 100 TB-scale
    key cardinality (e.g. dropDuplicates over billions of event ids).
    RocksDB spills state to local SSD and, with changelog
    checkpointing, uploads only per-batch deltas instead of full
    snapshots."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog else "false",
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
