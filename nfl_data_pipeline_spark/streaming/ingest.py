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

from nfl_data_pipeline_spark.operators.hints import gated_broadcast

# Streaming-side schema: ts is LONG epoch-nanos — stream source files
# are written from the engine's canonical events form (catalog.load
# normalizes ts to int64 ns regardless of the fixture's parquet
# timestamp resolution).
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


def stream_events(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of events with event-time column derived
    from the nano timestamp.

    ``max_files_per_trigger`` is the file source's rate limit: each
    micro-batch admits at most that many files, bounding per-batch
    state growth and shuffle size no matter how large the backlog —
    the knob that keeps a 100 TB catch-up read from becoming one
    giant batch.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    return raw.withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


def rate_events(
    spark: SparkSession,
    rows_per_second: int = 100,
    ramp_up_time: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic rate-limited event stream in the ``events`` shape —
    the built-in ``rate`` source mapped onto the fixture schema.

    The load generator for soak/throughput tests: emits exactly
    ``rows_per_second`` rows/sec (after ``ramp_up_time``), spread over
    ``num_partitions``, with deterministic columns derived from the
    source's monotonically-increasing ``value``. No reference analog
    (the reference's feed is a weekly batch); this is the knob the
    streaming path is tuned with.
    """
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    )
    if ramp_up_time is not None:
        reader = reader.option("rampUpTime", ramp_up_time)
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    raw = reader.load()  # columns: timestamp, value
    return raw.select(
        F.col("value").alias("event_id"),
        (F.unix_micros("timestamp") * F.lit(1000)).alias("ts"),
        (F.col("value") % 1000).alias("user_id"),
        F.when(F.col("value") % 3 == 0, "click")
        .when(F.col("value") % 3 == 1, "view")
        .otherwise("purchase")
        .alias("event_type"),
        (F.col("value") % 97).cast("double").alias("value"),
        F.to_json(F.struct(F.col("value").alias("seq"))).alias("props"),
        F.col("timestamp").alias("event_time"),
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


def rollup_maintenance_stream(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    bucket_ns: int = 3_600_000_000_000,
):
    """Streaming continuous-aggregate maintenance: each micro-batch
    merges into the stored rollup via ``jobs.rollup.refresh_rollup``
    with the micro-batch id as the replay ledger key — so a batch
    replayed after a checkpoint rollback (the at-least-once window of
    foreachBatch) is detected and skipped instead of double-counting
    merged state. This is the end-to-end exactly-once composition the
    rollup's batch_id ledger exists for: Structured Streaming
    guarantees batch_id-stable replays; the ledger makes the sink
    idempotent per batch_id.
    """
    from nfl_data_pipeline_spark.jobs.rollup import refresh_rollup

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        refresh_rollup(
            spark,
            batch_df,
            rollup_path,
            bucket_ns=bucket_ns,
            batch_id=f"stream-{batch_id}",
        )

    return (
        events.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def rollup_maintenance_stream_tx(
    spark: SparkSession,
    events: DataFrame,
    table,
    checkpoint_dir: str,
    bucket_ns: int = 3_600_000_000_000,
):
    """Exactly-once streaming rollup maintenance over a
    ``jobs.txlog.TxTable``. Unlike ``rollup_maintenance_stream`` (whose
    ledger marker lands AFTER the overwrite — a crash between the two
    replays as a double-count), the tx variant publishes merged state
    and the batch marker in one atomic manifest swap, so foreachBatch's
    at-least-once replays are idempotent with NO unprotected window.
    """
    from nfl_data_pipeline_spark.jobs.rollup import refresh_rollup_tx

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        refresh_rollup_tx(
            spark,
            batch_df,
            table,
            bucket_ns=bucket_ns,
            batch_id=f"stream-{batch_id}",
        )

    return (
        events.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich the event stream with a static
    dimension (the reference's 32-row teams join, J5, in streaming
    form). The static side is re-read per micro-batch and broadcast —
    no state store involved, so it's the cheap enrichment path; use
    it over stream-stream whenever one side doesn't actually move.
    """
    # size-gated: the helper's contract is a SMALL static dim, but a
    # caller-supplied dim is not structurally bounded — degrade to a
    # shuffle join instead of aborting past the broadcast limit
    return events.join(gated_broadcast(dim), on, "left")


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each click pairs with
    purchases of the same user within ``max_gap`` AFTER it — the
    streaming twin of the batch ``range_join_windows``/``asof`` family.

    Both sides carry watermarks and the join has a two-sided time
    bound, so the state store can evict: a buffered click is dropped
    once the purchase-side watermark passes click_time + max_gap.
    Without BOTH (watermarks + time bound) the state grows forever —
    the canonical stream-stream-join pitfall.
    """
    c = clicks.withWatermark("event_time", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("event_time").alias("click_time"),
    )
    p = purchases.withWatermark("event_time", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("event_time").alias("purchase_time"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_time") >= F.col("click_time"))
        & (
            F.col("purchase_time")
            <= F.col("click_time") + F.expr(f"INTERVAL {max_gap}")
        ),
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        "click_time",
        "purchase_time",
        "purchase_value",
    )


def comoment_maintenance_stream_tx(
    spark: SparkSession,
    events: DataFrame,
    table,
    checkpoint_dir: str,
    bucket_ns: int = 3_600_000_000_000,
    x_col: str = "value",
    y_col: str = "user_id",
):
    """Exactly-once streaming maintenance of the CO-MOMENT rollup
    (``jobs.rollup.refresh_comoments_tx``): per micro-batch, the
    correlation's sufficient statistics merge into the tx table
    atomically with the batch marker — so the stream's accumulated
    state is BIT-IDENTICAL to a one-shot batch aggregation of the
    same events (exact decimal sums), and corr/cov derive at read
    time from state that never saw an approximate merge."""
    from nfl_data_pipeline_spark.jobs.rollup import refresh_comoments_tx

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:
        refresh_comoments_tx(
            spark,
            batch_df,
            table,
            x_col=x_col,
            y_col=y_col,
            bucket_ns=bucket_ns,
            batch_id=f"stream-{batch_id}",
        )

    return (
        events.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
