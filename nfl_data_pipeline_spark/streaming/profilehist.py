"""Incremental profiler histogram state (VERDICT r10 "What's
missing" #2 / builder round-11 #2): the batch ``table_profile`` has
min/max/avg; percentiles need distribution state, and
``percentile_approx``'s sketch is one-shot (not mergeable across tx
batches). This module maintains the two-leading-digit integer-bucket
histograms of ``operators/sketches.py`` — whose state is plain
(col, bucket, n) SUMS — in one transactional table, merged per
micro-batch through the rollup machinery (``merge_grouped_sums``), so
a continuous intake keeps per-column percentile state current at
O(batch vocabulary) per refresh and NEVER re-scans the corpus.

Contract (pinned by tests/test_profile_hist.py):

- stream-merge == one-shot: the state after any batch split equals
  ``profile_histograms`` over the union — bucket counts are sums and
  sums merge, so the recovered quantiles are IDENTICAL, not just
  close (unlike merging two percentile_approx sketches).
- accuracy: quantile recovery returns the bucket midpoint — relative
  error ≤ half a bucket width (~5.3%), exact for |values| < 10.
- replay: each merge carries the batch_id; a replayed batch is a
  detected no-op (the funnel's idempotence argument — one table, so
  there is no crash-between-substates window at all).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable, merge_grouped_sums
from nfl_data_pipeline_spark.operators.sketches import histogram_quantiles
from nfl_data_pipeline_spark.queries.extra import profile_histograms


class ProfileHistState:
    """One transactional histogram table: (col, bucket, n) rows
    partitioned by column name — a batch touching k columns rewrites
    exactly k partitions, each bounded by ~90·decades buckets."""

    def __init__(self, root: str):
        self.hist = TxTable(os.path.join(root, "hist"))


def process_profile_batch(
    spark: SparkSession,
    df: DataFrame,
    cols: tuple[str, ...],
    state: ProfileHistState,
    batch_id: str,
) -> bool:
    """Merge one batch's histogram delta; returns False for a
    detected replay (merge_grouped_sums' contract)."""
    from nfl_data_pipeline_spark.operators.sketches import (
        check_hist_scheme,
    )

    meta = check_hist_scheme(state.hist)
    delta = profile_histograms(df, cols).withColumn(
        "col_part", F.col("col")
    )
    return merge_grouped_sums(
        spark, delta, state.hist, ["col", "bucket"], ["n"], "col_part",
        batch_id, meta=meta,
    )


def read_histograms(
    spark: SparkSession, state: ProfileHistState
) -> DataFrame:
    """Current (col, bucket, n) state; empty-schema frame before the
    first batch lands."""
    from nfl_data_pipeline_spark.operators.sketches import (
        check_hist_scheme,
    )

    check_hist_scheme(state.hist)
    df = state.hist.read(spark)
    if df is None:
        from nfl_data_pipeline_spark.operators.localframe import (
            empty_frame,
        )

        return empty_frame(spark, "col string, bucket long, n long")
    return df.select("col", "bucket", "n")


def read_quantiles(
    spark: SparkSession,
    state: ProfileHistState,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Per-column quantiles recovered from the maintained state — the
    read path costs O(|state|), independent of corpus size."""
    return histogram_quantiles(
        read_histograms(spark, state), ["col"], probs
    ).orderBy("col")


def profile_maintenance_stream(
    spark: SparkSession,
    stream: DataFrame,
    cols: tuple[str, ...],
    state: ProfileHistState,
    checkpoint_dir: str,
):
    """Wire the histogram state into a stream (availableNow replay
    semantics; a checkpoint wipe replays harmlessly — the manifest
    rejects re-seen batch ids)."""

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        process_profile_batch(
            spark, batch_df, cols, state, f"profhist-{batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
