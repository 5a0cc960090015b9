"""Incrementally-maintained corpus statistics over tx state tables:
the quantile counterpart of the funnel's mergeable counters.

``merge_grouped_sums`` can maintain any statistic whose state is
plain sums; percentiles are not — so streaming jobs that want "p95
document length so far" either re-scan the corpus per refresh or hold
a non-mergeable sketch in opaque executor state. The mergeable length
histogram (operators/sketches.py) closes that: state is (key, bucket,
n) counts, each batch contributes one O(batch) hash-aggregate delta,
and quantiles are recovered at read time within a ~5% bucket width.

State table layout: partitioned by the first key column (the shard
key — refreshes rewrite only the shards a batch touches), carrying
the batch id for replay idempotence like every other tx merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from nfl_data_pipeline_spark.jobs.txlog import TxTable, merge_grouped_sums
from nfl_data_pipeline_spark.operators.sketches import (
    histogram_counts,
    histogram_quantiles,
)


def update_histogram_state(
    spark: SparkSession,
    df: DataFrame,
    table: TxTable,
    keys: Sequence[str],
    col: str,
    batch_id: str | None = None,
) -> bool:
    """Merge one batch's histogram delta into the state table.
    Returns False for a detected replay (same contract as
    merge_grouped_sums)."""
    from pyspark.sql import functions as F

    # scheme guard BEFORE any work: state written under another
    # bucket scheme must refuse the merge, not silently mix ids
    from nfl_data_pipeline_spark.operators.sketches import (
        check_hist_scheme,
    )

    meta = check_hist_scheme(table)
    # shadow partition column (the merge contract keys the rewrite on
    # a column distinct from the group keys, like funnel counts)
    delta = histogram_counts(df, keys, col).withColumn(
        "_part", F.col(keys[0])
    )
    return merge_grouped_sums(
        spark,
        delta,
        table,
        key_cols=[*keys, "bucket"],
        sum_cols=["n"],
        partition_col="_part",
        batch_id=batch_id,
        meta=meta,
    )


def read_quantile_state(
    spark: SparkSession,
    table: TxTable,
    keys: Sequence[str],
    probs: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame | None:
    """Current per-key quantiles from the maintained histogram —
    O(state) work, no corpus scan. None for an empty table."""
    from nfl_data_pipeline_spark.operators.sketches import (
        check_hist_scheme,
    )

    check_hist_scheme(table)  # old-scheme ids decode to wrong mids
    hist = table.read(spark)
    if hist is None:
        return None
    return histogram_quantiles(hist, keys, probs)
