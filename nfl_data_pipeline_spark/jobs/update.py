"""Incremental idempotent append — the Spark form of
``2_scrape_new_games.R`` / ``nflfastR::update_db``.

Reference behavior: diff completed games against games already in the
table, append only the missing ones (``2_scrape_new_games.R:7-12``),
then log the most recent 5 game ids (``:16-24`` — which silently
relies on insertion order; we sort explicitly).

Spark form: left-anti join on the natural key, append the remainder.
Running it twice appends nothing (the reference's contract). The
anti-join build side is the *keys projection* of the existing table —
column-pruned to the key, so at 100 TB the probe reads one column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from nfl_data_pipeline_spark.operators.relational import distinct_ordered_tail


def incremental_append(
    spark: SparkSession,
    new_rows: DataFrame,
    table_path: str,
    key: str | list[str],
    partition_col: str | None = None,
) -> int:
    """Append rows of ``new_rows`` whose key is absent from the table.

    Returns the number of rows appended. Idempotent by construction.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    if os.path.exists(table_path):
        existing_keys = spark.read.parquet(table_path).select(*keys)
        to_add = new_rows.join(existing_keys, keys, "left_anti")
    else:
        to_add = new_rows
    # ONE pass: the appended-row count comes from an Observation on
    # the write itself. Caching-then-counting (the obvious
    # alternative) materializes an unbounded `to_add` in executor
    # memory and scans the anti-join twice — a memory hazard and a
    # wasted pass at 100 TB. A zero-row append costs one empty task
    # set, which is cheaper than a second scan of the delta.
    obs = Observation("incremental_append")
    observed = to_add.observe(obs, F.count(F.lit(1)).alias("n_appended"))
    writer = observed.write.mode("append")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(table_path)
    return obs.get["n_appended"]


def freshness_report(spark: SparkSession, table_path: str, key: str, n: int = 5) -> DataFrame:
    """Most recent *n* distinct keys stamped with the report date —
    ``2_scrape_new_games.R:16-24`` (the reference prints the last-5
    game ids plus ``lubridate::today()``), with the insertion-order
    dependence replaced by an explicit sort."""
    from pyspark.sql import functions as F

    tail = distinct_ordered_tail(spark.read.parquet(table_path), key, n)
    return tail.withColumn("as_of", F.current_date())
