"""Full table rebuild — the Spark form of ``1_rebuild_db.R``.

Reference behavior: delete the SQLite file, loop seasons 1999→now,
download each and ``dbWriteTable(append=TRUE)``, then sanity-count by
season and team (``1_rebuild_db.R:12-50``).

Spark form: one declarative job — read the source, write
``mode("overwrite")`` partitioned by the season-like column, then the
same sanity aggregates. Partitioning by the append unit means later
incremental loads touch one partition, and every downstream
season-filtered read partition-prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def rebuild(
    df: DataFrame,
    out_path: str,
    partition_col: str | None = None,
) -> None:
    """Overwrite ``out_path`` with ``df``, partitioned if requested."""
    writer = df.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(out_path)


def sanity_counts(spark: SparkSession, path: str, by: str) -> DataFrame:
    """The post-rebuild verification of ``1_rebuild_db.R:39-50``:
    grouped row counts, computed distributed (driver only collects
    the tiny result)."""
    return spark.read.parquet(path).groupBy(by).count().orderBy(by)
