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
from pyspark.sql import functions as F

#: Per-file row cap for partitioned writes: a production-sized
#: partition splits into bounded files instead of one giant one
#: (~250 MB at reference row width — the guide-§6 output sizing
#: band). A no-op at bench scale (48k rows/season).
MAX_RECORDS_PER_FILE = 4_000_000


def rebuild(
    df: DataFrame,
    out_path: str,
    partition_col: str | None = None,
) -> None:
    """Overwrite ``out_path`` with ``df``, partitioned if requested.

    The frame is clustered on the partition column before a
    partitioned write: without it every upstream task writes its own
    file into every partition directory — N_tasks × N_partitions
    small files (measured 800 ~90 KB files and 7.1 s vs 25 files and
    1.8 s for the 1.2M-row rebuild). The repartition uses the
    session's shuffle-partition/AQE sizing (no fixed count), and
    ``maxRecordsPerFile`` re-splits any partition too large for one
    healthy file."""
    writer = (
        (df.repartition(F.col(partition_col)) if partition_col else df)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", MAX_RECORDS_PER_FILE)
    )
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(out_path)


def sanity_counts(spark: SparkSession, path: str, by: str) -> DataFrame:
    """The post-rebuild verification of ``1_rebuild_db.R:39-50``:
    grouped row counts, computed distributed (driver only collects
    the tiny result)."""
    return spark.read.parquet(path).groupBy(by).count().orderBy(by)
