"""Table catalog: name → parquet path, the Spark analog of
``tbl(con, "cleaned_pbp")`` (reference ``base_code.R:6-9``).

The reference resolves one table name inside one SQLite file; we
resolve any fixture-table name inside a scale-factor directory. Reads
are plain ``spark.read.parquet`` so Catalyst gets the full relation:
filter pushdown, column pruning, and (for partitioned layouts)
partition pruning all apply — the pushdown the reference gets from
dbplyr-compiled SQL (SURVEY.md §4) is free here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated fixture tables (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables that should always broadcast in joins
# (the reference's 32-row ``teams_colors_logos`` pattern, SURVEY §2.3 J5).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as a bigint of epoch-nanoseconds
    (lossless — sub-microsecond data is real in this fixture) and treat
    event time as ``ts_ns`` arithmetic throughout. The DuckDB oracle
    side uses ``epoch_ns(ts)`` for the identical integer.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(table_path(sf_dir, name))


def register_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view so ``spark.sql``
    queries see the same names the DuckDB oracle sees."""
    for name in FIXTURE_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)


class Catalog:
    """Bound catalog: remembers (spark, sf_dir) so call sites read like
    the reference's ``tbl(con, name)``."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir

    def table(self, name: str) -> DataFrame:
        return load(self.spark, self.sf_dir, name)

    def __getattr__(self, name: str) -> DataFrame:
        if name in FIXTURE_TABLES:
            return self.table(name)
        raise AttributeError(name)
