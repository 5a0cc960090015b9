"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB
equivalent for the hash-compare correctness gate.

All real logic lives in ``nfl_data_pipeline_spark/``; this file is a
thin adapter over the query registry.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nfl_data_pipeline_spark.queries import all_queries

# Steady-state table cache for the driver's correctness sweep: it runs
# ~50+ queries back-to-back against ONE sf_dir in ONE session, so each
# fixture table is materialized once (catalog.load) instead of
# re-scanned per query — results are identical, the sweep is ~2×
# faster. Cache entries are keyed by sessionUUID, so a recreated
# session never sees a dead session's DataFrames. Opt out with
# SPARK_GRAFT_CACHE=0.
os.environ.setdefault("SPARK_GRAFT_CACHE", "1")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The multi-join revenue rollup — scan + 4 equi-joins (2 broadcast)
    + exact-decimal grouped aggregation — is the engine's canonical
    plan shape (reference analog: R/epa_predict.R:215-219 panel build).
    """
    return all_queries()["revenue_by_nation"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
