"""Co-located join via bucketed tables + dynamic partition overwrite —
the two storage-layout levers the 100 TB posture depends on
(SURVEY.md §4 partitioning row; README scale design).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark):
    # session warehouse lives under cwd (spark-warehouse/, gitignored)
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    """Both sides bucketed on the join key → sort-merge join with NO
    Exchange: the co-located join that makes a 100 TB fact-fact join
    feasible (shuffle is the bottleneck, not CPU)."""
    orders = load(spark, SF_SMOKE, "orders")
    li = load(spark, SF_SMOKE, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    # at test scale the dimension auto-broadcasts, which bypasses
    # bucketing entirely; force the sort-merge path a 100 TB fact-fact
    # join would take
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            f"bucketed join still shuffles:\n{plan[:800]}"
        )
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_dynamic_partition_overwrite_restates_one_season(spark, tmp_path):
    """The reference re-states a season by re-downloading it
    (1_rebuild_db.R loop); the Spark form overwrites ONLY that
    partition, leaving the others byte-identical."""
    import os
    import tempfile

    os.makedirs("/root/repo/.scratch", exist_ok=True)
    d = tempfile.mkdtemp(dir="/root/repo/.scratch")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        orders = load(spark, SF_SMOKE, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )
        path = f"{d}/t"
        orders.write.partitionBy("order_year").parquet(path)
        before = spark.read.parquet(path)
        # materialize all "before" facts NOW: the lazy plan would
        # re-read files the overwrite is about to replace
        n_total = before.count()
        n_1997 = before.filter("order_year = 1997").count()
        n_1996 = before.filter("order_year = 1996").count()
        old_sum = before.filter("order_year = 1997").agg(
            F.sum("o_totalprice")
        ).collect()[0][0]

        # restate 1997 with modified rows (prices doubled)
        restated = (
            orders.filter("order_year = 1997")
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        )
        restated.write.mode("overwrite").partitionBy("order_year").parquet(path)

        after = spark.read.parquet(path)
        assert after.count() == n_total  # other partitions intact
        assert after.filter("order_year = 1997").count() == n_1997
        new_sum = after.filter("order_year = 1997").agg(
            F.sum("o_totalprice")
        ).collect()[0][0]
        assert new_sum == pytest.approx(2 * old_sum)
        assert after.filter("order_year = 1996").count() == n_1996
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
