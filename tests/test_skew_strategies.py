"""Skew-strategy tests (ROADMAP item: AQE skew-join vs salted_join).

Over the same pathologically-skewed data (90% of fact rows on one
key), the two defenses the engine offers must (a) actually engage and
(b) be row-invisible in results:

- adaptive: AQE's OptimizeSkewedJoin splits the hot shuffle partition
  at runtime (sort-merge join shows ``skew=true``). It only applies
  when no downstream operator requires the join's hash partitioning —
  a global/partial aggregate qualifies; a groupBy on the join key does
  NOT (the split would break the required distribution), which is
  exactly when the explicit ``salted_join`` remains necessary.
- explicit: ``operators.relational.salted_join`` shards the hot key
  across 16 salts regardless of what's downstream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.relational import salted_join

_SKEW_CONFS = {
    # make the tiny test partitions cross AQE's skew thresholds
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    # keep the dim side out of broadcast so the join really shuffles
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _skewed_inputs(spark):
    fact = spark.range(0, 300_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("key"),
        (F.col("id") % 97).alias("val"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("dimv")
    )
    return fact, dim


def test_aqe_skew_split_fires_and_strategies_agree(spark):
    saved = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    try:
        for k, v in _SKEW_CONFS.items():
            spark.conf.set(k, v)
        fact, dim = _skewed_inputs(spark)

        adaptive = fact.join(dim.hint("merge"), "key").agg(
            F.sum(F.col("val") + F.col("dimv")).alias("s")
        )
        adaptive_sum = adaptive.collect()[0]["s"]
        plan = adaptive._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan}"

        salted_sum = (
            salted_join(fact, dim, "key")
            .agg(F.sum(F.col("val") + F.col("dimv")).alias("s"))
            .collect()[0]["s"]
        )
        assert adaptive_sum == salted_sum
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_declines_split_when_groupby_needs_partitioning(spark):
    """The documented limit of the adaptive path: a groupBy on the
    join key pins the join's output distribution, so AQE must NOT
    split the hot partition — this is the case salted_join exists
    for."""
    saved = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    try:
        for k, v in _SKEW_CONFS.items():
            spark.conf.set(k, v)
        fact, dim = _skewed_inputs(spark)
        grouped = (
            fact.join(dim.hint("merge"), "key")
            .groupBy("key")
            .agg(F.sum("val").alias("s"))
        )
        grouped.collect()
        plan = grouped._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
