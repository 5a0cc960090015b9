"""Skew-join stress at AQE's DEFAULT thresholds (ROADMAP item 4).

tests/test_skew_strategies.py proves the mechanics by lowering
skewedPartitionThresholdInBytes to 32KB. This tool builds a hot
shuffle partition that crosses the real default (256MB advisory /
skewedPartitionFactor 5) — ~3M rows of one key carrying a ~128-byte
incompressible payload (shuffle sizes are post-compression, so the
payload is md5 hex of the row id, not a constant) — and times:

1. sort-merge join, AQE skew-join ON (default)  -> splits the hot
   partition; plan shows ``skew=true``
2. sort-merge join, AQE skew-join OFF           -> one straggler task
   drains the hot key alone
3. operators.relational.salted_join             -> explicit sharding,
   works even when a downstream groupBy pins the partitioning

Usage: python tools/skew_stress.py [N_TOTAL_ROWS]
Prints one JSON line; measured numbers recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.relational import salted_join


def build(spark: SparkSession, n: int):
    # half the rows on key 0, the rest uniform over 1000 keys;
    # payload = 4x md5 hex (128 bytes) so compression can't shrink
    # the hot partition under the threshold
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 1000)
        .alias("key"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
            F.md5((F.col("id") + 2).cast("string")),
            F.md5((F.col("id") + 3).cast("string")),
        ).alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("dimv")
    )
    return fact, dim


def run_join(fact, dim, agg_payload=True):
    j = fact.join(dim.hint("merge"), "key")
    # global agg downstream (does NOT pin the join partitioning, so
    # AQE's skew split is allowed to fire)
    out = j.agg(
        F.count("*").alias("n"), F.sum(F.length("payload")).alias("bytes")
    )
    t0 = time.time()
    row = out.collect()[0]
    dt = time.time() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    return dt, row, plan.count("skew=true")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("skew-stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark, n)
    fact = fact.cache()
    fact.count()  # materialize + warm

    out = {"n": n, "hot_rows": n // 2}

    t, row, skews = run_join(fact, dim)
    out["aqe_skew_on"] = {"sec": round(t, 1), "skew_splits": skews,
                          "rows": row["n"]}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t, row, skews = run_join(fact, dim)
    out["aqe_skew_off"] = {"sec": round(t, 1), "skew_splits": skews,
                           "rows": row["n"]}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    t0 = time.time()
    j = salted_join(fact, dim, "key", n_salts=32)
    row = j.agg(
        F.count("*").alias("n"), F.sum(F.length("payload")).alias("bytes")
    ).collect()[0]
    out["salted"] = {"sec": round(time.time() - t0, 1), "rows": row["n"]}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
