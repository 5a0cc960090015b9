"""Exact vs approximate COUNT DISTINCT at 12M rows: the HLL dial.

COUNT(DISTINCT x) is shuffle-expensive: Spark expands it into a
two-phase aggregate keyed by (group, x) — the full distinct key set
crosses the wire. `approx_count_distinct` (HyperLogLog++) ships
fixed-size sketches instead; `rsd` trades sketch size for error.
This tool measures both so the switch-over is recorded engineering,
like tools/quantile_accuracy.py for percentiles.

Usage: python tools/distinct_accuracy.py [N_ROWS]
Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("distinct-accuracy")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ~n/3 distinct values across 5 groups (pure function of id)
    df = (
        spark.range(n)
        .repartition(32)
        .select(
            (F.col("id") % 5).alias("g"),
            (F.abs(F.hash("id")) % (n // 3)).alias("x"),
        )
        .cache()
    )
    df.count()

    t0 = time.time()
    exact_rows = (
        df.groupBy("g").agg(F.countDistinct("x").alias("d")).orderBy("g").collect()
    )
    t_exact = round(time.time() - t0, 2)
    exact = {r["g"]: r["d"] for r in exact_rows}

    out = {"n": n, "exact_sec": t_exact, "approx": {}}
    for rsd in (0.05, 0.01, 0.005):
        t0 = time.time()
        rows = (
            df.groupBy("g")
            .agg(F.approx_count_distinct("x", rsd=rsd).alias("d"))
            .orderBy("g")
            .collect()
        )
        t = round(time.time() - t0, 2)
        max_rel = max(
            abs(r["d"] - exact[r["g"]]) / exact[r["g"]] for r in rows
        )
        out["approx"][f"rsd{rsd}"] = {
            "sec": t,
            "max_rel_err": round(max_rel, 5),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
