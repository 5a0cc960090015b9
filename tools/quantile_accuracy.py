"""Exact vs approximate percentile at 12M rows: the accuracy dial.

The registered `quantiles` query uses EXACT `percentile` for
reference parity (R type-7). Exact group percentiles buffer the
group's values in the aggregation — fine at fixture scale, a memory
hazard for 100 TB groups. Spark's scale path is `approx_percentile`
(Greenwald-Khanna): this tool measures its error and speed against
the exact result so the switch-over is a recorded engineering
decision, not a guess.

Usage: python tools/quantile_accuracy.py [N_ROWS]
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

PS = (0.2, 0.5, 0.8, 0.99)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("quantile-accuracy")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic heavy-tailed values, 5 groups (pure function of id)
    df = (
        spark.range(n)
        .repartition(32)
        .select(
            (F.col("id") % 5).alias("g"),
            F.expr(
                "exp(3.0 * sin(hash(id) * 1e-9) + 0.5 * sin(hash(id, 7) * 1e-9)) * 100.0"
            ).alias("x"),
        )
        .cache()
    )
    df.count()

    def run(agg_exprs):
        t0 = time.time()
        rows = df.groupBy("g").agg(*agg_exprs).orderBy("g").collect()
        return rows, round(time.time() - t0, 2)

    exact_rows, t_exact = run(
        [F.percentile("x", p).alias(f"p{int(p*100)}") for p in PS]
    )
    exact = {r["g"]: [r[f"p{int(p*100)}"] for p in PS] for r in exact_rows}

    out = {"n": n, "exact_sec": t_exact, "approx": {}}
    for acc in (100, 1000, 10000):
        rows, t = run(
            [
                F.expr(f"approx_percentile(x, {p}, {acc})").alias(
                    f"p{int(p*100)}"
                )
                for p in PS
            ]
        )
        max_rel = 0.0
        for r in rows:
            for i, p in enumerate(PS):
                e = exact[r["g"]][i]
                max_rel = max(max_rel, abs(r[f"p{int(p*100)}"] - e) / e)
        out["approx"][f"acc{acc}"] = {
            "sec": t,
            "max_rel_err": round(max_rel, 5),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
