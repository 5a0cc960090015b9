"""Seeded-shuffle scale study: per-byte cost of the epoch shard pass
at the sf0.1 and 10x tiers — the operator is one hash exchange + an
in-partition sort, so time should scale ~linearly with rows (sort is
n log n within fixed-size partitions).

Usage: python tools/shuffle_scale.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators.shuffle import (
    shuffled_shards,
    shuffled_shards_weighted,
)
from nfl_data_pipeline_spark.session import get_spark

TIERS = {"sf0.1": "/root/testdata/sf0.1", "10x": "/tmp/sfbig"}
N_SHARDS = 64


def main() -> dict:
    spark = get_spark(app_name="shuffle-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_shards": N_SHARDS}
    for tier, d in TIERS.items():
        docs = load(spark, d, "documents").select("doc_id", "text")
        n = docs.count()  # warm the scan
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            shuffled_shards(docs, seed=3, n_shards=N_SHARDS).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[tier] = {"rows": n, "sec": round(best, 3)}
        # the size-aware variant: same epoch order, shard boundaries
        # on cumulative chars; extra cost = the range-totals pass +
        # per-range window
        wdocs = docs.select(
            "doc_id", F.length("text").cast("long").alias("w")
        )
        total = wdocs.agg(F.sum("w")).collect()[0][0]
        best_w = None
        for _ in range(3):
            t0 = time.perf_counter()
            shuffled_shards_weighted(
                wdocs,
                seed=3,
                target_weight=max(1, total // N_SHARDS),
                weight_col="w",
                n_ranges=256,
            ).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best_w = dt if best_w is None else min(best_w, dt)
        out[tier]["weighted_sec"] = round(best_w, 3)
    r = out["10x"]["rows"] / out["sf0.1"]["rows"]
    t = out["10x"]["sec"] / out["sf0.1"]["sec"]
    out["rows_ratio"] = round(r, 2)
    out["time_ratio"] = round(t, 2)
    out["per_row_ratio"] = round(t / r, 3)
    tw = out["10x"]["weighted_sec"] / out["sf0.1"]["weighted_sec"]
    out["weighted_time_ratio"] = round(tw, 2)
    out["weighted_per_row_ratio"] = round(tw / r, 3)
    print(json.dumps(out))
    spark.stop()
    return out


if __name__ == "__main__":
    main()
