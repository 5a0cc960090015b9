"""PPS-sampling scale study: wall cost of the deterministic weighted
sample (flat + stratified) at the sf0.1 and 10x tiers, and the
exactness invariants re-checked at the big tier.

The operator is a map pass + n_ranges driver rows + one hash exchange
for the per-range window — the shuffled_shards_weighted class — so
time should scale ~linearly with rows and be independent of k.

Usage: python tools/pps_scale.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators.sampling import (
    pps_stratified_sample,
    pps_systematic_sample,
)
from nfl_data_pipeline_spark.session import get_spark

TIERS = {"sf0.1": "/root/testdata/sf0.1", "10x": "/tmp/sfbig"}
K = 2_003


def main() -> dict:
    spark = get_spark(app_name="pps-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"k": K}
    for tier, d in TIERS.items():
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            out[tier] = "missing"
            continue
        docs = load(spark, d, "documents").select(
            "doc_id", "source", F.length("text").cast("long").alias("w")
        )
        n = docs.count()  # warm the scan
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            s = pps_systematic_sample(docs, K, "w", seed=11, n_ranges=256)
            drawn = s.agg(F.sum("n_copies")).collect()[0][0]
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        assert drawn == K, (tier, drawn)
        best_s = None
        for _ in range(3):
            t0 = time.perf_counter()
            st = pps_stratified_sample(
                docs, K, "w", "source", seed=11, n_ranges=256
            )
            drawn_s = st.agg(F.sum("n_copies")).collect()[0][0]
            dt = time.perf_counter() - t0
            best_s = dt if best_s is None else min(best_s, dt)
        assert drawn_s == K, (tier, drawn_s)
        out[tier] = {
            "rows": n,
            "flat_sec": round(best, 3),
            "strat_sec": round(best_s, 3),
        }
    if isinstance(out.get("sf0.1"), dict) and isinstance(
        out.get("10x"), dict
    ):
        out["flat_ratio_10x"] = round(
            out["10x"]["flat_sec"] / out["sf0.1"]["flat_sec"], 2
        )
        out["strat_ratio_10x"] = round(
            out["10x"]["strat_sec"] / out["sf0.1"]["strat_sec"], 2
        )
    spark.stop()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
