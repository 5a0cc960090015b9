"""Heavy-hitter scale study: two-pass Misra-Gries vs wholesale
group-by at 12M keys.

Generates a Zipf-ish key stream DISTRIBUTED (hot head + md5 long
tail — the n-gram/URL shape), then measures:

- `heavy_hitters` (per-partition MG sketches → broadcast-semi exact
  count), including the candidate-set size the sketch pass feeds
  pass 2;
- the baseline full `groupBy(key).count().filter(...)` — which must
  shuffle the ENTIRE key space;
- equality of the two answers (the operator's exactness contract).

Usage:  python tools/hh_scale.py [N_ROWS] [PHI_INV]
Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_sketches,
)
from nfl_data_pipeline_spark.session import get_spark


def main(n_rows: int, phi_inv: int, n_parts: int | None = None) -> dict:
    spark = get_spark(app_name=f"hh-scale-{n_rows}")
    spark.sparkContext.setLogLevel("ERROR")
    # 0.1% of rows spread over 10 hot keys (each 'hot ⟺ ≥ N/phi_inv'
    # at phi_inv=10k); the rest an ~n_rows/3-key md5 tail
    stream = spark.range(n_rows).selectExpr(
        f"CASE WHEN id % 1000 = 0 "
        f"THEN concat('hot_', CAST((id DIV 1000) % 10 AS STRING)) "
        f"ELSE substring(md5(CAST(id % {n_rows // 3} AS STRING)), 1, 12) END AS k"
    )
    if n_parts:
        stream = stream.repartition(n_parts)
    stream = stream.localCheckpoint(eager=True)

    t0 = time.perf_counter()
    hh = heavy_hitters(stream, "k", phi_inv=phi_inv)
    got = {(r["k"], r["n"]) for r in hh.collect()}
    t_mg = time.perf_counter() - t0

    # broadcast-side sizes: raw sketch rows (the pre-r5 broadcast
    # bound, partitions × capacity) vs the r5 pruned candidate set
    # (groupBy-sum + summaries-merge upper-bound filter — what
    # heavy_hitters now actually broadcasts)
    sk = misra_gries_sketches(
        stream, "k", capacity=phi_inv
    ).localCheckpoint(eager=True)
    n_sketch_rows = sk.filter(F.col("key").isNotNull()).count()
    tot = sk.agg(
        F.sum(F.when(F.col("key").isNull(), F.col("mg_count"))).alias("n"),
        F.sum(F.when(F.col("key").isNotNull(), F.col("mg_count"))).alias("s"),
    ).first()
    err = (int(tot["n"] or 0) - int(tot["s"] or 0)) // (phi_inv + 1)
    n_cand = (
        sk.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("mg_count").alias("mg_sum"))
        .filter((F.col("mg_sum") + F.lit(err)) * phi_inv >= int(tot["n"] or 0))
        .count()
    )

    t0 = time.perf_counter()
    n = stream.count()
    want = {
        (r["k"], r["n"])
        for r in stream.groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") * phi_inv >= n)
        .collect()
    }
    t_full = time.perf_counter() - t0

    res = {
        "n_rows": n_rows,
        "phi_inv": phi_inv,
        "partitions": stream.rdd.getNumPartitions(),
        "heavy_found": len(got),
        "exact_match": got == want,
        "sketch_rows_prepruning": n_sketch_rows,
        "broadcast_candidates": n_cand,
        "wall_mg_s": round(t_mg, 2),
        "wall_full_groupby_s": round(t_full, 2),
    }
    spark.stop()
    return res


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    phi_inv = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_parts = int(sys.argv[3]) if len(sys.argv) > 3 else None
    print(json.dumps(main(n, phi_inv, n_parts)))
