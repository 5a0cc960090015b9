"""Recall-vs-cost curves for the ANN operators at 100k-vector scale.

The sf0.1 fixture has only 2k embeddings — fine for correctness, too
small to show the recall/cost dial that matters at 100 TB. This tool
generates a clustered 100k x 64d corpus DISTRIBUTED (spark.range +
JVM-side column expressions — no driver materialization, same idiom
as benchpipes.synth_pbp), computes the exact top-k, then sweeps:

- IVF: n_probe in {1, 2, 4, 8} at n_cells=64 — recall rises with
  probes while scored candidates stay ~n_probe/n_cells of the corpus.
- PQ: shortlist in {50, 100, 200} at m=8, n_codes=16 — recall rises
  with the rerank budget while ADC scoring cost is unchanged.

Usage:  python tools/ann_recall_curve.py [N_VECTORS]
Prints one JSON line; measured numbers are recorded in SCALING.md.

The corpus is a mixture model (64 clusters, deterministic sin-hash
centers, +-0.3 deterministic per-id noise) so nearest neighbors are
genuinely concentrated in cells — a uniform corpus would make every
ANN look artificially bad (no structure to exploit) and is not what
embedding spaces look like.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    kmeans_ivf_topk,
    pq_topk,
    recall_at_k,
)

N_CLUSTERS = 64
DIM = 64
K = 10
N_QUERIES = 20


def synth_corpus(spark: SparkSession, n: int) -> DataFrame:
    """Clustered corpus, generated distributed and fully deterministic
    (pure function of vec_id — reproducible on any partitioning)."""
    return (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {DIM - 1}), d -> cast("
                f"  sin((id % {N_CLUSTERS}) * 7919 + d * 104729)"
                f"  + 0.9 * sin(id * 131 + d * 31) as float))"
            ).alias("embedding"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ann-recall-curve")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth_corpus(spark, n).cache()
    corpus.count()  # materialize once; every variant scores the same corpus
    queries = corpus.filter(F.col("vec_id") < N_QUERIES)
    # warm the JVM + python workers so the first measured variant
    # isn't billed the session start-up
    cosine_topk(queries, corpus.limit(1000), k=1).count()

    t0 = time.time()
    # NB: cosine_topk is (queries, candidates); the ANN ops are
    # (corpus, queries) — index side first.
    exact = cosine_topk(queries, corpus, k=K).cache()
    exact.count()
    t_exact = time.time() - t0

    out = {"n": n, "dim": DIM, "k": K, "exact_sec": round(t_exact, 2),
           "ivf": {}, "pq": {}}

    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        approx = kmeans_ivf_topk(
            corpus, queries, k=K, n_cells=N_CLUSTERS, n_probe=n_probe
        )
        r = recall_at_k(approx, exact)
        out["ivf"][f"probe{n_probe}"] = {
            "recall": round(r, 3), "sec": round(time.time() - t0, 2)
        }

    for shortlist in (50, 200, 500, 1000):
        t0 = time.time()
        approx = pq_topk(
            corpus, queries, k=K, m=8, n_codes=16, shortlist=shortlist
        )
        r = recall_at_k(approx, exact)
        out["pq"][f"short{shortlist}"] = {
            "recall": round(r, 3), "sec": round(time.time() - t0, 2)
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
