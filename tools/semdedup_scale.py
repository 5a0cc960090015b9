"""Semantic-dedup scale study: cluster-bounded pair counts at 50k+
vectors.

The sf0.1 fixture has 2k embeddings — fine for the oracle, too small
to show WHY SemDedup's clustering matters. This tool generates a
clustered corpus DISTRIBUTED (same deterministic mixture idiom as
ann_recall_curve), plants exact-shape near-duplicates (id ≥ n-1000
repeats id-1000's embedding with small deterministic noise), runs
semantic_dedup at production-like settings and measures:

- the pairwise stage's actual fan-in: Σ c_i·(c_i−1)/2 over cluster
  sizes, vs the all-pairs n·(n−1)/2 it replaces;
- planted-duplicate recall: a planted copy lands in its original's
  cluster (same region of space), so it should be dropped;
- wall-clock for the full decision table.

Usage:  python tools/semdedup_scale.py [N_VECTORS] [N_CLUSTERS] [N_PROBE] [BACKEND]
BACKEND: det (deterministic one-Lloyd k-means, the oracle-checked
config) or ml (pyspark.ml KMeans to convergence — the production
clustering). Prints one JSON line; recorded in SCALING.md.
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
    semantic_dedup,
    semantic_dedup_ml,
)

DIM = 64
N_PLANTED = 1000
MIX_CLUSTERS = 64  # mixture components in the synthetic space


def synth_corpus(spark: SparkSession, n: int) -> DataFrame:
    """Clustered corpus with planted near-dups, generated distributed
    and fully deterministic (pure function of vec_id)."""
    base = f"(CASE WHEN id >= {n - N_PLANTED} THEN id - {N_PLANTED} ELSE id END)"
    amp = f"(CASE WHEN id >= {n - N_PLANTED} THEN cast(0.02 as double) ELSE cast(0.9 as double) END)"
    return (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("vec_id"),
            # per-id noise phases come from hash(id, d), NOT wave
            # arithmetic like sin(id*131 + d*31): any phase linear in d
            # partially aligns for id pairs whose Δ mod 2π is small,
            # planting accidental ≥0.95 pairs all over the corpus
            # (measured: 43k of 50k dropped before this fix)
            F.expr(
                f"transform(sequence(0, {DIM - 1}), d -> cast("
                f"  sin(({base} % {MIX_CLUSTERS}) * 7919 + d * 104729)"
                f"  + 0.9 * sin(hash({base}, d))"
                f"  + {amp} * 0.02 * sin(hash(id, d + 101)) as float))"
            ).alias("embedding"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    backend = sys.argv[4] if len(sys.argv) > 4 else "det"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("semdedup-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth_corpus(spark, n).cache()
    corpus.count()

    t0 = time.time()
    fn = semantic_dedup_ml if backend == "ml" else semantic_dedup
    table = fn(corpus, k=k, threshold=0.95, n_probe=n_probe).cache()
    n_rows = table.count()
    t_total = time.time() - t0

    sizes = (
        table.groupBy("cluster_id")
        .agg(F.count("*").alias("c"))
        .agg(
            F.max("c").alias("max_c"),
            F.avg("c").alias("mean_c"),
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
        )
        .collect()[0]
    )
    n_dropped = table.filter(F.col("is_kept") == 0).count()
    planted_dropped = table.filter(
        (F.col("is_kept") == 0) & (F.col("vec_id") >= n - N_PLANTED)
    ).count()

    all_pairs = n * (n - 1) / 2
    print(
        json.dumps(
            {
                "n": n,
                "k_clusters": k,
                "n_probe": n_probe,
                "backend": backend,
                "dim": DIM,
                "rows": n_rows,
                "sec": round(t_total, 2),
                "max_cluster": int(sizes["max_c"]),
                "mean_cluster": round(sizes["mean_c"], 1),
                "intra_cluster_pairs": int(sizes["pairs"]),
                "all_pairs": int(all_pairs),
                "pair_fraction": round(sizes["pairs"] / all_pairs, 5),
                "n_dropped": n_dropped,
                "planted": N_PLANTED,
                "planted_dropped": planted_dropped,
                "planted_recall": round(planted_dropped / N_PLANTED, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
