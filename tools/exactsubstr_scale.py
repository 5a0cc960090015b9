"""Exact-substring dedup scale study: seed-and-extend with planted
verbatim chunks, plus the df-cap's defense against boilerplate.

Synthetic corpus (distributed, pure function of doc_id): every doc is
200 hash-derived tokens. Planted signal: the last N_PLANTED docs copy
a 24-token chunk verbatim from their base doc (doc_id − N_PLANTED).
Planted hazard: EVERY doc opens with the same 12-token boilerplate
header — without the df-cap that one repeated window would seed
n·(n−1)/2 pair candidates (5×10⁹ at 100k docs); with it, the window's
document frequency exceeds the cap and it is excluded before the
join.

Usage: python tools/exactsubstr_scale.py [N_DOCS]
Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.dedup import exact_substring_pairs

N_PLANTED = 1000
DOC_TOKENS = 200
CHUNK_LEN = 24  # planted verbatim span, tokens
CHUNK_AT = 80  # position of the planted chunk in the copying doc
BOILER_LEN = 12


def synth_corpus(spark: SparkSession, n: int) -> DataFrame:
    """200-token docs; tokens are short hash words. Copying docs
    reproduce base-doc tokens [CHUNK_AT, CHUNK_AT+CHUNK_LEN) exactly;
    all docs share tokens [0, BOILER_LEN) verbatim."""
    base = f"(CASE WHEN id >= {n - N_PLANTED} THEN id - {N_PLANTED} ELSE id END)"
    tok = (
        f"CASE WHEN t < {BOILER_LEN} THEN concat('h', t) "
        f"WHEN t >= {CHUNK_AT} AND t < {CHUNK_AT + CHUNK_LEN} "
        f"THEN concat('c', abs(hash({base}, t)) % 99991) "
        f"ELSE concat('w', abs(hash(id, t)) % 99991) END"
    )
    return (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"array_join(transform(sequence(0, {DOC_TOKENS - 1}), "
                f"t -> {tok}), ' ')"
            ).alias("text"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("exactsubstr-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth_corpus(spark, n).cache()
    corpus.count()

    t0 = time.time()
    pairs = exact_substring_pairs(corpus, w=8, min_run=2, max_df=16).cache()
    n_pairs = pairs.count()
    t_total = round(time.time() - t0, 2)

    planted_found = pairs.filter(
        (F.col("doc_b") - F.col("doc_a") == N_PLANTED)
        & (F.col("doc_b") >= n - N_PLANTED)
    )
    n_planted_found = planted_found.count()
    span_ok = planted_found.filter(
        F.col("max_span_tokens") == CHUNK_LEN
    ).count()

    print(
        json.dumps(
            {
                "n_docs": n,
                "doc_tokens": DOC_TOKENS,
                "sec": t_total,
                "pairs_found": n_pairs,
                "planted": N_PLANTED,
                "planted_found": n_planted_found,
                "planted_recall": round(n_planted_found / N_PLANTED, 4),
                "exact_span_reported": span_ok,
                "boilerplate_pairs_possible": n * (n - 1) // 2,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
