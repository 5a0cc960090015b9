"""Measure the incremental near-dup gate's recall as a function of
TRUE shingle Jaccard (streaming/neardup.py).

The gate finds candidates by MinHash banding (recall 1-(1-J^r)^L at
true Jaccard J) and, by default, verifies them EXACTLY on the shingle
sets — so the measured curve should be a sharp step at the threshold,
bounded above by the banding candidate recall. This tool plants pairs
across a sweep of true overlap levels, runs the two-batch gate, and
reports per-J-bucket recall — the honest operating curve for choosing
a production threshold (and the regression guard on the banding
layout: see SCALING.md for the 8-perm/4×2 soft curve this replaced).

Run: python tools/neardup_gate_recall.py
Findings: SCALING.md §"Near-dup gate recall".
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nfl_data_pipeline_spark.session import get_spark  # noqa: E402
from nfl_data_pipeline_spark.streaming.neardup import (  # noqa: E402
    NearDupState,
    process_neardup_batch,
)

N_PER_LEVEL = 150
DOC_TOKENS = 60
LEVELS = [0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
THRESHOLD = 0.5


def build_docs(rng):
    """(batch1 rows, batch2 rows, pair map new_id → (orig_id, k))
    where batch2 doc shares its first k tokens with the original and
    fills the rest with fresh vocabulary."""
    b1, b2, pairs = [], [], {}
    next_id = 0
    for li, lvl in enumerate(LEVELS):
        k = int(round(DOC_TOKENS * lvl))
        for _ in range(N_PER_LEVEL):
            base = [f"w{rng.randrange(10_000_000)}" for _ in range(DOC_TOKENS)]
            mut = base[:k] + [
                f"m{rng.randrange(10_000_000)}" for _ in range(DOC_TOKENS - k)
            ]
            a_id, b_id = next_id, 1_000_000 + next_id
            next_id += 1
            b1.append((a_id, " ".join(base)))
            b2.append((b_id, " ".join(mut)))
            pairs[b_id] = a_id
    return b1, b2, pairs


def true_jaccard(spark, docs_df):
    """Exact 3-gram shingle Jaccard between each planted pair."""
    from nfl_data_pipeline_spark.operators.dedup import with_shingle_ids

    s = with_shingle_ids(docs_df).select("doc_id", "sids")
    a = s.filter(F.col("doc_id") < 1_000_000).select(
        F.col("doc_id").alias("a_id"), F.col("sids").alias("a_sids")
    )
    b = s.filter(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("a_id"),
        F.col("doc_id").alias("b_id"),
        F.col("sids").alias("b_sids"),
    )
    inter = F.size(F.array_intersect("a_sids", "b_sids"))
    union = F.size(F.array_union("a_sids", "b_sids"))
    return {
        r["b_id"]: r["j"]
        for r in a.join(b, "a_id")
        .select("b_id", (inter / union).alias("j"))
        .collect()
    }


def main() -> None:
    spark = get_spark(app_name="neardup-recall")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(42)
    b1, b2, pairs = build_docs(rng)
    schema = "doc_id long, text string"
    df1 = spark.createDataFrame(b1, schema)
    df2 = spark.createDataFrame(b2, schema)
    jmap = true_jaccard(spark, df1.unionByName(df2))

    root = tempfile.mkdtemp(prefix="ndrecall")
    try:
        state = NearDupState(root)
        process_neardup_batch(spark, df1, state, "b1", THRESHOLD)
        verdicts = {
            r["doc_id"]: (r["keep"], r["dup_of"])
            for r in process_neardup_batch(
                spark, df2, state, "b2", THRESHOLD
            ).collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()

    buckets: dict[float, list[int]] = {}
    for b_id, orig in pairs.items():
        j = jmap.get(b_id, 0.0)
        bucket = round(j * 10) / 10
        hit = verdicts.get(b_id, (1, b_id))[1] == orig
        buckets.setdefault(bucket, []).append(1 if hit else 0)
    from nfl_data_pipeline_spark.streaming.neardup import (
        GATE_BANDS,
        GATE_PERMS,
    )

    print(
        f"threshold={THRESHOLD}, perms={len(GATE_PERMS)}, "
        f"bands={GATE_BANDS}x2 + exact verify, pairs/level={N_PER_LEVEL}"
    )
    for b in sorted(buckets):
        hits = buckets[b]
        print(
            f"true-J ≈ {b:.1f}: recall {sum(hits)/len(hits):.2f} "
            f"({sum(hits)}/{len(hits)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
