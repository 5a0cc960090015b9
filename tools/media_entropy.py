"""Measure fingerprint diversity of the synthetic media generators at
scale (VERDICT r7 #5): the round-5 generators exhaust pHash diversity
at ~2k images and collapse audio to ~10 landmark hashes per clip,
capping what the recall dials can prove. This study quantifies both
generators' pHash / landmark entropy at 50k+ images and 5k clips,
distributed (generation and fingerprinting run as mapInPandas over a
seed range — nothing is collected but the per-fingerprint stats).

Usage: PYTHONPATH=/root/repo python tools/media_entropy.py [N_IMG] [N_CLIP]
Prints one JSON line per (generator, modality); recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.session import get_spark


def image_stats(spark, gen_name: str, n: int) -> dict:
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("phash", LongType())])

    def fp_batches(it):
        import pandas as pd

        from nfl_data_pipeline_spark.operators import mediasynth as ms
        from nfl_data_pipeline_spark.operators.multimodal import phash_ppm

        gen = getattr(ms, gen_name)
        for pdf in it:
            yield pd.DataFrame(
                {
                    "phash": [
                        np.int64(
                            np.uint64(
                                phash_ppm(ms.ppm_bytes(gen(int(s))))
                                & ((1 << 64) - 1)
                            ).astype(np.int64)
                        )
                        for s in pdf["id"]
                    ]
                }
            )

    t0 = time.perf_counter()
    fps = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(fp_batches, schema)
        .localCheckpoint(eager=True)
    )
    distinct = fps.select("phash").distinct().count()
    # per-bit entropy from the 64 bit means, one distributed agg
    bit_means = fps.agg(
        *[
            F.avg(F.shiftright(F.col("phash"), b).bitwiseAND(1)).alias(f"b{b}")
            for b in range(64)
        ]
    ).collect()[0]
    p = np.array([bit_means[f"b{b}"] for b in range(64)], dtype=float)
    ent = -(
        p * np.log2(np.clip(p, 1e-12, 1))
        + (1 - p) * np.log2(np.clip(1 - p, 1e-12, 1))
    )
    # the GATE-relevant diversity metric: distinct images landing
    # within the hamming ≤ 10 near-dup radius of an earlier image
    # (this is what produced the round-5 kept-count decay, not exact
    # collisions). Same banded candidates-then-verify plan the gate
    # runs — no all-pairs. Measured on a fixed 5k sample: a larger n
    # drives the degenerate generator's shared chunk values past any
    # hot cap, which SUPPRESSES candidates and under-reports the very
    # collapse being measured (observed: 81% at 5k uncapped-in-effect
    # vs a misleading 3% at 50k under max_bucket=256).
    from nfl_data_pipeline_spark.operators.dedup import hamming_chunk_rows

    sample_n = min(n, 5000)
    ids = fps.limit(sample_n).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    chunks = hamming_chunk_rows(ids, "doc_id", "phash", 10, max_bucket=256)
    ham = F.bit_count(F.col("a._fp").bitwiseXOR(F.col("b._fp")))
    near = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .filter(ham <= 10)
        .select(F.col("b._id").alias("dup"))
        .distinct()
        .count()
    )
    return {
        "modality": "image",
        "generator": gen_name,
        "n": n,
        "distinct_phash": distinct,
        "distinct_frac": round(distinct / n, 4),
        "mean_bit_entropy": round(float(ent.mean()), 4),
        "min_bit_entropy": round(float(ent.min()), 4),
        "constant_bits": int((ent < 0.01).sum()),
        "near_collisions_ham10_5k_sample": near,
        "near_collision_frac": round(near / sample_n, 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def audio_stats(spark, gen_name: str, n: int) -> dict:
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("h", LongType()), StructField("clip", LongType())]
    )

    def lm_batches(it):
        import pandas as pd

        from nfl_data_pipeline_spark.operators import mediasynth as ms
        from nfl_data_pipeline_spark.operators.multimodal import afp_hashes

        gen = getattr(ms, gen_name)
        for pdf in it:
            hs, cs = [], []
            for s in pdf["id"]:
                for h, _t in afp_hashes(ms.wav_bytes(gen(int(s)))):
                    hs.append(h)
                    cs.append(int(s))
            yield pd.DataFrame({"h": hs, "clip": cs})

    t0 = time.perf_counter()
    lm = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(lm_batches, schema)
        .localCheckpoint(eager=True)
    )
    total = lm.count()
    distinct = lm.select("h").distinct().count()
    per_clip = (
        lm.groupBy("clip")
        .agg(F.countDistinct("h").alias("d"))
        .agg(F.avg("d"))
        .collect()[0][0]
    )
    # corpus hash entropy from the per-hash frequency table
    ent = (
        lm.groupBy("h")
        .count()
        .select(
            F.sum(
                -(F.col("count") / total)
                * F.log2(F.col("count") / F.lit(float(total)))
            ).alias("e")
        )
        .collect()[0]["e"]
    )
    return {
        "modality": "audio",
        "generator": gen_name,
        "n": n,
        "total_landmarks": total,
        "distinct_hashes": distinct,
        "per_clip_distinct": round(float(per_clip), 1),
        "corpus_hash_entropy_bits": round(float(ent), 2),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main() -> int:
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_clip = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark(app_name="media-entropy")
    spark.sparkContext.setLogLevel("ERROR")
    for gen in ("smooth_image", "rich_image"):
        print(json.dumps(image_stats(spark, gen, n_img)), flush=True)
    for gen in ("tone_clip", "rich_clip"):
        print(json.dumps(audio_stats(spark, gen, n_clip)), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
