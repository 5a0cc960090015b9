"""MinHash-LSH banding study: recall/cost vs (bands x rows) on a
corpus with PLANTED near-duplicates of controlled similarity.

The shipped `minhash_lsh_pairs` uses 8 permutations banded 4x2 — a
fixed point on the classic S-curve P(candidate) = 1-(1-J^r)^b. This
tool measures where that point sits and what the neighboring configs
buy, on a distributed synthetic corpus (spark.range + codegen token
exprs, no driver loops):

- 4000 base docs of 60 tokens; four mutation tiers replace
  {2, 4, 8, 16} tokens of a base doc -> planted pairs whose TRUE
  word-3-gram-shingle Jaccard is measured exactly per pair (a token
  edit destroys 3 shingles, so tiers land near J~0.85/0.72/0.5/0.27).
- for each (b, r): signatures = b*r fresh permutations; candidates =
  full banded self-join (the real operator's plan shape: explode to
  (band, key) and equi-join); recall measured per tier against the
  planted truth; cost = total candidate pairs surfaced.

Usage: python tools/lsh_banding_curve.py
Prints one JSON line; measured numbers recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.dedup import with_shingle_ids
from nfl_data_pipeline_spark.operators.hashing import P

N_BASE = 4000
L = 60  # tokens per doc
VOCAB = 50_000
TIERS = [2, 4, 8, 16]  # tokens replaced per mutant tier
CONFIGS = [(4, 2), (8, 2), (4, 4), (8, 4), (16, 2)]  # (bands, rows)


def synth_corpus(spark: SparkSession) -> DataFrame:
    """doc_id < N_BASE: base docs. Tier k mutant of base i has
    doc_id = (k+1)*N_BASE + i and replaces TIERS[k] evenly-spaced
    token positions with out-of-vocab tokens. Pure function of
    doc_id — deterministic on any partitioning."""
    n_total = N_BASE * (1 + len(TIERS))
    tier_expr = f"cast(id div {N_BASE} as int) - 1"  # -1 = base doc
    base_expr = f"id % {N_BASE}"
    # token at position t of base doc i
    tok = f"concat('w', pmod({base_expr} * 1000003 + t * 7919, {VOCAB}))"
    # mutation stride: replace positions where t % (L/m) == 0
    m = f"element_at(array({','.join(str(x) for x in TIERS)}), ({tier_expr}) + 1)"
    mut = (
        f"IF(({tier_expr}) >= 0 AND t % cast({L} / {m} as int) = 0, "
        f"concat('x', id * 31 + t), {tok})"
    )
    return (
        spark.range(n_total)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"concat_ws(' ', transform(sequence(0, {L - 1}), t -> {mut}))"
            ).alias("text"),
        )
    )


def perm_consts(n: int) -> list[tuple[int, int]]:
    # fresh affine perms per study config (distinct from the shipped
    # MINHASH_PERMS so b*r can exceed 8)
    return [(104729 * (i + 1) + 7919, 15485863 * (i + 1) + 97) for i in range(n)]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("lsh-banding")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth_corpus(spark)
    sids = (
        with_shingle_ids(corpus, "text", 3)
        .select("doc_id", "sids")
        .persist()
    )
    sids.count()

    # exact shingle Jaccard of every planted (base, mutant) pair
    planted = sids.filter(F.col("doc_id") >= N_BASE).select(
        F.col("doc_id").alias("mut_id"),
        (F.col("doc_id") % N_BASE).alias("base_id"),
        ((F.col("doc_id") / N_BASE).cast("int") - 1).alias("tier"),
        F.col("sids").alias("s_mut"),
    )
    base = sids.filter(F.col("doc_id") < N_BASE).select(
        F.col("doc_id").alias("base_id"), F.col("sids").alias("s_base")
    )
    truth = (
        planted.join(base, "base_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("s_mut", "s_base"))
            / F.size(F.array_union("s_mut", "s_base")),
        )
        .select("base_id", "mut_id", "tier", "jaccard")
        .persist()
    )
    tier_j = {
        int(r["tier"]): round(r["mj"], 3)
        for r in truth.groupBy("tier").agg(F.avg("jaccard").alias("mj")).collect()
    }

    out = {"n_docs": N_BASE * (1 + len(TIERS)), "tier_mean_jaccard": tier_j,
           "configs": {}}

    for bands, rows in CONFIGS:
        perms = perm_consts(bands * rows)
        sig = sids
        for i, (a, b_) in enumerate(perms):
            sig = sig.withColumn(
                f"mh{i}",
                F.expr(f"array_min(transform(sids, x -> ({a} * x + {b_}) % {P}))"),
            )
        banded = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band_id"),
                            F.array(
                                *[F.col(f"mh{bi * rows + ri}") for ri in range(rows)]
                            ).alias("key"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("band"),
        ).select("doc_id", "band.*").persist()
        cand = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .persist()
        )
        n_cand = cand.count()
        hit = truth.join(
            cand,
            (truth.base_id == cand.doc_a) & (truth.mut_id == cand.doc_b),
            "left_semi",
        )
        recall = {
            int(r["tier"]): round(r["rec"], 3)
            for r in truth.join(
                hit.select("base_id", "mut_id").withColumn("hit", F.lit(1)),
                ["base_id", "mut_id"],
                "left",
            )
            .groupBy("tier")
            .agg(F.avg(F.coalesce("hit", F.lit(0))).alias("rec"))
            .collect()
        }
        theory = {
            t: round(1 - (1 - tier_j[t] ** rows) ** bands, 3) for t in tier_j
        }
        out["configs"][f"b{bands}r{rows}"] = {
            "n_candidates": n_cand,
            "recall_by_tier": recall,
            "theory_by_tier": theory,
        }
        banded.unpersist()
        cand.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
