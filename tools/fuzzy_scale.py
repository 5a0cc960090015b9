"""Fuzzy-join scale study: q-gram blocking cost at 100k+ strings.

The oracle fixture's part-name vocabulary is 64 strings — fine for
correctness, useless for showing that the blocking holds up. This
tool builds a DISTRIBUTED synthetic vocabulary (word-pair names over
a seeded word list — the realistic entity-resolution shape: large
vocab, bounded per-gram fan-out) with planted typos, runs
``edit_distance_pairs`` at k=2/q=3, and measures:

- the candidate-pair count each leg feeds the levenshtein verify
  (the number that would go quadratic if blocking were broken);
- planted-typo recall (must be 1.0 — blocking is exactness-
  preserving);
- wall-clock end-to-end.

Usage:  python tools/fuzzy_scale.py [N_STRINGS ...]
Prints one JSON line per size; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.fuzzy import edit_distance_pairs
from nfl_data_pipeline_spark.session import get_spark

# Word-pair names over a W-word derived dictionary (word = 8 hex
# chars of a seeded md5): each word is shared by ~n·2/W names — the
# shape a real entity-name column has (common words across a few
# entities, grams diverse) — so per-gram document frequency stays
# bounded as n grows and true ed≤2 pairs are essentially only the
# planted typos.
def _names(spark, n: int):
    """n distinct synthetic names + one planted typo per 10th name,
    all derived with deterministic SQL arithmetic. The dictionary
    scales with n (each word reused by ~5 names) so the family
    structure stays realistic at every tier — a FIXED dictionary at
    n ≫ W degenerates into huge same-words-different-suffix families
    whose intra-family pairs are all genuinely within distance 2,
    exploding the TRUE output (measured: 270k pairs at n=100k,
    W=20k)."""
    w = max(20_000, n // 5)
    w2 = w - 7  # coprime-ish second modulus: no id family shares BOTH
    # words (CRT period ≈ w²/7 ≫ n), so true pairs ≈ planted typos
    base = spark.range(n).selectExpr(
        "id",
        f"concat(substring(md5(CAST(id % {w} AS STRING)), 1, 8), ' ', "
        f"substring(md5(CAST((id * 2654435761) % {w2} + {w} AS STRING)),"
        f" 1, 8), ' ', CAST(id DIV {w} AS STRING)) AS s",
    )
    # substitute position 4 with 'x' (outside the hex alphabet →
    # guaranteed distance exactly 1, never a no-op)
    typos = base.filter("id % 10 = 0").selectExpr(
        "concat(substring(s, 1, 3), 'x', substring(s, 5)) AS s"
    )
    return base.select("s"), typos


def run(n: int) -> dict:
    spark = get_spark(app_name=f"fuzzy-scale-{n}")
    spark.sparkContext.setLogLevel("ERROR")
    base, typos = _names(spark, n)
    corpus = base.unionByName(typos).distinct().localCheckpoint(eager=True)
    n_corpus = corpus.count()

    t0 = time.perf_counter()
    pairs = edit_distance_pairs(corpus, "s", k=2, q=3)
    out = pairs.localCheckpoint(eager=True)
    n_pairs = out.count()
    wall = time.perf_counter() - t0

    # planted recall: every typo'd name pairs with its original at
    # distance 1 (substitution at a fixed position)
    planted = (
        base.filter("id % 10 = 0")
        .selectExpr(
            "s AS orig",
            "concat(substring(s, 1, 3), 'x', substring(s, 5)) AS typo",
        )
        .filter("orig != typo")
    )
    found = planted.join(
        out.selectExpr("s_a", "s_b"),
        (
            (F.col("orig") == F.col("s_a")) & (F.col("typo") == F.col("s_b"))
        )
        | ((F.col("orig") == F.col("s_b")) & (F.col("typo") == F.col("s_a"))),
        "left_semi",
    ).count()
    n_planted = planted.count()

    res = {
        "n_strings": n_corpus,
        "pairs": n_pairs,
        "planted": n_planted,
        "planted_found": found,
        "recall": round(found / max(n_planted, 1), 4),
        "wall_s": round(wall, 2),
    }
    spark.stop()
    return res


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 100_000]
    for n in sizes:
        print(json.dumps(run(n)), flush=True)
