"""Bigram-count skew study (VERDICT r10 #1 acceptance evidence).

The r10 ``bigram_logprob`` counted bigrams with window functions
partitioned by ``(prev, term)`` and ``prev`` over the raw exploded
pair stream. A window has no map-side combine: every pair sharing a
``prev`` must co-reside in one task, so a hot context word ("the",
~5-7% of English bigram contexts) creates a straggler holding a
corpus-scale partition at 100×. The r11 shape folds pairs immediately
into a map-side-combined ``groupBy(doc, prev, term)`` aggregate and
derives the count tables from it, joining them back through
``gated_broadcast``.

This tool builds a synthetic hot-prev corpus — every other token is
the SAME context word, so ~50% of all bigrams share one ``prev`` —
and times both shapes at a 10× tier. The interesting number is not
just wall-clock on local[32] (where one straggler still finishes; on
a cluster it is the whole job) but the max rows a single task holds,
which the window shape pins at ~half the corpus.

Usage: python tools/bigram_skew_scale.py [N_DOCS] [TOKENS_PER_DOC]
Prints one JSON line; measured numbers recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.hints import gated_broadcast

_K = 0.5


def build(spark: SparkSession, n_docs: int, toks: int):
    # doc text alternates "the wXXX the wYYY ..." — 50% of bigram
    # contexts are the hot word; filler vocabulary ~50k terms so the
    # count tables stay vocabulary-bounded like real text
    half = toks // 2
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(half - 1)),
                    lambda i: F.array(
                        F.lit("the"),
                        F.concat(
                            F.lit("w"),
                            ((F.col("id") * half + i) % 50000).cast(
                                "string"
                            ),
                        ),
                    ),
                )
            ),
            " ",
        ).alias("text"),
    )


def pairs_of(docs):
    d = docs.select("doc_id", F.split(F.col("text"), " ").alias("s"))
    return d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(s) < 2 THEN array() "
                "ELSE transform(sequence(2, size(s)), i -> "
                "struct(element_at(s, i - 1) AS prev, "
                "element_at(s, i) AS term)) END"
            )
        ).alias("p"),
    ).select("doc_id", "p.prev", "p.term")


def vocab_of(docs):
    return docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("t")
    ).agg(F.countDistinct("t").cast("double").alias("v"))


def window_shape(docs):
    """The r10 form: window counts over the raw pair stream."""
    pairs = pairs_of(docs)
    wb = Window.partitionBy("prev", "term")
    wc = Window.partitionBy("prev")
    lp = F.log((F.col("bc") + _K) / (F.col("cc") + _K * F.col("v")))
    return (
        pairs.withColumn("bc", F.count("*").over(wb))
        .withColumn("cc", F.count("*").over(wc))
        .crossJoin(F.broadcast(vocab_of(docs)))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(-F.avg(lp), 9).alias("xent_nats"),
        )
    )


def prefold_shape(docs):
    """Rejected candidate: unigram-style (doc,prev,term) pre-fold.

    Positional text barely compresses under this key (k~1), so the
    localCheckpoint materializes a corpus-sized frame — measured
    slower than both other shapes; kept here as the evidence for
    why bigram_logprob does NOT mirror unigram_logprob's dt."""
    pairs = pairs_of(docs)
    dtp = pairs.groupBy("doc_id", "prev", "term").agg(
        F.count("*").alias("k")
    )
    dtp = dtp.localCheckpoint()
    bg = dtp.groupBy("prev", "term").agg(
        F.sum("k").cast("long").alias("bc")
    )
    cg = bg.groupBy("prev").agg(F.sum("bc").cast("long").alias("cc"))
    lp = F.log((F.col("bc") + _K) / (F.col("cc") + _K * F.col("v")))
    return (
        dtp.join(gated_broadcast(bg), ["prev", "term"])
        .join(gated_broadcast(cg), "prev")
        .crossJoin(F.broadcast(vocab_of(docs)))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.round(-(F.sum(F.col("k") * lp) / F.sum("k")), 9).alias(
                "xent_nats"
            ),
        )
    )


def agg_shape(docs):
    """The shipped r11 form: count tables off the pair stream
    (map-side combined, distinct-bigram-bounded exchange), joined
    back broadcast onto the unshuffled pair fact, per-doc fold as
    the oracle's own per-pair AVG with one doc_id exchange."""
    pairs = pairs_of(docs)
    bg = pairs.groupBy("prev", "term").agg(
        F.count("*").cast("long").alias("bc")
    )
    bg = bg.localCheckpoint()
    cg = bg.groupBy("prev").agg(F.sum("bc").cast("long").alias("cc"))
    lp = F.log((F.col("bc") + _K) / (F.col("cc") + _K * F.col("v")))
    return (
        pairs.join(gated_broadcast(bg), ["prev", "term"])
        .join(gated_broadcast(cg), "prev")
        .crossJoin(F.broadcast(vocab_of(docs)))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(-F.avg(lp), 9).alias("xent_nats"),
        )
    )


def time_shape(fn, docs):
    t0 = time.time()
    out = fn(docs).agg(
        F.count("*").alias("docs"),
        F.sum("n_bigrams").alias("pairs"),
        F.round(F.avg("xent_nats"), 9).alias("mean_xent"),
    ).collect()[0]
    return time.time() - t0, out.asDict()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    toks = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("bigram-skew")
        .getOrCreate()
    )
    docs = build(spark, n_docs, toks).localCheckpoint()
    n_pairs = toks - 1 if toks >= 2 else 0
    res = {"n_docs": n_docs, "tokens_per_doc": toks,
           "total_pairs": n_docs * n_pairs,
           "hot_prev_share": 0.5}
    for name, fn in (
        ("window_r10", window_shape),
        ("prefold_rejected", prefold_shape),
        ("agg_r11", agg_shape),
    ):
        sec, out = time_shape(fn, docs)
        res[name] = {"sec": round(sec, 2), **{k: (float(v) if isinstance(v, float) else v) for k, v in out.items()}}
    res["speedup"] = round(
        res["window_r10"]["sec"] / res["agg_r11"]["sec"], 2
    )
    # equality of the scored output between shapes (same rounding)
    res["equal_mean_xent"] = (
        res["window_r10"]["mean_xent"] == res["agg_r11"]["mean_xent"]
    )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
