"""Streaming bigram language-model scorer — the incremental twin of
the batch ``bigram_logprob`` query (VERDICT r10 "What's missing" #1 /
builder round-11 #1): arriving document batches merge their bigram
evidence into transactional count tables and are scored under the
cumulative LM, so a continuous intake gets the order-2 quality
signal without re-aggregating the corpus per batch.

State tables under one root (all jobs/txlog.TxTable):

- ``vocab``    — (term, c) unigram counts, hash-bucketed mergeable
                 sums. Its ROW COUNT is the smoothing denominator V.
- ``bigrams``  — (prev, term, bc) bigram counts, hash-bucketed on the
                 composite key. Vocabulary²-bounded, corpus-unbounded
                 growth rate ~Heaps-law like the unigram vocab.
- ``contexts`` — (prev, cc) context counts. Derivable from
                 ``bigrams`` by a groupBy(prev) at read time, but
                 maintained as its own mergeable table so scoring
                 reads it directly instead of re-aggregating the
                 full bigram state every batch (O(batch) merge vs
                 O(|bigrams|) read-time fold).
- ``scores``   — per-doc (doc_id, n_bigrams, xent_nats, bigram_ppl)
                 rows, append-only; committed LAST so
                 ``scores.is_applied(bid)`` is the whole-batch marker.

Prefix-consistency contract (the unigram funnel's LM argument,
streaming/funnel.py, generalized to order 2): each batch is scored
under the LM of everything ingested so far INCLUDING itself — its
bigram/context/vocab deltas merge before scoring. A single batch over
the whole corpus is therefore EXACTLY the batch query (asserted by
the equality test); across many batches early docs see a younger LM,
the honest contract of any streaming quality filter. Three
consistency invariants hold at every committed version:

1. cc(prev) == Σ_term bc(prev, term): both tables merge the SAME
   batch's delta under the same replay-guarded batch_id, so no
   prefix can contain one table's contribution without the other's
   (a crash in between is healed by the replay, which skips the
   applied table and applies the missing one).
2. V == |vocab rows| counts DISTINCT TOKENS ever ingested, not
   distinct contexts: the batch twin's V is countDistinct over all
   tokens (doc-final tokens are never a ``prev``; doc-initial never
   a ``term`` — only the unigram table sees them all).
3. The smoothing constant is ``_BIGRAM_K`` imported from the batch
   query — one definition, so the two engines cannot drift.

Exactly-once: commit order vocab → bigrams → contexts → scores; a
crash between any two replays idempotently (committed tables skip via
``is_applied``, the rest apply, and the batch re-scores to the SAME
values because the count state already contains the batch — the
funnel's replay argument verbatim).

Scale: per batch the merges rewrite only touched buckets (O(batch
vocabulary), never O(corpus)); scoring joins the batch's pair stream
against the count tables through ``gated_broadcast`` — above the gate
they degrade to shuffle joins keyed on the distinct-bigram
distribution, never the raw pair stream (the r11 batch-shape rule:
no window over pairs, SCALING.md round-11 skew study).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable, merge_grouped_sums
from nfl_data_pipeline_spark.operators.hints import gated_broadcast
from nfl_data_pipeline_spark.queries.llmprep import _BIGRAM_K, bigram_pairs

_NB = 32  # state-table hash buckets, same sizing as the funnel's

_SCORE_SCHEMA = (
    "doc_id long, n_bigrams bigint, xent_nats double, bigram_ppl double"
)


class BigramLMState:
    """The four state tables of one streaming bigram LM (see module
    docstring for the roles and the consistency invariants)."""

    def __init__(self, root: str):
        self.vocab = TxTable(os.path.join(root, "vocab"))
        self.bigrams = TxTable(os.path.join(root, "bigrams"))
        self.contexts = TxTable(os.path.join(root, "contexts"))
        self.scores = TxTable(os.path.join(root, "scores"))


def _vocab_delta(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(_NB)).cast("long")
        )
    )


def _bigram_delta(pairs: DataFrame) -> DataFrame:
    return (
        pairs.groupBy("prev", "term")
        .agg(F.count("*").cast("long").alias("bc"))
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("prev", "term"), F.lit(_NB)).cast("long"),
        )
    )


def _context_delta(pairs: DataFrame) -> DataFrame:
    return (
        pairs.groupBy("prev")
        .agg(F.count("*").cast("long").alias("cc"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("prev"), F.lit(_NB)).cast("long")
        )
    )


def score_pairs_against(
    pairs: DataFrame, bg: DataFrame, cg: DataFrame, v: DataFrame
) -> DataFrame:
    """Score ``pairs`` (doc_id, prev, term) against SUPPLIED count
    tables — the batch query's exact fold (per-pair AVG of
    ln((bc+k)/(cc+kV)), 9/6-decimal rounding). ``bg`` carries
    (prev, term, bc), ``cg`` (prev, cc), ``v`` one row with the
    vocabulary size as double. Shared by the standalone LM state
    reader below and the funnel's optional bigram gate
    (streaming/funnel.py) — one scoring definition, so the two can
    never drift."""
    lp = F.log(
        (F.col("bc") + _BIGRAM_K) / (F.col("cc") + _BIGRAM_K * F.col("v"))
    )
    return (
        pairs.join(gated_broadcast(bg.select("prev", "term", "bc")),
                   ["prev", "term"])
        .join(gated_broadcast(cg.select("prev", "cc")), "prev")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(-F.avg(lp), 9).alias("xent_nats"),
            F.round(F.exp(-F.avg(lp)), 6).alias("bigram_ppl"),
        )
    )


def score_pairs(
    spark: SparkSession, pairs: DataFrame, state: BigramLMState
) -> DataFrame:
    """Score ``pairs`` under the CURRENT maintained LM, count tables
    served from state instead of re-aggregated. Pure read: also the
    'rescore under the final LM' path for early batches."""
    bg = state.bigrams.read(spark)
    cg = state.contexts.read(spark)
    if bg is None or cg is None:
        from nfl_data_pipeline_spark.operators.localframe import (
            empty_frame,
        )

        return empty_frame(spark, _SCORE_SCHEMA)
    vocab = state.vocab.read(spark)
    v = (
        vocab.agg(F.count("*").cast("double").alias("v"))
        if vocab is not None
        else spark.range(1).select(F.lit(0.0).alias("v"))
    )
    return score_pairs_against(pairs, bg, cg, v)


def process_bigram_batch(
    spark: SparkSession, docs: DataFrame, state: BigramLMState,
    batch_id: str,
) -> DataFrame | None:
    """One micro-batch: merge the three count deltas, score the batch
    under the now-cumulative LM, append the scores (the completion
    marker). Safe to replay with the same ``batch_id`` at any crash
    point (module docstring). Returns the scored frame (None for a
    detected whole-batch replay)."""
    if state.scores.is_applied(batch_id):
        return None
    docs = docs.localCheckpoint(eager=True)  # deltas + scoring consume it
    pairs = bigram_pairs(docs).localCheckpoint(eager=True)

    # commit order IS the invariant order: vocab (V) → bigrams →
    # contexts → scores. Each merge is replay-guarded by batch_id.
    merge_grouped_sums(
        spark, _vocab_delta(docs), state.vocab, ["term"], ["c"],
        "bucket", batch_id,
    )
    merge_grouped_sums(
        spark, _bigram_delta(pairs), state.bigrams, ["prev", "term"],
        ["bc"], "bucket", batch_id,
    )
    merge_grouped_sums(
        spark, _context_delta(pairs), state.contexts, ["prev"], ["cc"],
        "bucket", batch_id,
    )

    scored = score_pairs(spark, pairs, state)
    if not state.scores.is_applied(batch_id):
        # narrow (doc_id, score, bucket) rows → the auto path stages
        # metadata-sized batches driver-side (r12, same bound +
        # telemetry as the neardup/fps registry appends)
        adds = state.scores.stage_files_auto(
            scored.withColumn(
                "bucket",
                F.pmod(F.xxhash64("doc_id"), F.lit(_NB)).cast("long"),
            ),
            "bucket",
            site="bigramlm.py:scores-append",
        )
        state.scores.commit(adds, batch_id=batch_id)
    return scored


def read_scores(spark: SparkSession, state: BigramLMState) -> DataFrame:
    """All per-doc scores committed so far (each doc scored under the
    LM prefix that existed when ITS batch landed)."""
    df = state.scores.read(spark)
    if df is None:
        from nfl_data_pipeline_spark.operators.localframe import (
            empty_frame,
        )

        return empty_frame(spark, _SCORE_SCHEMA)
    return df.select("doc_id", "n_bigrams", "xent_nats", "bigram_ppl")


def bigram_maintenance_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    state: BigramLMState,
    checkpoint_dir: str,
):
    """Wire the bigram LM into a document stream (availableNow
    file-source replay semantics, same as funnel_maintenance_stream);
    checkpoint wipes replay harmlessly — the state manifests reject
    re-seen batch ids."""

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        process_bigram_batch(spark, batch_df, state, f"bigram-{batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
