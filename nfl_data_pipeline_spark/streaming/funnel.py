"""Incremental curation funnel (ROADMAP #5): the batch
``curation_funnel`` query re-derives every corpus statistic from
scratch each run; this module maintains those statistics in
transactional state tables (jobs/txlog.TxTable) and refreshes them
per micro-batch inside ``foreachBatch`` — so an arriving shard of
documents costs O(shard + touched state), never O(corpus).

State tables under one root:

- ``vocab``      — (term, c) unigram counts, hash-bucketed. Mergeable
                   sums: refresh rewrites only touched buckets (the
                   rollup pattern with term keys).
- ``fingerprints`` — (fp, doc_id) first-seen exact-dedup registry,
                   hash-bucketed, append-only commits (no rewrites).
- ``counts``     — per-source funnel survivor counts, mergeable sums
                   partitioned by source.

Gate semantics vs the batch twin:

- URL / language / quality gates are stateless → identical.
- The exact-dedup gate is first-arrival-wins across batches (equal to
  the batch twin's first-doc_id-wins whenever batches arrive in
  doc_id order — the replay/backfill layout).
- The perplexity gate is **prefix-consistent**: each batch is scored
  under the LM of everything ingested so far *including itself* (its
  token counts merge before scoring). A single batch over the whole
  corpus is therefore EXACTLY the batch query; across many batches
  early docs see a younger LM — that is the honest contract of any
  streaming quality filter, and the maintained vocab lets a final
  re-score run against the full-corpus LM without re-aggregating it
  (``rescore_with_final_lm``).

Exactly-once: every state table carries the micro-batch id in its
manifest (txlog's atomic data+marker swap), and the ``counts`` commit
is LAST — so ``counts.is_applied(bid)`` means the whole batch landed,
and a crash between table commits replays idempotently: already-
committed tables skip, the rest apply, and the perplexity/dedup gates
recompute to the same values because their state already contains the
batch (vocab: merged counts; fingerprints: the stored winner doc_id
equals the batch winner's own id).

Scale: per batch the vocab rewrite is O(|vocab|) across _NB buckets
(independent of corpus size; raise _NB or adopt an LSM-style partial
merge when the vocabulary itself is huge), fingerprints grow
append-only, and counts stay at #sources rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable, merge_grouped_sums

_NB = 16  # state hash buckets (vocab + fingerprints)


class FunnelState:
    """The three state tables of one incremental funnel."""

    def __init__(self, root: str):
        self.vocab = TxTable(os.path.join(root, "vocab"))
        self.fps = TxTable(os.path.join(root, "fingerprints"))
        self.counts = TxTable(os.path.join(root, "counts"))


def _bucket(col: str):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(_NB)).cast("long")


def _vocab_delta(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumn("bucket", _bucket("term"))
    )


def _xent_vs_vocab(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Per-doc cross-entropy under the GIVEN vocabulary (broadcast) —
    the unigram_logprob shape with the LM supplied externally."""
    dt = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("k"))
    )
    tot = vocab.agg(F.sum("c").cast("double").alias("n"))
    return (
        dt.join(F.broadcast(vocab), "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            (
                -F.sum(F.col("k") * F.log(F.col("c") / F.col("n")))
                / F.sum("k")
            ).alias("x")
        )
    )


def process_funnel_batch(
    spark: SparkSession, docs: DataFrame, state: FunnelState, batch_id: str
) -> None:
    """One micro-batch through every gate, refreshing all three state
    tables. Safe to replay with the same ``batch_id`` at any crash
    point (see module docstring)."""
    from nfl_data_pipeline_spark.queries.llmprep import (
        _XENT_CUT,
        funnel_base,
        funnel_counts_agg,
        stateless_flags,
    )
    from pyspark.sql import Window

    if state.counts.is_applied(batch_id):
        return  # counts commit is last → whole batch already landed
    docs = docs.localCheckpoint(eager=True)  # consumed by 4 branches

    # 1. merge this batch's token counts, then read the cumulative LM
    merge_grouped_sums(
        spark, _vocab_delta(docs), state.vocab, ["term"], ["c"], "bucket",
        batch_id,
    )
    vocab = state.vocab.read(spark).select("term", "c")

    # 2. evidence + stateless gates + prefix-consistent ppl gate
    flagged = stateless_flags(
        funnel_base(docs).join(_xent_vs_vocab(docs, vocab), "doc_id")
    ).withColumn(
        "pass_ppl", F.when(F.col("x") <= _XENT_CUT, 1).otherwise(0)
    )

    # 3. exact-dedup gate against the fingerprint registry
    stored = state.fps.read(spark)
    if stored is None:
        stored = spark.createDataFrame([], "fp string, first_doc long")
    else:
        stored = stored.select("fp", F.col("doc_id").alias("first_doc"))
    # no broadcast hint: the registry is the corpus-sized side (AQE
    # broadcasts it while small, shuffle-joins once it grows; a bloom
    # prefilter on fp is the known optimization when it dominates)
    wdup = Window.partitionBy("fp").orderBy("doc_id")
    flagged = (
        flagged.join(stored, "fp", "left")
        .withColumn("_rn", F.row_number().over(wdup))
        .withColumn(
            "pass_dedup",
            F.when(
                F.col("first_doc").isNotNull(),
                # replay: this doc was the recorded winner
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0),
            ).otherwise(F.when(F.col("_rn") == 1, 1).otherwise(0)),
        )
        .localCheckpoint(eager=True)  # pin gates before state mutates
    )

    # 4. register this batch's new fingerprints (append-only commit)
    if not state.fps.is_applied(batch_id):
        new_fps = (
            flagged.filter(
                F.col("first_doc").isNull() & (F.col("_rn") == 1)
            )
            .select("fp", "doc_id")
            .withColumn("bucket", _bucket("fp"))
        )
        adds = state.fps.stage_files(new_fps, "bucket")
        state.fps.commit(adds, batch_id=batch_id)

    # 5. survivor counts merge LAST (the batch-completion marker)
    delta = funnel_counts_agg(flagged).withColumn(
        "src_part", F.col("source")
    )
    merge_grouped_sums(
        spark,
        delta,
        state.counts,
        ["source"],
        ["n_input", "n_url", "n_lang", "n_quality", "n_ppl", "n_final"],
        "src_part",
        batch_id,
    )


def funnel_maintenance_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    state: FunnelState,
    checkpoint_dir: str,
):
    """Wire the incremental funnel into a document stream
    (availableNow file-source replay semantics, same as the other
    maintenance streams in streaming/ingest.py)."""

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        process_funnel_batch(spark, batch_df, state, f"funnel-{batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_funnel_counts(spark: SparkSession, state: FunnelState) -> DataFrame:
    """Current per-source survivor counts."""
    df = state.counts.read(spark)
    if df is None:
        return spark.createDataFrame(
            [],
            "source string, n_input long, n_url long, n_lang long,"
            " n_quality long, n_ppl long, n_final long",
        )
    return df.select(
        "source", "n_input", "n_url", "n_lang", "n_quality", "n_ppl",
        "n_final",
    ).orderBy("source")


def rescore_with_final_lm(
    spark: SparkSession, docs: DataFrame, state: FunnelState
) -> DataFrame:
    """Re-derive per-doc cross-entropy under the FULL maintained LM
    without re-aggregating the corpus — the 'stats refresh' read path:
    the vocabulary is served from state, so this costs one pass over
    ``docs``, not two."""
    vocab = state.vocab.read(spark).select("term", "c")
    return _xent_vs_vocab(docs, vocab)
