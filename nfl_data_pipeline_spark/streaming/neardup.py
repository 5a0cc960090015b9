"""Incremental MinHash-LSH near-duplicate gate: each arriving batch
is probed against a PERSISTED signature registry — the "new crawl vs
existing corpus" dedup that a one-shot ``minhash_lsh_pairs`` self-join
cannot express without re-scanning the corpus per batch.

State: one tx table of banded signature rows
``(band_id, h_lo, h_hi, doc_id, mh0..mh7)`` — 4 rows per registered
doc (N_BANDS), hash-bucketed on the band value for manifest pruning.
Only KEPT (non-duplicate) docs register, so the registry grows with
the deduplicated corpus, not the raw stream.

Per batch:

1. signatures + band rows for the batch (operators/dedup machinery);
2. candidate edges = batch bands ⋈ registry bands on the band value
   (bucketed, never all-pairs) ∪ the batch's internal band self-join.
   Cost honesty (same shape as the funnel's registry study in
   SCALING.md): the probe SHUFFLES only the band-matched candidates,
   but the registry SCAN is O(registry) per batch — band values are
   uniform hashes, so any real batch touches every one of the _NB
   buckets and manifest pruning cannot bite. The scan parallelizes
   across executors; the shuffle is what the banding bounds;
3. similarity = the MinHash estimate (fraction of agreeing signature
   components — 8 perms, so the estimator is coarse: ±1/8 steps;
   production raises ``MINHASH_PERMS``). Edges below ``threshold``
   drop;
4. connected components over the surviving edges
   (operators/dedup.connected_components — driver union-find on the
   post-threshold edge set, distributed fallback): a component's
   winner is its REGISTRY member if one exists (first-arrival-wins
   across batches), else the min batch doc_id;
5. winners' band rows append to the registry with the batch id in
   the same atomic manifest swap.

Replay (same batch id): winners are already registered; their
registry rows are excluded as self-matches, losers re-match the same
winners (now through the registry), verdicts reproduce exactly —
asserted by the crash-replay test.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.operators.dedup import (
    _materialized_sids,
    connected_components,
    with_minhash_signature,
)
from nfl_data_pipeline_spark.operators.hashing import MINHASH_PERMS, N_BANDS

_NB = 16  # registry hash buckets
_SIG = [f"mh{i}" for i in range(len(MINHASH_PERMS))]


class NearDupState:
    def __init__(self, root: str):
        self.sigs = TxTable(os.path.join(root, "signatures"))


def _band_rows(sig: DataFrame) -> DataFrame:
    """Explode a signature frame into banded probe rows."""
    return sig.select(
        "doc_id",
        *_SIG,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.col(f"mh{2 * bi}").alias("h_lo"),
                        F.col(f"mh{2 * bi + 1}").alias("h_hi"),
                    )
                    for bi in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", *_SIG, "band.*")


def _est_jaccard(a_prefix: str, b_prefix: str):
    """MinHash similarity estimate between two signature row sides."""
    agree = sum(
        F.when(
            F.col(f"{a_prefix}.{c}") == F.col(f"{b_prefix}.{c}"), 1
        ).otherwise(0)
        for c in _SIG
    )
    return agree / float(len(_SIG))


def process_neardup_batch(
    spark: SparkSession,
    docs: DataFrame,
    state: NearDupState,
    batch_id: str,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Run one batch through the incremental gate. Returns the
    verdict frame ``(doc_id, keep, dup_of)`` — ``dup_of`` is the
    winning doc (itself when kept) — and registers the winners'
    signatures unless this ``batch_id`` already applied (replay)."""
    sig = with_minhash_signature(
        _materialized_sids(docs, text_col, 3)
    ).select("doc_id", *_SIG)
    bands = _band_rows(sig).localCheckpoint(eager=True)

    # candidate edges, estimated similarity, thresholded
    band_key = ["band_id", "h_lo", "h_hi"]
    stored = state.sigs.read(spark)
    edges = None
    if stored is not None:
        inter = (
            bands.alias("a")
            .join(stored.alias("b"), band_key)
            .filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .filter(_est_jaccard("a", "b") >= threshold)
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )
        edges = inter
    intra = (
        bands.alias("a")
        .join(bands.alias("b"), band_key)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(_est_jaccard("a", "b") >= threshold)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    edges = intra if edges is None else edges.unionByName(intra)
    comps = connected_components(edges.distinct())  # (node, component)

    # winner per component: registered member (min id among them) if
    # any, else min batch doc id. Registered nodes are exactly those
    # already in the signature registry.
    if stored is not None:
        reg_nodes = stored.select("doc_id").distinct().withColumn(
            "_reg", F.lit(1)
        )
    else:
        reg_nodes = spark.createDataFrame([], "doc_id long, _reg int")
    labeled = comps.join(reg_nodes, comps["node"] == reg_nodes["doc_id"], "left").select(
        "node", "component", F.coalesce("_reg", F.lit(0)).alias("_reg")
    )
    winners = labeled.groupBy("component").agg(
        F.coalesce(
            F.min(F.when(F.col("_reg") == 1, F.col("node"))),
            F.min("node"),
        ).alias("winner")
    )
    verdict_in_comp = (
        labeled.join(winners, "component")
        .filter(F.col("_reg") == 0)  # verdicts are for batch docs only
        .select(
            F.col("node").alias("doc_id"),
            F.col("winner").alias("dup_of"),
        )
    )
    verdicts = (
        sig.select("doc_id")
        .join(verdict_in_comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_of", F.col("doc_id")).alias("dup_of"),
        )
        .withColumn("keep", (F.col("dup_of") == F.col("doc_id")).cast("int"))
        .localCheckpoint(eager=True)  # pin before the registry mutates
    )

    if not state.sigs.is_applied(batch_id):
        kept = verdicts.filter(F.col("keep") == 1).select("doc_id")
        new_rows = bands.join(kept, "doc_id").withColumn(
            "bucket",
            F.pmod(F.xxhash64("h_lo", "h_hi"), F.lit(_NB)).cast("long"),
        )
        adds = state.sigs.stage_files(new_rows, "bucket")
        state.sigs.commit(adds, batch_id=batch_id)
    return verdicts
