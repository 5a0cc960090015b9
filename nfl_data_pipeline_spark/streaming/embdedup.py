"""Incremental embedding near-dup gate: the vector twin of
streaming/neardup.py — new batches of embeddings are probed against a
persisted registry of hyperplane-LSH band rows, so "is this vector a
near-copy of anything already kept?" costs a bucketed join against
the registry, never a corpus re-scan.

State: one tx table of band rows ``(band_id, band_val, vec_id, vec,
norm)`` — ``n_bands`` rows per KEPT vector, the vector carried on
each row so the probe is a single join (the n_bands-fold vector
duplication is the storage price of one-hop probes; a normalized
two-table layout trades that for a second join). Hash-derived planes
(operators/similarity._hyperplane_proj) make band values reproducible
by any future batch — the property that lets the registry stay
probe-compatible without storing plane weights.

Per batch: band rows → candidates (batch×registry ∪ batch×batch on
equal band values; the registry SCAN is O(registry) per batch — only
the candidate SHUFFLE is bounded by the banding, same honesty note
as streaming/neardup.py) → exact cosine verify ≥ threshold → connected
components with registered-member-wins (first-arrival across
batches, min-id within a batch) → winners' band rows append with the
batch id in one atomic manifest swap. Replays reproduce verdicts
exactly (self-matches excluded), same argument as the MinHash gate.

Threshold regime: hyperplane LSH is only selective at high cosine
(recall 1-(1-p^r)^L, p = 1-θ/π) — production near-dup ≥0.9 is the
intended regime, matching embedding_near_dups_banded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.operators.dedup import registry_winner_verdicts
from nfl_data_pipeline_spark.operators.similarity import hyperplane_band_rows

_NB = 16  # registry hash buckets


class EmbDedupState:
    def __init__(self, root: str):
        self.bands = TxTable(os.path.join(root, "bands"))


def _check_gate_config(state: EmbDedupState, cfg: dict) -> None:
    """Raise before any work when the persisted registry was written
    under a different gate configuration — the shared guard
    (jobs/txlog.check_gate_config): band layout/dim change the band
    keys, threshold changes verdicts, and the two projection engines
    are not bit-identical — one configuration per registry."""
    from nfl_data_pipeline_spark.jobs.txlog import check_gate_config

    check_gate_config(state.bands, cfg, "embedding")


def process_embdedup_batch(
    spark: SparkSession,
    vectors: DataFrame,
    state: EmbDedupState,
    batch_id: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band_bits: int = 8,
    n_bands: int = 4,
    dim: int | None = None,
    engine: str = "sql",
) -> DataFrame:
    """Returns ``(vec_id, keep, dup_of)`` and registers the winners'
    band rows unless ``batch_id`` already applied (replay).

    ``engine="arrow"`` switches the projection to the numpy matmul
    fast path (same hash-derived planes; ~100x per-vector — see
    hyperplane_band_rows). Use ONE engine per registry."""
    if dim is None:
        probe = vectors.select(F.size(vec_col)).first()
        if probe is None:  # empty micro-batch: nothing to gate
            from nfl_data_pipeline_spark.operators.localframe import (
                empty_frame,
            )

            return empty_frame(
                spark, f"{id_col} long, dup_of long, keep int"
            )
        dim = int(probe[0])
    cfg = {
        "fp": "hyperplane_lsh",
        "threshold": threshold,
        "band_bits": band_bits,
        "n_bands": n_bands,
        "dim": dim,
        "engine": engine,
    }
    _check_gate_config(state, cfg)
    bands = hyperplane_band_rows(
        vectors, id_col, vec_col, band_bits, n_bands, dim, engine=engine
    ).localCheckpoint(eager=True)

    # Candidate verify (r13, guide §8): the band self-join + cross
    # join evaluated the pairwise cosine once per candidate pair with
    # both vectors on the pair row — ~1 KB of Arrow/codegen traffic
    # per pair (SCALING.md: ~3M candidates/batch at the 10× tier).
    # The sided grouped kernel ships each band row once per bucket,
    # scores probe-probe (a < b) and probe-registry (a ≠ b) pairs in
    # segment-vectorized numpy with the exact fold order of the SQL
    # engine's dim-unrolled dot, and never emits registry-registry
    # pairs. Verdicts are therefore bit-identical to the SQL engine
    # BY CONSTRUCTION for both engine settings (previously the arrow
    # engine's einsum could in principle flip a knife-edge pair; the
    # equivalence test pinned zero flips empirically).
    from nfl_data_pipeline_spark.operators.similarity import (
        _grouped_pair_scores,
    )

    stored = state.bands.read(spark)
    members = bands.select(
        "band_id",
        "band_val",
        "c_id",
        "c_vec",
        "c_norm",
        F.lit(0).alias("c_side"),
    )
    if stored is not None:
        members = members.unionByName(
            stored.select(
                "band_id",
                "band_val",
                F.col("vec_id").alias("c_id"),
                F.col("vec").alias("c_vec"),
                F.col("norm").alias("c_norm"),
                F.lit(1).alias("c_side"),
            )
        )
    edges = (
        _grouped_pair_scores(
            members, ["band_id", "band_val"], dim, side_col="c_side"
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b")
        )
    )
    reg_nodes = (
        stored.select(F.col("vec_id").alias("doc_id"))
        .distinct()
        .withColumn("_reg", F.lit(1))
        if stored is not None
        else None
    )
    verdicts = registry_winner_verdicts(
        spark, vectors.select(id_col), edges, reg_nodes, id_col=id_col
    )

    if not state.bands.is_applied(batch_id):
        kept = verdicts.filter(F.col("keep") == 1).select(
            F.col(id_col).alias("c_id")
        )
        new_rows = (
            bands.join(kept, "c_id")
            .select(
                F.col("c_id").alias("vec_id"),
                F.col("c_vec").alias("vec"),
                F.col("c_norm").alias("norm"),
                "band_id",
                "band_val",
            )
            .withColumn(
                "bucket",
                F.pmod(
                    F.xxhash64("band_id", "band_val"), F.lit(_NB)
                ).cast("long"),
            )
        )
        # Deliberately NOT stage_files_auto: these rows carry the
        # embedding payload, so the bounding limit(N+1).collect()
        # would itself be the driver hazard at production dims
        # (20k × 768-d ≈ 120 MB). Row-count bounds only make the
        # driver path safe for NARROW frames; vector registries stay
        # on the distributed write at every size.
        adds = state.bands.stage_files(new_rows, "bucket")
        state.bands.commit(
            adds, batch_id=batch_id, meta={"gate_config": cfg}
        )
    return verdicts


def maintain_embdedup_state(
    spark: SparkSession,
    state: EmbDedupState,
    min_files: int = 8,
    retain_versions: int = 2,
    grace_s: float = 300.0,
) -> dict:
    """Periodic maintenance for the band-row registry (one file per
    touched bucket per batch otherwise — O(buckets × batches) growth):
    compact to ~one file per bucket, vacuum expired versions. Metadata
    + layout only; band values, probe verdicts, and replay markers
    are unchanged (tests/test_gate_maintenance)."""
    compacted = state.bands.compact(
        spark, min_files=min_files, partition_col="bucket"
    )
    deleted = state.bands.vacuum(
        retain_versions=retain_versions, grace_s=grace_s
    )
    return {"bands": {"compacted": compacted, "deleted_files": deleted}}
