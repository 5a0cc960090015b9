"""Incremental image/audio fingerprint registries — the multimodal
gate twins of streaming/neardup.py (text MinHash) and
streaming/embdedup.py (embeddings): "is this image/clip a near-copy
of anything already KEPT?" costs a bucketed probe against a persisted
fingerprint registry, never a corpus re-scan.

Image gate state: one tx table of pigeonhole bit-slice rows
``(doc_id, fp, chunk_id, chunk_val)`` — ``max_hamming + 1`` rows per
registered image (operators/dedup.hamming_chunk_rows over the 64-bit
pHash, operators/multimodal.phash_ppm), hash-bucketed on the chunk
value for manifest layout. Two pHashes within ``max_hamming`` bits
must share at least one whole slice, so the probe is an equi-join on
``(chunk_id, chunk_val)`` with an exact ``bit_count(a ^ b)`` verify —
the same candidates-then-verify contract as the batch
``image_near_dups``.

Audio gate state: one tx table of constellation landmark rows
``(doc_id, h, t)`` (operators/multimodal.afp_hashes — Wang-2003
anchor pairs), bucketed on the hash value. A probe joins batch
landmarks to registry landmarks on ``h`` and keeps pairs with
``min_matches`` shared hashes at ONE consistent time offset — the
offset-consistency vote that kills coincidental collisions, identical
to the batch ``audio_near_dups``.

Both gates follow the registry protocol the text/embedding gates
pinned down:

- only KEPT (non-duplicate) media register, so state grows with the
  deduplicated corpus, not the stream;
- winner per connected component is its REGISTRY member when one
  exists (first-arrival-wins across batches), else the min batch id;
- the registry probe is partition-scoped (funnel registry_probe
  precedent): every row of one probe key (chunk value / landmark
  hash) lives in one of ``_NB`` hash buckets, so each batch reads
  only its touched buckets — O(touched buckets), not O(registry) —
  and the per-key hot caps stay exact over the pruned slice; the
  caps apply to BOTH sides of the candidate join (batch rows at
  generation, stored rows at probe), so a key that goes hot across
  batches stops generating candidates instead of eroding the
  defense as the registry grows;
- batch ids ride every commit → replay idempotence (verdicts
  reproduce exactly; registered winners self-match-excluded);
- the gate configuration (fingerprint layout + thresholds that
  change band keys or verdicts) is STAMPED into the table meta on
  first commit and enforced on every batch — the ADVICE-r4 lesson
  from the text gate: an incompatible registry must raise, not
  silently pass known near-dups;
- maintenance compacts the per-batch bucket files back toward one
  file per bucket and vacuums old versions — verdict-preserving.

Operating guidance on the hot caps (SCALING.md round 7): because the
caps now bound BOTH sides of the candidate join, size them for the
registry's eventual scale, not the batch's — a fixed df cap gets
relatively stricter as the registry grows (measured: audio recall
0.9→0.6 at max_df_hash=5 with a ~360-clip registry of degenerate
synthetic tones; 1.0 throughout at 20).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.operators.dedup import (
    cap_hot_values,
    hamming_chunk_rows,
    registry_winner_verdicts,
)
from nfl_data_pipeline_spark.operators.multimodal import (
    WAV_MIMES,
    audio_fingerprints,
    image_phash,
)

# Registry hash buckets — the manifest-pruning granularity of the
# partition-scoped probe (funnel registry_probe precedent). All rows
# of one probe key (chunk value / landmark hash) land in ONE bucket,
# so a probe that reads only the batch's touched buckets sees every
# possible match AND the exact per-key frequencies (the hot caps stay
# exact over the pruned slice). Stamped into the gate config: the
# probe's bucket arithmetic must match the layout the registry was
# written under, or pruning silently drops true matches.
_NB = 64


def _bucket_col(*cols: str) -> "F.Column":
    """THE registry bucket formula — the single definition shared by
    both registry write paths and the probe's pruning set. The module
    comment's warning is structural: probe arithmetic that drifts from
    the written layout silently drops true matches, so no call site
    may inline its own copy."""
    return F.pmod(F.xxhash64(*cols), F.lit(_NB)).cast("long")


def _touched_buckets(df: DataFrame, *cols: str) -> set:
    """Distinct registry buckets this batch's probe keys hash to —
    the pruning set for ``TxTable.read(partitions=...)``. The collect
    is bounded at ``_NB`` longs, never O(batch)."""
    return {
        r[0]
        for r in df.select(_bucket_col(*cols).alias("b"))
        .distinct()
        .collect()
    }


def _check_config(table: TxTable, cfg: dict, what: str) -> None:
    """Raise before any work when the persisted registry was written
    under a different gate configuration — the shared guard
    (jobs/txlog.check_gate_config)."""
    from nfl_data_pipeline_spark.jobs.txlog import check_gate_config

    check_gate_config(table, cfg, what)


# ---- image gate ----------------------------------------------------------


class ImageDedupState:
    def __init__(self, root: str):
        self.chunks = TxTable(os.path.join(root, "chunks"))


def process_image_batch(
    spark: SparkSession,
    media: DataFrame,
    state: ImageDedupState,
    batch_id: str,
    max_hamming: int = 10,
    max_bucket: int | None = None,
) -> DataFrame:
    """One media batch through the perceptual-image gate. Returns
    ``(doc_id, dup_of, keep)`` for every decodable (PPM-mime) row and
    registers the winners' chunk rows unless ``batch_id`` already
    applied (replay). ``max_bucket`` is the hot-bucket defense of
    ``hamming_chunk_rows`` — boilerplate images (solid frames,
    repeated logos) share every chunk value and would otherwise
    explode the candidate self-join O(n²); it changes verdicts, so it
    rides the stamped config."""
    cfg = {
        "fp": "phash_ppm/64",
        "max_hamming": max_hamming,
        "max_bucket": max_bucket,
        "buckets": _NB,
    }
    _check_config(state.chunks, cfg, "image")
    # pin the decode (the expensive Arrow pass); chunk rows re-derive
    # cheaply from it. The verdict base is fp, NOT chunks — a doc
    # whose every chunk lands in a capped hot bucket still gets its
    # (trivially kept) verdict row.
    fp = image_phash(media).localCheckpoint(eager=True)
    chunks = hamming_chunk_rows(
        fp, "doc_id", "phash", max_hamming, max_bucket
    )

    ham = F.bit_count(F.col("a._fp").bitwiseXOR(F.col("b._fp")))
    chunk_key = (
        (F.col("a.chunk_id") == F.col("b.chunk_id"))
        & (F.col("a.chunk_val") == F.col("b.chunk_val"))
    )
    intra = (
        chunks.alias("a")
        .join(chunks.alias("b"), chunk_key & (F.col("a._id") < F.col("b._id")))
        .filter(ham <= max_hamming)
        .select(
            F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b")
        )
    )
    edges = intra
    # partition-scoped probe: a registry row can only match a batch
    # chunk row on equal (chunk_id, chunk_val) — same bucket — so
    # reading only the batch's touched buckets is verdict-identical
    # to the full registry scan while the SCAN drops from O(registry)
    # to O(touched buckets).
    buckets = _touched_buckets(chunks, "chunk_id", "chunk_val")
    stored = (
        state.chunks.read(spark, partitions=buckets) if buckets else None
    )
    if stored is not None:
        reg = stored.select(
            F.col("doc_id").alias("_id"),
            F.col("fp").alias("_fp"),
            "chunk_id",
            "chunk_val",
        )
        # registry-side hot-value cap — the batch-side rule applied
        # to the stored rows too (all rows of a chunk value share a
        # bucket, so the count over the pruned slice is exact): a
        # value that went hot ACROSS batches stops generating
        # candidates instead of eroding the defense as the registry
        # grows. Verdict-changing like the batch cap, hence it rides
        # the same stamped max_bucket.
        reg = cap_hot_values(reg, ["chunk_id", "chunk_val"], max_bucket)
        cross = (
            chunks.alias("a")
            .join(reg.alias("b"), chunk_key & (F.col("a._id") != F.col("b._id")))
            .filter(ham <= max_hamming)
            .select(
                F.col("a._id").alias("doc_a"),
                F.col("b._id").alias("doc_b"),
            )
        )
        edges = edges.unionByName(cross)
        reg_nodes = (
            stored.select("doc_id").distinct().withColumn("_reg", F.lit(1))
        )
    else:
        reg_nodes = None

    base_ids = fp.select("doc_id").distinct()
    verdicts = registry_winner_verdicts(spark, base_ids, edges, reg_nodes)

    if not state.chunks.is_applied(batch_id):
        kept = verdicts.filter(F.col("keep") == 1).select(
            F.col("doc_id").alias("_id")
        )
        new_rows = (
            chunks.join(kept, "_id")
            .select(
                F.col("_id").alias("doc_id"),
                F.col("_fp").alias("fp"),
                "chunk_id",
                "chunk_val",
            )
            .withColumn("bucket", _bucket_col("chunk_id", "chunk_val"))
        )
        adds = state.chunks.stage_files(new_rows, "bucket")
        state.chunks.commit(
            adds, batch_id=batch_id, meta={"gate_config": cfg}
        )
    return verdicts


# ---- audio gate ----------------------------------------------------------


class AudioDedupState:
    def __init__(self, root: str):
        self.landmarks = TxTable(os.path.join(root, "landmarks"))


def _offset_vote(
    a: DataFrame, b: DataFrame, min_matches: int, symmetric: bool
) -> DataFrame:
    """Pairs sharing ≥ ``min_matches`` DISTINCT landmark hashes at
    one consistent time offset (the same distinct-hash vote as the
    batch ``audio_near_dups`` — raw co-occurrence counting is
    degenerate on stationary content, see its docstring).
    ``symmetric=True`` is the intra-batch self-join (``id_a <
    id_b``); otherwise batch-vs-registry (``id_a != id_b``)."""
    cond = (
        F.col("id_a") < F.col("id_b")
        if symmetric
        else F.col("id_a") != F.col("id_b")
    )
    votes = (
        a.join(b, "h")
        .filter(cond)
        .groupBy(
            "id_a", "id_b", (F.col("ta") - F.col("tb")).alias("offset")
        )
        .agg(F.countDistinct("h").alias("n_matches"))
    )
    best = Window.partitionBy("id_a", "id_b").orderBy(
        # ties across offsets happen on stationary spectra — prefer
        # the physically sensible smallest |offset| alignment
        F.desc("n_matches"), F.asc(F.abs("offset")), F.asc("offset")
    )
    return (
        votes.withColumn("_rk", F.row_number().over(best))
        .filter(
            (F.col("_rk") == 1) & (F.col("n_matches") >= min_matches)
        )
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
    )


def process_audio_batch(
    spark: SparkSession,
    media: DataFrame,
    state: AudioDedupState,
    batch_id: str,
    min_matches: int = 8,
    max_df_hash: int | None = None,
) -> DataFrame:
    """One media batch through the constellation audio gate. Returns
    ``(doc_id, dup_of, keep)`` for every decodable (WAV-mime) row and
    registers the winners' landmark rows unless ``batch_id`` already
    applied (replay). ``max_df_hash`` caps batch-side degenerate
    hashes (silence/tone boilerplate) before candidate generation."""
    cfg = {
        # afp_hashes defaults — any change re-keys every hash; the
        # df cap changes which landmarks REGISTER (and thus future
        # votes), so it is part of the registry contract too
        "fp": "afp/wang2003",
        "frame": 512,
        "hop": 256,
        "peaks": 3,
        "fan_out": 3,
        "zone": 6,
        "min_matches": min_matches,
        "max_df_hash": max_df_hash,
        "buckets": _NB,
    }
    _check_config(state.landmarks, cfg, "audio")
    fp = audio_fingerprints(media)
    if max_df_hash is not None:
        ok = (
            fp.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("_df"))
            .filter(F.col("_df") <= max_df_hash)
            .select("h")
        )
        fp = fp.join(ok, "h")
    fp = fp.localCheckpoint(eager=True)

    a = fp.select(F.col("doc_id").alias("id_a"), "h", F.col("t").alias("ta"))
    b = fp.select(F.col("doc_id").alias("id_b"), "h", F.col("t").alias("tb"))
    edges = _offset_vote(a, b, min_matches, symmetric=True)
    # partition-scoped probe (see the image gate): landmark matches
    # are equi-joins on h, and every registry row of one h lives in
    # one bucket, so reading only the batch's touched buckets is
    # verdict-identical and the SCAN is O(touched buckets).
    buckets = _touched_buckets(fp, "h")
    stored = (
        state.landmarks.read(spark, partitions=buckets)
        if buckets
        else None
    )
    if stored is not None:
        # registry-side document-frequency cap — the batch-side rule
        # over the stored landmarks (per-h df over the pruned slice
        # is exact): a hash that went degenerate ACROSS batches stops
        # generating candidates. Rides the stamped max_df_hash.
        reg_rows = cap_hot_values(
            stored, ["h"], max_df_hash, distinct_col="doc_id"
        )
        reg_b = reg_rows.select(
            F.col("doc_id").alias("id_b"), "h", F.col("t").alias("tb")
        )
        edges = edges.unionByName(
            _offset_vote(a, reg_b, min_matches, symmetric=False)
        )
        reg_nodes = (
            stored.select("doc_id").distinct().withColumn("_reg", F.lit(1))
        )
    else:
        reg_nodes = None

    # verdict base: every decodable WAV row, including clips whose
    # capped/empty fingerprint produced no landmarks (trivially kept)
    base_ids = (
        media.filter(F.col("media_meta.mime").isin(*sorted(WAV_MIMES)))
        .select("doc_id")
        .distinct()
    )
    verdicts = registry_winner_verdicts(spark, base_ids, edges, reg_nodes)

    if not state.landmarks.is_applied(batch_id):
        kept = verdicts.filter(F.col("keep") == 1).select("doc_id")
        new_rows = fp.join(kept, "doc_id").withColumn(
            "bucket", _bucket_col("h")
        )
        adds = state.landmarks.stage_files(new_rows, "bucket")
        state.landmarks.commit(
            adds, batch_id=batch_id, meta={"gate_config": cfg}
        )
    return verdicts


# ---- maintenance ---------------------------------------------------------


def maintain_image_state(
    spark: SparkSession,
    state: ImageDedupState,
    min_files: int = 8,
    retain_versions: int = 2,
) -> dict:
    """Compact the chunk registry back toward one file per bucket and
    vacuum expired versions — metadata + layout only, verdicts and
    replay markers unchanged (tests/test_streaming_mediadedup)."""
    compacted = state.chunks.compact(
        spark, min_files=min_files, partition_col="bucket"
    )
    deleted = state.chunks.vacuum(retain_versions=retain_versions)
    return {"chunks": {"compacted": compacted, "deleted_files": deleted}}


def maintain_audio_state(
    spark: SparkSession,
    state: AudioDedupState,
    min_files: int = 8,
    retain_versions: int = 2,
) -> dict:
    compacted = state.landmarks.compact(
        spark, min_files=min_files, partition_col="bucket"
    )
    deleted = state.landmarks.vacuum(retain_versions=retain_versions)
    return {
        "landmarks": {"compacted": compacted, "deleted_files": deleted}
    }
