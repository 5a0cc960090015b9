"""Right-to-be-forgotten deletion — keyed row deletes on tx tables
and registry purges across every incremental dedup gate.

Two layers:

1. ``delete_by_key_tx``: the DELETE sibling of
   ``jobs/upsert.upsert_by_key_tx`` — partition-scoped copy-on-write.
   Only partitions that actually hold matching rows are rewritten
   (touched set discovered by a scan, rewrite cost O(touched), the
   100-TB table stays untouched elsewhere), published as one atomic
   manifest swap with an optional replay marker.

2. ``forget_docs_*``: per-gate wrappers that purge a doc-id set from
   a gate's persisted registries (streaming/neardup, embdedup,
   mediadedup, funnel). WHY this must exist: the gates are
   first-arrival-wins — a registered winner's rows silently DROP
   every future near-copy. Once the winner itself is deleted
   (takedown, GDPR, license revocation), its ghost rows would keep
   suppressing legitimate re-arrivals of similar content, referencing
   a document that no longer exists. Purging the registry rows makes
   the next arrival register fresh, exactly as if the deleted doc had
   never been seen.

Bloom-sidecar honesty (funnel): blooms cannot delete, so after a
purge the fingerprint bloom still answers "maybe" for forgotten fps.
That is SAFE — the bloom is a probe prefilter whose false positives
only cost a join that then finds nothing (the no-false-negative
contract is untouched). The bitmap tightens again at the next
maintenance rebuild.

Gate-config stamps survive purges: ``TxTable.commit`` carries meta
keys forward, so a purge commit keeps the registry probe-compatible.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable


def delete_by_key_tx(
    spark: SparkSession,
    table: TxTable,
    id_col: str,
    ids: DataFrame | Iterable,
    partition_col: str,
    batch_id: str | None = None,
) -> dict:
    """Delete every row whose ``id_col`` is in ``ids`` from a
    bucketed/partitioned tx table. Copy-on-write at partition
    granularity: untouched partitions keep their files byte-for-byte;
    touched ones are rewritten without the matching rows and swapped
    in atomically (with the removal set) — a crash leaves either
    snapshot whole. Returns ``{"touched_partitions", "deleted_rows",
    "replayed"}``; idempotent under the same ``batch_id``.
    """
    base_v = table.latest_version()
    if base_v is None:
        return {"touched_partitions": 0, "deleted_rows": 0, "replayed": False}
    if batch_id is not None and table.is_applied(batch_id, base_v):
        return {"touched_partitions": 0, "deleted_rows": 0, "replayed": True}
    if isinstance(ids, DataFrame):
        ids_df = ids.select(id_col).distinct()
    else:
        vals = list(ids)
        if not vals:
            return {
                "touched_partitions": 0,
                "deleted_rows": 0,
                "replayed": False,
            }
        ids_df = spark.createDataFrame(
            [(v,) for v in vals], f"{id_col} long"
        )
    ids_df = F.broadcast(ids_df)

    current = table.read(spark, version=base_v)
    if current is None:
        return {"touched_partitions": 0, "deleted_rows": 0, "replayed": False}
    # touched set AND deleted-row count from ONE aggregate over one
    # scan+join (per-partition match counts are a handful of rows).
    # The scan is O(table) — the honest cost of deleting by a
    # non-partition key; the REWRITE is bounded by the partitions
    # actually holding matches.
    per_part = (
        current.join(ids_df, id_col)
        .groupBy(partition_col)
        .agg(F.count("*").alias("_n"))
        .collect()
    )
    touched = {r[0] for r in per_part}
    n_del = sum(int(r["_n"]) for r in per_part)
    if not touched:
        return {"touched_partitions": 0, "deleted_rows": 0, "replayed": False}
    remaining = table.read(spark, version=base_v, partitions=touched).join(
        ids_df, id_col, "left_anti"
    )
    adds = table.stage_files(remaining, partition_col)
    table.commit(
        adds,
        remove_partitions=touched,
        batch_id=batch_id,
        expected_version=base_v,
    )
    return {
        "touched_partitions": len(touched),
        "deleted_rows": int(n_del),
        "replayed": False,
    }


def forget_docs_neardup(
    spark: SparkSession, state, doc_ids, batch_id: str | None = None
) -> dict:
    """Purge doc ids from the MinHash gate's signature AND sids
    registries (streaming/neardup.NearDupState)."""
    return {
        "signatures": delete_by_key_tx(
            spark, state.sigs, "doc_id", doc_ids, "bucket",
            batch_id=batch_id and f"{batch_id}-sigs",
        ),
        "sids": delete_by_key_tx(
            spark, state.sids, "doc_id", doc_ids, "bucket",
            batch_id=batch_id and f"{batch_id}-sids",
        ),
    }


def forget_docs_embdedup(
    spark: SparkSession, state, vec_ids, batch_id: str | None = None
) -> dict:
    """Purge vector ids from the embedding gate's band registry
    (streaming/embdedup.EmbDedupState)."""
    return {
        "bands": delete_by_key_tx(
            spark, state.bands, "vec_id", vec_ids, "bucket",
            batch_id=batch_id,
        )
    }


def forget_docs_image(
    spark: SparkSession, state, doc_ids, batch_id: str | None = None
) -> dict:
    """Purge doc ids from the pHash chunk registry
    (streaming/mediadedup.ImageDedupState)."""
    return {
        "chunks": delete_by_key_tx(
            spark, state.chunks, "doc_id", doc_ids, "bucket",
            batch_id=batch_id,
        )
    }


def forget_docs_audio(
    spark: SparkSession, state, doc_ids, batch_id: str | None = None
) -> dict:
    """Purge doc ids from the constellation landmark registry
    (streaming/mediadedup.AudioDedupState)."""
    return {
        "landmarks": delete_by_key_tx(
            spark, state.landmarks, "doc_id", doc_ids, "bucket",
            batch_id=batch_id,
        )
    }


def forget_docs_funnel(
    spark: SparkSession, state, doc_ids, batch_id: str | None = None
) -> dict:
    """Purge doc ids from the funnel's exact-fingerprint registry
    (streaming/funnel.FunnelState). The bloom sidecar is left as-is —
    stale "maybe" answers are safe (prefilter false positives only;
    see module docstring) and the bitmap tightens at the next
    maintenance rebuild. Vocab/count tables are AGGREGATES, not
    per-doc records: they hold no row attributable to a document, so
    nothing to purge there."""
    return {
        "fingerprints": delete_by_key_tx(
            spark, state.fps, "doc_id", doc_ids, "bucket",
            batch_id=batch_id,
        )
    }


def forget_docs_curation(
    spark: SparkSession, state, doc_ids, batch_id: str | None = None
) -> dict:
    """One composed purge across everything the curation chain
    persists per-document: the funnel's fingerprint registry and the
    near-dup gate's signature/sids registries
    (streaming/curation.CurationState). The count, histogram, and
    frequent-items tables are AGGREGATES — they hold no row
    attributable to a document (that irreversibility is exactly what
    makes them sketches), so there is nothing to purge there and
    nothing that identifies the forgotten doc."""
    out = forget_docs_funnel(
        spark, state.funnel, doc_ids,
        batch_id=batch_id and f"{batch_id}-funnel",
    )
    out.update(
        forget_docs_neardup(spark, state.neardup, doc_ids, batch_id=batch_id)
    )
    return out


# Operating guidance (measured, SCALING.md round 5): uniform-hash
# bucketing spreads a scattered id set across ~(1 - (1-1/B)^n) of the
# buckets, so partition-scoping pays when buckets >> delete-set size,
# or when forget requests are accumulated and purged in periodic
# BATCHES — the rewrite is per-touched-partition, so a 10,000-id
# batch rewrites no more than a 100-id one at the same table size.


class ForgetQueue:
    """Accumulated right-to-be-forgotten requests, purged in batches
    — the measured operating shape (SCALING.md round 5: rewrite cost
    is per-touched-partition, so one large purge costs what a small
    one does). ``enqueue`` appends tombstone ids to a tiny tx table
    (atomic, replay-guarded); ``drain_into_curation`` purges every
    queued id from the curation chain's registries in one pass and
    then truncates the queue.

    Crash safety: the drain derives its purge batch id from the
    queue VERSION it read, so a crash between the purges and the
    truncation replays to no-ops; a concurrent ``enqueue`` during a
    drain survives (the truncation commit carries
    ``expected_version`` and yields to the newer tombstones, which
    the next drain picks up)."""

    def __init__(self, root: str):
        self.table = TxTable(root)

    def enqueue(
        self,
        spark: SparkSession,
        ids: Iterable,
        batch_id: str | None = None,
    ) -> int:
        vals = [(int(v), "q") for v in ids]
        if not vals:
            return 0
        if batch_id is not None and self.table.is_applied(batch_id):
            return 0
        df = spark.createDataFrame(vals, "doc_id long, _part string")
        adds = self.table.stage_files(df.coalesce(1), "_part")
        self.table.commit(adds, batch_id=batch_id)
        return len(vals)

    def pending(self, spark: SparkSession) -> int:
        df = self.table.read(spark)
        return 0 if df is None else df.count()

    def drain_into_curation(self, spark: SparkSession, state) -> dict:
        """Purge every queued id from the funnel + near-dup
        registries (forget_docs_curation), then truncate the queue.
        Returns the per-registry delete report plus the drained
        count; {} when the queue is empty."""
        from nfl_data_pipeline_spark.jobs.txlog import CommitConflict

        v = self.table.latest_version()
        ids = self.table.read(spark, version=v)
        if ids is None:
            return {}
        id_rows = ids.select("doc_id").distinct()
        n = id_rows.count()
        if n == 0:
            return {}
        out = forget_docs_curation(
            spark, state, id_rows, batch_id=f"forgetq-{v}"
        )
        out["drained"] = n
        try:
            self.table.commit(
                [],
                remove_partitions={"q"},
                batch_id=f"forgetq-clear-{v}",
                expected_version=v,
            )
            out["queue_cleared"] = True
        except CommitConflict:
            # new tombstones arrived mid-drain: keep them queued (the
            # already-purged ids re-purge as no-ops next drain)
            out["queue_cleared"] = False
        return out
