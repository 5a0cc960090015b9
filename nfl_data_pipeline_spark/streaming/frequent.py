"""Incrementally-maintained frequent-items state — the streaming twin
of ``heavy_hitter_ngrams`` (operators/sketches.heavy_hitters).

The one-shot operator re-scans the corpus for exact candidate counts;
a stream cannot (past batches are gone). What CAN be maintained with
bounded state is a merged Misra-Gries sketch: per batch, the
executors produce per-partition MG sketches (one Arrow pass, the same
primitive the batch operator uses), the bounded sketch rows merge
into the state table by summed counts, and the state is re-truncated
to ``capacity`` by the mergeable-MG rule (subtract the
(capacity+1)-th largest count, drop non-positive — Agarwal et al.,
PODS'12). The merged sketch keeps the MG guarantee across any batch
arrival order:

- every key with true count ≥ N/(capacity+1) is IN the state;
- per key, ``mg_count ≤ true ≤ mg_count + err`` with
  ``err = (N − Σ mg_count)/(capacity+1)`` (the summaries-merge bound,
  computable from state + the maintained total).

So a ``phi_inv``-heavy query reports two tiers: ``certain`` keys
(lower bound alone clears the threshold) and candidates whose upper
bound clears it — and NEVER misses a truly heavy key when
``capacity ≥ phi_inv``.

State shape: one bounded partition (≤ capacity rows — sketch, not
corpus) in a tx table; the stream length and capacity ride the
manifest ``meta`` so they publish atomically with the rows; batch ids
give replay idempotence like every other gate. The sketch merge is
DISTRIBUTED: state rows union with the batch's per-partition sketch
rows, ``groupBy(key).sum`` merges them executor-side (map-side
combine), and the (capacity+1)-th-largest subtraction resolves via a
bounded top-k (TakeOrderedAndProject on the count column only). The
driver sees O(capacity) values per batch — capacity+1 longs for the
truncation threshold plus two 1-row aggregates — never the
partitions × capacity candidate set, so the merge holds at any
partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.operators.sketches import misra_gries_sketches

_PART = "hh"  # the whole sketch lives in one bounded partition


def update_frequent_state(
    spark: SparkSession,
    df: DataFrame,
    key_col: str,
    table: TxTable,
    batch_id: str | None = None,
    capacity: int = 10_000,
) -> bool:
    """Fold one batch into the frequent-items state. Returns False
    for a detected replay (same contract as merge_grouped_sums)."""
    from pyspark.sql import functions as F

    base_v = table.latest_version()
    if batch_id is not None and table.is_applied(batch_id, base_v):
        return False
    meta = table.meta(base_v)
    prev_cap = int(meta.get("hh_capacity", capacity))
    if prev_cap != capacity:
        raise ValueError(
            f"state built at capacity {prev_cap}, batch offered "
            f"{capacity} — one capacity per state table"
        )
    # one Arrow pass over the batch (misra_gries_sketches), merged
    # with the stored state executor-side; NULL-key rows carry each
    # partition's total offered count, so their merged group IS
    # n_batch. The whole fold is ONE bounded action (r13 — it was
    # three: a checkpoint, an n_batch aggregate, a threshold top-k,
    # then a second full collect): order the merged rows by count
    # DESC (nulls first — the null group's count is the batch total,
    # ≥ any single key's count, so the tie-safe sort keeps it on
    # board) and take capacity + 2 rows. That bounded prefix contains
    # (1) the null n_batch row (sorted first UNCONDITIONALLY — a
    # long-lived state key's count can exceed one batch's total, so
    # sorting nulls by count would evict it), (2) every possible
    # survivor of the MG truncation — a survivor needs count > the
    # (capacity+1)-th largest keyed count, and keyed rows beyond the
    # prefix are ≤ it by construction — and (3) the truncation
    # threshold itself. O(capacity) rows to the driver, exactly the
    # contract the two-action form had.
    sketches = misra_gries_sketches(
        df.select(key_col).withColumnRenamed(key_col, "k"), "k", capacity
    )
    merged = sketches.select("key", "mg_count")
    existing = table.read(spark, version=base_v)
    if existing is not None:
        merged = merged.unionByName(existing.select("key", "mg_count"))
    merged = merged.groupBy("key").agg(
        F.sum("mg_count").alias("mg_count")
    )
    if capacity <= 20_000:
        top = (
            merged.orderBy(
                F.col("key").isNotNull().asc(),
                F.desc("mg_count"),
                F.asc("key"),
            )
            .limit(capacity + 2)
            .collect()
        )
        n_batch = 0
        keyed = []
        for r in top:
            if r["key"] is None:
                n_batch = int(r["mg_count"])
            else:
                keyed.append(r)
        if len(keyed) > capacity:
            # the MG decrement: drop ≤ sub, subtract from survivors
            # (≤ capacity counts are strictly greater than the
            # (capacity+1)-th largest, so the result is bounded)
            sub = int(keyed[capacity]["mg_count"])
            keyed = [
                r for r in keyed if int(r["mg_count"]) > sub
            ]
        else:
            sub = 0
        from pyspark.sql import types as T

        rows = [
            {
                "key": r["key"],
                "mg_count": int(r["mg_count"]) - sub,
                "_part": _PART,
            }
            for r in keyed
        ]
        schema = T.StructType(
            list(merged.schema)
            + [T.StructField("_part", T.StringType(), False)]
        )
        adds = table.stage_rows_local(rows, schema, "_part")
    else:
        # large-capacity path: the driver only sees the n_batch row
        # and the threshold values, the state stays distributed
        merged = merged.localCheckpoint(eager=True)
        n_batch = int(
            merged.filter(F.col("key").isNull())
            .agg(F.sum("mg_count"))
            .first()[0]
            or 0
        )
        merged = merged.filter(F.col("key").isNotNull())
        top = merged.select("mg_count").orderBy(
            F.desc("mg_count")
        ).limit(capacity + 1).collect()
        if len(top) > capacity:
            sub = int(top[-1]["mg_count"])
            merged = merged.filter(F.col("mg_count") > sub).withColumn(
                "mg_count", F.col("mg_count") - F.lit(sub)
            )
        merged = merged.withColumn("_part", F.lit(_PART)).coalesce(1)
        adds = table.stage_files(merged, "_part")
    # expected_version: a concurrent writer between latest_version()
    # and here would otherwise be silently clobbered (this merge was
    # computed from the base_v snapshot AND the base_v meta) — raise
    # CommitConflict like commit_grouped_sums instead of losing counts
    table.commit(
        adds,
        remove_partitions={_PART},
        batch_id=batch_id,
        expected_version=base_v,
        meta={
            "hh_n_total": int(meta.get("hh_n_total", 0)) + n_batch,
            "hh_capacity": capacity,
        },
    )
    return True


def read_frequent_state(
    spark: SparkSession, table: TxTable, phi_inv: int = 10_000
) -> DataFrame | None:
    """Current heavy-hitter report: ``(key, count_lower, count_upper,
    certain)`` for every key whose UPPER bound clears N/phi_inv —
    ``certain`` marks keys whose lower bound alone clears it. Superset
    guarantee per the module docstring; None for an empty state."""
    from pyspark.sql import functions as F

    # pin ONE version for rows and meta — resolving them separately
    # lets a commit land in between and pair mismatched n_total with
    # stale rows, breaking the bracketing bound
    v = table.latest_version()
    state = table.read(spark, version=v)
    if state is None:
        return None
    meta = table.meta(v)
    n_total = int(meta.get("hh_n_total", 0))
    capacity = int(meta.get("hh_capacity", phi_inv))
    if phi_inv > capacity:
        # the no-miss guarantee needs capacity ≥ phi_inv: a state
        # built coarser than the query threshold can silently drop
        # truly heavy keys (their upper bound never surfaces for
        # absent keys) — refuse rather than answer wrong
        raise ValueError(
            f"state built at capacity {capacity} cannot answer "
            f"phi_inv={phi_inv} (no-miss guarantee needs "
            "capacity >= phi_inv)"
        )
    stored = state.agg(F.sum("mg_count")).first()[0] or 0
    err = (n_total - int(stored)) // (capacity + 1)
    return (
        state.withColumn("count_lower", F.col("mg_count"))
        .withColumn("count_upper", F.col("mg_count") + F.lit(err))
        .withColumn(
            "certain",
            (F.col("count_lower") * phi_inv >= F.lit(n_total)).cast(
                "int"
            ),
        )
        .filter(F.col("count_upper") * phi_inv >= F.lit(n_total))
        .select("key", "count_lower", "count_upper", "certain")
    )
