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
give replay idempotence like every other gate. The sketch merge runs
driver-side on the COLLECTED sketch rows (bounded at partitions ×
capacity by construction — the same bounded-aggregate precedent as
merge_grouped_sums' small-delta fast path and the ≤1M-edge
union-find), never on corpus rows.
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
    sketch_rows = misra_gries_sketches(
        df.select(key_col).withColumnRenamed(key_col, "k"), "k", capacity
    ).collect()
    n_batch = sum(
        int(r["mg_count"]) for r in sketch_rows if r["key"] is None
    )
    counters: dict[str, int] = {}
    existing = table.read(spark, version=base_v)
    if existing is not None:
        for r in existing.collect():
            counters[r["key"]] = int(r["mg_count"])
    for r in sketch_rows:
        if r["key"] is not None:
            counters[r["key"]] = counters.get(r["key"], 0) + int(
                r["mg_count"]
            )
    if len(counters) > capacity:
        vals = sorted(counters.values(), reverse=True)
        sub = vals[capacity]
        counters = {k: v - sub for k, v in counters.items() if v > sub}
    merged = spark.createDataFrame(
        [(k, v, _PART) for k, v in counters.items()],
        "key string, mg_count long, _part string",
    )
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
