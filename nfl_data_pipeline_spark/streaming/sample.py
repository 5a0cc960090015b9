"""Incrementally-maintained weighted reservoir — the streaming twin
of the batch PPS sampler (operators/sampling.py).

The batch sampler's systematic comb needs the corpus's global
cumulative weights, which a stream cannot maintain (every arrival
shifts every boundary). What CAN be maintained with bounded state is
the Efraimidis–Spirakis weighted reservoir: give row i a
DETERMINISTIC uniform ``u_i`` in (0,1) — a pure function of
``(doc_id, seed)``, no RNG, so retries and replays see the same draw
— and the key ``k_i = ln(u_i) / w_i`` (a monotone transform of the
classic ``u^(1/w)``; both negative, larger is better). The
exactly-k weighted sample WITHOUT replacement is the k largest keys
(Efraimidis & Spirakis, IPL 2006).

Top-k by a pure-function key is order-independent and mergeable, so
the maintained reservoir provably equals a one-shot top-k over
everything ever offered — any batch arrival order, any replay, and a
re-offered document (same id) lands on the SAME key and cannot
double-enter. State is k rows in one bounded tx-table partition;
``k``/``seed`` ride the manifest meta and publish atomically with the
rows (a mismatched later batch fails fast — they define the key
function, so they are TABLE properties). The merge resolves via a
bounded TakeOrdered top-k — the driver never sees more than k rows.

Where the batch comb is exact integer arithmetic (oracle-gated), the
reservoir key uses ln() doubles: fine for a maintenance gate (the
contract is self-consistency — stream == one-shot — which holds
bit-for-bit because both paths evaluate the same expression), but not
an engine-independent oracle contract; tests pin stream-vs-batch
equality and a pure-Python key recompute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable

_PART = "res"  # the whole reservoir lives in one bounded partition
_TWO63 = float(1 << 63)


def reservoir_key(
    id_col: str, weight_col: str, seed: int
) -> Column:
    """The E-S key ``ln(u) / w`` with the deterministic uniform
    ``u = (xxhash64(id, seed) & (2^63-1)) + 1) / (2^63+1)`` ∈ (0,1).
    NULL id/weight or w <= 0 → NULL key (never sampled)."""
    h = F.xxhash64(F.col(id_col), F.lit(seed)).bitwiseAND(
        F.lit((1 << 63) - 1)
    )
    u = (h.cast("double") + 1.0) / (_TWO63 + 1.0)
    w = F.col(weight_col).cast("double")
    return F.when(
        F.col(id_col).isNotNull() & w.isNotNull() & (w > 0),
        F.log(u) / w,
    )


def _best_per_doc(pool: DataFrame) -> DataFrame:
    """One row per doc_id, keeping the (skey, weight)-max offer —
    a deterministic, mergeable resolution of re-offers (max is
    associative and commutative, so any batch grouping of the same
    offer multiset converges to the same reservoir). Extra columns
    beyond (doc_id, weight, skey) ride along inside the struct."""
    extra = [c for c in pool.columns if c not in ("doc_id", "weight", "skey")]
    best = pool.groupBy("doc_id").agg(
        F.max(F.struct("skey", "weight", *extra)).alias("_b")
    )
    return best.select(
        "doc_id",
        F.col("_b.weight").alias("weight"),
        F.col("_b.skey").alias("skey"),
        *[F.col(f"_b.{c}").alias(c) for c in extra],
    )


def update_reservoir(
    spark: SparkSession,
    batch: DataFrame,
    table: TxTable,
    k: int,
    seed: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    batch_id: str | None = None,
) -> bool:
    """Fold one batch of ``(id, weight)`` offers into the reservoir.
    Returns False for a detected replay. ``k``/``seed`` are stamped
    at bootstrap; a later mismatch raises before any work."""
    base_v = table.latest_version()
    # stamp validation BEFORE the replay early-return: a replayed
    # batch offered with mismatched k/seed is a misconfigured caller
    # and must fail fast, not silently report "already applied"
    meta = table.meta(base_v)
    for name, offered in (("res_k", k), ("res_seed", seed)):
        stamped = meta.get(name)
        if stamped is not None and int(stamped) != offered:
            raise ValueError(
                f"reservoir built with {name}={stamped}, batch "
                f"offered {offered} — the key function is a table "
                "property; rebuild to change it"
            )
    if batch_id is not None and table.is_applied(batch_id, base_v):
        return False
    offers = batch.select(
        F.col(id_col).alias("doc_id"),
        F.col(weight_col).cast("long").alias("weight"),
        reservoir_key(id_col, weight_col, seed).alias("skey"),
    ).filter(F.col("skey").isNotNull())

    state = table.read(spark, version=base_v)
    pool = (
        offers
        if state is None
        else state.select("doc_id", "weight", "skey").unionByName(offers)
    )
    merged = (
        # a re-offered id with the SAME weight carries the identical
        # deterministic key; a re-offer with a CHANGED weight yields a
        # different key, so resolve per doc by max(skey, weight) —
        # associative/commutative, hence order- and batching-
        # independent (dropDuplicates would keep an arbitrary copy,
        # making the reservoir nondeterministic under weight drift).
        # Contract: the most favorable draw wins — for the E-S key
        # ln(u)/w that is the LARGEST weight ever offered for the id.
        _best_per_doc(pool)
        .orderBy(F.col("skey").desc(), F.col("doc_id"))
        .limit(k)
        .withColumn("part", F.lit(_PART))
    )
    adds = table.stage_files(merged, "part")
    table.commit(
        adds,
        remove_partitions={_PART},
        batch_id=batch_id,
        expected_version=base_v,
        meta={"res_k": k, "res_seed": seed},
    )
    return True


def read_reservoir(spark: SparkSession, table: TxTable) -> DataFrame:
    """The current exactly-≤k sample (k rows once the stream has
    offered ≥ k eligible documents)."""
    df = table.read(spark)
    if df is None:
        from nfl_data_pipeline_spark.operators.localframe import (
            empty_frame,
        )

        return empty_frame(
            spark, "doc_id long, weight long, skey double"
        )
    return df.select("doc_id", "weight", "skey")


def update_stratified_reservoir(
    spark: SparkSession,
    batch: DataFrame,
    table: TxTable,
    k: int,
    seed: int,
    quota_weights: dict,
    strata_col: str = "stratum",
    id_col: str = "doc_id",
    weight_col: str = "weight",
    batch_id: str | None = None,
) -> bool:
    """Stratified incremental reservoir: one E-S reservoir per
    stratum, with ``k`` split over strata by the same Hamilton
    largest-remainder allocation the batch sampler uses
    (operators/sampling.hamilton_quotas over ``quota_weights``), so
    the maintained sample's strata mix matches the pinned mix to the
    integer. State is ≤ k rows total.

    Quota-drift contract — quotas are PINNED at bootstrap, not
    re-split per batch: a reservoir holds only its stratum's top
    ``k_s`` keys, so rows discarded under a smaller quota are
    unrecoverable from bounded state — a shrink-then-grow re-split
    could never equal the one-shot sample again. Changing the mix is
    therefore a REBUILD, same as ``k``/``seed``. What is stamped (and
    enforced) is the resolved integer QUOTA map, not the raw weights
    — two weight dicts with the same Hamilton split define the same
    key function. Offers from strata outside the pinned map have
    quota 0 and are never sampled (consistent with Hamilton over the
    pinned weights). Stratum values ride as strings in state/meta.

    Stream == one-shot: per stratum the reservoir is a top-``k_s``
    by the pure-function key, so the maintained state provably equals
    the one-shot per-stratum top-``k_s`` over everything ever
    offered (tests pin it)."""
    import json

    from nfl_data_pipeline_spark.operators.sampling import hamilton_quotas

    quotas = {
        str(s): int(q)
        for s, q in hamilton_quotas(quota_weights, k).items()
        if q > 0
    }
    base_v = table.latest_version()
    meta = table.meta(base_v)
    offered_q = json.dumps(quotas, sort_keys=True)
    for name, offered in (
        ("res_k", str(k)),
        ("res_seed", str(seed)),
        ("res_quotas", offered_q),
    ):
        stamped = meta.get(name)
        if stamped is not None and str(stamped) != offered:
            raise ValueError(
                f"stratified reservoir built with {name}={stamped}, "
                f"batch offered {offered} — the key function and the "
                "quota split are table properties; rebuild to change "
                "them"
            )
    if batch_id is not None and table.is_applied(batch_id, base_v):
        return False

    offers = batch.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).cast("string").alias("stratum"),
        F.col(weight_col).cast("long").alias("weight"),
        reservoir_key(id_col, weight_col, seed).alias("skey"),
    ).filter(F.col("skey").isNotNull() & F.col("stratum").isNotNull())

    state = table.read(spark, version=base_v)
    pool = (
        offers
        if state is None
        else state.select(
            "doc_id", "stratum", "weight", "skey"
        ).unionByName(offers)
    )
    from pyspark.sql.window import Window

    from nfl_data_pipeline_spark.operators.localframe import local_frame

    qdf = local_frame(
        spark, list(quotas.items()), "stratum string, _q long"
    )
    wq = Window.partitionBy("stratum").orderBy(
        F.col("skey").desc(), F.col("doc_id")
    )
    merged = (
        _best_per_doc(pool)
        # bounded broadcast: one row per stratum
        .join(F.broadcast(qdf), "stratum")
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= F.col("_q"))
        .select("doc_id", "stratum", "weight", "skey")
        .withColumn("part", F.lit(_PART))
    )
    adds = table.stage_files(merged, "part")
    table.commit(
        adds,
        remove_partitions={_PART},
        batch_id=batch_id,
        expected_version=base_v,
        meta={"res_k": k, "res_seed": seed, "res_quotas": offered_q},
    )
    return True


def read_stratified_reservoir(
    spark: SparkSession, table: TxTable
) -> DataFrame:
    """The current stratified sample: ≤ k_s rows per stratum (k_s
    exactly once the stream has offered ≥ k_s eligible docs in the
    stratum)."""
    df = table.read(spark)
    if df is None:
        from nfl_data_pipeline_spark.operators.localframe import (
            empty_frame,
        )

        return empty_frame(
            spark, "doc_id long, stratum string, weight long, skey double"
        )
    return df.select("doc_id", "stratum", "weight", "skey")
