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
    if batch_id is not None and table.is_applied(batch_id, base_v):
        return False
    meta = table.meta(base_v)
    for name, offered in (("res_k", k), ("res_seed", seed)):
        stamped = meta.get(name)
        if stamped is not None and int(stamped) != offered:
            raise ValueError(
                f"reservoir built with {name}={stamped}, batch "
                f"offered {offered} — the key function is a table "
                "property; rebuild to change it"
            )
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
        # a re-offered id carries the identical deterministic key —
        # one row survives regardless of which copy wins
        pool.dropDuplicates(["doc_id"])
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
        return spark.createDataFrame(
            [], "doc_id long, weight long, skey double"
        )
    return df.select("doc_id", "weight", "skey")
