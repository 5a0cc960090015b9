"""Sketch-based approximate aggregation — the 100 TB toolbox the
reference never needed (its 1.2M rows fit in RAM): HyperLogLog++
distinct counts and t-digest-style quantiles, both mergeable across
partitions (one pass, bounded memory, no exact shuffle of distincts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.02
) -> DataFrame:
    """HLL++ approximate COUNT(DISTINCT col) per key group.

    rsd = relative standard deviation target. Unlike exact distinct
    aggregation, the sketch merges map-side: no shuffle of the
    distinct values themselves.
    """
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(f"approx_n_{col}"),
        F.count("*").alias("n_rows"),
    )


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate per-group quantiles (Greenwald-Khanna via
    percentile_approx): one mergeable pass, memory bounded by
    `accuracy`, vs the exact percentile's full sort per group."""
    aggs = [
        F.percentile_approx(col, p, accuracy).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs)


# --- mergeable length histogram ------------------------------------------
#
# percentile_approx / HLL answer one-shot queries; maintaining
# percentiles ACROSS incremental batches (jobs/txlog state) needs a
# sketch whose state is plain mergeable SUMS. This one buckets a
# non-negative integer metric by (decimal length, two leading digits):
#   x in [0, 10)  -> singleton bucket x - 10        (exact)
#   x >= 10       -> (len(x)-2)*90 + first2(x) - 10 (rel. width ~5%)
# Bucketing is pure integer/string arithmetic — length(CAST AS
# STRING)), integer div by an exact power of ten — so Spark and DuckDB
# produce bit-identical bucket ids (no log10 boundary drift), and the
# state is just (key, bucket, n) counts that merge_grouped_sums can
# maintain. Quantile recovery walks the cumulative counts and returns
# the bucket midpoint: relative error ≤ half a bucket width (~5.3%),
# exact below 10.

HIST_SUB = 90  # two-leading-digit mantissa buckets per decade


def sp_len_bucket(x: str) -> str:
    """Spark SQL: deterministic log-ish bucket id of integer ``x``."""
    d = f"length(CAST({x} AS STRING))"
    p = f"CAST(power(10, {d} - 2) AS BIGINT)"  # exact for d-2 <= 15
    return (
        f"CASE WHEN {x} < 10 THEN {x} - 10 "
        f"ELSE ({d} - 2) * {HIST_SUB} + (CAST({x} AS BIGINT) div {p}) - 10 "
        "END"
    )


def duck_len_bucket(x: str) -> str:
    """DuckDB: the same bucket id, same integer math."""
    d = f"length(CAST({x} AS VARCHAR))"
    p = f"CAST(power(10, {d} - 2) AS BIGINT)"
    return (
        f"CASE WHEN {x} < 10 THEN {x} - 10 "
        f"ELSE ({d} - 2) * {HIST_SUB} + (CAST({x} AS BIGINT) // {p}) - 10 "
        "END"
    )


def sp_bucket_mid(b: str) -> str:
    """Spark SQL: representative value of bucket ``b`` (midpoint of
    [lo, hi); exact value for the singleton buckets)."""
    d = f"CAST(({b}) div {HIST_SUB} AS DOUBLE)"
    mant = f"(({b}) % {HIST_SUB} + 10)"
    return (
        f"CASE WHEN {b} < 0 THEN CAST({b} + 10 AS DOUBLE) "
        f"ELSE ({mant} + 0.5) * power(10, {d}) END"
    )


def duck_bucket_mid(b: str) -> str:
    d = f"CAST(({b}) // {HIST_SUB} AS DOUBLE)"
    mant = f"(({b}) % {HIST_SUB} + 10)"
    return (
        f"CASE WHEN {b} < 0 THEN CAST({b} + 10 AS DOUBLE) "
        f"ELSE ({mant} + 0.5) * power(10, {d}) END"
    )


def histogram_counts(
    df: DataFrame, keys: Sequence[str], col: str
) -> DataFrame:
    """Mergeable histogram state: (keys..., bucket, n). One hash
    aggregate with map-side combine — the state cardinality is
    O(|keys| × ~90·decades), independent of row count."""
    return (
        df.select(*keys, F.expr(sp_len_bucket(col)).alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame, keys: Sequence[str], probs: Sequence[float]
) -> DataFrame:
    """Per-key quantiles recovered from histogram state. The
    threshold compare is pure integer (``100·cum ≥ p100·total``), so
    recovery is deterministic cross-engine. Returns one row per key
    with a ``p{NN}`` column per requested quantile."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*keys)
    c = (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(wt))
        .withColumn("mid", F.expr(sp_bucket_mid("bucket")))
    )
    aggs = []
    for p in probs:
        p100 = round(p * 100)
        aggs.append(
            F.min(
                F.when(F.col("cum") * 100 >= F.col("total") * p100, F.col("mid"))
            ).alias(f"p{p100}")
        )
    return c.groupBy(*keys).agg(*aggs)
