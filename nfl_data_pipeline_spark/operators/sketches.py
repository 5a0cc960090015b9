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
