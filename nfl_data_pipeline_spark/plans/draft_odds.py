"""Draft-odds de-vig + pivot — reproduction of
``R/nfl_draft_espn_dk.R``.

Moves: name/label parsing (``:14-19``), American-odds → implied
probability (``:21-26``), the 10-iteration vig-removal fixed point
per (player, line) book (``:28-40``), pivot_wider on the under/over
flag (``:42-45``), and the cumulative-probability CDF (``:75-81``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.functions import american_odds_to_prob


def parse_odds(dk: DataFrame) -> DataFrame:
    """String cleanup + implied probability
    (R/nfl_draft_espn_dk.R:13-26)."""
    return dk.select(
        F.regexp_replace("player", " Draft Position$", "").alias("player"),
        F.col("pick"),
        F.when(F.col("label").contains("Under"), 1).otherwise(0).alias("under"),
        F.col("oddsAmerican").cast("double").alias("odds"),
    ).withColumn("pct", american_odds_to_prob("odds"))


def remove_vig(parsed: DataFrame, n_iter: int = 10) -> DataFrame:
    """Power-method de-vig per (player, pick) 2-leg book
    (R/nfl_draft_espn_dk.R:28-40): pct ← pct^(log2/log(2/Σpct))."""
    w = Window.partitionBy("player", "pick")
    df = parsed
    for i in range(n_iter):
        k = F.log(F.lit(2.0)) / F.log(2.0 / F.sum("pct").over(w))
        df = df.withColumn("pct", F.pow("pct", k))
        if i % 4 == 3:
            df = df.localCheckpoint(eager=False)
    return df


def pivot_under_over(devigged: DataFrame) -> DataFrame:
    """pivot_wider(values_from=c(odds,pct), names_from=under)
    (R/nfl_draft_espn_dk.R:42-45)."""
    piv = (
        devigged.groupBy("player", "pick")
        .pivot("under", [0, 1])
        .agg(F.first("odds").alias("odds"), F.first("pct").alias("pct"))
    )
    return piv.select(
        "player",
        "pick",
        F.col("0_odds").alias("odds_over"),
        F.col("1_odds").alias("odds_under"),
        F.col("0_pct").alias("pct_over"),
        F.col("1_pct").alias("pct_under"),
    )


def pick_cdf(espn_proj: DataFrame) -> DataFrame:
    """Per-player cumulative pick probability ordered by pick number
    (R/nfl_draft_espn_dk.R:75-81) — running sum, explicit order."""
    w = (
        Window.partitionBy("player")
        .orderBy("espn_pick")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return espn_proj.withColumn("cum_prob", F.sum("espn_prob").over(w))
